package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native intersection-size of two SORTED arrays (SURVEY E2).
  *
  * The Jaccard verification step (C4, and MinHash C2's exactness
  * check) computes |A ∩ B| for millions of candidate pairs. Spark's
  * `array_intersect` builds a hash set and materializes the
  * intersection array per row; for pre-sorted inputs a merge scan is
  * O(n+m) with ZERO allocation — and this expression generates that
  * loop into whole-stage codegen.
  *
  * Element types: string (UTF8String compare) or bigint (primitive
  * compare — the near-dup verifiers hash shingles to xxhash64 longs,
  * 8 bytes/element instead of ~48 for an md5 hex string, so the
  * candidate-verify shuffles move ~6× fewer bytes and the merge scan
  * compares longs instead of strings).
  *
  * Inputs MUST be ascending-sorted arrays of non-null elements (the
  * near-dup operators build them with `sort_array(collect_set(...))`).
  * Duplicate elements are counted once per distinct match run —
  * callers pass set-valued (distinct) arrays, where it equals the set
  * intersection size exactly.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_size"

  private def elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<string> or two array<bigint> arguments, got $l / $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val strings = elementType == StringType
    var i = 0
    var j = 0
    var cnt = 0
    while (i < x.numElements() && j < y.numElements()) {
      val c =
        if (strings) x.getUTF8String(i).compareTo(y.getUTF8String(j))
        else java.lang.Long.compare(x.getLong(i), y.getLong(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val c = ctx.freshName("c")
      val cmp =
        if (elementType == StringType)
          s"$x.getUTF8String($i).compareTo($y.getUTF8String($j))"
        else
          s"java.lang.Long.compare($x.getLong($i), $y.getLong($j))"
      s"""
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $x.numElements() && $j < $y.numElements()) {
         |  final int $c = $cmp;
         |  if ($c == 0) { $cnt++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object ArrayExpressions {

  /** Codegen'd |A ∩ B| for ascending-sorted distinct string or long
    * arrays. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectSize(Bridge.expression(a), Bridge.expression(b)))
}
