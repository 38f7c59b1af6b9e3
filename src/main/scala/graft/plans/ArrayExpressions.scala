package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native intersection-size of two SORTED string arrays (SURVEY E2).
  *
  * The Jaccard verification step (C4, and MinHash C2's exactness
  * check) computes |A ∩ B| for millions of candidate pairs. Spark's
  * `array_intersect` builds a hash set and materializes the
  * intersection array per row; for pre-sorted inputs a merge scan is
  * O(n+m) with ZERO allocation — and this expression generates that
  * loop into whole-stage codegen.
  *
  * Inputs MUST be ascending-sorted arrays of non-null strings (the
  * near-dup operators build them with `sort_array(collect_set(...))`).
  * Duplicate elements are counted once per distinct match run —
  * callers pass set-valued (distinct) arrays, where it equals the set
  * intersection size exactly.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var cnt = 0
    while (i < x.numElements() && j < y.numElements()) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
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
      s"""
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $x.numElements() && $j < $y.numElements()) {
         |  final int $c = $x.getUTF8String($i).compareTo($y.getUTF8String($j));
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

  /** Codegen'd |A ∩ B| for ascending-sorted distinct string arrays. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectSize(Bridge.expression(a), Bridge.expression(b)))
}
