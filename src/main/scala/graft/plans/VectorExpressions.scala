package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst dot product over two double arrays (SURVEY E2).
  *
  * The hot path of every embedding operator (C5-C7) is a dot product
  * per candidate pair. The declarative form —
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,v) => acc+v)` —
  * is a higher-order function, which Catalyst evaluates interpreted
  * (CodegenFallback) and which allocates an intermediate array per
  * row. This expression generates a tight Java loop inside
  * whole-stage codegen instead: no allocation, no virtual calls.
  *
  * Semantics match the HOF form exactly (same left-to-right double
  * accumulation, so DuckDB-oracle results are unchanged): null input
  * or length mismatch → null; elements must be non-null doubles
  * (cast float arrays with `.cast("array<double>")` — the Column
  * helpers below do).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are array<double> by construction (the Column helpers cast)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // a LENGTH MISMATCH yields null even when both children are
  // non-nullable — without this override the generated
  // `isNull = true` would assign to a constant `false` under
  // whole-stage codegen (a Java compile error → interpreted fallback)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions. */
object VectorExpressions {

  private def toDouble(a: Column): Column = a.cast("array<double>")

  /** Codegen'd dot product; accepts float or double arrays. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(ArrayDotProduct(
      Bridge.expression(toDouble(a)),
      Bridge.expression(toDouble(b))))

  /** L2 norm via the native dot. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity via the native dot (unrounded — callers round
    * per SURVEY §4.3). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
