package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for the product-quantization hot path
  * (SURVEY C27/C31, E2).
  *
  * The PQ operators were first written declaratively (HOF `transform`
  * lambdas scoring an m×k codebook literal). Two engine realities made
  * that untenable at any scale:
  *   1. higher-order functions evaluate interpreted, with NO common-
  *      subexpression elimination — a lambda that references a derived
  *      vector re-derives it per element (the unit-normalization alone
  *      became O(d²·k·m) per row);
  *   2. the optimizer freely COPIES expressions out of projections
  *      (predicate pushdown through a Project substitutes aliases), so
  *      "materialize the unit vector as an attribute first" does not
  *      survive optimization — `isnotnull(cell)` arrives at the scan
  *      with the whole argmax tree inlined into a Filter.
  * A native expression solves both: the model rides as ONE plan
  * reference object, evaluation is a tight compiled loop that costs
  * the same wherever the optimizer copies it, and the expression tree
  * is O(1) nodes so Catalyst analysis stays flat in m·k.
  *
  * Scoring matches the declarative form bit-for-bit: nearest-by-L2 ⇔
  * max of (u_sub·c − |c|²/2) over cells, ties to the lowest cell id,
  * doubles accumulated left-to-right.
  *
  * ONE deliberate ANSI divergence: a zero-norm input under
  * `normalize=true`. The declarative form fails fast with an ANSI
  * DIVIDE_BY_ZERO at normalization; native math would instead produce
  * NaN scores, a -1 argmax, and a deferred element_at crash far from
  * the cause. These expressions return NULL for a zero-norm vector —
  * the standard SQL "undefined input → NULL" contract — so downstream
  * ranking simply never sees the row (desc ordering puts nulls last).
  */
object PQNative {

  /** Codebook compiled to flat primitive arrays once per plan (the
    * expressions hold it via `addReferenceObj`). A dead cell (empty
    * seq — a Lloyd cell that lost all members) is null here and can
    * never win the argmax. */
  final class CompiledModel(cents: Seq[Seq[Seq[Double]]]) extends Serializable {
    val m: Int = cents.length
    val k: Int = if (cents.isEmpty) 0 else cents.map(_.length).max
    val cells: Array[Array[Array[Double]]] =
      cents.map(_.map(cv => if (cv.isEmpty) null else cv.toArray).toArray).toArray
    val half: Array[Array[Double]] = cells.map(_.map { cv =>
      if (cv == null) 0.0
      else { var s = 0.0; var i = 0; while (i < cv.length) { s += cv(i) * cv(i); i += 1 }; s / 2 }
    })
    val subDim: Int =
      cells.iterator.flatMap(_.iterator).collectFirst { case cv if cv != null => cv.length }.getOrElse(0)
    val dim: Int = m * subDim
  }

  /** Primitive copy, unit-normalized when asked; NULL (not NaN) for a
    * zero-norm vector — see the object docstring's ANSI note. */
  private def unitOf(v: ArrayData, n: Int, normalize: Boolean): Array[Double] = {
    val u = new Array[Double](n)
    var i = 0
    while (i < n) { u(i) = v.getDouble(i); i += 1 }
    if (normalize) {
      var s = 0.0; i = 0
      while (i < n) { s += u(i) * u(i); i += 1 }
      if (s == 0.0) return null
      val nrm = math.sqrt(s); i = 0
      while (i < n) { u(i) = u(i) / nrm; i += 1 }
    }
    u
  }

  /** argmax cell per subspace → m int codes; null on dim mismatch or
    * zero-norm input. */
  def codes(v: ArrayData, model: CompiledModel, normalize: Boolean): UnsafeArrayData = {
    if (v.numElements() != model.dim) return null
    val u = unitOf(v, model.dim, normalize)
    if (u == null) return null
    val out = new Array[Int](model.m)
    var s = 0
    while (s < model.m) {
      val off = s * model.subDim
      var best = Double.NegativeInfinity
      var bestC = -1
      var c = 0
      while (c < model.k) {
        val cv = model.cells(s)(c)
        if (cv != null) {
          var d = 0.0; var i = 0
          while (i < model.subDim) { d += u(off + i) * cv(i); i += 1 }
          val score = d - model.half(s)(c)
          if (score > best) { best = score; bestC = c }
        }
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ADC table: tbl(sub)(cell) = u_sub · centroid; null on dim
    * mismatch or zero-norm input (dead cells score 0 — tables are
    * only built from full codebooks). */
  def adcTable(v: ArrayData, model: CompiledModel, normalize: Boolean): ArrayData = {
    if (v.numElements() != model.dim) return null
    val u = unitOf(v, model.dim, normalize)
    if (u == null) return null
    val rows = new Array[ArrayData](model.m)
    var s = 0
    while (s < model.m) {
      val off = s * model.subDim
      val row = new Array[Double](model.k)
      var c = 0
      while (c < model.k) {
        val cv = model.cells(s)(c)
        if (cv != null) {
          var d = 0.0; var i = 0
          while (i < model.subDim) { d += u(off + i) * cv(i); i += 1 }
          row(c) = d
        }
        c += 1
      }
      rows(s) = UnsafeArrayData.fromPrimitiveArray(row)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  /** unit-normalized copy (x_i / ‖x‖, left-to-right accumulation —
    * identical doubles to the declarative `x / sqrt(dot(v,v))`);
    * null for a zero-norm vector. */
  def unit(v: ArrayData): UnsafeArrayData = {
    val u = unitOf(v, v.numElements(), normalize = true)
    if (u == null) null else UnsafeArrayData.fromPrimitiveArray(u)
  }
}

/** Base for the model-carrying unary expressions: the codebook is a
  * constructor param (plan-time constant), compiled once lazily and
  * shipped to executors as a codegen reference object. */
abstract class PQModelExpression extends UnaryExpression {
  def centroids: Seq[Seq[Seq[Double]]]
  def normalize: Boolean
  @transient protected lazy val compiled = new PQNative.CompiledModel(centroids)
  override def nullable: Boolean = true // dim mismatch → null

  protected def genCall(ctx: CodegenContext, ev: ExprCode, fn: String): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val model = ctx.addReferenceObj("pqModel", compiled,
        classOf[PQNative.CompiledModel].getName)
      s"""
         |${ev.value} = graft.plans.PQNative.$fn($v, $model, $normalize);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
}

/** `array<int>` of length m: per subspace, the nearest codebook cell. */
case class NearestCodes(child: Expression, centroids: Seq[Seq[Seq[Double]]],
                        normalize: Boolean) extends PQModelExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"
  override def nullSafeEval(a: Any): Any =
    PQNative.codes(a.asInstanceOf[ArrayData], compiled, normalize)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "codes")
  override protected def withNewChildInternal(newChild: Expression): NearestCodes =
    copy(child = newChild)
}

/** `array<array<double>>` m×k: per (subspace, cell), u_sub·centroid. */
case class AdcTableExpr(child: Expression, centroids: Seq[Seq[Seq[Double]]],
                        normalize: Boolean) extends PQModelExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_pq_adc_table"
  override def nullSafeEval(a: Any): Any =
    PQNative.adcTable(a.asInstanceOf[ArrayData], compiled, normalize)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "adcTable")
  override protected def withNewChildInternal(newChild: Expression): AdcTableExpr =
    copy(child = newChild)
}

/** `array<double>`: the unit-normalized vector, one O(d) pass; NULL
  * for a zero-norm input (see PQNative's ANSI note). */
case class UnitVector(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true // zero-norm input → null
  override def prettyName: String = "graft_unit_vector"
  override def nullSafeEval(a: Any): Any = PQNative.unit(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
       |${ev.value} = graft.plans.PQNative.unit($v);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): UnitVector =
    copy(child = newChild)
}

object PQExpressions {

  private def dbl(a: Column): Column = a.cast("array<double>")

  /** Nearest-cell codes per subspace (normalizes internally unless
    * `normalize=false` for already-unit inputs). */
  def nearestCodes(vec: Column, centroids: Seq[Seq[Seq[Double]]],
                   normalize: Boolean = true): Column =
    Bridge.column(NearestCodes(Bridge.expression(dbl(vec)), centroids, normalize))

  /** Single-codebook nearest cell id (IVF coarse assignment). */
  def nearestCell(vec: Column, centroids: Seq[Seq[Double]],
                  normalize: Boolean = true): Column =
    org.apache.spark.sql.functions.element_at(
      nearestCodes(vec, Seq(centroids), normalize), 1)

  /** Per-query ADC lookup table over the codebook. */
  def adcTable(vec: Column, centroids: Seq[Seq[Seq[Double]]],
               normalize: Boolean = true): Column =
    Bridge.column(AdcTableExpr(Bridge.expression(dbl(vec)), centroids, normalize))

  /** Dot products of the (optionally normalized) vector against one
    * flat centroid list — row 1 of a single-subspace ADC table. */
  def centroidDots(vec: Column, centroids: Seq[Seq[Double]],
                   normalize: Boolean = true): Column =
    org.apache.spark.sql.functions.element_at(
      adcTable(vec, Seq(centroids), normalize), 1)

  /** O(d) unit normalization (identical doubles to x/sqrt(dot(v,v))). */
  def unitVec(vec: Column): Column =
    Bridge.column(UnitVector(Bridge.expression(dbl(vec))))
}
