package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character n-gram extraction (SURVEY E2).
  *
  * The LM quality scorer (C28) explodes every document into its
  * character trigrams. Doing that with per-position `substr` is
  * QUADRATIC per document on UTF-8 strings — each codepoint-indexed
  * substring scans from the start of the string, so a 2 kB document
  * costs ~4M byte reads (measured: the substr form was ~3.3 s of the
  * c28 query at sf0.1). This expression walks the bytes ONCE,
  * records codepoint offsets, and slices each n-gram directly —
  * O(len) per document, allocation limited to the output grams.
  *
  * Semantics match `substr(t, i, n)` per CODEPOINT (the SQL/DuckDB
  * definition), so the C28 oracle is unchanged; parity with the
  * HOF+substr form is spec-pinned (TextNativeSpec).
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNgrams.slice(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharNgrams.slice($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {

  /** One linear pass: codepoint start offsets, then O(1) slices.
    * Called from generated code — must stay static-shaped. */
  def slice(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes // may copy once per document
    val len = bytes.length
    // offsets of each codepoint start, plus the terminal offset
    val offs = new Array[Int](s.numChars() + 1)
    var i = 0
    var c = 0
    while (i < len) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(c) = len
    val count = math.max(0, c - n + 1)
    val out = new Array[AnyRef](count)
    var g = 0
    while (g < count) {
      out(g) = UTF8String.fromBytes(bytes, offs(g), offs(g + n) - offs(g))
      g += 1
    }
    new GenericArrayData(out)
  }
}

object TextExpressions {

  /** Codegen'd array of all `n`-codepoint windows of `text`. */
  def charNgrams(text: Column, n: Int): Column =
    Bridge.column(CharNgrams(Bridge.expression(text), n))
}
