package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Multiply, Sqrt}

/** SQL-surface registration for graft's native expressions (SURVEY
  * E3): `graft_dot(a, b)` and `graft_cosine(a, b)` become callable
  * from `spark.sql(...)`.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session
  *    build time (the standard extensions mechanism), or
  *  - `GraftExtensions.register(spark)` imperatively on an existing
  *    session (what `Tables.load`-based entry points use, since the
  *    driver owns session construction).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def dotOf(args: Seq[Expression]): Expression = {
    require(args.length == 2, "expected (array, array)")
    ArrayDotProduct(args.head, args.last)
  }

  private def cosineOf(args: Seq[Expression]): Expression = {
    require(args.length == 2, "expected (array, array)")
    val Seq(a, b) = args
    org.apache.spark.sql.catalyst.expressions.Divide(
      ArrayDotProduct(a, b),
      Multiply(Sqrt(ArrayDotProduct(a, a)), Sqrt(ArrayDotProduct(b, b))))
  }

  private def intersectOf(args: Seq[Expression]): Expression = {
    require(args.length == 2, "expected (sorted array, sorted array)")
    SortedIntersectSize(args.head, args.last)
  }

  private def charNgramsOf(args: Seq[Expression]): Expression = {
    require(args.length == 2, "expected (text, n)")
    val n = args.last match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(s"n must be an int literal, got $other")
    }
    CharNgrams(args.head, n)
  }

  private def wordNgramsOf(args: Seq[Expression]): Expression = {
    require(args.length == 2, "expected (text, n)")
    val n = args.last match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(s"n must be an int literal, got $other")
    }
    WordNgrams(args.head, n)
  }

  private def textStatsOf(args: Seq[Expression]): Expression = {
    require(args.length == 1 || args.length == 2,
      "expected (text) or (text, array('stop', ...))")
    val stops: Seq[String] =
      if (args.length == 1) Seq.empty
      else args.last match {
        case org.apache.spark.sql.catalyst.expressions.CreateArray(elems, _) =>
          elems.map {
            case org.apache.spark.sql.catalyst.expressions.Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
              s.toString
            case other => throw new IllegalArgumentException(
              s"stopwords must be string literals, got $other")
          }
        case other => throw new IllegalArgumentException(
          s"stopwords must be an array literal, got $other")
      }
    TextStats(args.head, stops)
  }

  private[plans] val injections: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      dotOf _),
    ("graft_cosine",
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_cosine"),
      cosineOf _),
    ("graft_sorted_intersect_size",
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "graft_sorted_intersect_size"),
      intersectOf _),
    ("graft_char_ngrams",
      new ExpressionInfo(classOf[CharNgrams].getName, "graft_char_ngrams"),
      charNgramsOf _),
    ("graft_word_ngrams",
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_word_ngrams"),
      wordNgramsOf _),
    ("graft_text_stats",
      new ExpressionInfo(classOf[TextStats].getName, "graft_text_stats"),
      textStatsOf _))

  /** Idempotently register the graft functions on a live session. */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (name, info, builder) =>
      org.apache.spark.sql.graft.Bridge.registerFunction(spark, name, info, builder)
    }
}
