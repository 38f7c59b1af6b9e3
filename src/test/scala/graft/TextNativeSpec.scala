package graft

import org.apache.spark.sql.functions._
import graft.plans.TextExpressions

/** Native CharNgrams (E2): codepoint-exact parity with the
  * substr-based HOF form on ASCII, Cyrillic, and astral-plane text —
  * same grams the DuckDB oracle computes. */
class TextNativeSpec extends SparkSpec {
  import spark.implicits._

  private def hofTrigrams(text: org.apache.spark.sql.Column) =
    filter(
      transform(sequence(lit(1), greatest(length(text) - 2, lit(0))),
        i => text.substr(i, lit(3))),
      t => length(t) === 3)

  test("charNgrams == substr HOF on mixed-width unicode") {
    val rows = Seq(
      "hello world",
      "ab", "abc", "", "a",
      "привет мир и ещё немного текста",
      "emoji 😀 inside 🎉 text",
      "mixed räksmörgås ascii приве́т"
    ).toDF("t")
    val out = rows.select(
        TextExpressions.charNgrams(col("t"), 3).as("native"),
        hofTrigrams(col("t")).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"native ${r.getSeq[String](0)} vs hof ${r.getSeq[String](1)}")
    }
  }

  private def hofWordNgrams(text: org.apache.spark.sql.Column, n: Int) = {
    val toks = filter(split(text, "\\s+"), t => t =!= "")
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  test("wordNgrams == split/slice HOF: whitespace runs, edges, unicode, null") {
    val rows = Seq(
      "a b c d e",
      "  leading and   multi\t\tspace\nand newline  ",
      "one", "", "   ", "\t\n",
      "привет мир ещё раз тут",
      "emoji 😀 inside 🎉 text ok",
      null.asInstanceOf[String]
    ).toDF("t")
    for (n <- Seq(1, 2, 3, 5)) {
      val out = rows.select(
          TextExpressions.wordNgrams(col("t"), n).as("native"),
          hofWordNgrams(col("t"), n).as("hof"))
        .collect()
      out.foreach { r =>
        if (r.isNullAt(0) || r.isNullAt(1))
          // HOF: split(null) → null toks → size(null) = -1 → otherwise
          // branch → EMPTY array; native null-propagates. Both explode
          // to zero rows — the operator-level contract that matters.
          assert(r.isNullAt(0) && (r.isNullAt(1) || r.getSeq[String](1).isEmpty))
        else
          assert(r.getSeq[String](0) == r.getSeq[String](1),
            s"n=$n: native ${r.getSeq[String](0)} vs hof ${r.getSeq[String](1)}")
      }
    }
  }

  test("graft_word_ngrams is SQL-callable after registration") {
    graft.plans.GraftExtensions.register(spark)
    Seq("a  b\tc d").toDF("t").createOrReplaceTempView("tns_w")
    val grams = spark.sql("SELECT graft_word_ngrams(t, 2) g FROM tns_w")
      .collect().head.getSeq[String](0)
    assert(grams == Seq("a b", "b c", "c d"))
  }

  test("graft_char_ngrams is SQL-callable after registration") {
    graft.plans.GraftExtensions.register(spark)
    Seq("abcd").toDF("t").createOrReplaceTempView("tns_t")
    val grams = spark.sql("SELECT graft_char_ngrams(t, 2) g FROM tns_t")
      .collect().head.getSeq[String](0)
    assert(grams == Seq("ab", "bc", "cd"))
  }
}
