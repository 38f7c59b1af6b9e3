package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Document quality gate (SURVEY C9 + C13) — ONE code path for the
  * batch queries and their streaming twin (D7, `EventStream
  * .qualityGate`). Every column here is a pure map-side codegen
  * expression over `text`, so the same call applies to a static or
  * streaming DataFrame unchanged: no state, no shuffle, no
  * reordering. The reference has no quality stage (it loads whatever
  * the scraper produced); these are the Gopher/C4-style gates a
  * training-data pipeline needs in front of the lake.
  */
object Quality {

  /** Append C9's component columns and its fixed linear score:
    * word_count, punct_ratio, stopword_ratio, mean_word_len,
    * quality_score (each rounded per SURVEY §4.3 so the DuckDB
    * oracle reproduces the doubles exactly). */
  def scored(df: DataFrame, text: Column,
             stopwords: Seq[String] = TextFunctions.LangStopwords.toMap.apply("en")): DataFrame = {
    val wc = TextFunctions.wordCount(text)
    val punct = TextFunctions.punctRatio(text)
    val stop = TextFunctions.stopwordRatio(text, stopwords)
    df.withColumn("word_count", wc.cast("long"))
      .withColumn("punct_ratio", punct)
      .withColumn("stopword_ratio", stop)
      .withColumn("mean_word_len", TextFunctions.meanWordLength(text))
      .withColumn("quality_score",
        round(least(wc / 200.0, lit(1.0)) * 0.4 +
          (lit(1.0) - least(punct * 5.0, lit(1.0))) * 0.3 +
          least(stop * 4.0, lit(1.0)) * 0.3, 6))
  }

  /** Append C13's redaction of `text` and its per-kind PII counts:
    * scrubbed, n_emails, n_urls, n_phones. */
  def scrubbed(df: DataFrame, text: Column): DataFrame = {
    val (emails, urls, phones) = TextFunctions.piiCounts(text)
    df.withColumn("scrubbed", TextFunctions.scrub(text))
      .withColumn("n_emails", emails.cast("long"))
      .withColumn("n_urls", urls.cast("long"))
      .withColumn("n_phones", phones.cast("long"))
  }
}
