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
    * oracle reproduces the doubles exactly).
    *
    * All four raw counts come from ONE native byte pass
    * (`plans.TextStats`) instead of five regex scans — this is the
    * most common corpus pass there is, and the regex form re-walked
    * (and for the mean, regexp_replace-copied) every document per
    * statistic. Values, null behavior, and the DuckDB oracle are
    * unchanged: the guards below replicate the regex formulation
    * exactly (null text → wc 0, null punct_ratio, 0.0 stop/mean —
    * FunctionsSpec pins parity with the regex forms). */
  def scored(df: DataFrame, text: Column,
             stopwords: Seq[String] = TextFunctions.LangStopwords.toMap.apply("en")): DataFrame = {
    val st = graft.plans.TextExpressions.textStats(text, stopwords)
    val wc = when(text.isNull, lit(0)).otherwise(st.getField("wc"))
    val punct = when(length(text) === 0, lit(0.0))
      .otherwise(round(st.getField("punct").cast("double") / length(text).cast("double"), 6))
    val stop = when(wc === 0, lit(0.0))
      .otherwise(round(st.getField("stop").cast("double") / wc.cast("double"), 6))
    val mean = when(wc === 0, lit(0.0))
      .otherwise(round(st.getField("nonws").cast("double") / wc.cast("double"), 6))
    df.withColumn("word_count", wc.cast("long"))
      .withColumn("punct_ratio", punct)
      .withColumn("stopword_ratio", stop)
      .withColumn("mean_word_len", mean)
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
