package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared shingle machinery for the near-dup family (C2-C4, C11).
  *
  * `exploded` produces one (id, shingle) row per consecutive word
  * n-gram WITHOUT higher-order functions: split + posexplode + per-id
  * window `lead` — everything whole-stage codegen. It costs exactly
  * one shuffle on id, and every downstream per-id aggregation
  * (minhash mins, simhash bit sums, collect_set verification sets,
  * bottom-k fingerprints) reuses that partitioning — Catalyst inserts
  * no further exchange, and identical branches become ReusedExchange.
  */
object Shingles {

  /** (id, sh) rows: consecutive n-grams of the whitespace tokens of
    * `lower(text)` (python str.split semantics — empties dropped).
    * Docs with fewer than n tokens produce no rows. NOT deduplicated
    * (min-aggregations don't care; dedup where semantics need it). */
  def exploded(df: DataFrame, id: Column, text: Column, n: Int = 3): DataFrame = {
    val toks = df
      .select(id.as("id"), posexplode(split(lower(text), "\\s+")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    if (n == 1) return toks.select(col("id"), col("tok").as("sh"))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val withLeads = toks.select(
      col("id") +: col("tok") +:
        (1 until n).map(j => lead(col("tok"), j).over(w).as(s"t$j")): _*)
    withLeads
      .filter(col(s"t${n - 1}").isNotNull)
      .select(col("id"),
        concat_ws(" ", (col("tok") +: (1 until n).map(j => col(s"t$j"))): _*).as("sh"))
  }

  /** Distinct-shingle set per id as an ASCENDING-SORTED array column
    * (the near-dup verifiers merge-scan them natively). */
  def sets(exploded: DataFrame): DataFrame =
    exploded.groupBy(col("id")).agg(sort_array(collect_set(col("sh"))).as("s"))

  /** Repetition statistics per document (SURVEY C14, Gopher-style
    * quality rules): fraction of tokens taken by the most frequent
    * token, and of word 2-grams by the most frequent 2-gram. High
    * values flag degenerate/boilerplate text. Two hash aggregates
    * riding one id-shuffle each; docs too short for a 2-gram get 0.0. */
  def repetitionStats(df: DataFrame, id: Column, text: Column): DataFrame = {
    def topFrac(grams: DataFrame): DataFrame =
      grams.groupBy(col("id"), col("sh")).agg(count(lit(1)).as("c"))
        .groupBy(col("id"))
        .agg(round(max(col("c")).cast("double") / sum(col("c")), 6).as("frac"))
    val tok = topFrac(exploded(df, id, text, 1)).withColumnRenamed("frac", "top_token_frac")
    val big = topFrac(exploded(df, id, text, 2)).withColumnRenamed("frac", "top_bigram_frac")
    tok.join(big, Seq("id"), "left")
      .select(col("id"), col("top_token_frac"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"))
  }

  /** Bottom-k sketch fingerprint per document (SURVEY C11): the k
    * lexicographically smallest md5 hashes of the distinct shingles,
    * comma-joined; '' for docs too short to shingle. Aggregation
    * rides the `exploded` shuffle; the join back to the full id set
    * broadcasts the (tiny) sketch side or shuffles once. */
  def bottomKFingerprint(df: DataFrame, id: Column, text: Column,
                         n: Int = 3, k: Int = 5): DataFrame = {
    val sk = exploded(df, id, text, n)
      .groupBy(col("id"))
      .agg(concat_ws(",", slice(sort_array(collect_set(md5(col("sh")))), 1, k)).as("fp"))
    df.select(id.as("id"))
      .join(sk, Seq("id"), "left")
      .select(col("id"), coalesce(col("fp"), lit("")).as("fingerprint"))
  }
}
