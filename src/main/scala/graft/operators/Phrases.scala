package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collocation mining (SURVEY C39): corpus-wide bigram PMI — the
  * phrase-detection pass (Mikolov et al. 2013's word2vec phrase
  * step, PMI form) a training pipeline runs to decide which token
  * pairs behave as units ("new york", "gradient descent") before
  * vocabulary construction or tokenizer training.
  *
  * PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ) with p from corpus-wide
  * occurrence counts (bigrams over the whitespace tokens of
  * lower(text), python-split semantics). A `minCount` floor drops
  * the noise tail (rare pairs have unboundedly high PMI — the
  * classic failure mode).
  *
  * Shape: one token-explode feeds the unigram aggregate, one bigram-
  * explode the bigram aggregate (both map-side partialed, one hash
  * shuffle each); the PMI join touches the VOCABULARY-sized count
  * tables, never the corpus again. The two normalizing totals are
  * one-row aggregates OF THE COUNT TABLES (not corpus rescans),
  * resolved on the driver and embedded as literals — model-sized
  * traffic. Ranking is (pmi desc, bigram asc): a total order, so
  * top-k is deterministic in any engine.
  */
object Phrases {

  /** (w1, w2, c, pmi): bigrams with count ≥ minCount and their PMI,
    * rounded 6. */
  def collocations(df: DataFrame, text: Column, minCount: Long = 5): DataFrame = {
    val spark = df.sparkSession
    val docs = df.select(monotonically_increasing_id().as("id"), text.as("txt"))
    // vocabulary-sized after aggregation — materialize each so the
    // totals scalar and the PMI join(s) share ONE corpus scan per
    // count table instead of replaying the explode+agg per use
    val uni = Shingles.exploded(docs, col("id"), col("txt"), 1)
      .groupBy(col("sh")).agg(count(lit(1)).as("c1"))
      .localCheckpoint(true)
    val bi = Shingles.exploded(docs, col("id"), col("txt"), 2)
      .groupBy(col("sh")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // totals: one-row aggregates over the vocabulary-sized count
    // tables — two tiny driver-side scalars, never a corpus rescan.
    // sum over an EMPTY count table is null (empty corpus, or no doc
    // long enough to bigram): no collocations exist, by definition
    val totals = uni.agg(sum(col("c1"))).head()
    val biTotal = bi.agg(sum(col("c"))).head()
    if (totals.isNullAt(0) || biTotal.isNullAt(0)) {
      import spark.implicits._
      return Seq.empty[(String, String, Long, Double)].toDF("w1", "w2", "c", "pmi")
    }
    val n1 = totals.getLong(0).toDouble
    val n2 = biTotal.getLong(0)
    val split = bi.filter(col("c") >= minCount)
      .select(split_part(col("sh"), lit(" "), lit(1)).as("w1"),
        split_part(col("sh"), lit(" "), lit(2)).as("w2"), col("c"))
    split
      .join(uni.select(col("sh").as("w1"), col("c1").as("ca")), "w1")
      .join(uni.select(col("sh").as("w2"), col("c1").as("cb")), "w2")
      .select(col("w1"), col("w2"), col("c"),
        round(log((col("c").cast("double") / n2.toDouble) /
          ((col("ca") / n1) * (col("cb") / n1))), 6).as("pmi"))
  }
}
