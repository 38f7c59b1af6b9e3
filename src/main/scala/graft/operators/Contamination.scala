package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval decontamination (SURVEY C19): the n-gram collision
  * check every LLM training pipeline runs before shipping a corpus —
  * a training document that shares long word n-grams with an
  * evaluation set leaks the benchmark into the weights.
  *
  * Implementation is the inverted-index join, never train × eval
  * pairs: both sides explode to distinct (id, md5(n-gram)) rows; the
  * (small) eval-side gram set joins the train side on the hash — one
  * shuffle, candidate rows only — and the per-train-doc distinct
  * count of shared grams comes from the same exchange. At 100 TB the
  * eval side (benchmarks are small) broadcasts; the train side
  * streams map-side.
  */
object Contamination {

  /** Per TRAIN doc: the number of distinct `n`-grams it shares with
    * any eval doc (0 rows share → doc absent; left-join upstream if
    * every doc must appear). Returns (id, shared_grams). */
  def sharedGrams(train: DataFrame, eval: DataFrame, id: Column, text: Column,
                  n: Int): DataFrame = {
    val evalGrams = grams(eval, id, text, n).select(col("h")).distinct()
    grams(train, id, text, n)
      .join(evalGrams, "h")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("shared_grams"))
  }

  private def grams(df: DataFrame, id: Column, text: Column, n: Int) =
    Shingles.exploded(df, id, text, n)
      .select(col("id"), md5(col("sh")).as("h"))
      .dropDuplicates("id", "h")

  /** `sharedGrams` with a Bloom prefilter (E10) on the train side:
    * train grams that are definitely not in the eval set never reach
    * the join's exchange — at 100 TB that is almost all of them, so
    * the shuffle carries ~collisions + fpp·|train grams| instead of
    * every gram. Output is bit-identical to `sharedGrams` (the Bloom
    * admits false positives only; the exact join resolves them). */
  def sharedGramsPrefiltered(train: DataFrame, eval: DataFrame, id: Column,
                             text: Column, n: Int,
                             expectedEvalGrams: Long): DataFrame = {
    val evalGrams = grams(eval, id, text, n).select(col("h")).distinct()
    Bloom.prefilterFor(grams(train, id, text, n), col("h"),
        evalGrams, col("h"), expectedEvalGrams)
      .join(evalGrams, "h")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("shared_grams"))
  }
}
