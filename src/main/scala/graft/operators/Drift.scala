package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus distribution drift (SURVEY C43): smoothed KL divergence
  * between the unigram distributions of two corpus generations —
  * C42 asks "how much text is new", this asks "did the LANGUAGE
  * change": topic shifts, language-mix shifts, and scraper
  * regressions (suddenly-boilerplate crawls) all move the unigram
  * distribution long before anyone reads a sample. The standard
  * monitoring number for recurring ingests.
  *
  * KL(new ‖ old) over the UNION vocabulary with add-½ smoothing
  * (both sides smoothed, so tokens unseen in either generation are
  * defined): p(w) = (c_new+½)/(N_new+½V), q(w) likewise on old,
  * KL = Σ p·ln(p/q). Reported in nats, rounded 6.
  *
  * Engine portability (SURVEY §4.2): the ONLY order-sensitive
  * reduction — the sum over vocabulary terms — runs in DECIMAL over
  * per-term values rounded to 12 decimals (the LangModel
  * discipline); counts and totals are exact longs, so every double
  * op has deterministic operands.
  *
  * Shape: two map-side-partialed count aggregations, one full-outer
  * join on the token (vocabulary-sized), one decimal sum. Totals are
  * driver scalars of the count tables, never corpus rescans. */
object Drift {

  /** One row: (n_tokens_old, n_tokens_new, vocab, kl_nats). */
  def unigramKl(oldGen: DataFrame, newGen: DataFrame, text: Column): DataFrame = {
    def counts(df: DataFrame): DataFrame =
      df.select(explode(graft.plans.TextExpressions.wordNgrams(lower(text), 1)).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // vocab-sized; totals + join share one scan
    def total(df: DataFrame): Long = {
      val r = df.agg(sum(col("c"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val co = counts(oldGen)
    val cn = counts(newGen)
    val nOld = total(co)
    val nNew = total(cn)
    val joined = cn.withColumnRenamed("c", "c_new")
      .join(co.withColumnRenamed("c", "c_old"), Seq("w"), "full_outer")
    val v = joined.count()
    val spark = oldGen.sparkSession
    if (v == 0L) {
      import spark.implicits._
      return Seq((0L, 0L, 0L, 0.0)).toDF("n_tokens_old", "n_tokens_new", "vocab", "kl_nats")
    }
    val p = (coalesce(col("c_new"), lit(0L)).cast("double") + 0.5) / (nNew + 0.5 * v)
    val q = (coalesce(col("c_old"), lit(0L)).cast("double") + 0.5) / (nOld + 0.5 * v)
    joined
      .select(round(p * log(p / q), 12).cast("decimal(28,12)").as("term"))
      .agg(sum(col("term")).as("kl"))
      .select(lit(nOld).as("n_tokens_old"), lit(nNew).as("n_tokens_new"),
        lit(v).as("vocab"), round(col("kl").cast("double"), 6).as("kl_nats"))
  }
}
