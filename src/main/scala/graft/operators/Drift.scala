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
  * Computed in ONE aggregation over the vocabulary join by factoring
  * the smoothing denominators out of the per-term sum:
  *
  *   KL = S/(N_new+½V) + ln((N_old+½V)/(N_new+½V)),
  *   S  = Σ_w (c_new+½)·ln((c_new+½)/(c_old+½))
  *
  * (expand p·ln(p/q) and use Σ(c_new+½) = N_new+½V). S, V, N_old and
  * N_new all come out of the same pass, so the whole operator is one
  * lazy plan — no count() action, no checkpoint, no driver scalar.
  *
  * Engine portability (SURVEY §4.2): the ONLY order-sensitive
  * reduction — S — runs in DECIMAL over per-term values rounded to
  * 12 decimals (the LangModel discipline); counts and totals are
  * exact longs, so every double op has deterministic operands.
  *
  * Shape: two map-side-partialed count aggregations, one full-outer
  * join on the token (vocabulary-sized), one global aggregate. */
object Drift {

  /** One row: (n_tokens_old, n_tokens_new, vocab, kl_nats). */
  def unigramKl(oldGen: DataFrame, newGen: DataFrame, text: Column): DataFrame = {
    def counts(df: DataFrame, cName: String): DataFrame =
      df.select(explode(graft.plans.TextExpressions.wordNgrams(lower(text), 1)).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as(cName))
    val joined = counts(newGen, "c_new")
      .join(counts(oldGen, "c_old"), Seq("w"), "full_outer")
    val cn = coalesce(col("c_new"), lit(0L)).cast("double") + 0.5
    val co = coalesce(col("c_old"), lit(0L)).cast("double") + 0.5
    joined.agg(
        coalesce(sum(col("c_old")), lit(0L)).as("n_old"),
        coalesce(sum(col("c_new")), lit(0L)).as("n_new"),
        count(lit(1)).as("v"),
        sum(round(cn * log(cn / co), 12).cast("decimal(28,12)")).as("s"))
      .select(
        col("n_old").as("n_tokens_old"), col("n_new").as("n_tokens_new"),
        col("v").as("vocab"),
        when(col("v") === 0, lit(0.0)).otherwise(round(
          col("s").cast("double") / (col("n_new").cast("double") + lit(0.5) * col("v")) +
            log((col("n_old").cast("double") + lit(0.5) * col("v")) /
                (col("n_new").cast("double") + lit(0.5) * col("v"))), 6)).as("kl_nats"))
  }
}
