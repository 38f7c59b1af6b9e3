package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splits (SURVEY C17).
  *
  * Training-data pipelines need samples and train/val splits that are
  * (1) reproducible run-to-run, (2) stable under repartitioning and
  * re-scans, and (3) consistent across engines — `rand()` gives none
  * of these. Here membership is a pure function of the row's key:
  * `md5(key) < threshold`, where the threshold is the fraction mapped
  * onto the 128-bit hex space and compared LEXICOGRAPHICALLY (hex
  * strings of equal length order exactly like the numbers they
  * encode, so any engine with md5 and string compare agrees
  * bit-for-bit — SURVEY §4.1).
  *
  * Scale: pure map-side filters/projections — no shuffle, no state,
  * pushable on top of any scan.
  */
object Sampling {

  /** 32-hex-digit threshold h such that P(md5 hex < h) = fraction. */
  private[operators] def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    val space = BigDecimal(BigInt(1) << 128)
    val t = (space * BigDecimal(fraction)).toBigInt
    if (t >= (BigInt(1) << 128)) "g" // > any hex digit → keep all
    else {
      val hex = t.toString(16)
      ("0" * (32 - hex.length)) + hex
    }
  }

  /** Deterministic Bernoulli sample: keeps each row iff
    * md5(key) falls below the fraction threshold. */
  def bernoulli(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(md5(key.cast("string")) < lit(thresholdHex(fraction)))

  /** Adds a 'split' column: "val" for ~valFraction of rows, "train"
    * for the rest — the standard reproducible holdout. A row's split
    * never changes unless its key does. */
  def trainValSplit(df: DataFrame, key: Column, valFraction: Double): DataFrame =
    df.withColumn("split",
      when(md5(key.cast("string")) < lit(thresholdHex(valFraction)), "val")
        .otherwise("train"))

  /** Stratified Bernoulli: per-stratum fractions (strata absent from
    * the map are dropped). Still map-side only. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
                 fractions: Map[String, Double]): DataFrame = {
    val keep = fractions.foldLeft(lit(false)) { case (acc, (s, f)) =>
      acc || (stratum === s && md5(key.cast("string")) < lit(thresholdHex(f)))
    }
    df.filter(keep)
  }
}
