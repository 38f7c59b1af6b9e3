package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed snapshot diff (SURVEY A18) — CDC between two versions of an
  * upserted table: which keys were added, removed, or changed. The
  * audit/debug companion to the merge writers (A4/A16/E8): the
  * reference re-scrapes and upserts (db_loader.py:117-181); "what
  * did yesterday's run actually change" is this diff.
  *
  * One full-outer join on the key, comparing an md5 over the tracked
  * columns (computed MAP-SIDE on each input, so the join carries one
  * hash instead of the row payload). Scale: a single key shuffle per
  * side — and zero exchanges when both snapshots come from tables
  * bucketed on the key (E9's layout, PlanSpec-asserted there).
  * Unchanged keys are dropped as early as the join's own output
  * (filter on the hash equality), so the result is change-sized, not
  * table-sized.
  */
object Snapshot {

  /** (keys…, change) for every key whose presence or tracked-column
    * content differs: change ∈ 'added' (new in `after`), 'removed'
    * (gone from `after`), 'changed' (hash differs). NULL-safe: a
    * null column value hashes distinctly from the string "null"
    * (md5 over a length-prefixed encoding). */
  def diff(before: DataFrame, after: DataFrame,
           keys: Seq[String], tracked: Seq[String]): DataFrame = {
    require(keys.nonEmpty && tracked.nonEmpty, "need key and tracked columns")
    // length-prefixed, null-tagged encoding → no concat ambiguity
    def fingerprint(df: DataFrame): Column = md5(concat(tracked.map { c =>
      val s = col(c).cast("string")
      when(s.isNull, lit("~"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }: _*))
    val b = before.select(keys.map(col) :+ fingerprint(before).as("__h_before"): _*)
    val a = after.select(keys.map(col) :+ fingerprint(after).as("__h_after"): _*)
    b.join(a, keys, "full_outer")
      .withColumn("change",
        when(col("__h_before").isNull, "added")
          .when(col("__h_after").isNull, "removed")
          .when(col("__h_before") =!= col("__h_after"), "changed"))
      .filter(col("change").isNotNull)
      .select(keys.map(col) :+ col("change"): _*)
  }
}
