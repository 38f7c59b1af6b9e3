package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join (SURVEY B12): for every left row, the
  * single newest right row with the same key and rightTs ≤ leftTs —
  * the quote-for-trade / price-for-event lookup every time-series
  * pipeline needs.
  *
  * NOT implemented as a range join: the naive
  * `l JOIN r ON key AND r.ts <= l.ts` explodes to every
  * (row, earlier-row) pair before a per-row argmax. Instead both
  * sides are UNION-TAGGED and a single per-key window carries the
  * latest right payload forward (`last(..., ignoreNulls)` over rows
  * unbounded-preceding→current): ONE shuffle on the key, per-key
  * sort rides the exchange, zero pair blow-up — the same cost shape
  * as sessionization, at any scale.
  *
  * Ordering contract: right rows must be unique per (key, rightTs)
  * (dedupe upstream with `Dedup.keepLatest`); at equal timestamps
  * the right row sorts BEFORE the left row, so a same-instant quote
  * matches (inclusive ≤, the standard as-of convention).
  */
object AsOf {

  /** Left rows + `payload` columns of the matched right row (null
    * when no right row precedes). `toleranceSeconds` drops matches
    * older than leftTs − tolerance. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String],
           toleranceSeconds: Option[Long] = None): DataFrame = {
    val keyCols = keys.map(col)
    val lTagged = left.select(
      keyCols :+ col(leftTs).cast("timestamp").as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(s"struct<${payload.map(p => s"$p:" + right.schema(p).dataType.sql).mkString(",")},__rts:timestamp>").as("__r") :+
        struct(left.columns.toIndexedSeq.map(col): _*).as("__l"): _*)
    val rTagged = right.select(
      keyCols :+ col(rightTs).cast("timestamp").as("__ts") :+ lit(0).as("__side") :+
        struct(payload.map(col) :+ col(rightTs).cast("timestamp").as("__rts"): _*).as("__r") :+
        lit(null).cast(lTagged.schema("__l").dataType.sql).as("__l"): _*)
    val w = Window.partitionBy(keyCols: _*).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("__r"), ignoreNulls = true).over(w)
    val matched = toleranceSeconds.fold(matchedRaw)(tol =>
      when(matchedRaw("__rts") >= col("__ts") - expr(s"INTERVAL $tol SECONDS"), matchedRaw))
    lTagged.unionByName(rTagged)
      .withColumn("__m", matched)
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(c => col(s"__l.$c").as(c)) ++
        payload.map(p => col(s"__m.$p").as(p)): _*)
  }
}
