package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (SURVEY B5): assign session ids per key
  * where consecutive events more than `gapSeconds` apart start a new
  * session. One shuffle on the key; the per-key sort rides the same
  * exchange (no global sort).
  *
  * Resolution contract: the gap compares SECOND-FLOORED timestamps
  * (`unix_timestamp`), the portable form every SQL oracle agrees on.
  * The streaming twin (`EventStream.sessions`, D2) compares exact
  * microseconds — events whose spacing straddles the gap only at
  * sub-second precision can sessionize differently across the twins.
  */
object Sessionize {

  /** Adds `session_id` (1-based per key). `tieBreak` makes the
    * per-key order total so results are deterministic. */
  def byGap(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
            gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(key).orderBy(ts.asc, tieBreak.asc)
    val prev = lag(ts, 1).over(order)
    val newSession = when(prev.isNull ||
      unix_timestamp(ts) - unix_timestamp(prev) > gapSeconds, 1).otherwise(0)
    df.withColumn("__new", newSession)
      .withColumn("session_id",
        sum(col("__new")).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Session summary: bounds + size per (key, session). */
  def summarize(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
                gapSeconds: Long): DataFrame =
    byGap(df, key, ts, tieBreak, gapSeconds)
      .groupBy(key.as("key"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(ts).as("session_start"), max(ts).as("session_end"))
}
