package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Processing modes (SURVEY A14) — the reference's DAG params
  * (pasta-pipeline `dags/pipelines/dag.py:52-61,137-148`,
  * `message_scraper.py:85-108`): `incremental` looks back N days from
  * a reference instant, `refresh_old` takes rows older than N days,
  * `daily` the reference day, `full` everything. Pure pushed-down
  * filters → partition pruning on date-partitioned lakes.
  */
object ModeFilter {
  def apply(df: DataFrame, ts: Column, mode: String, now: String, lookbackDays: Int): DataFrame =
    mode match {
      case "incremental" =>
        df.filter(ts >= lit(now).cast("timestamp") - expr(s"INTERVAL $lookbackDays DAYS"))
      case "refresh_old" =>
        df.filter(ts < lit(now).cast("timestamp") - expr(s"INTERVAL $lookbackDays DAYS"))
      case "daily"       => df.filter(to_date(ts) === to_date(lit(now)))
      case "full"        => df
      case other         => throw new IllegalArgumentException(s"unknown mode: $other")
    }

  private val DayNanos = 86400L * 1000000000L

  /** Raw-nanos-domain modes (for tables whose time column is a
    * parquet nanos long, see Tables.loadEventsRaw): the comparison
    * stays on the STORED column, so it reaches the parquet scan as a
    * pushed filter and prunes row groups — a filter on the converted
    * timestamp never does. Backs the A14 query. */
  def applyRaw(df: DataFrame, tsNanos: Column, mode: String,
               nowNanos: Long, lookbackDays: Int): DataFrame = {
    val lookback = lookbackDays * DayNanos
    mode match {
      case "incremental" => df.filter(tsNanos >= nowNanos - lookback)
      case "refresh_old" => df.filter(tsNanos < nowNanos - lookback)
      case "daily" =>
        val dayStart = Math.floorDiv(nowNanos, DayNanos) * DayNanos
        df.filter(tsNanos >= dayStart && tsNanos < dayStart + DayNanos)
      case "full"  => df
      case other   => throw new IllegalArgumentException(s"unknown mode: $other")
    }
  }
}
