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

  /** Stored-domain modes (see Tables.loadEventsRaw): cutoff instants
    * are computed DRIVER-side and compared as literals in the time
    * column's STORED type — long nanos for legacy TIMESTAMP(NANOS)
    * files, timestamp[_ntz] for current ones — so the predicate
    * reaches the parquet scan as a pushed filter and prunes row
    * groups either way. Backs the A14 query. */
  def applyStored(df: DataFrame, colName: String, mode: String,
                  now: String, lookbackDays: Int): DataFrame = {
    import org.apache.spark.sql.types.LongType
    if (df.schema(colName).dataType == LongType)
      return applyRaw(df, col(colName), mode, graft.Tables.tsNanos(now), lookbackDays)
    val t = java.time.LocalDateTime.parse(now.replace(' ', 'T'))
    def fmt(dt: java.time.LocalDateTime): String =
      dt.toString.replace('T', ' ')
    def cut(dt: java.time.LocalDateTime): Column =
      graft.Tables.storedTsLit(df, colName, fmt(dt))
    mode match {
      case "incremental" => df.filter(col(colName) >= cut(t.minusDays(lookbackDays)))
      case "refresh_old" => df.filter(col(colName) < cut(t.minusDays(lookbackDays)))
      case "daily" =>
        val d0 = t.toLocalDate.atStartOfDay
        df.filter(col(colName) >= cut(d0) && col(colName) < cut(d0.plusDays(1)))
      case "full"  => df
      case other   => throw new IllegalArgumentException(s"unknown mode: $other")
    }
  }

  /** Raw-nanos-domain modes (the legacy TIMESTAMP(NANOS)-as-long
    * special case of applyStored). */
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
