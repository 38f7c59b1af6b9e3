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
}
