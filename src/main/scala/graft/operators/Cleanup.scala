package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cleanup/maintenance operators (SURVEY A10-A13).
  *
  * Re-expresses the reference's weekly-cleanup SQL
  * (pasta-pipeline `dags/processors/duplicate_remover.py:112-311`) as
  * declarative Spark. DELETE/UPDATE-in-place becomes "produce the
  * cleaned table" — the natural shape for an immutable data lake,
  * where the sink swaps partitions atomically.
  */
object Cleanup {

  /** Null out references that don't exist in the target table
    * (duplicate_remover.py:122 orphan cleanup). Implemented as a
    * LEFT join against the DISTINCT target keys; Spark broadcasts the
    * key set when small, else shuffles both sides once. */
  def nullifyOrphans(df: DataFrame, refCol: String, target: DataFrame, targetKey: String): DataFrame = {
    val keys = target.select(col(targetKey).as("__k")).distinct()
    df.join(keys, col(refCol) === col("__k"), "left")
      .withColumn(refCol, when(col("__k").isNull, lit(null)).otherwise(col(refCol)))
      .drop("__k")
  }

  /** Purge failed rows past the retry limit and stale
    * (duplicate_remover.py:160): returns the SURVIVING rows.
    * Pure filter — pushed to the parquet scan. */
  def purgeFailed(df: DataFrame, status: Column, failedStatuses: Seq[String],
                  retries: Column, maxRetries: Int, checked: Column, cutoff: String): DataFrame =
    df.filter(!(status.isInCollection(failedStatuses) &&
      retries >= maxRetries && checked < lit(cutoff)))

  /** Retention purge (duplicate_remover.py:199): keep rows newer than
    * the cutoff (a timestamp string, or a raw long for nanos-typed
    * time columns — see Tables.loadEventsRaw). Pure filter — pushed
    * down, prunes partitions when the table is date-partitioned. */
  def retention(df: DataFrame, ts: Column, cutoff: Any): DataFrame =
    df.filter(ts >= lit(cutoff))

  /** Statistics dashboard (duplicate_remover.py:246-283): total /
    * distinct / conditional counts in one pass per table, plus the
    * orphaned-link counter (duplicate_remover.py:274-278 — messages
    * whose link has no content row) as an anti-join count against the
    * distinct content keys. Three single-row aggregates cross-joined;
    * the anti-join broadcasts the key set when small. */
  def stats(messages: DataFrame, msgKey: Column, msgRef: Column,
            content: DataFrame, contentHash: Column, contentStatus: Column,
            msgLink: Column, contentKey: Column): DataFrame = {
    val m = messages.agg(
      count(lit(1)).as("total_messages"),
      countDistinct(msgKey).as("unique_messages"),
      count(msgRef).as("messages_with_links"))
    val c = content.agg(
      count(lit(1)).as("total_content"),
      countDistinct(contentHash).as("unique_content"),
      count(when(contentStatus === "success", 1)).as("successful_content"),
      count(when(contentStatus =!= "success", 1)).as("failed_content"))
    val o = messages.select(msgLink.as("__l")).filter(col("__l").isNotNull)
      .join(content.select(contentKey.as("__k")).distinct(),
        col("__l") === col("__k"), "left_anti")
      .agg(count(lit(1)).as("orphaned_links"))
    m.crossJoin(c).crossJoin(o)
  }
}
