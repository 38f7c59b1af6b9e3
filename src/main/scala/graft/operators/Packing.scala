package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing (SURVEY C30): assign documents to
  * fixed-budget training shards in a deterministic key order —
  * shard(doc) = ⌊(exclusive prefix sum of weights in id order) /
  * budget⌋. The last step before a corpus ships: writers want
  * shards of ~equal token mass, reproducibly.
  *
  * The naive form is a GLOBAL-ORDER window cumsum — a single
  * partition holding the corpus. Here it is the classic two-phase
  * distributed prefix sum instead:
  *   1. range-repartition by the key, so partition p holds a
  *      contiguous key range;
  *   2. per-partition totals → driver (one row per PARTITION —
  *      model-sized) → exclusive partition offsets;
  *   3. within-partition cumsum via a window PARTITIONED by the
  *      partition id (32 parallel windows, never one global one) +
  *      the broadcast offset.
  * Every row's prefix is exact regardless of where the range
  * boundaries fall, so the output is identical to the global-window
  * form (which is the DuckDB oracle).
  */
object Packing {

  /** (id, weight, shard): shard = ⌊exclusive-prefix(weight) /
    * budget⌋ in ascending id order. Weights must be non-negative;
    * a single weight larger than `budget` gets its own shard(s). */
  def packByBudget(docs: DataFrame, id: Column, weight: Column,
                   budget: Long): DataFrame = {
    require(budget > 0, "budget > 0")
    val spark = docs.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // materialized ONCE: the totals pass and the prefix pass must see
    // the SAME range boundaries (RangePartitioner samples its bounds,
    // and pid-keyed offsets are only valid under the bounds they were
    // computed from). Storage is (id, w, pid) rows — narrow — and
    // localCheckpoint spills to disk; at extreme scale substitute a
    // persisted table of the same projection.
    val ranged = docs.select(id.as("id"), weight.cast("long").as("w"))
      .repartitionByRange(nPart, col("id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    // partition totals: one row per partition reaches the driver
    val totals = ranged.groupBy(col("pid")).agg(sum(col("w")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, p) => acc + totals(p))).toMap
    val offCol = pids.foldLeft(lit(0L)) { (acc, p) =>
      when(col("pid") === p, offsets(p)).otherwise(acc)
    }
    val w = Window.partitionBy(col("pid")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("prefix", offCol + sum(col("w")).over(w) - col("w"))
      .select(col("id"), col("w").as("weight"),
        floor(col("prefix") / budget).cast("long").as("shard"))
  }
}
