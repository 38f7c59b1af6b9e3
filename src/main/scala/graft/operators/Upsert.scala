package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}

/** Keyed upsert — the reference's `INSERT … ON CONFLICT DO UPDATE`
  * (pasta-pipeline `dags/processors/db_loader.py:166-181`) re-expressed
  * for an immutable lake: union existing + incoming, keep the newest
  * version per key. One shuffle on the key; at scale, bucketed tables
  * on the key make this shuffle-free on the existing side.
  */
object Upsert {

  /** Merge `incoming` into `existing`: newest row per key wins.
    * `version` columns break ties (end with a unique column). */
  def merge(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
            version: Seq[Column]): DataFrame =
    Dedup.keepLatest(existing.unionByName(incoming), keys, version)

  /** Idempotent batch merge writer (db_loader.py:117 batched upsert):
    * merges and rewrites the target path; re-running the same batch
    * is a no-op by construction. Safe when `existing` READS the same
    * path being written: the merge lands in a sibling temp directory
    * first, then swaps in — Spark refuses (or corrupts) a direct
    * overwrite of an input path. */
  def mergeWrite(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
                 version: Seq[Column], path: String): Unit = {
    val spark = existing.sparkSession
    val tmp = path + "__staging"
    merge(existing, incoming, keys, version)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(conf)
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), target)
  }
}
