package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

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

  /** Swap `staging` into `target` keeping a recoverable copy at every
    * instant: target → target__old, staging → target, delete old. A
    * crash mid-swap leaves either the original or the `__old` copy on
    * disk; `recoverSwap` (run first) restores an interrupted swap. */
  private def safeSwap(fs: org.apache.hadoop.fs.FileSystem,
                       staging: Path, target: Path): Unit = {
    val old = new Path(target.getParent, target.getName + "__old")
    recoverSwap(fs, target)
    if (fs.exists(target)) fs.rename(target, old)
    fs.rename(staging, target)
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Heal a previous crash: `__old` present with the target missing
    * means the swap died between renames — restore the old copy;
    * `__old` present beside a target means only the final delete was
    * lost — finish it. */
  private def recoverSwap(fs: org.apache.hadoop.fs.FileSystem, target: Path): Unit = {
    val old = new Path(target.getParent, target.getName + "__old")
    if (fs.exists(old)) {
      if (!fs.exists(target)) fs.rename(old, target)
      else fs.delete(old, true)
    }
  }

  /** Idempotent batch merge writer (db_loader.py:117 batched upsert):
    * merges and rewrites the target path; re-running the same batch
    * is a no-op by construction. The merge lands in a sibling staging
    * directory first (Spark refuses — or corrupts — a direct
    * overwrite of an input path), then swaps in via `safeSwap`, so a
    * reader/crash at any instant still finds a complete copy.
    *
    * O(table) per batch — fine for small tables; for partitioned
    * lakes use `mergeWritePartitioned`, which is O(affected
    * partitions). */
  def mergeWrite(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
                 version: Seq[Column], path: String): Unit = {
    val spark = existing.sparkSession
    val tmp = path + "__staging"
    merge(existing, incoming, keys, version)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    safeSwap(fs, new Path(tmp), target)
  }

  /** PARTITION-SCOPED merge into a hive-partitioned parquet table
    * (the `Sink.writeByDate` layout): only partitions that the
    * incoming batch touches are read, merged, and atomically swapped
    * — O(batch), not O(table), matching the reference's per-batch
    * `ON CONFLICT` cost profile (db_loader.py:117-181).
    *
    * Contract: `partCol` must be STABLE PER KEY (the standard
    * date-of-event layout) — a key's row never moves between
    * partitions, so the partitions holding old versions of incoming
    * keys are exactly the incoming rows' own partition values. The
    * affected-partition list (one string per partition — model-sized)
    * is the only thing collected to the driver; the existing-side
    * read is partition-pruned to those directories, and untouched
    * partition directories are never opened, rewritten, or renamed.
    *
    * Each affected partition directory is swapped via `safeSwap`
    * (rename aside → rename in → delete), so a crash at any instant
    * leaves a recoverable copy and interrupted swaps self-heal on the
    * next run. The rename pair is not one atomic operation: a reader
    * racing the swap can briefly miss one partition — serialize
    * writers against readers (or use a MERGE-capable table format)
    * where that window matters. */
  def mergeWritePartitioned(incoming: DataFrame, keys: Seq[String], version: Seq[Column],
                            path: String, partCol: String): Unit = {
    val spark = incoming.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val parts = incoming.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    // heal EVERY interrupted swap first — a stray `dt=X__old` dir
    // would otherwise be discovered as partition value "X__old"
    if (fs.exists(root))
      fs.listStatus(root).filter(_.getPath.getName.endsWith("__old"))
        .foreach(st => recoverSwap(fs,
          new Path(root, st.getPath.getName.stripSuffix("__old"))))
    val existing =
      if (fs.exists(root) && !fs.listStatus(root).isEmpty)
        spark.read.parquet(path)
          .filter(col(partCol).cast("string").isin(parts: _*))
      else incoming.limit(0)
    val staging = path + "__staging"
    merge(existing, incoming, keys, version)
      .write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(staging)
    for (p <- parts) {
      val s = new Path(staging, s"$partCol=$p")
      if (fs.exists(s)) safeSwap(fs, s, new Path(root, s"$partCol=$p"))
    }
    fs.delete(new Path(staging), true)
  }
}
