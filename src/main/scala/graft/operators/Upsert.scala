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

  /** The aside-copy a swap parks the current data in. DOT-PREFIXED so
    * it can never collide with a real hive partition directory
    * (those are always `col=value`) and stays invisible to Spark's
    * file discovery (names starting with '.' or '_' are hidden). */
  private def asidePath(target: Path): Path =
    new Path(target.getParent, "." + target.getName + "__graft_old")

  /** Swap `staging` into `target` keeping a recoverable copy at every
    * instant: target → hidden aside, staging → target, delete aside.
    * A crash mid-swap leaves either the original or the aside copy on
    * disk; `recoverSwap` (run first) restores an interrupted swap.
    * Every rename RESULT is checked — Hadoop filesystems report most
    * failures by returning false, and an unchecked false here would
    * silently skip the merge (or nest staging inside a still-present
    * target on rename-into-directory filesystems). */
  private def safeSwap(fs: org.apache.hadoop.fs.FileSystem,
                       staging: Path, target: Path): Unit = {
    val old = asidePath(target)
    recoverSwap(fs, target)
    if (fs.exists(target))
      require(fs.rename(target, old), s"rename $target -> $old failed")
    require(fs.rename(staging, target), s"rename $staging -> $target failed")
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Heal a previous crash: the aside copy present with the target
    * missing means the swap died between renames — restore it; aside
    * present beside a target means only the final delete was lost —
    * finish it. */
  private def recoverSwap(fs: org.apache.hadoop.fs.FileSystem, target: Path): Unit = {
    val old = asidePath(target)
    if (fs.exists(old)) {
      if (!fs.exists(target))
        require(fs.rename(old, target), s"recovery rename $old -> $target failed")
      else fs.delete(old, true)
    }
  }

  /** Heal an interrupted `mergeWrite` swap at `path` (table dir
    * missing, hidden aside copy present). Call BEFORE reading a table
    * a crashed writer may have left mid-swap — the writer itself
    * can't do it for you, because the caller reads `existing` from
    * the same path first. `mergeWritePartitioned` heals its affected
    * partitions automatically. */
  def heal(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val target = new Path(path)
    recoverSwap(target.getFileSystem(spark.sparkContext.hadoopConfiguration), target)
  }

  /** Idempotent batch merge writer (db_loader.py:117 batched upsert):
    * merges and rewrites the target path; re-running the same batch
    * is a no-op by construction. The merge lands in a sibling staging
    * directory first (Spark refuses — or corrupts — a direct
    * overwrite of an input path), then swaps in via `safeSwap`, so a
    * crash at any instant leaves a recoverable copy — run `heal`
    * before reading `existing` when recovering from a crashed run
    * (the swap window leaves only the hidden aside copy on disk).
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
    * is the only thing collected to the driver.
    *
    * The existing side is selected by DIRECTORY IDENTITY — the
    * affected partitions' hive-escaped paths are read explicitly,
    * with partition-type inference disabled and the partition column
    * cast back to the incoming type. A value-level filter would be
    * wrong twice over: Spark's partition inference can round-trip a
    * string value into a different literal ("007" reads back as int
    * 7), silently matching nothing and REPLACING the partition with
    * just the batch; and stray directories would pollute discovery.
    * Untouched partition directories are never opened, rewritten, or
    * renamed.
    *
    * Each affected partition directory is swapped via `safeSwap`
    * (rename aside → rename in → delete), so a crash at any instant
    * leaves a recoverable copy and interrupted swaps self-heal on the
    * next run (aside copies are dot-prefixed — they can never be
    * mistaken for, or collide with, a real partition directory). The
    * rename pair is not one atomic operation: a reader racing the
    * swap can briefly miss one partition — serialize writers against
    * readers where that window matters, or use `sources.Versioned`
    * (E13), whose marker-committed snapshots have no such window. */
  def mergeWritePartitioned(incoming: DataFrame, keys: Seq[String], version: Seq[Column],
                            path: String, partCol: String): Unit = {
    val spark = incoming.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val rawParts = incoming.select(col(partCol).cast("string")).distinct()
      .collect().map(r => Option(r.getString(0))).toSeq
    require(!rawParts.exists(p => p.isEmpty || p.contains("")),
      s"mergeWritePartitioned: null or empty $partCol values in the incoming batch " +
        "(both land in __HIVE_DEFAULT_PARTITION__ — no stable directory identity to swap)")
    // directory names must match what Spark actually writes — values
    // with ':', '=', '%', … are hive-escaped (e.g. '00%3A00%3A00')
    val parts = rawParts.flatten.sorted.map(p =>
      p -> org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(p))
    parts.foreach { case (_, esc) => recoverSwap(fs, new Path(root, s"$partCol=$esc")) }
    val affectedDirs = parts
      .map { case (_, esc) => new Path(root, s"$partCol=$esc") }
      .filter(fs.exists).map(_.toString)
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val inferPrev = spark.conf.get(inferKey)
    val existing =
      if (affectedDirs.isEmpty) incoming.limit(0)
      else try {
        spark.conf.set(inferKey, "false") // dir value verbatim, not re-typed
        spark.read.option("basePath", path).parquet(affectedDirs: _*)
          .withColumn(partCol, col(partCol).cast(incoming.schema(partCol).dataType))
      } finally spark.conf.set(inferKey, inferPrev)
    val staging = path + "__staging"
    merge(existing, incoming, keys, version)
      .write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(staging)
    for ((raw, escaped) <- parts) {
      val s = new Path(staging, s"$partCol=$escaped")
      require(fs.exists(s),
        s"staging partition for $partCol=$raw missing at $s — dir-name mismatch would lose the batch")
      safeSwap(fs, s, new Path(root, s"$partCol=$escaped"))
    }
    fs.delete(new Path(staging), true)
  }
}
