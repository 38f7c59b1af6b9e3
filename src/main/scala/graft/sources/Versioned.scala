package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import graft.operators.Upsert

/** Reader-race-safe versioned table (SURVEY E13).
  *
  * The in-place merge writers (`Upsert.mergeWrite*`) are crash-safe
  * but not READER-safe: their rename pair is two FS operations, so a
  * reader racing the swap can briefly see a missing directory
  * (documented at Upsert.scala). This layout closes that window the
  * way modern table formats do — every write publishes a NEW immutable
  * snapshot directory and readers resolve the newest COMMITTED one:
  *
  *   path/v00041/part-*.parquet  + _graft_committed   ← current
  *   path/v00042/part-*.parquet                       ← in-flight
  *                                                      (invisible)
  *
  * Protocol: data files land first; the empty marker file is CREATED
  * (a single atomic FS op) last. "Newest directory containing the
  * marker" is therefore always a complete snapshot, and NOTHING on the
  * publish path is ever renamed or deleted — there is no intermediate
  * state in which a reader can fail or see partial data, on any
  * Hadoop filesystem (a pointer-file design would need atomic
  * overwrite-rename, which `AbstractFileSystem.renameInternal`
  * implements as delete-then-rename — a visible hole).
  *
  * GC after publish keeps the `keep` newest older committed snapshots
  * alive for in-flight readers (size `keep` to reader latency ×
  * write cadence, exactly like Iceberg's expire-snapshots contract)
  * and removes uncommitted dirs from crashed writers — those can
  * never commit under the single-writer contract the merge writers
  * already carry. Readers need no coordination at all.
  */
object Versioned {

  /** Underscore-prefixed: invisible to Spark's file discovery. */
  private val Marker = "_graft_committed"

  private def fsOf(spark: SparkSession, root: Path): FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dirName(v: Long): String = f"v$v%05d"

  private def versionOf(name: String): Option[Long] =
    if (name.length >= 6 && name.head == 'v' && name.tail.forall(_.isDigit))
      Some(name.tail.toLong)
    else None

  /** (version, dir, committed) ascending by version. */
  private def listVersions(fs: FileSystem, root: Path): Seq[(Long, Path, Boolean)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .flatMap(st => versionOf(st.getPath.getName).map(v =>
        (v, st.getPath, fs.exists(new Path(st.getPath, Marker)))))
      .sortBy(_._1)

  /** Newest committed (version, directory), if the table exists. */
  def currentSnapshot(spark: SparkSession, path: String): Option[(Long, String)] = {
    val root = new Path(path)
    listVersions(fsOf(spark, root), root)
      .filter(_._3).lastOption.map { case (v, p, _) => (v, p.toString) }
  }

  /** The current snapshot as a DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val (_, dir) = currentSnapshot(spark, path).getOrElse(
      sys.error(s"Versioned.read: no committed snapshot under $path"))
    spark.read.parquet(dir)
  }

  /** Publish `df` as the next snapshot; returns its version. */
  def write(df: DataFrame, path: String, keep: Int = 1): Long =
    write(df, path, keep, () => ())

  /** Test seam: `beforeCommit` runs between the data write and the
    * marker create — specs inject the concurrent-GC race there. */
  private[graft] def write(df: DataFrame, path: String, keep: Int,
                           beforeCommit: () => Unit): Long = {
    require(keep >= 1,
      "Versioned.write: keep >= 1 — the previous snapshot must outlive in-flight readers")
    val spark = df.sparkSession
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val seen = listVersions(fs, root)
    // max over ALL dirs (committed or not): a crashed writer's dir is
    // never reused, so a half-written leftover can't be resurrected
    val next = seen.lastOption.map(_._1 + 1).getOrElse(1L)
    val dir = new Path(root, dirName(next))
    df.write.mode(SaveMode.Overwrite).parquet(dir.toString)
    beforeCommit()
    // Commit guard: if the single-writer contract is violated, a
    // CONCURRENT writer's GC (below) may have deleted this in-flight
    // dir between the data write and the marker create. Blindly
    // creating the marker would then re-create the directory holding
    // ONLY the marker — publishing an empty snapshot that reads as
    // success. The committer's _SUCCESS witnesses the data files are
    // still in place; its absence turns the contract violation into
    // an error instead of silent data loss.
    require(fs.exists(new Path(dir, "_SUCCESS")),
      s"Versioned.write: $dir lost its _SUCCESS between data write and commit — " +
        "is a concurrent writer violating the single-writer contract?")
    fs.create(new Path(dir, Marker), false).close() // the atomic publish
    val retain = seen.filter(_._3).map(_._1).sorted.reverse.take(keep).toSet + next
    seen.foreach { case (v, p, _) => if (!retain.contains(v)) fs.delete(p, true) }
    next
  }

  /** Merge `incoming` into the current snapshot (newest row per key
    * wins — same idempotent semantics as `Upsert.mergeWrite`, same
    * O(table) batch cost) and publish the result as a new snapshot.
    * Returns the published version. */
  def mergeWrite(incoming: DataFrame, keys: Seq[String], version: Seq[Column],
                 path: String, keep: Int = 1): Long = {
    val spark = incoming.sparkSession
    val existing = currentSnapshot(spark, path) match {
      case Some((_, dir)) => spark.read.parquet(dir)
      case None           => incoming.limit(0)
    }
    write(Upsert.merge(existing, incoming, keys, version), path, keep)
  }

  /** Small-file compaction (SURVEY E15): rewrite the current snapshot
    * into ≈ totalBytes / `targetBytes` files and publish the result
    * as a NEW snapshot — continuous ingestion (the D6/D9 sinks, any
    * micro-batched merge) accretes files far smaller than an
    * efficient scan unit, and at 100 TB the resulting per-file task
    * overhead and lost row-group stats dominate read cost long before
    * the data itself does. Publishing through `write` means readers
    * are never disturbed: in-flight readers keep the old snapshot
    * (GC honors `keep`), new readers resolve the compacted one.
    *
    * Default rewrite is `coalesce` — a NARROW dependency, each output
    * task concatenates a run of input files with no shuffle at all
    * (file-size skew between output tasks is the accepted cost; a
    * compaction that shuffles the whole table to balance files pays
    * more than it saves). With `sortCols` the rewrite instead
    * range-repartitions and sorts — one shuffle, buying back
    * clustered min/max row-group stats on those columns (the E12
    * z-order sink is the multi-column version of the same decision).
    *
    * No-ops (returns the CURRENT version, writes nothing) when the
    * snapshot already has ≤ the target file count — so it is safe to
    * run on a schedule, idempotent between ingests.
    * Returns (version, filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L << 20,
              sortCols: Seq[String] = Nil, keep: Int = 1): (Long, Int, Int) = {
    require(targetBytes > 0, s"Versioned.compact: targetBytes must be > 0, got $targetBytes")
    val (cur, dir) = currentSnapshot(spark, path).getOrElse(
      sys.error(s"Versioned.compact: no committed snapshot under $path"))
    val fs = fsOf(spark, new Path(path))
    val dataFiles = fs.listStatus(new Path(dir)).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_")
        && !st.getPath.getName.startsWith("."))
    val totalBytes = dataFiles.map(_.getLen).sum
    val target = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (dataFiles.size <= target) return (cur, dataFiles.size, dataFiles.size)
    val df = spark.read.parquet(dir)
    val rewritten =
      if (sortCols.isEmpty) df.coalesce(target)
      else df.repartitionByRange(target, sortCols.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
    (write(rewritten, path, keep), dataFiles.size, target)
  }
}
