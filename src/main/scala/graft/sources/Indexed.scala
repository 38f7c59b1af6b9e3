package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Key-indexed parquet layout (SURVEY E16): file-level min/max
  * data skipping + a membership bloom on plain parquet — the
  * Delta/Iceberg data-skipping design re-expressed as sidecars, built
  * for POINT-LOOKUP probes of a large store by a small key set (the
  * D10/C34 signature store is the motivating user: each arriving
  * micro-batch needs the store rows matching ~10⁴ uniformly-hashed
  * keys out of ~10⁹).
  *
  * Why parquet alone can't do this: a pushed `In` predicate with a
  * SCATTERED value set never prunes natively — parquet-mr evaluates
  * `In` against row-group and page stats by comparing only the SET'S
  * min/max against the granule range (StatisticsFilter builds
  * `new MinMax(cmp, values)` and range-checks once), and a uniform
  * key set spans the whole key space, so every granule intersects.
  * Per-VALUE granule checks only happen when Spark pushes the set as
  * an OR-of-Eq chain, which it does only BELOW
  * `spark.sql.parquet.pushdown.inFilterThreshold` (and a chain deeper
  * than ~4000 overflows the visitor stack). Measured (SkipProbe,
  * 10M-row store, 32-file clustered layout, 2000-row pages): 200-key
  * probe = 392k rows scanned with OR-of-Eq vs 9.93M with native
  * `In`; an unsorted layout never skips under either form.
  *
  * The layout therefore makes the key set SMALL first, then lets
  * parquet's own per-value machinery work:
  *
  *  - `write` clusters rows by the key (range-partition + sort) into
  *    files with small pages (`parquet.page.row.count.limit`), so
  *    each key lives in ~1 file and ~1 page;
  *  - a `_graft_idx/` sidecar per directory holds a per-FILE
  *    [min,max] manifest (parquet) and a key BLOOM (Spark's
  *    mergeable `util.sketch.BloomFilter`, no false negatives);
  *  - `prunedRead` drops probe keys the bloom rules out (the step
  *    that turns 10⁴ keys into the few that can exist), selects only
  *    manifest-matching files (footers of everything else are never
  *    read), and applies the surviving keys as an `isInCollection`
  *    filter that Spark pushes as OR-of-Eq — per-value row-group and
  *    column-index page pruning inside the selected files.
  *
  * The result is bit-identical to `read-everything + filter`: the
  * bloom has no false negatives and the manifest/page pruning only
  * removes granules that cannot contain a probe key, so callers can
  * treat `prunedRead` as a pure optimization (the D10 gate's
  * store-join semantics are unchanged — IndexedSpec pins equality).
  *
  * Directory contract: a ROOT containing one or more subdirectories
  * of parquet files (the `batch=N` append layout); each dir may or
  * may not carry a sidecar — unindexed dirs are read whole, so old
  * stores keep working and the probe degrades gracefully. Sidecar
  * loads are cached by (path, sidecar mtime); the per-call cost
  * against an unchanged store is one root listing.
  *
  * Scale: the per-probe cost is O(|keys|) bloom probes + O(hit
  * files) footer reads + O(hit pages) data reads — FLAT in store
  * size. The store pays one clustering shuffle per compaction
  * (amortized; appends just sort the batch) and sidecar jobs bounded
  * by what was written. At a 10⁹-doc store the bloom sidecars total
  * ~10 bits/key; probe them on the driver (they stream in once and
  * cache) or raise `fpp` — false positives only cost extra point
  * reads, never correctness.
  */
object Indexed {

  /** Sidecar dir name — underscore-prefixed: invisible to Spark's
    * parquet file discovery. */
  private val IdxDir = "_graft_idx"
  private val IdxFile = "idx.bin"
  /** Pushdown cap: above this many surviving keys the read falls
    * back to the caller's scan plan. The filter is pushed as an OR of
    * `ChunkSize`-key In chunks over the SORTED keys — each chunk
    * translates to an OR-of-Eq chain (per-value granule pruning) of
    * bounded depth (parquet's predicate visitor recurses per value;
    * ~4000 in one chain overflows the stack), each chunk spans a
    * narrow contiguous key range (so even the chunk-level min/max
    * range check prunes), and the OR tree adds only keys/ChunkSize
    * depth on top. */
  val DefaultKeyCap = 16384
  private val ChunkSize = 512
  private val DefaultPageRows = 2000

  /** Supported key types (bloom + typed manifest need a stable
    * runtime representation). */
  private def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | StringType => true
    case _ => false
  }

  /** Clustered write of `df` into `dir` + sidecar: range-partition on
    * `keyCol` into `nFiles` files, sort within, small pages — the
    * point-lookup layout. `nFiles <= 0` keeps the input partitioning
    * and only sorts within partitions (the cheap per-batch append
    * shape: batch dirs are small, a range shuffle buys nothing). */
  def write(df: DataFrame, dir: String, keyCol: String, nFiles: Int,
            pageRows: Int = DefaultPageRows, fpp: Double = 0.01): Unit = {
    val clustered =
      if (nFiles > 0) df.repartitionByRange(nFiles, col(keyCol))
      else df
    clustered.sortWithinPartitions(col(keyCol))
      .write.mode(SaveMode.Overwrite)
      .option("parquet.page.row.count.limit", pageRows.toString)
      .parquet(dir)
    writeSidecar(df.sparkSession, dir, keyCol, fpp, pageRows)
  }

  /** BATCH write for streaming appends: one sorted file + sidecar at
    * the cost of TWO jobs total (the data write and one key collect —
    * a streaming gate pays this per micro-batch, so the distributed
    * stats/bloom jobs `writeSidecar` runs are the wrong shape here;
    * measured +3 s/arrival of pure job-scheduling at 500-doc
    * batches). The caller asserts batch-boundedness by choosing this
    * entry point. */
  def writeSmall(df: DataFrame, dir: String, keyCol: String,
                 pageRows: Int = DefaultPageRows, fpp: Double = 0.01): Unit = {
    val spark = df.sparkSession
    df.coalesce(1).sortWithinPartitions(col(keyCol))
      .write.mode(SaveMode.Overwrite)
      .option("parquet.page.row.count.limit", pageRows.toString)
      .parquet(dir)
    val dt = df.schema(keyCol).dataType
    if (!supported(dt)) return
    val keys = df.select(col(keyCol)).collect().map(_.get(0)).filter(_ != null)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(new Path(dir)).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_")
        && !st.getPath.getName.startsWith("."))
    if (keys.isEmpty || dataFiles.size != 1) {
      // empty batch (a 0-row file matches nothing) or an unexpected
      // layout: write a fileless/bloomless sidecar only when empty,
      // else leave unindexed
      if (keys.isEmpty && dataFiles.size <= 1)
        serializeSidecar(fs, dir, dt, pageRows, Seq.empty,
          BloomFilter.create(1, fpp))
      return
    }
    val bloom = BloomFilter.create(math.max(keys.length, 1).toLong, fpp)
    var lo: Any = keys(0); var hi: Any = keys(0)
    keys.foreach { k =>
      bloomPut(bloom, k)
      if (leq(k, lo)) lo = k
      if (leq(hi, k)) hi = k
    }
    serializeSidecar(fs, dir, dt, pageRows,
      Seq((dataFiles.head.getPath.getName, lo, hi, keys.length.toLong)), bloom)
  }

  /** Build + write the `_graft_idx` sidecar for an already-written
    * parquet dir: per-file [min,max] stats and a key bloom via two
    * distributed jobs (store-sized dirs — compaction's shape), then
    * one driver-serialized sidecar file. No-op (returns false) for
    * key types the sidecar can't represent — the dir is then simply
    * unindexed and reads degrade to scans. */
  def writeSidecar(spark: SparkSession, dir: String, keyCol: String,
                   fpp: Double = 0.01, pageRows: Int = DefaultPageRows): Boolean = {
    val data = spark.read.parquet(dir).select(col(keyCol))
    val dt = data.schema.head.dataType
    if (!supported(dt)) return false
    val manifest = data.groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0).split('/').last, r.get(1), r.get(2), r.getLong(3)))
    val total = manifest.map(_._4).sum
    val bloom = data.stat.bloomFilter(keyCol, math.max(total, 1L), fpp)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    serializeSidecar(fs, dir, dt, pageRows, manifest.toSeq, bloom)
    true
  }

  private def bloomPut(b: BloomFilter, key: Any): Unit = key match {
    case l: java.lang.Long => b.putLong(l)
    case i: java.lang.Integer => b.putLong(i.longValue())
    case s: String => b.putString(s)
    case other => b.put(other)
  }

  private def typeTag(dt: DataType): Int = dt match {
    case LongType => 0
    case IntegerType => 1
    case StringType => 2
    case other => throw new IllegalArgumentException(s"unsupported key type $other")
  }

  /** The whole sidecar as ONE driver-written binary file
    * `_graft_idx/idx.bin`: header (version, key type, page rows),
    * per-file [name, lo, hi, rows] stats, then the bloom. Writing it
    * costs no Spark job, and the loader parses it with one fs read —
    * the cheap shape a per-micro-batch append needs. */
  private def serializeSidecar(fs: FileSystem, dir: String, dt: DataType,
                               pageRows: Int,
                               files: Seq[(String, Any, Any, Long)],
                               bloom: BloomFilter): Unit = {
    val idx = new Path(new Path(dir, IdxDir), IdxFile)
    val out = new java.io.DataOutputStream(fs.create(idx, true))
    try {
      out.writeInt(0x47494458) // "GIDX"
      out.writeInt(1)
      out.writeInt(typeTag(dt))
      out.writeInt(pageRows)
      out.writeInt(files.size)
      def writeKey(v: Any): Unit = v match {
        case l: java.lang.Long => out.writeLong(l)
        case i: java.lang.Integer => out.writeInt(i)
        case s: String =>
          val b = s.getBytes("UTF-8")
          out.writeInt(b.length); out.write(b)
      }
      files.foreach { case (name, lo, hi, n) =>
        val nb = name.getBytes("UTF-8")
        out.writeInt(nb.length); out.write(nb)
        writeKey(lo); writeKey(hi)
        out.writeLong(n)
      }
      bloom.writeTo(out)
    } finally out.close()
  }

  /** Parse `_graft_idx/idx.bin`; None on absence or any corruption
    * (the dir is then treated as unindexed — never wrong, only
    * slower). */
  private def parseSidecar(fs: FileSystem, d: Path)
    : Option[(Array[(String, Any, Any)], BloomFilter, Long, Int)] = {
    val idx = new Path(new Path(d, IdxDir), IdxFile)
    try {
      val in = new java.io.DataInputStream(fs.open(idx))
      try {
        require(in.readInt() == 0x47494458 && in.readInt() == 1)
        val tag = in.readInt()
        val pageRows = in.readInt()
        val nFiles = in.readInt()
        def readKey(): Any = tag match {
          case 0 => java.lang.Long.valueOf(in.readLong())
          case 1 => java.lang.Integer.valueOf(in.readInt())
          case 2 =>
            val b = new Array[Byte](in.readInt()); in.readFully(b)
            new String(b, "UTF-8")
        }
        var rows = 0L
        val files = (0 until nFiles).map { _ =>
          val nb = new Array[Byte](in.readInt()); in.readFully(nb)
          val name = new String(nb, "UTF-8")
          val lo = readKey(); val hi = readKey()
          rows += in.readLong()
          (new Path(d, name).toString, lo, hi)
        }.toArray
        val bloom = BloomFilter.readFrom(in)
        Some((files, bloom, rows, pageRows))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** One directory's loaded sidecar: per-file ranges (sorted by lo)
    * and the bloom; `indexed = false` marks a dir with no usable
    * sidecar (read whole, all probe keys forced alive). */
  final case class DirIndex(dir: String, indexed: Boolean,
                            files: Array[(String, Any, Any)],
                            bloom: Option[BloomFilter], rows: Long,
                            pageRows: Int)

  /** (path, bloom-file mtime) → DirIndex. The cache never needs
    * explicit invalidation: compaction DELETES dirs (stale keys just
    * stop being requested) and rewrites land under new mtimes. */
  private val cache = TrieMap.empty[(String, Long), DirIndex]

  /** List the data subdirectories of a store root. Also accepts a
    * root that directly contains parquet files (treated as one dir). */
  private def dataDirs(fs: FileSystem, root: Path): Seq[Path] = {
    val entries = fs.listStatus(root).toSeq
      .filterNot(_.getPath.getName.startsWith("_"))
    val dirs = entries.filter(_.isDirectory)
    if (dirs.nonEmpty) dirs.map(_.getPath) else Seq(root)
  }

  /** Load (with caching) every data dir's sidecar under `root`. */
  def load(spark: SparkSession, root: String): Seq[DirIndex] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Seq.empty
    dataDirs(fs, rootPath).map { d =>
      val idxFile = new Path(new Path(d, IdxDir), IdxFile)
      val mtime =
        if (fs.exists(idxFile)) fs.getFileStatus(idxFile).getModificationTime
        else -1L
      def unindexed: DirIndex = {
        // unindexed: every parquet file, no pruning possible. A
        // NESTED layout (inner partition dirs) can't be enumerated as
        // leaf files here — mark it opaque so prunedRead bails to the
        // caller's full-scan plan instead of silently reading nothing.
        val entries = fs.listStatus(d).toSeq
          .filterNot(st => st.getPath.getName.startsWith("_")
            || st.getPath.getName.startsWith("."))
        if (entries.exists(_.isDirectory))
          DirIndex(d.toString, indexed = false, null, None, -1L, DefaultPageRows)
        else DirIndex(d.toString, indexed = false,
          entries.map(st => (st.getPath.toString, null: Any, null: Any)).toArray,
          None, -1L, DefaultPageRows)
      }
      if (mtime < 0) unindexed
      else cache.getOrElseUpdate((d.toString, mtime),
        parseSidecar(fs, d) match {
          case Some((files, bloom, rows, pr)) =>
            DirIndex(d.toString, indexed = true, files, Some(bloom), rows, pr)
          case None => unindexed // unreadable sidecar: slower, never wrong
        })
    }
  }

  private def mightContain(b: BloomFilter, key: Any): Boolean = key match {
    case l: java.lang.Long => b.mightContainLong(l)
    case i: java.lang.Integer => b.mightContainLong(i.longValue())
    case s: String => b.mightContainString(s)
    case other => b.mightContain(other)
  }

  @inline private def leq(a: Any, b: Any): Boolean = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) => x <= y
    case (x: java.lang.Integer, y: java.lang.Integer) => x <= y
    case (x: String, y: String) => x <= y
    case _ => true // unknown pairing: keep the file (never unsound)
  }

  /** The pruned probe: rows of `root` whose `keyName` ∈ `keys`,
    * reading only what the sidecars can't rule out. Returns None when
    * pruning can't beat a plain scan (too many surviving keys, or
    * nothing is indexed) — the caller falls back to its full-scan
    * plan, which is always correct. Returns Some(empty) when the
    * blooms rule every key out — the probe then costs NOTHING.
    *
    * Sets `spark.sql.parquet.pushdown.inFilterThreshold` to
    * `keyCap` on the session (once; idempotent): the surviving-key
    * filter must push as OR-of-Eq for per-value granule pruning —
    * see the object scaladoc. */
  def prunedRead(spark: SparkSession, root: String, keyName: String,
                 keys: Seq[Any], keyCap: Int = DefaultKeyCap): Option[DataFrame] = {
    val dirs = load(spark, root)
    if (dirs.isEmpty || dirs.forall(!_.indexed)) return None
    if (dirs.exists(d => !d.indexed && d.files == null)) return None // opaque dir
    def emptyOf: Option[DataFrame] =
      dirs.collectFirst { case d if d.files.nonEmpty => d.files.head._1 }
        .map(f => spark.read.parquet(f).limit(0))
    val distinctKeys = keys.distinct
    // a key is alive if ANY dir might hold it: an unindexed dir keeps
    // every key alive; an indexed dir vouches via its bloom
    val anyUnindexed = dirs.exists(!_.indexed)
    val blooms = dirs.flatMap(_.bloom)
    val alive: Seq[Any] =
      if (anyUnindexed) distinctKeys
      else distinctKeys.filter(k => blooms.exists(b => mightContain(b, k)))
    if (alive.isEmpty) {
      if (sys.env.contains("GRAFT_IDX_DEBUG"))
        println(s"prunedRead($root): keys=${distinctKeys.size} alive=0 -> empty")
      return emptyOf
    }
    // cost gate: a point probe reads ~one page per alive key per dir
    // that might hold it, so when the estimate reaches half the store
    // a plain scan is at least as cheap (and pays no per-row
    // OR-of-InSet evaluation) — decline and let the caller's scan
    // plan run. Estimated per INDEXED dir as min(alive × pageRows,
    // dirRows); unindexed flat dirs are read whole under either plan,
    // so they cancel out of the comparison.
    val est = dirs.collect {
      case d if d.indexed => math.min(alive.size.toLong * d.pageRows, d.rows)
    }.sum
    val total = dirs.filter(_.indexed).map(_.rows).sum
    if (sys.env.contains("GRAFT_IDX_DEBUG"))
      println(s"prunedRead($root): keys=${distinctKeys.size} alive=${alive.size} " +
        s"est=$est total=$total")
    if (alive.size > keyCap || est * 2 >= total) return None
    // file selection: keep a file iff some alive key ∈ [lo, hi]
    // (merge over the lo-sorted manifest); unindexed dirs keep all
    val sortedKeys = alive.sortBy(_.toString)
    val files = dirs.flatMap { d =>
      if (!d.indexed) d.files.map(_._1)
      else d.files.collect {
        case (f, lo, hi) if alive.exists(k => leq(lo, k) && leq(k, hi)) => f
      }
    }
    if (files.isEmpty) return emptyOf
    // OR-of-Eq pushdown needs the threshold ABOVE the chunk size
    if (spark.conf.get("spark.sql.parquet.pushdown.inFilterThreshold", "10").toInt
        <= ChunkSize)
      spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold",
        (2 * ChunkSize).toString)
    val pred = sortedKeys.grouped(ChunkSize)
      .map(ch => col(keyName).isInCollection(ch)).reduce(_ || _)
    Some(spark.read.parquet(files: _*).filter(pred))
  }
}
