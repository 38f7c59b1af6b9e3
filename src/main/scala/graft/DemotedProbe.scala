package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Demoted-arrival recompute A/B (SURVEY §6 r17, ADVICE r16 #2).
  *
  * When `Incremental.gate` DEMOTES an oversized micro-batch to the
  * declarative plan shape, the returned signature tables stay lazy
  * and the exact-signature collapse's `dup0` subplan feeds three
  * downstream subtrees. The r16 scaladoc ACCEPTED the resulting
  * per-action pipeline re-runs as a rare-event cost; this probe took
  * the measurement the advisor asked for behind that acceptance —
  * 1.74× the per-arrival wall — which flipped the decision: `gate`
  * now `Pins.persist`s the demoted tables when a sink collector is
  * active (the `sink` arm), and this probe stands as the record and
  * the regression guard. One demoted arrival (the
  * `maxBandRows` knob forces the demotion — the plan shape is
  * identical to a naturally-oversized arrival, only the absolute
  * data size differs) consumed exactly as `nearDupGateSink` consumes
  * it (survivor localCheckpoint, then per signature table a count +
  * a parquet write — the sink's `writeSignatures` census; its
  * sidecar read-back scans the WRITTEN files, not the source plan,
  * so it adds no pipeline run and is omitted), in three interleaved
  * arms:
  *
  *   lazy    — the demoted shape with NO collector (a plain batch
  *             caller): every action re-plans.
  *   persist — the returned tables persisted MEMORY_AND_DISK
  *             probe-side before the first action and unpersisted
  *             after the last (the fix's mechanism, isolated).
  *   sink    — the SHIPPED path: the consumption wrapped in the
  *             Pins collector, so `gate` itself registers the lazy
  *             caches and the end-of-batch reap frees them (what a
  *             real demoted arrival inside `nearDupGateSink` pays).
  *
  * Per-action walls land in the record so the delta is attributable
  * (which actions stop paying the pipeline), with the bench-noise
  * playbook: all arms warmed, interleaved reps, a ~45 ms pure-CPU
  * stamp after each arm, min-of-reps headline. One JSON line to
  * stdout and SPARK_GRAFT_DEMOTEDPROBE_OUT (default
  * demotedprobe_out.json).
  */
object DemotedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // GATE_REAL=1: the REAL-BOUND variant — a distributed-generated
    // arrival big enough to trip MaxMicroBatchBandRows NATURALLY
    // (GATE_REAL_COPIES disjoint-vocabulary copies of the sf dir's
    // documents table, the ScaleGen construction — 210 × 5k = 1.05M
    // docs > the 4M-band-row bound at k/bandRows = 4), so the
    // demoted+cached path is measured at its actual trip point, not
    // just under a forced bound. Arms reduce to lazy vs sink (the
    // isolated-persist arm duplicates sink here), reps default 2,
    // and the record adds the arrival size, a demotion-actually-
    // happened check, the live cache high-water, and the block-dir
    // bytes after the reap. Run with SPARK_DRIVER_MEM>=24g.
    val real = sys.env.get("GATE_REAL").contains("1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", if (real) "2" else "5").toInt
    val batchSize = sys.env.getOrElse("GATE_BATCH", "20000").toInt
    val storeBatches = sys.env.getOrElse("GATE_STORE_BATCHES", "5").toInt
    val realCopies = sys.env.getOrElse("GATE_REAL_COPIES", "210").toInt
    val realStoreCopies = sys.env.getOrElse("GATE_REAL_STORE_COPIES", "20").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_DEMOTEDPROBE_OUT", "demotedprobe_out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def miniCalib(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 27).selectExpr("bit_xor(xxhash64(id))").collect()
      (System.nanoTime() - t0) / 1e9
    }

    // fixture: disjoint-vocabulary store + arrival, both written to
    // parquet ONCE so every rep reads identical input. Forced mode
    // builds them driver-side (the GateProfile construction); real
    // mode generates DISTRIBUTED disjoint-vocabulary copies of the
    // whole documents table (each copy's tokens prefixed with its
    // copy tag — ScaleGen's construction, so per-copy dup structure
    // is identical and no cross-copy shingle ever matches)
    val dir = java.nio.file.Files.createTempDirectory("graft-demotedprobe").toString
    if (real) {
      val docsT = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val stride = docsT.agg(max(col("doc_id"))).head().getLong(0) + 1
      def copiesOf(tag: String, n: Int, idBase: Long) =
        (0 until n).map { k =>
          docsT.select((col("doc_id") + lit(idBase + k * stride)).as("id"),
            array_join(transform(split(col("text"), " "),
              w => concat(lit(s"$tag${k}·"), w)), " ").as("text"))
        }.reduce(_ unionByName _)
      copiesOf("s", realStoreCopies, 0L)
        .write.mode("overwrite").parquet(s"$dir/storedocs")
      val sd = spark.read.parquet(s"$dir/storedocs")
      val (b, s) = operators.Incremental.signatures(sd, col("id"), col("text"))
      b.write.mode("overwrite").parquet(s"$dir/store/bands/batch=0")
      s.write.mode("overwrite").parquet(s"$dir/store/sets/batch=0")
      copiesOf("m", realCopies, 1L << 40)
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$dir/arrival")
    } else {
      val pool = Tables.load(spark, sfDir, "documents")
        .select(col("text")).as[String].collect()
      def docsDF(tag: String, k: Int) =
        (0 until batchSize).map { i =>
          val pfx = s"$tag${k}·"
          (k.toLong * batchSize + i,
            pool((k * batchSize + i) % pool.length)
              .split("\\s+").filter(_.nonEmpty).map(pfx + _).mkString(" "))
        }.toDF("id", "text")
      (0 until storeBatches).foreach { k =>
        val (b, s) = operators.Incremental.signatures(docsDF("s", k), col("id"), col("text"))
        b.write.mode("overwrite").parquet(s"$dir/store/bands/batch=$k")
        s.write.mode("overwrite").parquet(s"$dir/store/sets/batch=$k")
      }
      docsDF("m", storeBatches).write.mode("overwrite").parquet(s"$dir/arrival")
    }
    val storeBands = spark.read.parquet(s"$dir/store/bands")
    val storeSets = spark.read.parquet(s"$dir/store/sets")
    val arrival = spark.read.parquet(s"$dir/arrival")
    val nArrival = arrival.count()
    println(s"fixture: arrival $nArrival docs, store ${storeSets.count()} set rows " +
      s"(${storeBands.count()} band rows)")

    val actionNames = Seq("surv_ckpt", "bands_count", "bands_write",
      "sets_count", "sets_write")
    // live-cache high-water across the cached arms (the demoted
    // tables' MEMORY_AND_DISK footprint) and block-dir bytes after
    // the last sink-arm reap (the hygiene line)
    var cachedMemMax = 0L; var cachedDiskMax = 0L; var diskAfterReap = -1L
    // one demoted arrival, sink-shaped consumption; returns
    // (total, per-action walls)
    def arm(mode: String, run: Int): (Double, Seq[Double]) = {
      val walls = Array.fill(actionNames.size)(0.0)
      def act[T](i: Int)(body: => T): T = {
        val t0 = System.nanoTime()
        val r = body
        walls(i) = (System.nanoTime() - t0) / 1e9
        r
      }
      val pins = if (mode == "sink") operators.Pins.start() else null
      val t0 = System.nanoTime()
      try {
        // forced mode: maxBandRows = 1 demotes any nonempty batch
        // (plan shape = the demoted one, absolute size small); real
        // mode: the SHIPPED bound, tripped by arrival volume alone
        val d0 = operators.Incremental.demotions.sum()
        val (surv, bBands, bSets) = operators.Incremental.gate(
          storeBands, storeSets, arrival, col("id"), col("text"),
          maxBandRows =
            if (real) operators.Incremental.MaxMicroBatchBandRows else 1L)
        assert(operators.Incremental.demotions.sum() > d0,
          "the arrival must demote (in real mode: by volume alone)")
        if (mode == "persist") {
          bBands.persist(StorageLevel.MEMORY_AND_DISK)
          bSets.persist(StorageLevel.MEMORY_AND_DISK)
        }
        val survIds = act(0) { surv.localCheckpoint(true) }
        val nSurv = survIds.count()
        val out = s"$dir/out/run=$run"
        val nB = act(1) { bBands.count() }
        if (mode != "lazy") {
          // cache is fully populated by now: record its high-water
          val live = spark.sparkContext.getRDDStorageInfo
          cachedMemMax = math.max(cachedMemMax, live.map(_.memSize).sum)
          cachedDiskMax = math.max(cachedDiskMax, live.map(_.diskSize).sum)
        }
        act(2) { bBands.write.mode("overwrite").parquet(s"$out/bands") }
        val nS = act(3) { bSets.count() }
        act(4) { bSets.write.mode("overwrite").parquet(s"$out/sets") }
        val sec = (System.nanoTime() - t0) / 1e9
        if (mode == "persist") { bBands.unpersist(true); bSets.unpersist(true) }
        survIds.queryExecution.logical match {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(true)
          case _ => ()
        }
        assert(nSurv > 0 && nB > 0 && nS > 0)
        (sec, walls.toSeq)
      } finally if (mode == "sink") {
        operators.Pins.stop()
        operators.Pins.reap(pins)
        org.apache.spark.graft.Listeners.settle(spark.sparkContext)
        diskAfterReap =
          org.apache.spark.graft.Listeners.blockManagerDiskBytes(spark.sparkContext)
      }
    }

    val modes = if (real) Seq("lazy", "sink") else Seq("lazy", "persist", "sink")
    modes.zipWithIndex.foreach { case (m, i) => arm(m, i) } // warm all shapes
    miniCalib()
    var run = modes.size
    val rows = (1 to reps).map { _ =>
      val per = modes.map { m =>
        val r = arm(m, { run += 1; run }); val s = miniCalib(); (m, r, s)
      }
      System.err.println("[demotedprobe] " + per.map { case (m, (sec, _), s) =>
        f"$m $sec%.3f s (stamp $s%.3f)" }.mkString(" "))
      per
    }
    spark.stop()

    def j(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def a(xs: Seq[Double]): String = xs.map(j).mkString("[", ",", "]")
    def actions(w: Seq[Double]): String =
      actionNames.zip(w).map { case (n, v) => s""""$n":${j(v)}""" }.mkString("{", ",", "}")
    // per mode: rep walls, stamps, min, and the fastest rep's
    // per-action walls (the attribution row)
    val perMode = modes.map { m =>
      val rs = rows.map(_.find(_._1 == m).get)
      (m, rs.map(_._2._1), rs.map(_._3), rs.minBy(_._2._1)._2._2)
    }
    val minOf = perMode.map { case (m, secs, _, _) => m -> secs.min }.toMap
    val body = perMode.map { case (m, secs, stamps, walls) =>
      s""""${m}_secs":${a(secs)},"${m}_stamps":${a(stamps)},""" +
        s""""min_$m":${j(secs.min)},"${m}_actions":${actions(walls)}"""
    }.mkString(",")
    val persistRatio =
      if (minOf.contains("persist"))
        s""""lazy_over_persist":${j(minOf("lazy") / minOf("persist"))},"""
      else ""
    val line =
      s"""{"sf":"$sfDir","reps":$reps,"real":$real,"batch":$batchSize,""" +
      s""""n_arrival":$nArrival,""" +
      s""""store_batches":$storeBatches,$body,$persistRatio""" +
      s""""cached_mem_mb":${j(cachedMemMax / 1e6)},""" +
      s""""cached_disk_mb":${j(cachedDiskMax / 1e6)},""" +
      s""""disk_after_reap_mb":${j(diskAfterReap / 1e6)},""" +
      s""""lazy_over_sink":${j(minOf("lazy") / minOf("sink"))}}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[demotedprobe] $outPath not written: $e") }
    println(line)
  }
}
