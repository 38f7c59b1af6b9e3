package graft
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every `SparkEntry.queries`
  * entry against SPARK_GRAFT_SF_DIR, min-of-REPS after a full warmup
  * pass, and reports two ways:
  *
  *  - ONE compact JSON line on stdout (the driver's scrape), with the
  *    headline fields LAST so a tail-truncated capture still carries
  *    them;
  *  - the COMPLETE full-precision record to SPARK_GRAFT_BENCH_OUT
  *    (default `bench_out.json` in the cwd = the repo), so the round
  *    artifact is self-contained even when the stdout scrape
  *    truncates — BENCH_r05 and r06 both lost their tails that way.
  *
  * Both carry a LOAD CALIBRATION: a fixed, sf-independent reference
  * computation (sum(xxhash64(id)) over 2^28 ids — pure CPU across all
  * cores, no I/O, no shuffle) timed min-of-3 BEFORE and AFTER the
  * sweep. On a quiet box it is a stable constant for a given core
  * count; external load inflates even its min, so a load-corrupted
  * record self-identifies (r06's driver run was ~3× inflated end to
  * end and nothing in the record said so). /proc/loadavg snapshots
  * land beside it for diagnosis.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle-partition count scales with DATA, not cores: 32 is right
    // for sf0.1 (partitions fit executor memory) but at sf10 (100×) the
    // big self-join shuffles spill tens of GB when squeezed into 32
    // partitions. On a real cluster AQE splits from a high initial
    // partition number; locally the knob lets scale runs set e.g. 256
    // (AQE, on by default in Spark 4, coalesces the small stages back
    // down, so only the genuinely big shuffles keep the fan-out).
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // Shuffle WRITER choice (optimization round 17, guide §2.2 "many
      // small blocks"): the bypass-merge writer opens one temp file per
      // REDUCE partition per map task (M×R file creates/deletes per
      // exchange), and on this sandbox's filesystem each open/delete
      // costs ~10 ms — thread dumps of a 32-map × 32-reduce exchange
      // showed task CPU dominated by FileOutputStream.open0/delete0
      // (~300 ms/task against ~5 ms of real row work; taskSum 12 s →
      // 0.5 s with the sort writer, OPTIMIZATION_r17.md). Threshold 1
      // routes every multi-partition exchange through the sort-based
      // writer: ONE spill file + index per map task, M files total.
      // Production-faithful, not a local trick: at cluster reducer
      // counts (R > 200) bypass never fires anyway — this makes the
      // local plan shape match the at-scale one.
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "1"))
      // Disk-leak guard, shipped as a harness default (round 15):
      // localCheckpoint blocks are MEMORY_AND_DISK and are freed only
      // when a DRIVER GC lets the ContextCleaner reap the dead RDD
      // handles; a long suite run accumulated 73 GB of dead block
      // files in ~50 min and hit ENOSPC (SURVEY §6 r14). The periodic
      // driver GC bounds that to one interval's worth (73 → 7 GB
      // measured) at no wall-time cost (gc60 vs hyg0 chain pair,
      // §6 r14 — the deltas were box noise).
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // c40's proven-bounded unpartitioned window: see EngineLog
    EngineLog.silenceProvenBoundedWindowWarn()
    // Warm the JVM so no measured query is charged JIT/startup cost:
    // one full UNMEASURED pass of the same query set at the same sf
    // dir (same plans + same AQE decisions → same generated classes),
    // then the measured pass below runs fully warm. A smaller-sf
    // warmup does NOT work — AQE picks different join strategies at
    // different sizes, so the generated code differs. Each timing
    // below is steady-state engine cost, not "who ran first pays the
    // operator family's cold codegen compile".
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    // fail fast on a mistyped filter name — BEFORE the multi-minute
    // warmup, with the unknown names spelled out
    val unknown = args.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — known: " +
        SparkEntry.queries.keySet.toSeq.sorted.mkString(", "))
    // validate the rep count BEFORE the warmup too: reps <= 0 would
    // make every rep list empty, silently reporting the -1.0 sentinel
    // for every query (indistinguishable from "all reps failed"), and
    // a typo'd value would throw a bare NumberFormatException AFTER
    // minutes of warmup already ran
    val repsRaw = sys.env.getOrElse("SPARK_GRAFT_REPS", "3")
    val reps = scala.util.Try(repsRaw.toInt).getOrElse(
      sys.error(s"SPARK_GRAFT_REPS must be an integer >= 1, got '$repsRaw'"))
    require(reps >= 1, s"SPARK_GRAFT_REPS must be >= 1, got '$repsRaw'")

    // ---- load calibration -------------------------------------------------
    // fixed reference work: ~268M xxhash64 evaluations, embarrassingly
    // parallel, zero I/O — its min-of-3 moves only when something else
    // is eating the cores. Warmed once so codegen never pollutes it.
    def calibOnce(): Double = {
      val t0 = System.nanoTime()
      // bit_xor, not sum: a sum of 2^28 hashes overflows long under
      // ANSI arithmetic; xor is overflow-free and just as CPU-bound
      spark.range(1L << 28).selectExpr("bit_xor(xxhash64(id))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def calibMin(): Double = { calibOnce(); (1 to 3).map(_ => calibOnce()).min }
    // Per-REP mini-calibration (round 14): the sweep-level pre/post
    // calib can't see INSIDE the run, and this box showed multi-minute
    // ~3× CPU-slowdown windows with ZERO guest-visible steal (the
    // pure-CPU reference itself went 0.09 → 0.27 s between runs in
    // identical conditions). A heavy query's three reps span 1-2.5
    // minutes — the same order as a burst — so min-of-3 can't dodge
    // and the row inflates with no JVM-side signature (measured:
    // zero spill/storage/gc on reps 2-3× slower than standalone).
    // One 2^27-id slice (~45 ms quiet, 3× under a burst) after each
    // rep stamps that rep's window; analysis can then discard reps
    // whose stamp is inflated instead of trusting a blind min.
    def miniCalib(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 27).selectExpr("bit_xor(xxhash64(id))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").take(3).mkString(" ")
      catch { case _: Exception => "unavailable" }
    val loadPre = loadavg()
    val calibPre = calibMin()

    // ---- per-query diagnostics (round 14: the suite-inflation hunt) ---
    // A query's wall seconds alone can't attribute an in-suite
    // inflation (r13: c38 29.6/41.0 s in-suite vs 17.3 standalone,
    // min-of-3 per run — NOT transient noise). Three cheap probes per
    // query separate the suspects: driver+executor GC time (suite-long
    // heap debt), task spill bytes (execution-memory contention), and
    // the BlockManager's resident RDD storage (this suite's operators
    // localCheckpoint intermediates — Components per CC round, the
    // packing prefix sums — and those blocks are freed only when a
    // DRIVER GC lets the ContextCleaner collect them, so storage can
    // accumulate across a 95-query suite and squeeze execution
    // memory). All three land in the FULL file record only; the
    // stdout line (the driver's scrape) is unchanged.
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // JIT-state probes (round 14, second pass): the chain experiment
    // reproduced the inflation with ZERO gc/spill/storage signature —
    // the remaining suspects are JVM code state. Per query: the JIT's
    // cumulative compilation-time delta (a recompile storm = seconds
    // of C2 work mid-query), code-heap occupancy (the sweeper starts
    // flushing warm methods near the segment caps — this probe is
    // how the r15 code-cache-saturation verdict was reached, and why
    // build.sbt now forks with -XX:ReservedCodeCacheSize=512m; at
    // the JVM default 240 MB the 95-query sf10 suite measurably
    // re-warmed flushed kernels, SURVEY §6 r15), and metaspace
    // (class accumulation from one generated class per codegen
    // stage per plan).
    def jitMillis(): Long = {
      val c = java.lang.management.ManagementFactory.getCompilationMXBean
      if (c != null && c.isCompilationTimeMonitoringSupported) c.getTotalCompilationTime else 0L
    }
    def poolUsedMb(nameFrag: String): Double = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.contains(nameFrag)).map(_.getUsage.getUsed).sum / 1e6
    }
    // Host CPU accounting per rep (round 14, third pass): the per-rep
    // spikes survive a quiet pre/post calib because the calib can't
    // see INSIDE the run. /proc/stat's cpu line is the ground truth —
    // a rep whose window carries high STEAL ran against a co-tenant
    // burst (invalid measurement, not an engine cost); high IOWAIT
    // says storage stalls; high IDLE with a long wall says scheduler
    // gaps. Returns (user+nice, system+irq+softirq, idle, iowait,
    // steal) jiffies — irq/softirq fold into the system bucket so
    // the denominator covers the full cpu line and the reported
    // percentages aren't overstated on irq-heavy windows.
    def procStat(): Array[Long] =
      try {
        val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
        val f = l.trim.split("\\s+").drop(1).map(_.toLong)
        def at(i: Int) = if (f.length > i) f(i) else 0L
        Array(f(0) + f(1), f(2) + at(5) + at(6), f(3), f(4), at(7))
      } catch { case _: Exception => Array(0L, 0L, 0L, 0L, 0L) }
    val spillBytes = new LongAdder
    // shuffle-fetch wait per rep (round 16): the next engine-side
    // suspect for context-free rep scatter — a rep whose tasks sat
    // waiting on shuffle fetches carries the wait here, separating
    // "executor starved by the host" from "engine waited on itself"
    val fetchWaitMs = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spillBytes.add(m.memoryBytesSpilled + m.diskBytesSpilled)
          if (m.shuffleReadMetrics != null)
            fetchWaitMs.add(m.shuffleReadMetrics.fetchWaitTime)
        }
      }
    })
    // ---- continuous slowdown sampler (round 16: the c38/c22 scatter) --
    // The ~90 ms post-rep stamp provably undersamples the suspected
    // sub-minute host slowdown windows (it observes <1% of a 30 s rep).
    // SPARK_GRAFT_BENCH_SAMPLER=1 starts a daemon thread running a
    // fixed ~0.5 ms pure-JVM work unit every 100 ms for the whole
    // sweep; each rep then reports the tick-duration distribution and
    // slow-tick occupancy INSIDE its own window. The unit competes
    // with Spark's task threads, so its absolute duration inflates
    // during any busy query — the diagnostic is the CONTRAST between
    // fast and slow reps of the SAME query, where the engine's work is
    // constant and only host interference differs. Off by default: a
    // permanent 0.5%-duty spinner has no place under a record run.
    val samplerOn = sys.env.get("SPARK_GRAFT_BENCH_SAMPLER").contains("1")
    final case class Tick(at: Long, workNanos: Long)
    val ticks = new java.util.concurrent.ConcurrentLinkedQueue[Tick]()
    val tickSink = new LongAdder // observable sink: the loop can't be elided
    def tickOnce(): Tick = {
      val t0 = System.nanoTime()
      var x = t0 | 1L
      var i = 0
      while (i < 300000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      tickSink.add(x)
      val t1 = System.nanoTime()
      Tick(t1, t1 - t0)
    }
    if (samplerOn) {
      val t = new Thread(() => {
        while (true) { ticks.add(tickOnce()); Thread.sleep(100) }
      }, "graft-bench-sampler")
      t.setDaemon(true)
      t.start()
    }
    def tickWindow(from: Long, to: Long): Seq[Double] = {
      import scala.jdk.CollectionConverters._
      ticks.iterator().asScala.filter(t => t.at >= from && t.at <= to)
        .map(_.workNanos / 1e6).toSeq.sorted
    }
    // disk size matters as much as memory: localCheckpoint blocks are
    // MEMORY_AND_DISK, so under execution-memory pressure they land on
    // disk and STAY there until a driver GC lets the ContextCleaner
    // reap them — a hygiene-off sf10 suite accumulated 73 GB of
    // block-manager files in ~50 min on this box (r14, hit ENOSPC)
    def storageSnapshot(): (Long, Long, Int) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(_.memSize).sum, infos.map(_.diskSize).sum,
        spark.sparkContext.getPersistentRDDs.size)
    }
    // SPARK_GRAFT_BENCH_HYGIENE=1: between queries, drop every
    // persistent RDD (nothing references a prior query's checkpoint
    // blocks once its action returned), clear the SQL cache, and ask
    // for a driver GC so the ContextCleaner can reap broadcast/shuffle
    // state. OFF by default — the protocol the cross-round records
    // were measured under stays the default; this knob is the A/B for
    // the inflation experiment.
    val hygiene = sys.env.get("SPARK_GRAFT_BENCH_HYGIENE").contains("1")
    def hygienePass(): Unit = if (hygiene) {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      System.gc()
      org.apache.spark.graft.Listeners.settle(spark.sparkContext)
      Thread.sleep(200) // let async unpersist/cleaner messages land
    }

    // local profiling with a name filter warms only the filtered set
    // (the driver passes no args → full warmup, unchanged)
    miniCalib() // warm the per-rep stamp's codegen before anything is measured
    val warmSet = if (args.isEmpty) SparkEntry.queries
                  else args.toSeq.map(n => n -> SparkEntry.queries(n)).toMap
    warmSet.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // name-sorted so per-query timings are comparable across rounds:
    // with Map iteration order, adding one query reshuffles who pays
    // the shared cold codegen/JIT of each operator family
    // optional args = query-name filter (local profiling; driver passes none)
    // Noise robustness: the box this runs on carries unpredictable
    // external load (round-4 record: a 1.2 s query measured at 16.8 s
    // inside a load window). Each query therefore runs REPS measured
    // repetitions and records the MIN — the warmup above already
    // targets steady state, so the min IS the steady-state engine
    // cost, and one noisy minute can no longer corrupt a round's
    // record. A rep that THROWS records the -1.0 sentinel; a query
    // whose every rep fails reports -1.0 — a broken query must never
    // masquerade as a fast one.
    val resultsFull = (if (args.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
                   else args.toSeq.map(n => n -> SparkEntry.queries(n)))
      .map { case (name, fn) =>
      // noop sink: computes every output column (count() would let
      // Catalyst prune the projections) without any write cost.
      hygienePass()
      val times = (1 to reps).map { _ =>
        // drain the listener bus so a prior rep's straggling task-end
        // events don't leak into this rep's spill total (outside the
        // timer on both ends)
        org.apache.spark.graft.Listeners.settle(spark.sparkContext)
        spillBytes.reset()
        fetchWaitMs.reset()
        val g0 = gcMillis()
        val j0 = jitMillis()
        val s0 = procStat()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val tEnd = System.nanoTime()
          val sec = (tEnd - t0) / 1e9
          org.apache.spark.graft.Listeners.settle(spark.sparkContext)
          val s1 = procStat()
          val ds = s1.zip(s0).map { case (a, b) => (a - b).toDouble }
          val tot = math.max(1.0, ds.sum)
          // (steal%, iowait%, idle%) of the host over this rep's window
          (sec, (gcMillis() - g0) / 1e3, spillBytes.sum() / 1e6,
            (jitMillis() - j0) / 1e3,
            100 * ds(4) / tot, 100 * ds(3) / tot, 100 * ds(2) / tot,
            miniCalib(), fetchWaitMs.sum() / 1e3, (t0, tEnd))
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: $e")
            (-1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, (0L, 0L))
        }
      }
      val ok = times.filter(_._1 >= 0)
      // diagnostics ride the rep that produced the reported (min) time
      val best =
        if (ok.isEmpty) (-1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, (0L, 0L))
        else ok.minBy(_._1)
      val (storageBytes, storageDiskBytes, nRdds) = storageSnapshot()
      (name, best._1, best._2, best._3, storageBytes / 1e6,
        storageDiskBytes / 1e6, nRdds,
        times.map(_._1), times.map(_._4), poolUsedMb("CodeHeap"), poolUsedMb("Metaspace"),
        times.map(_._5), times.map(_._6), times.map(_._7), times.map(_._8),
        times.map(_._9), times.map(_._10))
    }
    val results = resultsFull.map(r => r._1 -> r._2)
    // post-sweep calibration: load arriving MID-run shows up as
    // pre/post disagreement even if the pre measurement was quiet
    val calibPost = calibMin()
    val loadPost = loadavg()
    val calib = math.min(calibPre, calibPost)

    // The harness that consumes the stdout line captures only the
    // LAST ~2000 bytes; a full-precision 80-query line is ~3 KB, so
    // its head — including the {"metric":…} prefix — was being
    // truncated off every round and the line never parsed. Defenses,
    // layered:
    //   1. per-query times at millisecond precision (min of reps ⇒
    //      sub-ms digits are noise anyway) keeps the line small;
    //   2. "queries" FIRST and calib/metric/value/unit/sf LAST, so
    //      even a truncated capture still carries the summary fields
    //      (JSON object keys are unordered);
    //   3. the COMPLETE full-precision record also lands in
    //      SPARK_GRAFT_BENCH_OUT (default bench_out.json in the
    //      repo) — the self-contained file twin of this line;
    //   4. the stdout line prints AFTER spark.stop(), so no shutdown
    //      logging can push it out of the capture window.
    def ms(v: Double): String =
      if (v < 0) "-1.0" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val qsFull = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val line =
      s"""{"queries":$qs,"calib":${ms(calib)},"out":"$outPath",""" +
      s""""metric":"total","value":${ms(total)},"unit":"sec","sf":"$sfDir"}"""
    // per-query diagnostics (gc seconds + spill MB of the min rep;
    // resident RDD storage MB + block count right AFTER the query) —
    // the attribution record for any in-suite-vs-standalone gap
    // sampler baseline: the fastest tick of the whole run is the
    // quiet-box work-unit cost; a rep's "slow occupancy" is the
    // fraction of its ticks over 3× that floor
    val tickMinMs = {
      import scala.jdk.CollectionConverters._
      val all = ticks.iterator().asScala.map(_.workNanos / 1e6)
      if (all.isEmpty) 0.0 else all.min
    }
    // second floor (round 17, ADVICE): on a box that is NEVER quiet —
    // exactly the condition being diagnosed — the all-ticks min
    // inflates and slow-occupancy understates host interference. Ticks
    // taken OUTSIDE every rep window (settle gaps, per-rep stamps,
    // warmup/teardown) are immune to the engine's own busy queries, so
    // their min is the in-run quiet estimate to calibrate against the
    // cross-run quiet baseline. Emitted beside tick_min_ms (which
    // stays the slow_pct denominator for comparability with the r16
    // probe records).
    val tickIdleMinMs = {
      import scala.jdk.CollectionConverters._
      val windows = resultsFull.flatMap(_._17).filter(w => w._2 > w._1)
      val idle = ticks.iterator().asScala
        .filter(t => !windows.exists(w => t.at >= w._1 && t.at <= w._2))
        .map(_.workNanos / 1e6)
      if (idle.isEmpty) 0.0 else idle.min
    }
    val diag = resultsFull.map {
      case (name, _, gcSec, spillMb, storMb, storDiskMb, nRdds,
            repSecs, repJitSecs, codeHeapMb, metaspaceMb,
            repStealPct, repIowaitPct, repIdlePct, repCalib,
            repFetchWait, repWindows) =>
        val tickJson = if (!samplerOn) "" else {
          val stats = repWindows.map { case (from, to) => tickWindow(from, to) }
          def arr(f: Seq[Double] => Double): String =
            stats.map(w => ms(if (w.isEmpty) -1.0 else f(w))).mkString(",")
          s""""rep_tick_n":[${stats.map(_.size).mkString(",")}],""" +
            s""""rep_tick_p50_ms":[${arr(w => w(w.size / 2))}],""" +
            s""""rep_tick_p90_ms":[${arr(w => w(w.size * 9 / 10))}],""" +
            s""""rep_tick_slow_pct":[${arr(w =>
              100.0 * w.count(_ > 3 * tickMinMs) / w.size)}],""" +
            // mean tick vs the run floor (round 17): classifies
            // 1.5×-amplitude windows the 3× slow-pct threshold misses
            // (the two mid-slow c38 reps of the r16 probe sat at 5-7%
            // occupancy; their mean ratio separates them cleanly)
            s""""rep_tick_mean_x":[${arr(w =>
              w.sum / w.size / math.max(tickMinMs, 1e-9))}],"""
        }
        "\"" + name + s"""":{"gc_sec":${ms(gcSec)},"spill_mb":${ms(spillMb)},""" +
          s""""storage_mb_after":${ms(storMb)},""" +
          s""""storage_disk_mb_after":${ms(storDiskMb)},"rdds_after":$nRdds,""" +
          s""""rep_secs":[${repSecs.map(ms).mkString(",")}],""" +
          s""""rep_jit_secs":[${repJitSecs.map(ms).mkString(",")}],""" +
          s""""rep_steal_pct":[${repStealPct.map(ms).mkString(",")}],""" +
          s""""rep_iowait_pct":[${repIowaitPct.map(ms).mkString(",")}],""" +
          s""""rep_idle_pct":[${repIdlePct.map(ms).mkString(",")}],""" +
          s""""rep_calib_secs":[${repCalib.map(ms).mkString(",")}],""" +
          s""""rep_fetch_wait_secs":[${repFetchWait.map(ms).mkString(",")}],""" +
          tickJson +
          s""""codeheap_mb_after":${ms(codeHeapMb)},""" +
          s""""metaspace_mb_after":${ms(metaspaceMb)}}"""
    }.mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir",""" +
      s""""reps":$reps,"cpus":"$cpus","shuffle_partitions":"$shufflePartitions",""" +
      s""""n_queries":${results.size},"hygiene":$hygiene,""" +
      s""""calib":$calib,"calib_pre":$calibPre,"calib_post":$calibPost,""" +
      s""""calib_ref":"min-of-3 bit_xor(xxhash64(id)) over range(2^28), warmed",""" +
      s""""loadavg_pre":"$loadPre","loadavg_post":"$loadPost",""" +
      s""""sampler":$samplerOn,"tick_min_ms":${ms(tickMinMs)},""" +
      s""""tick_idle_min_ms":${ms(tickIdleMinMs)},""" +
      s""""diag":$diag,""" +
      s""""queries":$qsFull}"""
    // best-effort: the bench must still report via stdout if cwd
    // isn't writable (e.g. run from a read-only checkout)
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (full + "\n").getBytes("UTF-8"))
    } catch { case e: Exception => System.err.println(s"[bench] $outPath not written: $e") }
    // Per-round ARCHIVE copy: bench_out.json is overwritten by every
    // run, so round N+1's first run would destroy round N's per-query
    // record. The round number is inferred from the newest BENCH_r<N>
    // stdout scrape the driver committed (absent in round 1 → r01);
    // SPARK_GRAFT_ROUND overrides. Full driver runs only — a filtered
    // local profiling run must not overwrite the round's archive.
    if (args.isEmpty) try {
      import scala.jdk.CollectionConverters._
      val round = sys.env.get("SPARK_GRAFT_ROUND").map(_.toInt).getOrElse {
        val rx = "BENCH_r(\\d+)\\.json".r
        val seen = java.nio.file.Files.list(java.nio.file.Paths.get("."))
          .iterator().asScala
          .flatMap(p => rx.findFirstMatchIn(p.getFileName.toString).map(_.group(1).toInt))
          .toSeq
        if (seen.isEmpty) 1 else seen.max + 1
      }
      val arch = f"bench_out_r$round%02d.json"
      java.nio.file.Files.write(java.nio.file.Paths.get(arch),
        (full + "\n").getBytes("UTF-8"))
    } catch { case e: Exception => System.err.println(s"[bench] archive not written: $e") }
    spark.stop()
    println(line)
  }
}
