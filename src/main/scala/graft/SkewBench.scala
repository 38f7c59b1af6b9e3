package graft

import java.util.concurrent.atomic.{LongAccumulator, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: the SKEW experiment (SURVEY §6 round-12) — measures the
  * near-dup family on a boilerplate-skewed corpus (SkewGen) against
  * its uniform twin, unsalted vs hot-key-salted, and reports the
  * evidence wall-clock alone hides: MAX TASK SECONDS (the straggler a
  * hot band/prefix key creates — on a 1000-executor cluster the job
  * ends when that one task does) and total shuffle bytes (the
  * candidate-pair volume, which salting does NOT reduce — quadratic
  * candidates are a property of the data; salting only spreads their
  * emission).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1skew sbt "runMain graft.SkewBench"
  *   env: SPARK_GRAFT_SALTS (16), SPARK_GRAFT_HOTMIN (512),
  *        SPARK_GRAFT_REPS (3), SPARK_GRAFT_BENCH_OUT (skewbench_out.json),
  *        SPARK_GRAFT_SHUFFLE_PARTITIONS (32 — 256 emulates a
  *        cluster-width reducer count for the salting-residual check),
  *        SPARK_GRAFT_SKEW_VARIANTS (comma-separated name prefixes to
  *        run a subset, e.g. "c3" for the SimHash rows)
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1skew")
    val salts = sys.env.getOrElse("SPARK_GRAFT_SALTS", "16").toInt
    val hotMin = sys.env.getOrElse("SPARK_GRAFT_HOTMIN", "512").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "skewbench_out.json")
    // SPARK_GRAFT_BROADCAST=-1 disables broadcast joins: at sf1 the
    // prefix/band tables still fit under the broadcast threshold and
    // a BROADCAST probe spreads hot-key emissions across probe tasks
    // by accident — the straggler regime this experiment measures is
    // the SHUFFLE-join regime a corpus-scale table is in (sf10's
    // prefix table is ~400 MB), so -1 makes the sf1-sized corpus
    // execute the sf10-shaped plan
    val bcast = sys.env.getOrElse("SPARK_GRAFT_BROADCAST", "10MB")
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", shufParts)
      // experiment knob (round-13 residual hunt): AQE's input-byte
      // partition coalescing packs tiny-input/quadratic-output salt
      // cells back into one reducer
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE_COALESCE", "true"))
      .config("spark.sql.autoBroadcastJoinThreshold", bcast)
      .config("spark.sql.session.timeZone", "UTC")
      // dead-localCheckpoint-block disk guard (see Bench's builder)
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shufW = new LongAdder; val shufR = new LongAdder
    val tasks = new LongAdder; val maxTaskMs = new LongAccumulator(Math.max(_, _), 0L)
    // per-stage (sum, max) task millis — attributes the straggler to
    // a stage so "max task" isn't a black box (stage ids are matched
    // to operators by reading the executed plan's stage markers)
    val stageMs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    // the straggler's anatomy: metrics of the single longest task —
    // distinguishes "one cell genuinely holds the work" (big shuffle
    // read / output rows) from a memory-pressure artifact (spill, GC)
    case class MaxTask(ms: Long, stage: Int, shufRMb: Double, shufWMb: Double,
                       spillMb: Double, gcMs: Long, recordsR: Long)
    // ONE lock object shared by the listener's read-modify-write and
    // the per-rep reset below: a bare `synchronized` in the anonymous
    // listener locks the listener instance while one in `main` locks
    // the SkewBench object — two monitors, no mutual exclusion
    // (ADVICE r13; benign under the single listener-bus thread, but
    // the locks must mean what they say)
    val mtLock = new Object
    @volatile var maxTask = MaxTask(0, -1, 0, 0, 0, 0, 0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufW.add(m.shuffleWriteMetrics.bytesWritten)
          shufR.add(m.shuffleReadMetrics.totalBytesRead)
          maxTaskMs.accumulate(t.taskInfo.duration)
          tasks.increment()
          stageMs.merge(t.stageId, (t.taskInfo.duration, t.taskInfo.duration),
            (a, b) => (a._1 + b._1, math.max(a._2, b._2)))
          mtLock.synchronized {
            if (t.taskInfo.duration > maxTask.ms) maxTask = MaxTask(
              t.taskInfo.duration, t.stageId,
              m.shuffleReadMetrics.totalBytesRead / 1e6,
              m.shuffleWriteMetrics.bytesWritten / 1e6,
              (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6,
              m.jvmGCTime, m.shuffleReadMetrics.recordsRead)
          }
        }
      }
    })
    def drained(): Unit = {
      var last = -1L; var stable = 0
      while (stable < 2) {
        Thread.sleep(300)
        val now = tasks.sum()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
    }

    def docs: DataFrame = Tables.load(spark, dir, "documents")
    // c4 variants go through the TWO-STEP form with the build-once
    // barrier FORCED on both, so the A/B isolates salting at the
    // plan shape a corpus-scale input gets (the sf1-sized fixtures
    // sit below the auto gate)
    def barrieredSets: DataFrame = operators.Jaccard.barriered(
      operators.Jaccard.sortedSets(docs, col("doc_id"), col("text"), 3))
    val allVariants: Seq[(String, () => DataFrame)] = Seq(
      "c2_unsalted" -> (() => operators.MinHash.nearDupPairs(
        docs, col("doc_id"), col("text"), salts = 1)),
      s"c2_salted$salts" -> (() => operators.MinHash.nearDupPairs(
        docs, col("doc_id"), col("text"), salts = salts, hotMin = hotMin)),
      // c3/c3b: the SimHash chunk-value self-join is the same
      // pair-generating shape as c2's band join — a template-dominated
      // fingerprint cluster puts f·n rows under one (ci, cv) key
      "c3_unsalted" -> (() => operators.SimHash.nearDupPairs(
        docs, col("doc_id"), col("text"), salts = 1)),
      s"c3_salted$salts" -> (() => operators.SimHash.nearDupPairs(
        docs, col("doc_id"), col("text"), salts = salts, hotMin = hotMin)),
      "c3b_unsalted" -> (() => operators.SimHash.nearDupPairs(
        docs, col("doc_id"), col("text"), maxHamming = 3, agree = 5, salts = 1)),
      s"c3b_salted$salts" -> (() => operators.SimHash.nearDupPairs(
        docs, col("doc_id"), col("text"), maxHamming = 3, agree = 5,
        salts = salts, hotMin = hotMin)),
      "c4_unsalted" -> (() => operators.Jaccard.nearDupPairsFromSets(
        barrieredSets, 0.5, salts = 1)),
      s"c4_salted$salts" -> (() => operators.Jaccard.nearDupPairsFromSets(
        barrieredSets, 0.5, salts = salts, hotMin = hotMin)),
      "c45_line_dedup" -> (() => SparkEntry.queries("c45_line_dedup")(spark, dir)))
    val prefixes = sys.env.get("SPARK_GRAFT_SKEW_VARIANTS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val variants = prefixes match {
      case Some(ps) => allVariants.filter { case (n, _) => ps.exists(n.startsWith) }
      case None => allVariants
    }
    require(variants.nonEmpty, s"no variants match $prefixes")

    // full warmup pass (same reasoning as Bench: steady-state only)
    variants.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save()
    }
    drained()
    def j(v: Double, digits: Int = 3): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))
    val rows = variants.map { case (name, f) =>
      val times = (1 to reps).map { _ =>
        shufW.reset(); shufR.reset(); tasks.reset(); maxTaskMs.reset(); stageMs.clear()
        mtLock.synchronized { maxTask = MaxTask(0, -1, 0, 0, 0, 0, 0) }
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        drained()
        import scala.jdk.CollectionConverters._
        val top = stageMs.asScala.toSeq.sortBy(-_._2._2).take(3)
          .map { case (sid, (sum, mx)) =>
            s"stage $sid max=${j(mx / 1e3)}s sum=${j(sum / 1e3)}s" }
          .mkString("; ")
        System.err.println(s"[skewbench] $name rep top stages: $top")
        val mt = maxTask
        System.err.println(f"[skewbench] $name rep max task: ${mt.ms / 1e3}%.3f s " +
          f"stage ${mt.stage} shuf_r=${mt.shufRMb}%.1f MB (${mt.recordsR} rec) " +
          f"shuf_w=${mt.shufWMb}%.1f MB spill=${mt.spillMb}%.1f MB gc=${mt.gcMs} ms")
        (sec, maxTaskMs.get() / 1e3, shufW.sum() / 1e6, shufR.sum() / 1e6, tasks.sum())
      }
      val best = times.minBy(_._1)
      val line = s""""$name":{"sec":${j(best._1)},"max_task_sec":${j(best._2)},""" +
        s""""shuffle_write_mb":${j(best._3, 1)},"shuffle_read_mb":${j(best._4, 1)},""" +
        s""""tasks":${best._5}}"""
      System.err.println(s"[skewbench] $name $line")
      line
    }
    val out = s"""{"variants":{${rows.mkString(",")}},"sf":"$dir",""" +
      s""""salts":$salts,"hot_min":$hotMin,"reps":$reps,"broadcast":"$bcast",""" +
      s""""shuffle_partitions":$shufParts}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (out + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[skewbench] $outPath not written: $e") }
    spark.stop()
    println(out)
  }
}
