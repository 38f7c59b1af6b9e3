package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-query CLUSTER-RESOURCE audit — wall time is a poor
  * proxy for 100 TB behavior on a 32-thread box, so this measures the
  * quantities that actually bound a 1000-executor run: bytes scanned,
  * bytes through the shuffle (write + read), and bytes spilled. A
  * query whose TIME scales fine but whose SHUFFLE volume grows
  * super-linearly is a scale defect the stopwatch hides (it just
  * hasn't hit the disk cliff yet at local sizes).
  *
  * Metrics come from a SparkListener summing TaskMetrics across every
  * task of every job the query triggers (AQE re-plans included). The
  * listener bus is asynchronous, so each query waits for a quiet
  * period before reading the adders — a dev-tool-grade drain (the
  * alternative, listenerBus.waitUntilEmpty, is private[spark]).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.ShuffleAudit c2_dedup_minhash ..."
  * Emits one JSON line per query plus a trailing summary line.
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    // SPARK_GRAFT_CODEC switches the shuffle/spill block codec (lz4 is
    // Spark's default) — used to measure the compression tax high
    // partition counts levy on the sorted-set verify shuffles
    val codec = sys.env.getOrElse("SPARK_GRAFT_CODEC", "lz4")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.io.compression.codec", codec)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val unknown = args.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val names = if (args.nonEmpty) args.toSeq else Seq("c2_dedup_minhash")

    val input = new LongAdder; val shufW = new LongAdder
    val shufR = new LongAdder; val spill = new LongAdder
    val tasks = new LongAdder
    // tasks counted on arrival lets the drain below detect stragglers:
    // the job is done when the task count stops moving for two polls
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          input.add(m.inputMetrics.bytesRead)
          shufW.add(m.shuffleWriteMetrics.bytesWritten)
          shufR.add(m.shuffleReadMetrics.totalBytesRead)
          spill.add(m.diskBytesSpilled)
          tasks.increment()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def drained(): Unit = {
      var last = -1L
      var stable = 0
      while (stable < 2) {
        Thread.sleep(300)
        val now = tasks.sum()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
    }
    def mb(a: LongAdder): Double = math.round(a.sum() / 1e4) / 100.0

    // one unmeasured warmup pass so codegen/IO cache effects don't
    // pollute the first query's task metrics with retries
    names.distinct.foreach { n =>
      try SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    drained()

    val rows = names.map { name =>
      input.reset(); shufW.reset(); shufR.reset(); spill.reset(); tasks.reset()
      val t0 = System.nanoTime()
      val ok = try {
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save(); true
      } catch { case e: Throwable => System.err.println(s"[audit] $name failed: $e"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      drained()
      val line =
        s"""{"query":"$name","ok":$ok,"sec":${math.round(sec * 1000) / 1000.0},""" +
        s""""input_mb":${mb(input)},"shuffle_write_mb":${mb(shufW)},""" +
        s""""shuffle_read_mb":${mb(shufR)},"spill_mb":${mb(spill)},"tasks":${tasks.sum()}}"""
      println(line)
      line
    }
    spark.stop()
    println(s"""{"sf":"$dir","n":${rows.size}}""")
  }
}
