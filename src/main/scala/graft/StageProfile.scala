package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool (round 17 optimization): per-STAGE wall/task-time profile
  * of one or more queries — separates "time inside stages" from
  * "driver gaps" (planning, AQE re-optimization, broadcast builds,
  * collects), which per-query wall seconds alone cannot attribute.
  *
  * For each named query (after the standard warmup pass) it runs ONE
  * measured rep and prints, per stage: wall span, summed task time,
  * task count, and the stage's first line of detail; then the gap
  * total = rep wall − union of stage spans.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.StageProfile c34_incremental_gate"
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "1"))
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("c34_incremental_gate")

    final case class St(var sub: Long = 0L, var done: Long = 0L,
                        var taskMs: Long = 0L, var nTasks: Int = 0, var name: String = "")
    val stages = TrieMap.empty[Int, St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
        val s = stages.getOrElseUpdate(e.stageInfo.stageId, St())
        s.sub = System.nanoTime(); s.name = e.stageInfo.name.takeWhile(_ != '\n')
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val s = stages.getOrElseUpdate(e.stageInfo.stageId, St())
        s.done = System.nanoTime()
        s.nTasks = e.stageInfo.numTasks
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val s = stages.getOrElseUpdate(e.stageId, St())
        if (e.taskMetrics != null) s.taskMs += e.taskMetrics.executorRunTime
      }
    })

    // Catalyst phase timings of the measured noop write (captured via
    // the execution listener — the write runs its own QueryExecution)
    val phases = new java.util.concurrent.atomic.AtomicReference[String]("")
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             d: Long): Unit =
        phases.set(qe.tracker.phases.map { case (k, v) =>
          f"$k=${(v.endTimeMs - v.startTimeMs) / 1e3}%.3f" }.mkString(" "))
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    })

    for (name <- names) {
      // warm (unmeasured) pass — same protocol as the bench
      try SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      org.apache.spark.graft.Listeners.settle(spark.sparkContext)
      stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.Listeners.settle(spark.sparkContext)
      val ss = stages.toSeq.sortBy(_._2.sub).filter(_._2.sub > 0)
      println(f"===== $name wall=$wall%.3f s, ${ss.size} stages =====")
      var covered = 0L
      var lastEnd = 0L
      for ((sid, s) <- ss if s.done > 0) {
        val span = (s.done - s.sub) / 1e9
        // union of stage spans (stages overlap when AQE runs leaves in parallel)
        val start = math.max(s.sub, lastEnd)
        if (s.done > start) covered += s.done - start
        lastEnd = math.max(lastEnd, s.done)
        println(f"  stage $sid%3d span=$span%7.3f taskSum=${s.taskMs / 1e3}%7.3f n=${s.nTasks}%3d ${s.name.take(90)}")
      }
      println(f"  stage-span union=${covered / 1e9}%.3f s, driver gaps=${wall - covered / 1e9}%.3f s")
      Thread.sleep(300) // let the listener event land
      println(s"  phases: ${phases.get()}")
    }
    spark.stop()
  }
}
