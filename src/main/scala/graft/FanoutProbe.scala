package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 17): why does fanning a 1-row-group scan out to
  * 32 tasks multiply TOTAL task CPU ~50× on the text kernels? Sweeps
  * partition counts over one heavy map pass and prints wall, task-sum,
  * deserialize-sum, gc-sum per setting.
  */
object FanoutProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.shuffle.sort.bypassMergeThreshold", sys.env.getOrElse("BYPASS", "200"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val run = new LongAdder; val deser = new LongAdder
    val gc = new LongAdder; val cpu = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { run.add(m.executorRunTime); deser.add(m.executorDeserializeTime)
          gc.add(m.jvmGCTime); cpu.add(m.executorCpuTime / 1000000) }
      }
    })
    def pass(p: Int): Unit = {
      val raw = Tables.eventsFromRaw(spark.read.parquet(s"$dir/events.parquet"))
      val docs = if (p > 0) raw.repartition(p) else raw
      val q = operators.Sessionize.summarize(docs,
        col("user_id"), col("ts"), col("event_id"), 1800)
      // warm
      q.write.format("noop").mode("overwrite").save()
      org.apache.spark.graft.Listeners.settle(spark.sparkContext)
      val times = (1 to 3).map { _ =>
        run.reset(); deser.reset(); gc.reset(); cpu.reset()
        val t0 = System.nanoTime()
        q.write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.Listeners.settle(spark.sparkContext)
        (w, run.sum() / 1e3, deser.sum() / 1e3, gc.sum() / 1e3, cpu.sum() / 1e3)
      }
      val b = times.minBy(_._1)
      println(f"p=$p%3d wall=${b._1}%6.3f taskSum=${b._2}%7.3f cpuSum=${b._5}%7.3f deserSum=${b._3}%6.3f gcSum=${b._4}%6.3f")
    }
    Seq(0, 1, 8, 32, 32, 0).foreach(pass)
    spark.stop()
  }
}
