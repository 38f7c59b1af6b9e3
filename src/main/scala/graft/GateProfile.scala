package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: where does a D10 gate arrival's time go? Builds a
  * persistent-store fixture (STORE_BATCHES × BATCH docs, disjoint
  * vocabularies — the StreamBench construction), writes it to
  * parquet like the streaming store, then times ONE gate arrival
  * against it, reporting the executed join operators and the task
  * shuffle totals. The question under test: does the store get
  * SHUFFLED (O(store) network per arrival) or only SCANNED?
  * GATE_EXPLAIN=1 prints the full plan. */
object GateProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batchSize = sys.env.getOrElse("GATE_BATCH", "2000").toInt
    val storeBatches = sys.env.getOrElse("GATE_STORE_BATCHES", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val pool = Tables.load(spark, sfDir, "documents")
      .select(col("text")).as[String].collect()
    def docs(tag: String, k: Int) =
      (0 until batchSize).map { i =>
        val pfx = s"$tag${k}·"
        (k.toLong * batchSize + i,
          pool((k * batchSize + i) % pool.length)
            .split("\\s+").filter(_.nonEmpty).map(pfx + _).mkString(" "))
      }.toDF("id", "text")

    val dir = java.nio.file.Files.createTempDirectory("graft-gateprof").toString
    (0 until storeBatches).foreach { k =>
      val (b, s) = operators.Incremental.signatures(docs("s", k), col("id"), col("text"))
      b.write.mode("overwrite").parquet(s"$dir/bands/batch=$k")
      s.write.mode("overwrite").parquet(s"$dir/sets/batch=$k")
    }
    val storeBands = spark.read.parquet(s"$dir/bands")
    val storeSets = spark.read.parquet(s"$dir/sets")
    println(s"store: ${storeBands.count()} band rows, ${storeSets.count()} set rows")

    val shufW = new LongAdder; val shufR = new LongAdder; val inBytes = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufW.add(m.shuffleWriteMetrics.bytesWritten)
          shufR.add(m.shuffleReadMetrics.totalBytesRead)
          inBytes.add(m.inputMetrics.bytesRead)
        }
      }
    })

    // warm: one gate arrival end-to-end (codegen etc.)
    val warm = operators.Incremental.gate(storeBands, storeSets,
      docs("w", 990), col("id"), col("text"))._1
    warm.write.format("noop").mode("overwrite").save()

    shufW.reset(); shufR.reset(); inBytes.reset()
    val t0 = System.nanoTime()
    val (surv, _, _) = operators.Incremental.gate(storeBands, storeSets,
      docs("m", 991), col("id"), col("text"))
    surv.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9

    val plan = surv.queryExecution.executedPlan.toString
    val joins = plan.linesIterator.map(_.trim)
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .map(_.takeWhile(_ != '(')).toSeq
        .groupBy(identity).view.mapValues(_.size).toSeq.sortBy(-_._2)
    println(f"gate arrival: $sec%.2f s  input=${inBytes.sum / 1e6}%.1f MB " +
      f"shuffle_write=${shufW.sum / 1e6}%.1f MB shuffle_read=${shufR.sum / 1e6}%.1f MB")
    println("plan operators: " + joins.map { case (k, n) => s"$n×$k" }.mkString(", "))
    if (sys.env.contains("GATE_EXPLAIN")) println(plan)
    spark.stop()
  }
}
