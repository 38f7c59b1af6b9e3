package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time queries by name while tuning (not part of the API).
  * Repeat a name to see warm timings; DIAG_EXPLAIN=1 prints plans. */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    val names = if (args.nonEmpty) args.toSeq else Seq("c3_dedup_simhash")
    for (name <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (sys.env.contains("DIAG_EXPLAIN"))
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
