package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: print simple physical plans for plan review. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // args: [absolute sf dir] [query names...] — either may be omitted
    val dir = if (args.nonEmpty && args.head.startsWith("/")) args.head else "/root/testdata/sf0.1"
    val names = args.toSeq.filterNot(_.startsWith("/"))
    val qs = if (names.nonEmpty) names else SparkEntry.queries.keys.toSeq.sorted
    for (q <- qs) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
