package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Shingles, SimHash}

/** Dev tool: one-off measurements while tuning (not part of the API). */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.load(spark, dir, "documents")
    time("explode+dedup") {
      Shingles.exploded(docs, col("doc_id"), col("text"), 3)
        .dropDuplicates("id", "sh").write.format("noop").mode("overwrite").save()
    }
    time("sigs") {
      SimHash.fingerprints(
        Shingles.exploded(docs, col("doc_id"), col("text"), 3).dropDuplicates("id", "sh"),
        "id", "sh").write.format("noop").mode("overwrite").save()
    }
    time("full c3") {
      SparkEntry.queries("c3_dedup_simhash")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("full c3 warm") {
      SparkEntry.queries("c3_dedup_simhash")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
