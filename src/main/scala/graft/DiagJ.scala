package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev tool: c5 cell-pruning measurement (not part of the API). */
object DiagJ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    println(s"vecs=${e.count()}")
    for (it <- Seq(0, 1, 2)) {
      val out = Similarity.cosinePairsBucketed(e, col("vec_id"), col("embedding"), 0.4,
        nCells = 16, iters = it)
      println(s"iters=$it pairs=${out.count()}")
    }
    spark.stop()
  }
}
