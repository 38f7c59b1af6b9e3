package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Shingles

/** Dev tool: Jaccard join fan-out measurement (not part of the API). */
object DiagJ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val t = 0.5
    val docs = Tables.load(spark, dir, "documents")
    val index = Shingles.exploded(docs, col("doc_id"), col("text"), 3)
      .select(col("id"), md5(col("sh")).as("h"))
      .dropDuplicates("id", "h")
    index.cache()
    println(s"index rows=${index.count()} distinct h=${index.select("h").distinct().count()}")
    val sizes = index.groupBy("id").agg(count(lit(1)).cast("int").as("sz"))
    val w = Window.partitionBy(col("id")).orderBy(col("h"))
    val prefix = index.withColumn("rn", row_number().over(w))
      .join(sizes, "id")
      .filter(col("rn") <= col("sz") - ceil(lit(t) * col("sz")).cast("int") + 1)
    prefix.cache()
    println(s"prefix rows=${prefix.count()}")
    val full = index.groupBy("h").agg(count(lit(1)).as("n"))
    println("full join fanout = " + full.agg(sum(col("n") * (col("n") - 1) / 2)).head.get(0))
    val pf = prefix.groupBy("h").agg(count(lit(1)).as("n"))
    println("prefix join fanout = " + pf.agg(sum(col("n") * (col("n") - 1) / 2)).head.get(0))
    val cand = prefix.as("a").join(prefix.as("b"),
      col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
        col("a.sz") >= lit(t) * col("b.sz") && col("b.sz") >= lit(t) * col("a.sz"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
    println(s"cand rows (pre-distinct)=${cand.count()} distinct=${cand.distinct().count()}")
    spark.stop()
  }
}
