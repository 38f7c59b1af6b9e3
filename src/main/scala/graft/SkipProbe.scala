package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Dev tool: measures whether parquet data skipping (row-group stats +
  * column-index page stats under a pushed `In` predicate) can prune a
  * band-key-clustered signature store down to an arriving batch's
  * keys — the mechanism behind the D10/C34 store-scan fix (SURVEY
  * §7.16c). Writes the SAME synthetic store in the append layout
  * (unsorted batch dirs) and the clustered layout (range-partitioned
  * + sorted by key, small pages), then probes both with a
  * batch-sized uniform key set and reports the SCAN node's output
  * rows (rows that survived parquet-level row-group/page pruning,
  * BEFORE Spark's residual filter — the direct skipping signal) and
  * wall time.
  *
  * SKIP_ROWS / SKIP_KEYS / SKIP_PAGEROWS env vars size the run.
  */
object SkipProbe {
  def main(args: Array[String]): Unit = {
    val nRows = sys.env.getOrElse("SKIP_ROWS", "10000000").toLong
    val nKeys = sys.env.getOrElse("SKIP_KEYS", "4000").toInt
    val pageRows = sys.env.getOrElse("SKIP_PAGEROWS", "2000").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // default inFilterThreshold=10: ABOVE it Spark pushes a native
      // parquet In predicate (set-based); raising it instead builds a
      // left-deep OR-of-Eq chain that stack-overflows at ~4000 values
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // store-like band table: bk = md5 hex (uniform)
    val store = spark.range(nRows)
      .select(col("id"), (col("id") % 2).cast("int").as("bi"),
        md5(concat(lit("k"), col("id"))).as("bk"))
    val dir = java.nio.file.Files.createTempDirectory("graft-skipprobe").toString

    // layout A: the current append layout — 20 unsorted batch dirs
    (0 until 20).foreach { k =>
      store.filter(col("id") % 20 === k)
        .write.mode("overwrite").parquet(s"$dir/flat/batch=$k")
    }
    // layout B: clustered — range-partitioned + sorted by bk, small pages
    store.repartitionByRange(32, col("bk"))
      .sortWithinPartitions(col("bk"))
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", pageRows.toString)
      .parquet(s"$dir/sorted")

    def du(path: String): Unit = {
      val f = new org.apache.hadoop.fs.Path(path)
      val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
      println(f"$path on disk: ${fs.getContentSummary(f).getLength / 1e6}%.1f MB")
    }
    du(s"$dir/flat"); du(s"$dir/sorted")

    // probe keys: md5s of ids that DO exist (hit path) — uniform
    def keySet(salt: Long): Seq[String] = spark.range(nKeys)
      .select(md5(concat(lit("k"), col("id") * (nRows / nKeys) + salt)))
      .collect().map(_.getString(0)).toSeq

    def scanRows(df: DataFrame): Long = {
      def find(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
        p match {
          case a: AdaptiveSparkPlanExec => find(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => find(q.plan)
          case s: FileSourceScanExec => Seq(s)
          case other => other.children.flatMap(find)
        }
      val scans = find(df.queryExecution.executedPlan)
      if (scans.isEmpty) {
        println("NO FileSourceScanExec found; plan:")
        println(df.queryExecution.executedPlan.toString.take(2000))
      }
      scans.map(_.metrics("numOutputRows").value).sum
    }

    def probe(tag: String, path: String, salt: Long): Unit = {
      val df = spark.read.parquet(path)
        .filter(col("bk").isInCollection(keySet(salt)))
        .select(sum(col("id")).as("s"), count(lit(1)).as("n"), max(col("bi")))
      val t0 = System.nanoTime()
      val r = df.collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-8s rows_out=${r.getLong(1)}%8d  scan_rows=${scanRows(df)}%10d  $sec%6.2f s")
    }

    probe("flat", s"$dir/flat", 0)      // cold-ish
    probe("sorted", s"$dir/sorted", 0)
    probe("flat", s"$dir/flat", 1)      // repeat, distinct keys
    probe("sorted", s"$dir/sorted", 1)

    // small key set + raised threshold → OR-of-Eq pushdown, which
    // parquet evaluates PER VALUE at row-group AND page level
    def probeN(tag: String, path: String, n: Int, salt: Long): Unit = {
      val ks = keySet(salt).take(n)
      val df = spark.read.parquet(path).filter(col("bk").isInCollection(ks))
        .select(sum(col("id")).as("s"), count(lit(1)).as("n"), max(col("bi")))
      val t0 = System.nanoTime()
      val r = df.collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-14s keys=$n%5d rows_out=${r.getLong(1)}%8d  scan_rows=${scanRows(df)}%10d  $sec%6.2f s")
    }
    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "2000")
    probeN("sorted/oreq", s"$dir/sorted", 200, 2)
    probeN("sorted/oreq", s"$dir/sorted", 1000, 3)
    probeN("flat/oreq", s"$dir/flat", 200, 2)
    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "10")
    probeN("sorted/nativein", s"$dir/sorted", 200, 2)

    val plan = spark.read.parquet(s"$dir/sorted")
      .filter(col("bk").isInCollection(keySet(0)))
      .queryExecution.executedPlan.toString
    println(plan.linesIterator.filter(_.contains("PushedFilters"))
      .map(_.take(300)).mkString("\n"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
