package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (round 17): INTERLEAVED A/B of a session conf over the
  * bench queries — the box carries unpredictable external load, so
  * sequential A-then-B runs confound arm with load window. This runs
  * A,B,A,B,... per query (REPS pairs after one warm pass per arm) and
  * reports per-arm min and the pairwise median ratio, which cancels
  * any load window longer than one rep.
  *
  * args: <confKey> <valueA> <valueB> <query names...>
  * env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, AB_REPS (default 3)
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: AbProbe <confKey> <valA> <valB> <queries...>")
    val (key, valA, valB) = (args(0), args(1), args(2))
    val names = args.drop(3).toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("AB_REPS", "3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "1"))
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    var totA = 0.0; var totB = 0.0
    for (q <- names) {
      spark.conf.set(key, valA); try once(q) catch { case _: Throwable => () } // warm A
      spark.conf.set(key, valB); try once(q) catch { case _: Throwable => () } // warm B
      val pairs = (1 to reps).map { _ =>
        spark.conf.set(key, valA); val a = once(q)
        spark.conf.set(key, valB); val b = once(q)
        (a, b)
      }
      val aMin = pairs.map(_._1).min; val bMin = pairs.map(_._2).min
      val ratios = pairs.map(p => p._2 / p._1).sorted
      val medR = ratios(ratios.size / 2)
      totA += aMin; totB += bMin
      println(f"$q%-32s A=$aMin%6.3f B=$bMin%6.3f minRatio=${bMin / aMin}%5.2f medPairRatio=$medR%5.2f")
    }
    println(f"TOTALMIN A=$totA%7.2f B=$totB%7.2f ratio=${totB / totA}%5.3f")
    spark.stop()
  }
}
