package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Narrow-vs-wide SimHash lane A/B (SURVEY §6 r17): measures what
  * `wideLanes = true` actually costs on an ordinary corpus at the
  * c3b web-scale banding configuration (ham ≤ 3, 5-of-8 combination
  * bands — fingerprinting is the shared stage, so the lane layout is
  * the only difference between the arms). The wide layout doubles
  * the aggregation state (32 accumulators vs 16); whether that is
  * "a few percent" or "2×" decides if big-doc corpora should just
  * default to wide — the scaladoc's "one extra doubling" needs a
  * number.
  *
  * Protocol (the bench-noise playbook): both arms warmed unmeasured,
  * then `SPARK_GRAFT_REPS` (default 5) INTERLEAVED measured reps
  * (narrow, wide, narrow, …) so a host-load window taints both arms
  * symmetrically instead of one; a ~45 ms pure-CPU stamp after every
  * rep marks burst-tainted reps for the stamp filter; min-of-reps
  * per arm is the headline. One JSON line to stdout and to
  * SPARK_GRAFT_LANEPROBE_OUT (default laneprobe_out.json). */
object LaneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_LANEPROBE_OUT", "laneprobe_out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def miniCalib(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 27).selectExpr("bit_xor(xxhash64(id))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def arm(wide: Boolean): Double = {
      val t0 = System.nanoTime()
      operators.SimHash.nearDupPairs(
          Tables.load(spark, sfDir, "documents"), col("doc_id"), col("text"),
          n = 3, maxHamming = 3, chunks = 8, agree = 5, wideLanes = wide)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    miniCalib(); arm(false); arm(true) // warm: stamp + both arms' codegen
    val rows = (1 to reps).map { _ =>
      val n = arm(false); val ns = miniCalib()
      val w = arm(true); val ws = miniCalib()
      System.err.println(f"[laneprobe] narrow $n%.3f s (stamp $ns%.3f) " +
        f"wide $w%.3f s (stamp $ws%.3f)")
      (n, ns, w, ws)
    }
    spark.stop()
    def j(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def a(xs: Seq[Double]): String = xs.map(j).mkString("[", ",", "]")
    val (minN, minW) = (rows.map(_._1).min, rows.map(_._3).min)
    val line =
      s"""{"sf":"$sfDir","reps":$reps,"config":"c3b ham<=3 agree=5",""" +
      s""""narrow_secs":${a(rows.map(_._1))},"narrow_stamps":${a(rows.map(_._2))},""" +
      s""""wide_secs":${a(rows.map(_._3))},"wide_stamps":${a(rows.map(_._4))},""" +
      s""""min_narrow":${j(minN)},"min_wide":${j(minW)},""" +
      s""""wide_over_narrow":${j(minW / minN)}}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[laneprobe] $outPath not written: $e") }
    println(line)
  }
}
