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
    // SPARK_GRAFT_LANEPROBE_STAGE=fingerprints isolates the lane
    // layouts' shared stage (explode → md5 → lane agg → extraction)
    // from the band join, for attributing any narrow/wide delta
    val stage = sys.env.getOrElse("SPARK_GRAFT_LANEPROBE_STAGE", "pairs")
    // Baseline arm: the r16 UNBIASED 16-accumulator narrow layout,
    // reconstructed probe-locally (it is no longer reachable through
    // SimHash — the r17 ANSI-safe bias replaced it), ANSI off for the
    // fingerprint stage so its top-lane sum cannot overflow. Only
    // meaningful with STAGE=fingerprints; answers "did the r17 bias
    // cost anything vs r16, and does wide beat the OLD narrow too?"
    def r16NarrowFingerprints(ex: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      def hexVal(h: org.apache.spark.sql.Column, idx: Int) = {
        val a = ascii(substring(h, idx, 1))
        when(a >= 97, a - 87).otherwise(a - 48)
      }
      val spreadM = (1L << 0) + (1L << 15) + (1L << 30) + (1L << 45)
      val laneMask = 0x0001000100010001L
      val hashed = ex.select(col("id"), md5(col("sh")).as("__h"))
        .select(col("id") +: (1 to 16).map(c =>
          (hexVal(col("__h"), c) * lit(spreadM)).bitwiseAND(lit(laneMask)).as(s"p$c")): _*)
      val aggs = (1 to 16).map(c => sum(col(s"p$c")).as(s"s$c")) :+ count(lit(1)).as("__n")
      def cnt(i: Int) = shiftrightunsigned(col(s"s${i / 4 + 1}"), (i % 4) * 16)
        .bitwiseAND(lit(0xFFFFL))
      val packed = (0 until 64).map { i =>
        shiftleft(shiftright(col("__n") - cnt(i) * 2, 63).bitwiseAND(lit(1L)), i)
      }.reduce(_ + _)
      hashed.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
        .select(col("id"), packed.as("sig"))
    }
    def arm(layout: String): Double = {
      val t0 = System.nanoTime()
      val docs = Tables.load(spark, sfDir, "documents")
      val df =
        if (stage == "fingerprints") {
          val ex = operators.Shingles.exploded(docs, col("doc_id"), col("text"), 3)
            .dropDuplicates("id", "sh")
          if (layout == "r16narrow") r16NarrowFingerprints(ex)
          else operators.SimHash.fingerprints(ex, "id", "sh", layout == "wide")
        } else operators.SimHash.nearDupPairs(docs, col("doc_id"), col("text"),
          n = 3, maxHamming = 3, chunks = 8, agree = 5, wideLanes = layout == "wide")
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // third arm opt-in (fingerprint stage only). Safe under ANSI on
    // this corpus: the unbiased r16 layout only overflowed near the
    // 65k-shingle bound, and no bench doc is within two decades of it
    val withBaseline = stage == "fingerprints" &&
      sys.env.get("SPARK_GRAFT_LANEPROBE_BASELINE").contains("1")
    miniCalib(); arm("narrow"); arm("wide") // warm: stamp + both arms' codegen
    if (withBaseline) arm("r16narrow")
    val rows = (1 to reps).map { _ =>
      val n = arm("narrow"); val ns = miniCalib()
      val w = arm("wide"); val ws = miniCalib()
      val (b, bs) = if (withBaseline) (arm("r16narrow"), miniCalib()) else (-1.0, -1.0)
      System.err.println(f"[laneprobe] narrow $n%.3f s (stamp $ns%.3f) " +
        f"wide $w%.3f s (stamp $ws%.3f)" +
        (if (withBaseline) f" r16narrow $b%.3f s (stamp $bs%.3f)" else ""))
      (n, ns, w, ws, b, bs)
    }
    spark.stop()
    def j(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def a(xs: Seq[Double]): String = xs.map(j).mkString("[", ",", "]")
    val (minN, minW) = (rows.map(_._1).min, rows.map(_._3).min)
    val baseJson = if (!withBaseline) "" else {
      val minB = rows.map(_._5).min
      s""""r16narrow_secs":${a(rows.map(_._5))},""" +
        s""""r16narrow_stamps":${a(rows.map(_._6))},"min_r16narrow":${j(minB)},""" +
        s""""wide_over_r16narrow":${j(minW / minB)},"""
    }
    val line =
      s"""{"sf":"$sfDir","reps":$reps,"config":"c3b ham<=3 agree=5","stage":"$stage",""" +
      s""""narrow_secs":${a(rows.map(_._1))},"narrow_stamps":${a(rows.map(_._2))},""" +
      s""""wide_secs":${a(rows.map(_._3))},"wide_stamps":${a(rows.map(_._4))},""" +
      baseJson +
      s""""min_narrow":${j(minN)},"min_wide":${j(minW)},""" +
      s""""wide_over_narrow":${j(minW / minN)}}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[laneprobe] $outPath not written: $e") }
    println(line)
  }
}
