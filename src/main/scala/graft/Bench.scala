package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM so no measured query is charged JIT/startup cost:
    // one full UNMEASURED pass of the same query set at the same sf
    // dir (same plans + same AQE decisions → same generated classes),
    // then the measured pass below runs fully warm. A smaller-sf
    // warmup does NOT work — AQE picks different join strategies at
    // different sizes, so the generated code differs. Each timing
    // below is steady-state engine cost, not "who ran first pays the
    // operator family's cold codegen compile".
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    // fail fast on a mistyped filter name — BEFORE the multi-minute
    // warmup, with the unknown names spelled out
    val unknown = args.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — known: " +
        SparkEntry.queries.keySet.toSeq.sorted.mkString(", "))
    // validate the rep count BEFORE the warmup too: reps <= 0 would
    // make every rep list empty, silently reporting the -1.0 sentinel
    // for every query (indistinguishable from "all reps failed"), and
    // a typo'd value would throw a bare NumberFormatException AFTER
    // minutes of warmup already ran
    val repsRaw = sys.env.getOrElse("SPARK_GRAFT_REPS", "3")
    val reps = scala.util.Try(repsRaw.toInt).getOrElse(
      sys.error(s"SPARK_GRAFT_REPS must be an integer >= 1, got '$repsRaw'"))
    require(reps >= 1, s"SPARK_GRAFT_REPS must be >= 1, got '$repsRaw'")
    // local profiling with a name filter warms only the filtered set
    // (the driver passes no args → full warmup, unchanged)
    val warmSet = if (args.isEmpty) SparkEntry.queries
                  else args.toSeq.map(n => n -> SparkEntry.queries(n)).toMap
    warmSet.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // name-sorted so per-query timings are comparable across rounds:
    // with Map iteration order, adding one query reshuffles who pays
    // the shared cold codegen/JIT of each operator family
    // optional args = query-name filter (local profiling; driver passes none)
    // Noise robustness: the box this runs on carries unpredictable
    // external load (round-4 record: a 1.2 s query measured at 16.8 s
    // inside a load window). Each query therefore runs REPS measured
    // repetitions and records the MIN — the warmup above already
    // targets steady state, so the min IS the steady-state engine
    // cost, and one noisy minute can no longer corrupt a round's
    // record. A rep that THROWS records the -1.0 sentinel; a query
    // whose every rep fails reports -1.0 — a broken query must never
    // masquerade as a fast one.
    val results = (if (args.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
                   else args.toSeq.map(n => n -> SparkEntry.queries(n)))
      .map { case (name, fn) =>
      // noop sink: computes every output column (count() would let
      // Catalyst prune the projections) without any write cost.
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1.0
        }
      }
      val ok = times.filter(_ >= 0)
      name -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    // The harness that consumes this output captures only the LAST
    // ~2000 bytes of stdout; a 66-query line at full double precision
    // is ~3 KB, so its head — including the {"metric":…} prefix — was
    // being truncated off every round and the line never parsed.
    // Defenses, layered:
    //   1. per-query times printed at millisecond precision (min of
    //      reps ⇒ sub-ms digits are noise anyway), which fits the
    //      whole line in the capture window;
    //   2. "queries" FIRST and the headline metric/value/unit/sf
    //      LAST, so even a truncated capture still carries the
    //      summary fields (JSON object keys are unordered);
    //   3. the full-precision line also lands in
    //      target/bench_full.json for offline reading;
    //   4. the stdout line prints AFTER spark.stop(), so no shutdown
    //      logging can push it out of the capture window.
    def ms(v: Double): String =
      if (v < 0) "-1.0" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val qsFull = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"queries":$qs,"metric":"total","value":${ms(total)},"unit":"sec","sf":"$sfDir"}"""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsFull,"sf":"$sfDir"}"""
    // best-effort: the bench must still report via stdout if cwd
    // isn't writable (e.g. run from a read-only checkout)
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.write(java.nio.file.Paths.get("target/bench_full.json"),
        (full + "\n").getBytes("UTF-8"))
    } catch { case e: Exception => System.err.println(s"[bench] bench_full.json not written: $e") }
    spark.stop()
    println(line)
  }
}
