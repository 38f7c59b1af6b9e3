package graft

import org.apache.spark.sql.SparkSession

/** Minimal load probe for `tools/quiet_watch.py` (SURVEY §6 r16): the
  * same warmed min-of-3 2^28 xxhash64 calibration that `Bench`
  * brackets its records with — pure CPU across all cores, no I/O, no
  * shuffle — with no query sweep attached. On a quiet box it prints
  * ~0.066-0.080 s; external load inflates even the min. One JSON line
  * on stdout; the watch loop parses it and fires the sf0.1 record
  * pair when the box finally goes quiet. */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(): Double = {
      val t0 = System.nanoTime()
      // bit_xor, not sum: overflow-free under ANSI (Bench's reference)
      spark.range(1L << 28).selectExpr("bit_xor(xxhash64(id))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    once() // codegen warm — never charge compile cost to the probe
    val calib = (1 to 3).map(_ => once()).min
    val load =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(" ")
      catch { case _: Exception => "unavailable" }
    spark.stop()
    println(f"""{"calib":$calib%.4f,"loadavg":"$load"}""")
  }
}
