package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.sources.Sink

/** E12 z-ordered parquet layout: the write-side data-skipping story.
  *
  * The claim under test is the whole point of a Z-curve: ONE layout
  * that prunes scans for selective predicates on EVERY z-column
  * independently, where a linear sort only ever helps its leading
  * column. "Prunes" is measured, not inferred: the scan node's
  * numOutputRows after an action counts rows the parquet reader
  * actually surfaced, i.e. what survived row-group/page min-max
  * skipping — NOT the post-filter result (the residual filter runs in
  * a separate FilterExec above the scan).
  */
class ZOrderSpec extends SparkSpec {

  /** rows the parquet reader actually produced (post stats-skipping,
    * pre residual filter). */
  private def rowsScanned(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
      .sum
  }

  test("z-ordered write prunes row groups for predicates on each column") {
    // 65536 points on a 256x256 grid — every (x, y) combination once,
    // so neither column is correlated with the other
    val n = 1 << 16
    val grid = spark.range(n)
      .select((col("id") % 256).as("x"), (col("id") / 256).as("y"))
    val base = Files.createTempDirectory("graft-zorder").toString
    Sink.writeZOrdered(grid, s"$base/z", Seq("x", "y"), nFiles = 64)

    // selective predicate on EACH column independently: the z layout
    // must let parquet stats skip most row groups both times.
    // Threshold math: 64 files ≈ the top-6 z bits (y,x,y,x,y,x); x<16
    // zeroes three of the x bits → 8/64 blocks = n/8 ideal. Range
    // boundaries come from SAMPLING (seeded by RDD id — run-order
    // dependent), so each of the 8 selected blocks can straddle one
    // boundary: worst case 16 files = n/4. Assert n/3: above the
    // worst case, far below the linear layout's no-pruning ~n.
    val zx = rowsScanned(spark.read.parquet(s"$base/z").filter(col("x") < 16))
    val zy = rowsScanned(spark.read.parquet(s"$base/z").filter(col("y") < 16))
    assert(zx <= n / 3, s"x-predicate scanned $zx of $n rows — no pruning on x")
    assert(zy <= n / 3, s"y-predicate scanned $zy of $n rows — no pruning on y")

    // results are still exact (layout must never change answers)
    assert(spark.read.parquet(s"$base/z").filter(col("x") < 16).count() == 16L * 256)
    assert(spark.read.parquet(s"$base/z").filter(col("y") < 16).count() == 16L * 256)
    // and the helper column never reaches the files
    assert(!spark.read.parquet(s"$base/z").columns.contains("__z"))

    // contrast: a linear sort on x cannot prune y — pinning that the
    // assertion above is measuring layout, not reader magic
    grid.repartitionByRange(64, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$base/linear")
    val lx = rowsScanned(spark.read.parquet(s"$base/linear").filter(col("x") < 16))
    val ly = rowsScanned(spark.read.parquet(s"$base/linear").filter(col("y") < 16))
    assert(lx <= n / 3, s"sanity: linear layout should prune its own sort column, scanned $lx")
    assert(ly > n / 2, s"contrast broken: linear layout pruned y ($ly of $n) — metric is vacuous")
  }

  import spark.implicits._

  test("string z-column: layout prunes on the string AND the numeric column") {
    // host-like strings: 64 distinct "h000".."h063" × 1024 values
    val n = 1 << 16
    val data = spark.range(n).select(
      format_string("h%03d", col("id") % 64).as("host"),
      (col("id") / 64).as("v"))
    val base = Files.createTempDirectory("graft-zorder-str").toString
    Sink.writeZOrdered(data, s"$base/z", Seq("host", "v"), nFiles = 64)
    // equality on the string column and range on the numeric both prune
    val sh = rowsScanned(spark.read.parquet(s"$base/z")
      .filter(col("host") === "h007"))
    val sv = rowsScanned(spark.read.parquet(s"$base/z").filter(col("v") < 64))
    assert(sh <= n / 3, s"host-predicate scanned $sh of $n rows — no pruning on the string column")
    assert(sv <= n / 3, s"v-predicate scanned $sv of $n rows — no pruning on v")
    // exactness unchanged
    assert(spark.read.parquet(s"$base/z").filter(col("host") === "h007").count() == n / 64)
    assert(spark.read.parquet(s"$base/z").filter(col("v") < 64).count() == 64L * 64)
  }

  test("string order key preserves lexicographic order across lengths") {
    // "z" > "abc" lexicographically — the zero-padding case; plus
    // prefix pairs, empties, and multibyte UTF-8
    val strs = Seq("", "a", "ab", "abc", "abd", "z", "za", "ñ", "é", "hello!!", "hello!!!")
    val df = strs.toDF("s").withColumn("d", lit(0))
    val keyed = df.select(col("s"),
        Sink.zValue(df, Seq("s", "d"), bits = 20).as("z"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // z here is driven by s alone (d constant): z order must follow
    // (7-byte-prefix) string order
    val sorted = strs.sorted
    sorted.sliding(2).foreach {
      case Seq(a, b) =>
        assert(keyed(a) <= keyed(b), s"'$a' vs '$b': ${keyed(a)} > ${keyed(b)}")
      case _ =>
    }
    // beyond-prefix strings share a key (documented clustering contract)
    assert(keyed("hello!!") == keyed("hello!!!"))
  }

  test("zValue interleaves bits: locality beats either column alone") {
    // neighbors in (x, y) must be near each other in z — the property
    // that makes each output file a small rectangle in all dimensions
    val pts = spark.range(1 << 10)
      .select((col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))
    val z = pts.select(col("x"), col("y"), Sink.zValue(pts, Seq("x", "y"), bits = 5).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // adjacent cells differ in few low bits → bounded z distance
    assert(math.abs(z((3L, 4L)) - z((4L, 4L))) < (1L << 6))
    assert(math.abs(z((3L, 4L)) - z((3L, 5L))) < (1L << 6))
    // and distinct points get distinct z (bijective on the grid)
    assert(z.values.toSet.size == z.size)
  }
}
