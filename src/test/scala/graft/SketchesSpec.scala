package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Sketch aggregates (C23-C26): estimates land within each sketch's
  * documented error bound of the exact answer, and the merge path
  * (union of per-group sketches) agrees with the direct global
  * sketch — the associativity that makes them storable state at
  * 100 TB. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1 to 3000).map { i =>
    (i.toLong, s"g${i % 5}", s"key_${i % 700}", i.toDouble)
  }.toDF("id", "grp", "key", "x")

  test("HLL distinctByGroup: per-group within 2%, '*' is the sketch union") {
    val out = Sketches.distinctByGroup(docs, col("grp"), col("key"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.groupBy("grp").agg(countDistinct("key").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((g, n) <- exact)
      assert(math.abs(out(g) - n) <= math.max(2, 0.02 * n), s"group $g: ${out(g)} vs $n")
    val exactAll = docs.select(countDistinct("key")).as[Long].head()
    assert(math.abs(out("*") - exactAll) <= math.max(2, 0.02 * exactAll))
  }

  test("KLL quantilesByGroup: rank error within 2x the k=200 bound") {
    val qs = Seq(0.5, 0.9, 0.99)
    val out = Sketches.quantilesByGroup(docs, col("grp"), col("x"), qs)
    val row = out.filter(col("grp") === "*").head()
    // 3000 evenly spaced values: value v has rank v/3000. KLL k=200
    // has normalized rank error ~1.65%; allow 2x for safety.
    for ((q, i) <- qs.zipWithIndex) {
      val est = row.getDouble(i + 1)
      assert(math.abs(est / 3000.0 - q) <= 0.033, s"q=$q est=$est")
    }
    assert(out.count() === 6) // 5 groups + '*'
  }

  test("approxTopK: exact counts while distinct items fit the tracked budget") {
    val terms = docs.select(explode(split(
      concat_ws(" ", col("grp"), col("grp"), col("key")), " ")).as("term"))
    val out = Sketches.approxTopK(terms, col("term"), 5)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val exact = terms.groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(5)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.toSeq === exact.toSeq)
  }

  test("theta setOverlap: exact below the 4096-entry retention") {
    val a = docs.filter(col("id") <= 2000) // keys key_1..key_700 all present
    val b = docs.filter(col("id") > 1500)  // overlap tail
    val r = Sketches.setOverlap(a, b, col("key")).head()
    val ka = a.select("key").distinct().as[String].collect().toSet
    val kb = b.select("key").distinct().as[String].collect().toSet
    assert(r.getLong(0) === (ka ++ kb).size)
    assert(r.getLong(1) === (ka & kb).size)
    assert(r.getLong(2) === (ka -- kb).size)
    assert(r.getLong(3) === (kb -- ka).size)
  }
}
