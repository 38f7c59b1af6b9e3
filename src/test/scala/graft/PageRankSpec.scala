package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** C51: the distributed fixed-point PageRank against an independent
  * driver-side reference of the same recurrence, plus the edge
  * contracts (dangling leak, weights, determinism across partition
  * counts). The sf-corpus numbers are pinned by the c51 oracle; this
  * suite pins the OPERATOR on graphs the fixture can't produce. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val unit = 1000000000000L

  /** The spec'd recurrence, driver-side: same floor divisions, same
    * order of operations as the operator's contract. */
  private def reference(edges: Seq[(String, String, Long)], iters: Int,
                        dampingPct: Int = 85): Map[String, Long] = {
    val ew = edges.groupBy(e => (e._1, e._2)).map { case (k, es) => k -> es.map(_._3).sum }
    val nodes = (ew.keys.map(_._1) ++ ew.keys.map(_._2)).toSet
    val deg = ew.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val n = nodes.size
    val base = (unit * (100 - dampingPct) / 100) / n
    var r = nodes.map(_ -> unit / n).toMap
    for (_ <- 1 to iters) {
      val cs = ew.toSeq.map { case ((s, d), w) => d -> (r(s) * w) / deg(s) }
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      r = nodes.map(v => v -> (base + (cs.getOrElse(v, 0L) * dampingPct) / 100)).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String, Long)], iters: Int): Map[String, Long] =
    PageRank.ranks(edges.toDF("s", "d", "w"), col("s"), col("d"), col("w"), iters)
      .as[(String, Long)].collect().toMap

  test("ranks equals the driver reference on an irregular weighted graph") {
    // hub 'a' cited by everyone, chain b->c->d, parallel-duplicate
    // edges (must sum), weight skew, and 'e' cited by nobody
    val edges = Seq(
      ("b", "a", 3L), ("c", "a", 1L), ("d", "a", 5L), ("e", "a", 1L),
      ("b", "c", 1L), ("c", "d", 2L), ("a", "b", 1L), ("a", "b", 1L))
    for (iters <- Seq(0, 1, 3)) {
      val got = run(edges, iters)
      assert(got == reference(edges, iters), s"iters=$iters")
    }
    // the hub must outrank everything; the never-cited node is floor
    val r3 = run(edges, 3)
    assert(r3("a") == r3.values.max)
    assert(r3("e") == r3.values.min)
  }

  test("dangling node leaks mass: totals shrink, never move") {
    // z has in-edges but no out-edges -> its mass exits the system
    val edges = Seq(("x", "z", 1L), ("y", "z", 1L), ("x", "y", 1L))
    val got = run(edges, 2)
    assert(got == reference(edges, 2))
    assert(got.values.sum < unit) // leaked, not redistributed
  }

  test("result is identical across partitionings (integer sums are exact)") {
    val edges = (0L until 200L).map(i =>
      (s"h${i % 13}", s"h${(i * i + 1) % 13}", 1L + i % 7))
    val df1 = edges.toDF("s", "d", "w").repartition(1)
    val df17 = edges.toDF("s", "d", "w").repartition(17)
    val a = PageRank.ranks(df1, col("s"), col("d"), col("w"), 3)
      .as[(String, Long)].collect().toMap
    val b = PageRank.ranks(df17, col("s"), col("d"), col("w"), 3)
      .as[(String, Long)].collect().toMap
    assert(a == b)
    assert(a == reference(edges, 3))
  }

  test("ranksConverged stops at a fixed point and matches the fixed-iter recurrence") {
    val edges = Seq(
      ("b", "a", 3L), ("c", "a", 1L), ("d", "a", 5L), ("e", "a", 1L),
      ("b", "c", 1L), ("c", "d", 2L), ("a", "b", 2L))
    // damping 85% contracts deltas by ~0.85/iteration from ~unit/n,
    // so tol = 5e7 units (≈5e-5 of the mass) needs ~45 iterations
    val tol = 50000000L
    val (rdf, iters) = PageRank.ranksConverged(edges.toDF("s", "d", "w"),
      col("s"), col("d"), col("w"), tolUnits = tol, maxIters = 60)
    val got = rdf.as[(String, Long)].collect().toMap
    assert(iters < 60, s"must converge before the cap, ran $iters")
    // converged result = the fixed-iteration recurrence run that long
    assert(got == reference(edges, iters), s"iters=$iters")
    // one more iteration moves nothing by more than the tolerance
    // (contraction: the post-stop delta only shrinks further)
    val next = reference(edges, iters + 1)
    assert(got.forall { case (k, v) => math.abs(next(k) - v) <= tol })
    // a tight cap stops early and honestly reports it
    val (_, capped) = PageRank.ranksConverged(edges.toDF("s", "d", "w"),
      col("s"), col("d"), col("w"), tolUnits = 1L, maxIters = 2)
    assert(capped == 2)
  }

  test("overflow contract fails loudly, not with wrapped garbage ranks") {
    // rank ≤ unit, so rank·w wraps once an aggregated edge weight
    // exceeds Long.MaxValue/unit ≈ 9.2e6 at unit=1e12 — previously a
    // SILENT wrong answer. The guard must name the contract…
    val heavy = Seq(("a", "b", 10000000L), ("b", "a", 1L))
    val err = intercept[IllegalArgumentException] { run(heavy, 2) }
    assert(err.getMessage.contains("overflow contract"))
    assert(err.getMessage.contains("unit"))
    // …catch PARALLEL edges whose aggregated sum crosses the limit…
    val split = Seq(("a", "b", 5000000L), ("a", "b", 5000000L), ("b", "a", 1L))
    intercept[IllegalArgumentException] { run(split, 2) }
    // …and the documented remedy (lower unit) must actually work
    val ok = PageRank.ranks(heavy.toDF("s", "d", "w"), col("s"), col("d"),
        col("w"), 2, unit = 1000000000L)
      .as[(String, Long)].collect().toMap
    assert(ok.values.forall(v => v >= 0 && v <= 1000000000L))
  }

  test("degenerate inputs: empty graph, single self-loop") {
    assert(run(Nil, 3).isEmpty)
    val loop = run(Seq(("solo", "solo", 2L)), 3)
    // one node keeps all its (damped) mass: base + 85% of prior rank
    assert(loop == reference(Seq(("solo", "solo", 2L)), 3))
    assert(loop("solo") > unit * 9 / 10) // converging to unit, minus floor dust
  }
}
