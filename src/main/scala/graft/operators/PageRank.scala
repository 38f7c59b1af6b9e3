package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Host-graph PageRank (SURVEY C51): the crawl-quality weighting a
  * web-scale corpus pipeline runs over its HOST link graph — the
  * published recipe behind Common Crawl's host-level ranking
  * (harmonic/PageRank centrality releases) and the "domain quality"
  * prior that corpus mixers weight sampling by. The reference
  * pipeline keys everything on per-channel/link provenance
  * (pasta-pipeline `dags/processors/telegraph_processor.py:128`,
  * `db_loader.py:98`) but has no notion of cross-host endorsement;
  * this adds the standard one.
  *
  * This is the engine's second ITERATIVE graph operator (beside
  * C22's pointer-doubling components, Components.scala:53) and it
  * follows the same discipline: per-iteration `localCheckpoint` so
  * the plan stays O(1) deep instead of growing by two joins per
  * iteration, edges iterated by reference, only scalars on the
  * driver.
  *
  * Arithmetic is FIXED-POINT INTEGER on purpose: ranks live in
  * `unit` = 10^12 units as BIGINTs, every division is a floor
  * division, every product stays in long range (contract below).
  * Floating-point PageRank is not reproducible across engines or
  * even across partitionings (float addition is not associative);
  * integer sums are exact and associative, so the SAME numbers come
  * out of Spark at any parallelism and of the DuckDB oracle — the
  * engine-wide determinism discipline (SURVEY §4.1), applied to the
  * one algorithm people usually accept as "approximately equal".
  *
  * Semantics, all deterministic:
  *  - rank_0(v) = unit div N for every node (N = |nodes|);
  *  - rank_{i+1}(v) = base + (d · Σ_{(u,v,w)∈E} (rank_i(u)·w div
  *    outdeg(u))) div 100, with base = (unit·(100−d) div 100) div N
  *    and outdeg(u) = Σ w over u's out-edges — WEIGHTED PageRank
  *    (an edge with weight w is w parallel endorsements);
  *  - nodes with no out-edges leak their mass (the classic
  *    simplification; add self-loops upstream for the re-feeding
  *    variant) — leaked mass shrinks the total, it never moves.
  *
  * Scale: each iteration is ONE equi-join of the rank table (node-
  * sized — hosts, not documents) against the edge list on src plus
  * ONE aggregation by dst — the Pregel shape, no driver traffic but
  * the initial node count. Overflow contract: rank ≤ unit, so
  * rank·w needs w ≤ Long.MaxValue/unit ≈ 9·10^6 per edge; lower
  * `unit` if edge weights exceed that (hosts with 10^6+ distinct
  * linking pages at 100 TB: use unit = 10^9).
  */
object PageRank {

  /** Weighted fixed-point PageRank over `iters` iterations.
    * Input: (src, dst, weight) edge rows, weights cast to long;
    * parallel (src,dst) duplicates are summed. Returns (node,
    * rank) with rank in `unit` fixed-point units. */
  def ranks(edges: DataFrame, src: Column, dst: Column, weight: Column,
            iters: Int, dampingPct: Int = 85,
            unit: Long = 1000000000000L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    run(edges, src, dst, weight, dampingPct, unit,
      maxIters = iters, tolUnits = -1L)._1
  }

  /** `ranks` iterated TO CONVERGENCE: stop when no node's rank moved
    * by more than `tolUnits` fixed-point units in an iteration (the
    * L∞ delta — an exact integer comparison, so "converged" means
    * the same thing on every engine and partitioning), or at
    * `maxIters`. Returns (ranks, iterations run). The delta check
    * adds one driver scalar per iteration — same traffic class as
    * the iteration's own aggregation. `tolUnits` must be ≥ 1: the
    * floor arithmetic can oscillate by single units forever, so a
    * zero tolerance may never terminate. */
  def ranksConverged(edges: DataFrame, src: Column, dst: Column, weight: Column,
                     tolUnits: Long, maxIters: Int = 50, dampingPct: Int = 85,
                     unit: Long = 1000000000000L): (DataFrame, Int) = {
    require(tolUnits >= 1, s"tolUnits must be >= 1, got $tolUnits")
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    run(edges, src, dst, weight, dampingPct, unit, maxIters, tolUnits)
  }

  private def run(edges: DataFrame, src: Column, dst: Column, weight: Column,
                  dampingPct: Int, unit: Long, maxIters: Int,
                  tolUnits: Long): (DataFrame, Int) = {
    require(dampingPct >= 0 && dampingPct <= 100, s"dampingPct in [0,100], got $dampingPct")
    val e = edges.select(src.as("src"), dst.as("dst"), weight.cast("long").as("w"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    if (n == 0) return (nodes.withColumn("rank", lit(0L)), 0)
    // Overflow guard for the documented contract (object doc): rank ≤
    // unit, so rank·w stays in long range only while every aggregated
    // edge weight w ≤ Long.MaxValue/unit. Silent wrap would produce
    // garbage ranks with no error — the one undetected-wrong-answer
    // path this operator had; the check is one driver scalar in the
    // same traffic class as n above. Callers with heavier edges lower
    // `unit` (the error says so).
    val maxW = e.agg(max(col("w"))).head().getLong(0)
    require(maxW <= Long.MaxValue / unit,
      s"PageRank overflow contract: max aggregated edge weight $maxW exceeds " +
        s"Long.MaxValue/unit = ${Long.MaxValue / unit} (unit=$unit); rank*w " +
        "would wrap. Lower `unit` (e.g. 1e9) or pre-scale edge weights.")
    // outdeg rides the edge row so each iteration's contribution is
    // one projection after the rank join — no second join per step
    val deg = e.groupBy(col("src")).agg(sum(col("w")).as("deg"))
    val ew = e.join(deg, "src").localCheckpoint(true)
    val base = (unit * (100 - dampingPct) / 100) / n // scala long div = floor for positives
    var r = nodes.withColumn("rank", lit(unit / n))
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val contrib = ew.join(r, ew("src") === r("node"))
        .select(col("dst").as("node"),
          expr("(rank * w) div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("cs"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"(coalesce(cs, 0L) * $dampingPct) div 100")).as("rank"))
        .localCheckpoint(true)
      if (tolUnits >= 0) {
        // L∞ delta as a driver scalar; exact integers, so the stop
        // decision is identical on every engine and partitioning
        val delta = next.join(r.withColumnRenamed("rank", "prev"), "node")
          .agg(max(abs(col("rank") - col("prev")))).head().getLong(0)
        converged = delta <= tolUnits
      }
      r = next
      it += 1
    }
    (r, it)
  }
}
