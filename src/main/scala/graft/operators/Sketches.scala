package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable DataSketches aggregates (SURVEY C23-C26) — the 100 TB
  * dashboard story. Exact distinct counts, quantiles, heavy hitters
  * and set overlaps all need a full shuffle of the raw keys; at scale
  * the winning pattern is a SKETCH COLUMN: fixed-size, mergeable
  * state that partial-aggregates map-side, unions associatively
  * across partitions / days / tables, and can be STORED next to the
  * data it summarizes (re-aggregating yesterday's corpus costs a
  * sketch union, not a re-scan). Error is bounded and documented per
  * sketch: HLL ≈ ±1.6% at lgK=12, theta exact below its 4096-entry
  * retention then ±~1.6%, KLL rank error ≈ ±1.65% at k=200.
  *
  * These wrap Spark 4's native DataSketches expressions (codegen'd,
  * no UDFs): the estimates Spark computes are the same bytes the
  * DataSketches library would produce, so sketches written by graft
  * can be merged by any DataSketches-speaking engine (Druid, Hive,
  * Trino, Pinot) and vice versa — the binary IS the interchange
  * format.
  *
  * Reference tie-in: the cleanup-DAG statistics dashboard
  * (duplicate_remover.py:246-278) recomputes COUNT(DISTINCT …) over
  * the whole table nightly; `distinctByGroup` + a stored sketch per
  * batch turns that into an O(batches) union.
  */
object Sketches {

  /** Per-group HLL distinct-count estimates plus a '*' grand-total
    * row computed by UNIONING the per-group sketches — demonstrating
    * the merge path (the total never re-reads the input, and the same
    * union would work across stored daily sketches). One shuffle on
    * the group key; the rollup moves only k-byte sketch blobs. */
  def distinctByGroup(df: DataFrame, group: Column, key: Column,
                      lgK: Int = 12): DataFrame = {
    val sk = df.groupBy(group.as("grp"))
      .agg(hll_sketch_agg(key, lit(lgK)).as("sk"))
    val per = sk.select(col("grp"),
      hll_sketch_estimate(col("sk")).as("n_distinct"))
    val total = sk.agg(hll_union_agg(col("sk"), lit(false)).as("u"))
      .select(lit("*").as("grp"), hll_sketch_estimate(col("u")).as("n_distinct"))
    per.unionByName(total)
  }

  /** Per-group KLL quantile estimates plus a '*' row from MERGING the
    * per-group sketches (`kll_merge_agg_double`) — the mergeable twin
    * of exact `percentile` (B10) and of `approx_percentile` (B11),
    * with the extra property B11's GK summaries lack: the state is a
    * first-class column that can be stored and re-merged later. */
  def quantilesByGroup(df: DataFrame, group: Column, value: Column,
                       qs: Seq[Double], k: Int = 200): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    val sk = df.groupBy(group.as("grp"))
      .agg(kll_sketch_agg_double(value, lit(k)).as("sk"))
    def est(s: Column): Seq[Column] = qs.zipWithIndex.map { case (q, i) =>
      kll_sketch_get_quantile_double(s, lit(q)).as(s"q$i")
    }
    val per = sk.select(col("grp") +: est(col("sk")): _*)
    val total = sk.agg(kll_merge_agg_double(col("sk")).as("m"))
      .select(lit("*").as("grp") +: est(col("m")): _*)
    per.unionByName(total)
  }

  /** Approximate heavy hitters via the mergeable approx_top_k state:
    * per-shard ACCUMULATE (map-side partials), COMBINE into one
    * state, ESTIMATE the top `k` — (item, est_count) ranked. Exact
    * while distinct items ≤ `maxTracked` (then a documented
    * frequent-items overestimate), constant memory regardless of
    * cardinality — B7's exact term count at 100 TB would shuffle
    * every distinct term; this ships one `maxTracked`-entry state per
    * partition. */
  def approxTopK(df: DataFrame, item: Column, k: Int,
                 maxTracked: Int = 10000): DataFrame = {
    val state = df.agg(
      call_function("approx_top_k_accumulate", item, lit(maxTracked)).as("st"))
      .agg(call_function("approx_top_k_combine", col("st")).as("st"))
    state.select(explode(
        call_function("approx_top_k_estimate", col("st"), lit(k))).as("e"))
      .select(col("e.item").as("term"), col("e.count").as("cnt_est"))
      .orderBy(col("cnt_est").desc, col("term"))
  }

  /** Theta-sketch set algebra between two keyed row sets: estimates
    * of |A∪B|, |A∩B|, |A∖B|, |B∖A| from two single-pass sketches —
    * the sketch twin of decontamination (C19): at 100 TB, "how much
    * of the training split collides with eval" is a theta
    * intersection, not an n-gram join. Exact below the sketch's 4096
    * retained entries, ±~1.6% beyond. */
  def setOverlap(a: DataFrame, b: DataFrame, key: Column): DataFrame = {
    val sa = a.agg(theta_sketch_agg(key).as("ska"))
    val sb = b.agg(theta_sketch_agg(key).as("skb"))
    sa.crossJoin(sb).select(
      theta_sketch_estimate(theta_union(col("ska"), col("skb"))).as("n_union"),
      theta_sketch_estimate(theta_intersection(col("ska"), col("skb"))).as("n_common"),
      theta_sketch_estimate(theta_difference(col("ska"), col("skb"))).as("n_only_a"),
      theta_sketch_estimate(theta_difference(col("skb"), col("ska"))).as("n_only_b"))
  }
}
