package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rollup/cube via RE-AGGREGATION (SURVEY B20) — the scale-shaped
  * plan for hierarchical aggregates over algebraic functions.
  *
  * Native `rollup`/`cube` plan an Expand that replicates EVERY INPUT
  * ROW once per grouping set — k+1 copies for a rollup, 2^k for a
  * cube — before the aggregate ever sees it. When the grouping keys
  * are low-cardinality (status/priority/flag dimensions — the usual
  * case for subtotal reports), that multiplies 100 TB of scan output
  * by 2^k to produce a handful of result rows. Algebraic aggregates
  * (sum, count, min, max) decompose — the super-aggregate IS an
  * aggregate of the finest partials — so the right plan is: aggregate
  * ONCE at the finest grain (one corpus shuffle, map-side partials),
  * then re-aggregate the group-count-sized result per coarser set.
  * Every re-aggregation here runs over the tiny base frame, so the
  * extra levels cost nothing at any scale.
  *
  * Contract:
  *  - aggregates must be re-aggregable: each `Re` carries its base
  *    aggregate AND the function that merges partials (sum→sum,
  *    count→sum, min→min, max→max). avg is NOT directly algebraic —
  *    carry sum+count and divide after.
  *  - rolled-up key positions emit NULL (native rollup's convention;
  *    coalesce to a label downstream if wanted).
  *  - key columns must be NON-NULL in the data: a null data key would
  *    be indistinguishable from a subtotal marker (the same ambiguity
  *    native rollup resolves with `grouping()`, which a re-aggregated
  *    plan cannot reconstruct after the fact). Pre-coalesce null keys.
  *  - exactness: decimal sums of decimal partials lose nothing;
  *    ReAggSpec pins equality with native rollup/cube.
  */
object ReAgg {

  /** One output aggregate: `base` computes it at the finest grain,
    * `re` merges finest-grain partials into a super-aggregate. */
  final case class Re(alias: String, base: Column, re: Column => Column)

  def sumOf(alias: String, c: Column): Re = Re(alias, sum(c), sum)
  def countAll(alias: String): Re = Re(alias, count(lit(1)), sum)
  def minOf(alias: String, c: Column): Re = Re(alias, min(c), min)
  def maxOf(alias: String, c: Column): Re = Re(alias, max(c), max)

  /** ROLLUP(keys): grouping sets = every prefix of `keys` (finest →
    * grand total), computed from one finest-grain aggregation. */
  def rollup(df: DataFrame, keys: Seq[String], aggs: Seq[Re]): DataFrame =
    fromSets(df, keys, aggs, (0 to keys.length).reverse.map(keys.take))

  /** CUBE(keys): all 2^k key subsets, same single corpus pass. */
  def cube(df: DataFrame, keys: Seq[String], aggs: Seq[Re]): DataFrame = {
    val sets = (0 until (1 << keys.length)).map(m =>
      keys.zipWithIndex.collect { case (k, i) if (m & (1 << i)) != 0 => k })
    fromSets(df, keys, aggs, sets)
  }

  /** Explicit GROUPING SETS over subsets of `keys`. */
  def groupingSets(df: DataFrame, keys: Seq[String], aggs: Seq[Re],
                   sets: Seq[Seq[String]]): DataFrame = fromSets(df, keys, aggs, sets)

  private def fromSets(df: DataFrame, keys: Seq[String], aggs: Seq[Re],
                       sets: Seq[Seq[String]]): DataFrame = {
    require(keys.nonEmpty, "ReAgg: need at least one key")
    require(aggs.nonEmpty, "ReAgg: need at least one aggregate")
    require(sets.forall(_.forall(keys.contains)),
      s"ReAgg: grouping sets must draw from $keys")
    val base = df.groupBy(keys.map(col): _*)
      .agg(aggs.head.base.as(aggs.head.alias),
        aggs.tail.map(a => a.base.as(a.alias)): _*)
    // the base frame is group-count-sized: every coarser level is a
    // trivial re-aggregation of it, never another corpus scan
    val frames = sets.map { s =>
      // the grand-total set re-aggregates under groupBy(lit(1)), NOT a
      // global agg: grouped aggregation over an empty base yields ZERO
      // rows, matching native rollup/cube on empty input (a global agg
      // would invent one all-null total row no data produced)
      val groupCols = if (s.isEmpty) Seq(lit(1)) else s.map(col)
      val lvl =
        if (s.toSet == keys.toSet) base
        else base.groupBy(groupCols: _*)
          .agg(aggs.head.re(col(aggs.head.alias)).as(aggs.head.alias),
            aggs.tail.map(a => a.re(col(a.alias)).as(a.alias)): _*)
      val keep = s.toSet
      lvl.select(keys.map(k =>
        (if (keep(k)) col(k) else lit(null).cast(base.schema(k).dataType)).as(k))
        ++ aggs.map(a => col(a.alias)): _*)
    }
    frames.reduce(_ unionByName _)
  }
}
