package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join prefilters (SURVEY E10) — the manual form of
  * Spark's own runtime row-level filtering, for when the planner
  * can't inject it (imperative pipelines, anti-joins, reused
  * sketches).
  *
  * The pattern at 100 TB: the expensive side of a join shuffles ALL
  * its rows just to discover most don't match. A Bloom sketch of the
  * small side's keys (built by `bloom_filter_agg`, the same
  * BloomFilterImpl Spark's runtime filters use) drops definite
  * non-matches MAP-SIDE, before the exchange, at ~1.2 MB per million
  * keys (fpp 1%). False positives only ever ADD candidate rows, and
  * the exact join still runs on what remains — results are
  * bit-identical to the unfiltered plan; the sketch only decides how
  * much work reaches the shuffle.
  *
  * The sketch travels as a plan literal (model-sized, like the
  * IVF/PQ codebooks): fine for the benchmark-/dimension-sized right
  * sides this targets (≤ tens of MB); beyond that, use Spark's own
  * broadcast-join runtime filters.
  */
object Bloom {

  /** numBits for a target false-positive rate (standard optimum
    * m = −n·ln(p)/ln²2). */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, "fpp in (0,1)")
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** Serialized Bloom filter of `key` over `df` (one aggregate; null
    * when `df` is empty). Keys are xxhash64-folded exactly as
    * `mightContain` probes them. */
  def sketchBytes(df: DataFrame, key: Column, expectedItems: Long,
                  fpp: Double = 0.01): Array[Byte] = {
    // BloomFilterAggregate is Spark-internal (the planner injects it
    // for runtime filters; it has no SQL name) — built directly, the
    // same way the injected filter builds it
    val agg = new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      Bridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(optimalNumBits(expectedItems, fpp)))
    val row = df.agg(Bridge.column(agg.toAggregateExpression()).as("bf")).head()
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe against a sketch from `sketchBytes`.
    * False positives possible; false negatives never. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType), Bridge.expression(xxhash64(key))))

  /** EXACT left anti join with a Bloom fast path: rows whose key is
    * definitely absent from `right` pass map-side without touching
    * the join; only might-match rows (matches + fpp·|left|) reach the
    * exact anti join. Output equals a plain left-anti join. */
  def prefilterAntiJoin(left: DataFrame, leftKey: Column,
                        right: DataFrame, rightKey: Column,
                        expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = sketchBytes(right, rightKey, expectedItems, fpp)
    if (bf == null) return left // empty right: anti join keeps all
    val clear = left.filter(!mightContain(bf, leftKey))
    val maybe = left.filter(mightContain(bf, leftKey))
      .join(right.select(rightKey.as("__bloom_k")).distinct(),
        leftKey === col("__bloom_k"), "left_anti")
    clear.unionByName(maybe)
  }

  /** EXACT inner-join prefilter: `left` reduced to rows whose key
    * might appear in `right` — feed this to the exact join; dropped
    * rows are guaranteed non-matches. */
  def prefilterFor(left: DataFrame, leftKey: Column,
                   right: DataFrame, rightKey: Column,
                   expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = sketchBytes(right, rightKey, expectedItems, fpp)
    if (bf == null) left.limit(0) // empty right: nothing can match
    else left.filter(mightContain(bf, leftKey))
  }
}
