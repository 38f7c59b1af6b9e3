package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.ArrayExpressions

/** Exact n-gram Jaccard near-duplicate join (SURVEY C4).
  *
  * Unlike MinHash (C2, probabilistic candidates), this is EXACT: every
  * pair with Jaccard ≥ t is found. Candidate generation uses the
  * classic exactness-preserving PREFIX FILTER (Chaudhuri et al.
  * SSJoin / Bayardo AllPairs): with every doc's shingle-hash set
  * sorted in the global xxhash64 order (any fixed total order
  * preserves the filter's exactness), only the first
  * |S| − ⌈t·|S|⌉ + 1 hashes are indexed as candidate generators. For
  * any pair with J ≥ t the overlap is ≥ ⌈t·|S|⌉ on both sides, so the
  * two prefixes must share a hash — no qualifying pair is missed,
  * while the index (and its self-join fan-out) shrinks by
  * ~(t/(1+t))²·4 vs indexing every shingle. The prefix is SLICED from
  * the already-sorted set array — no ranking window, no extra pass.
  *
  * Verification is a merge-scan |A ∩ B| over the per-doc sorted hash
  * arrays via the native codegen `SortedIntersectSize` (E2) — one
  * O(|A|+|B|) pass per candidate, no per-pair set allocation.
  *
  * Execution shape: ONE aggregation exchange builds the sorted sets;
  * the prefix explode is map-side on top of it; the prefix self-join
  * shuffles only (hash, id, sz) rows and its two sides collapse into
  * a ReusedExchange; size-compatibility (J ≥ t ⟹ t·|B| ≤ |A| ≤
  * |B|/t) prunes inside the join condition. The verify joins carry NO
  * broadcast hint: the set table is O(corpus), and a forced broadcast
  * is an OOM at scale (measured: the 100× ScaleGen corpus killed the
  * job at 500k docs). AQE broadcasts it when it is ACTUALLY small at
  * runtime and shuffles on the doc id otherwise; pre-bucketed corpora
  * (Sink.writeBucketed) keep the verify joins exchange-free.
  */
object Jaccard {

  /** All pairs (doc_a < doc_b) with exact Jaccard(shingles) ≥ t,
    * thresholded on the 6-rounded score. Returns (doc_a, doc_b,
    * jaccard). */
  def nearDupPairs(docs: DataFrame, id: Column, text: Column,
                   n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // per-doc ASC-sorted distinct hash array + size, in one exchange
    // (map-side partial collect_set collapses duplicate shingles).
    // xxhash64 longs, not md5 hex strings: the verify joins below
    // ship one array per candidate pair, so element width IS the
    // operator's shuffle volume (see Shingles.hashSets).
    val sets = Shingles.hashSets(Shingles.exploded(docs, id, text, n))
      .select(col("id"), col("s").as("hs"), size(col("s")).as("sz"))
    // prefix index: first sz − ⌈t·sz⌉ + 1 hashes of the sorted set,
    // with each hash's position for the PPJoin positional filter
    val plen = (col("sz") - ceil(lit(threshold) * col("sz")).cast("int") + 1)
    val prefix = sets.select(col("id"), col("sz"),
      posexplode(slice(col("hs"), lit(1), plen)).as(Seq("pos", "h")))
    // positional filter (PPJoin): at the FIRST common hash, overlap
    // ≤ min of the remaining suffix lengths, which must reach the
    // J ≥ t overlap bound t·(|A|+|B|)/(1+t). Later common hashes may
    // fail the test, but the first always passes for a qualifying
    // pair, and distinct() keeps a pair if ANY instance survived.
    // (−1e-9: the real-valued bound must never round up past an
    // integer overlap that exactly meets it.)
    val alpha = lit(threshold / (1 + threshold)) * (col("a.sz") + col("b.sz")) - lit(1e-9)
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
          col("a.sz") >= lit(threshold) * col("b.sz") &&
          col("b.sz") >= lit(threshold) * col("a.sz") &&
          least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos")) >= alpha)
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    val inter = ArrayExpressions.sortedIntersectSize(col("ha"), col("hb"))
    // SHUFFLE_HASH, not sort-merge: SMJ would SORT the set table —
    // including the multi-KB hash arrays — on every verify join,
    // spill-bound at scale (measured 70× sf1's time for 10× its data
    // on the 100× corpus); a hash build per partition never sorts the
    // array payload. AQE still turns these into broadcasts when the
    // set table is runtime-small.
    cand
      .join(sets.select(col("id").as("doc_a"), col("hs").as("ha"), col("sz").as("sza"))
        .hint("shuffle_hash"), "doc_a")
      .join(sets.select(col("id").as("doc_b"), col("hs").as("hb"), col("sz").as("szb"))
        .hint("shuffle_hash"), "doc_b")
      .withColumn("jaccard",
        round(inter.cast("double") / (col("sza") + col("szb") - inter), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
