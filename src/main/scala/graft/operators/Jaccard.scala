package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard near-duplicate join (SURVEY C4).
  *
  * Unlike MinHash (C2, probabilistic candidates), this is EXACT: every
  * pair with Jaccard ≥ t is found. The inverted-index formulation
  * computes |A ∩ B| directly: index (shingle-hash → doc), self-join on
  * the hash, count shared shingles per pair — no shingle-set arrays
  * are ever shuffled, every operator is a codegen'd join/aggregate.
  * |A ∪ B| then follows from per-doc set sizes, which travel as one
  * int per row.
  *
  * Scale: the only heavy shuffle is the index self-join on the
  * shingle hash; size-compatibility (J ≥ t ⟹ t·|B| ≤ |A| ≤ |B|/t)
  * prunes pairs in the join itself, and map-side partial counts
  * collapse the pair stream before the (doc_a, doc_b) exchange. For
  * heavy-tailed corpora, drop ubiquitous shingles first (their
  * candidate fan-out is quadratic and they never decide J at
  * realistic thresholds) — the classic stop-shingle cut.
  */
object Jaccard {

  /** All pairs (doc_a < doc_b) with exact Jaccard(shingles) ≥ t,
    * thresholded on the 6-rounded score. Returns (doc_a, doc_b,
    * jaccard). */
  def nearDupPairs(docs: DataFrame, id: Column, text: Column,
                   n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // distinct (id, shingle-hash) index; the dedup and the size count
    // both ride the exploded shuffle's id-partitioning
    val index = Shingles.exploded(docs, id, text, n)
      .select(col("id"), md5(col("sh")).as("h"))
      .dropDuplicates("id", "h")
    val sizes = index.groupBy(col("id")).agg(count(lit(1)).cast("int").as("sz"))
    val indexed = index.join(sizes, "id")
    val inter = indexed.as("a").join(indexed.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
          col("a.sz") >= lit(threshold) * col("b.sz") &&
          col("b.sz") >= lit(threshold) * col("a.sz"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        col("a.sz").as("sza"), col("b.sz").as("szb"))
      .agg(count(lit(1)).cast("int").as("cnt"))
    inter
      .withColumn("jaccard",
        round(col("cnt").cast("double") / (col("sza") + col("szb") - col("cnt")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
