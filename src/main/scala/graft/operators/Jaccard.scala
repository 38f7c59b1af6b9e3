package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.MinHash.{jaccard, shingles}

/** Exact n-gram Jaccard near-duplicate join (SURVEY C4).
  *
  * Unlike MinHash (C2, probabilistic candidates), this is EXACT: every
  * pair with Jaccard ≥ t is found, via prefix filtering (PPJoin-style,
  * Xiao et al., WWW'08): order each document's shingles by a global
  * total order (their md5 hex), index only the first
  * |s| - ceil(t·|s|) + 1 of them — any pair with J ≥ t must share a
  * prefix element — then verify candidates with the true Jaccard.
  *
  * Scale: the inverted-index self-join shuffles on the prefix-shingle
  * hash only; prefix filtering keeps the candidate set near-linear for
  * realistic corpora instead of the O(n²) all-pairs join. Verification
  * joins fetch the two shingle sets by doc id (broadcast when small).
  */
object Jaccard {

  /** All pairs (doc_a < doc_b) with exact Jaccard(shingles) ≥ t,
    * thresholded on the 6-rounded score. Returns (doc_a, doc_b,
    * jaccard). */
  def nearDupPairs(docs: DataFrame, id: Column, text: Column,
                   n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(id.as("id"), shingles(text, n).as("s"))
      .filter(size(col("s")) > 0)
      // global order = md5 of the shingle (portable, skew-free)
      .withColumn("hs", array_sort(transform(col("s"), x => md5(x))))
    val prefixLen = (size(col("hs")) - ceil(lit(threshold) * size(col("hs"))) + 1).cast("int")
    val prefix = sh.select(col("id"), posexplode(slice(col("hs"), lit(1), prefixLen)).as(Seq("p", "h")))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    cand
      .join(sh.select(col("id").as("doc_a"), col("hs").as("ha")), "doc_a")
      .join(sh.select(col("id").as("doc_b"), col("hs").as("hb")), "doc_b")
      .withColumn("jaccard", jaccard(col("ha"), col("hb")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
