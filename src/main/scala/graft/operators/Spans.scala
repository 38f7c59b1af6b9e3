package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicated-span statistics (SURVEY C32): for every document, how
  * many of its distinct consecutive n-token spans also occur in at
  * least one OTHER document — the corpus-wide exact-substring overlap
  * measure behind "train on deduplicated spans" (Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better", ACL
  * 2022 — the k-gram formulation, not the suffix-array one: a
  * suffix array is a single-machine index, while k-gram counting is
  * one hash aggregation).
  *
  * Distinct from the rest of the dedup family: C1-C5 decide WHICH
  * DOCUMENTS are near-copies, C19/C29 count collisions against a
  * designated eval split — this scores span-level copying against the
  * WHOLE corpus, the signal used to cut boilerplate and templated
  * text that document-level dedup can't see.
  *
  * Shape: spans are built map-side per document (`Shingles.exploded`
  * — array HOFs, no token shuffle), de-duplicated per (doc, span),
  * counted per span, and joined back to per-doc stats. All exchanges
  * are hash equi-shuffles on (id, span) or span; the span-count
  * aggregate partials map-side, and a hot span (boilerplate header in
  * a million docs) skews only the count aggregate, which AQE splits.
  * Nothing is quadratic: the join back moves one row per DISTINCT
  * (doc, span), never per occurrence pair.
  */
object Spans {

  /** (id, n_spans, dup_spans, dup_frac): per document, its distinct
    * n-token spans, how many of those appear in ≥ 2 distinct docs,
    * and the ratio (rounded 6, 0.0 for span-less short docs — same
    * short-doc contract as `Shingles.exploded`). */
  def dupSpans(df: DataFrame, id: Column, text: Column, n: Int = 5): DataFrame = {
    // distinct (doc, span): occurrence multiplicity within one doc is
    // irrelevant to cross-doc duplication, and dropping it map-side
    // (partial-agg distinct) is what keeps the span shuffle linear in
    // distinct spans, not corpus tokens
    val perDoc = Shingles.exploded(df, id, text, n).distinct()
    // after the distinct, count(*) per span IS its distinct-doc count
    val docsPerSpan = perDoc.groupBy(col("sh")).agg(count(lit(1)).as("ndocs"))
    val stats = perDoc
      .join(docsPerSpan.filter(col("ndocs") >= 2), Seq("sh"), "left")
      .groupBy(col("id"))
      // count(ndocs) counts non-null = spans shared with another doc
      .agg(count(lit(1)).as("n_spans"), count(col("ndocs")).as("dup_spans"))
    df.select(id.as("id")).join(stats, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        when(coalesce(col("n_spans"), lit(0L)) > 0,
          round(col("dup_spans").cast("double") / col("n_spans"), 6))
          .otherwise(lit(0.0)).as("dup_frac"))
  }
}
