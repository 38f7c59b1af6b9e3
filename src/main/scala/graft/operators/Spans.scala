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
    // irrelevant to cross-doc duplication — and a per-doc distinct is
    // ROW-LOCAL, so it happens map-side inside the gram array (round
    // 18: array_distinct before the explode; the former
    // `.distinct()` paid an (id, sh) exchange + two aggregate passes
    // for work that never needed to leave the row)
    val perDoc = Shingles.explodedDistinct(df, id, text, n)
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

  /** Generation novelty (SURVEY C42): how much of a NEW corpus
    * generation is genuinely new text vs what the previous
    * generation already had — the go/no-go number for ingesting a
    * recrawl (a crawl that is 95% old spans adds storage and dedup
    * cost, not model quality). Span-level, not doc-level: a "new"
    * document stitched from old boilerplate counts as old.
    *
    * Returns one row: (n_spans_new, shared_spans, novelty_frac)
    * where the counts are DISTINCT n-token spans of the new
    * generation and novelty = 1 − shared/total (rounded 6; 1.0 for
    * an empty old generation, 0.0 novelty_frac denominator guard for
    * an unshingleable new generation).
    *
    * Shape: both generations shingle map-side (native WordNgrams),
    * dedup to distinct spans (one hash agg each), and the overlap is
    * a LEFT SEMI join on the span — never a doc × doc comparison.
    * At 100 TB the old side can be pre-aggregated once and persisted
    * (it is the same distinct-gram table C19's index uses). */
  def generationNovelty(oldGen: DataFrame, newGen: DataFrame, id: Column,
                        text: Column, n: Int = 5): DataFrame = {
    val oldSpans = Shingles.exploded(oldGen, id, text, n).select(col("sh")).distinct()
    val newSpans = Shingles.exploded(newGen, id, text, n).select(col("sh")).distinct()
    val shared = newSpans.join(oldSpans, Seq("sh"), "left_semi")
    newSpans.agg(count(lit(1)).as("n_spans_new"))
      .crossJoin(shared.agg(count(lit(1)).as("shared_spans")))
      .select(col("n_spans_new"), col("shared_spans"),
        when(col("n_spans_new") > 0,
          round(lit(1.0) - col("shared_spans").cast("double") / col("n_spans_new"), 6))
          .otherwise(lit(0.0)).as("novelty_frac"))
  }

  /** Span-removal rewrite (SURVEY C35) — the REWRITE counterpart of
    * `dupSpans`: drop every token covered by an n-token span that
    * also occurs in another document, and re-emit the surviving text
    * (Lee et al. 2022's dedup step itself, in the same cross-doc
    * k-gram formulation as C32 — not just the statistic).
    *
    * Contract: tokens are the whitespace splits of `lower(text)`
    * (python str.split semantics); the output text is those kept
    * tokens re-joined with single spaces, so it is case-folded and
    * whitespace-normalized relative to the input. A token at position
    * p is removed iff some shared span starts at i ≤ p ≤ i+n-1. Docs
    * shorter than n tokens have no spans and survive whole; null
    * text ⇒ 0 tokens, empty output.
    *
    * Shape (everything linear in corpus tokens, no per-doc quadratic
    * work): span occurrences are built map-side with start positions
    * (posexplode over the same `transform`-built gram array as
    * `Shingles.exploded`); the shared-span set is one hash agg over
    * distinct (doc, span); covered positions expand map-side from the
    * matched starts (sequence + explode, ≤ n rows per shared start)
    * and dedup on (id, p); kept tokens are a LEFT ANTI equi-join of
    * (id, p, tok) against covered — a hash join on (id, p), never a
    * scan of a per-doc covered ARRAY (an array_contains mask would be
    * O(doc_len × covered) interpreted work per doc, quadratic on
    * boilerplate-heavy corpora). Reassembly is one hash agg per doc:
    * collect_list of (p, tok) structs, array_sort (p is unique per
    * doc so struct order is total), array_join. At 100 TB every
    * exchange here is a hash shuffle keyed on span, (id, p) or id —
    * AQE-splittable, no global sort, no driver traffic.
    */
  def removeDupSpans(df: DataFrame, id: Column, text: Column, n: Int = 5): DataFrame = {
    require(n >= 1, s"span length must be >= 1, got $n")
    val toks = df.select(id.as("id"),
      coalesce(filter(split(lower(text), "\\s+"), t => t =!= ""),
        array().cast("array<string>")).as("toks"))
    // (id, i, g): every span occurrence with its 0-based start —
    // native WordNgrams (one linear pass; posexplode keeps positions)
    val grams = df.select(id.as("id"),
      posexplode(graft.plans.TextExpressions.wordNgrams(lower(text), n))
        .as(Seq("i", "g")))
    // spans in >= 2 distinct docs (same definition as dupSpans); the
    // per-doc dedup is map-side (round 18 — see dupSpans above), so
    // the count's exchange is the only shuffle on the span stream
    val shared = Shingles.explodedDistinct(df, id, text, n)
      .groupBy(col("sh")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("sh").as("g"))
    // covered token positions: expand each matched start map-side.
    // NOT deduplicated (optimization round 17): the consumer below is
    // a LEFT ANTI equi-join, whose hash build dedups keys inherently —
    // the explicit distinct() bought nothing but a partial+final
    // aggregate pair on (id, p), and its exchange is the same (id, p)
    // hash shuffle the join needs anyway. Duplicate factor is bounded
    // by n (a position is covered by at most n span starts), so the
    // shuffle grows ≤ n× in 16-byte rows while two aggregation passes
    // disappear — plan: 2 HashAggregate fewer, same exchange count.
    val covered = grams.join(shared, Seq("g"), "left_semi")
      .select(col("id"), explode(sequence(col("i"), col("i") + (n - 1))).as("p"))
    val tokpos = toks.select(col("id"), posexplode(col("toks")).as(Seq("p", "tok")))
    val kept = tokpos.join(covered, Seq("id", "p"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("kept_tokens"),
        array_join(transform(array_sort(collect_list(struct(col("p"), col("tok")))),
          s => s.getField("tok")), " ").as("kept_text"))
    toks.select(col("id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        when(col("n_tokens") > 0,
          round((col("n_tokens") - coalesce(col("kept_tokens"), lit(0L)))
            .cast("double") / col("n_tokens"), 6))
          .otherwise(lit(0.0)).as("removed_frac"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }
}
