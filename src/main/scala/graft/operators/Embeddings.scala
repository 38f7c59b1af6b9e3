package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-free document embeddings by hashed random projection
  * (SURVEY C53) — the feature-hashing construction (Weinberger et
  * al. 2009) composed with a ±1 random projection (Achlioptas 2003):
  * emb_j(doc) = Σ_occurrences sign(tok, j), L2-normalized. This is
  * the CONTINUOUS cousin of SimHash — C3's fingerprint is exactly
  * the sign bits of this projection — and it closes the loop for the
  * embedding operators: when no neural encoder is available, C53
  * manufactures the `Array[Double]` column that C5 pair dedup, C36
  * SemDeDup and C50 semantic decontamination consume. Cosine on
  * these vectors estimates token-distribution similarity (the JL
  * lemma bounds the distortion), which is what cheap corpus-level
  * clustering and near-dup triage need.
  *
  * Portability (§4.1): the projection matrix is md5-derived — sign
  * (tok, j) = ±1 from bit (j mod 4) of hex char (j div 4 + 1) of
  * md5(tok), the SAME bit-extraction SimHash ships — so any engine
  * rebuilds the identical matrix; per-dim sums are exact integers,
  * and only the final normalize divides (each element rounded 6).
  *
  * Scale: one md5 per token OCCURRENCE (a map-side projection in the
  * scan stage), `dims` integer sums per doc in ONE hash aggregation
  * — the one corpus shuffle, on the doc id. The vector never
  * materializes per occurrence; the aggregation state is `dims`
  * longs. Zero-norm docs (no tokens) return a NULL embedding, the
  * engine-wide zero-norm contract, with n_toks = 0 preserved.
  */
object Embeddings {

  /** 0-15 value of the 1-based `idx`-th hex char of md5 string `h`
    * (SimHash's portable hex arithmetic). */
  private def hexVal(h: Column, idx: Int): Column = {
    val a = ascii(substring(h, idx, 1))
    when(a >= 97, a - 87).otherwise(a - 48)
  }

  /** Per-document token-occurrence capacity of the 32-bit counter
    * lanes below: the largest n with n·(2³² + 1) < 2⁶³, so the ANSI
    * lane sums are provably overflow-free inside the bound (the same
    * arithmetic as SimHash.MaxWideLaneShingles — a beyond-2³¹-token
    * "document" is a corpus, and is refused loudly rather than
    * silently wrapped). */
  val MaxLaneTokens: Long = (1L << 31) - 1

  /** (id, n_toks, emb): `dims`-dimensional L2-normalized hashed
    * random projection of the word-unigram bag (with multiplicity).
    * dims ≤ 64 (16 hex chars × 4 bits of one md5).
    *
    * Aggregation layout (optimization round 17, guide §4 expression
    * cost / §2.3 narrower shuffle): the per-dim ±1 sums ride 32-bit
    * COUNTER LANES, two per long — SimHash's wide-lane
    * multiply-and-mask spread ((v&3)·(1+2³¹) masked to bits 0/32
    * lands bits 0-1 of each md5 hex char in two lanes; bits 2-3
    * likewise) — so `dims` signed sums need only ⌈dims/4⌉·2
    * accumulators plus the token count instead of one sum per dim.
    * sign_j = 2·bit_j − 1 summed over occurrences equals
    * 2·ones_j − n exactly, so the reported embedding is
    * BIT-IDENTICAL to the one-sum-per-dim form (EmbeddingsSpec pins
    * the parity; the DuckDB oracle pins c53 end to end). For the
    * dims = 16 production shape this quarters the aggregate state
    * (17 → 9 longs), halves the per-row expression work (two hex-char
    * extractions per char instead of four CASE-over-substring bit
    * probes), and shrinks the generated aggregate code ~4× —
    * measured 1.54 → 1.0 s on the c53 bench row (sf0.1). Lane sums
    * are ANSI-safe to `MaxLaneTokens` occurrences per doc and REFUSE
    * loudly past it (raise_error with the doc id), where the old
    * layout silently kept going to 2⁶³ — that bound is a corpus, not
    * a document. */
  def project(docs: DataFrame, id: Column, text: Column, dims: Int = 16): DataFrame = {
    require(dims >= 1 && dims <= 64, s"dims must be in [1,64], got $dims")
    val hashed = docs
      .select(id.as("id"),
        explode_outer(graft.plans.TextExpressions.wordNgrams(lower(text), 1)).as("tok"))
      .select(col("id"), md5(col("tok")).as("h"))
    // two 32-bit lanes per long: (v & 3)·spread lands bit 0 of the hex
    // char at position 0 and bit 1 at position 32; (v >> 2) likewise
    // for bits 2-3 — one multiply-and-mask per pair of dims, no
    // per-bit CASE, and the ±1 signs are recovered exactly from the
    // lane ones-counts at the end (2·ones − n)
    val spreadW = 1L + (1L << 31)
    val laneMaskW = 0x0000000100000001L
    val nChars = (dims + 3) / 4
    val packs = (1 to nChars).flatMap { c =>
      val v = hexVal(col("h"), c)
      Seq(
        when(col("h").isNull, lit(0L))
          .otherwise((v.bitwiseAND(lit(3)) * lit(spreadW)).bitwiseAND(lit(laneMaskW)))
          .as(s"p${c}a"),
        when(col("h").isNull, lit(0L))
          .otherwise((shiftright(v, 2) * lit(spreadW)).bitwiseAND(lit(laneMaskW)))
          .as(s"p${c}b"))
    }
    // h rides into the aggregation input solely for count(h): the
    // pack columns are 0 (not null) on the explode_outer null row so
    // the sums stay 0 for token-less docs, which means they cannot
    // also carry the occurrence count
    val packed = hashed.select(col("id") +: col("h") +: packs: _*)
    // Lane extraction lives in the aggregate's RESULT expressions, so
    // the aggregation's OUTPUT columns s0..s{dims-1} are plain
    // attributes downstream (Spark dedups the aggregate functions:
    // the 2*ceil(dims/4) lane sums + 1 count back all dims results).
    // Two rejected shapes, both measured this round: extracting lanes
    // in a separate projection of ALIASED shift expressions made
    // Catalyst's constraint propagation (getAllValidConstraints /
    // semanticEquals) the dominant cost of every downstream action
    // (c53b 1.07 -> 5.4 s, driver-gap-bound per thread dumps); and
    // inlining the extraction into the norm made the expression tree
    // quadratic in dims (codegen heap blow-up at dims = 64).
    def laneSum(c: Int, half: String): Column = sum(col(s"p$c$half"))
    val nTok = count(col("h"))
    def sgnAgg(j: Int): Column = {
      val c = j / 4 + 1; val b = j % 4
      (shiftrightunsigned(laneSum(c, if (b < 2) "a" else "b"), (b % 2) * 32)
        .bitwiseAND(lit(0xFFFFFFFFL)) * 2 - nTok).as(s"s$j")
    }
    // per-doc lane-capacity guard, applied to the NARROW n_toks
    // column rather than wrapping the wide emb array below: a guard
    // CASE around the 16-element rounded array pushed the generated
    // projection method past Janino's 64 KB limit and the whole stage
    // fell back to interpreted evaluation (the else branch only
    // evaluates on over-bound docs; NullType coerces into the long)
    val nGuarded = when(nTok <= lit(MaxLaneTokens), nTok)
      .otherwise(raise_error(concat(
        lit("Embeddings.project: doc "), col("id").cast("string"),
        lit(" has "), nTok.cast("string"),
        lit(s" token occurrences > $MaxLaneTokens - 32-bit counter lanes would " +
          "overflow (that is not a document, it is a corpus)"))).cast("long"))
      .as("n_toks")
    val aggCols = nGuarded +: (0 until dims).map(sgnAgg)
    val agg = packed.groupBy(col("id")).agg(aggCols.head, aggCols.tail: _*)
    // exact-integer norm, then one rounded division per element -
    // identical operation order to the SQL oracle
    val nrm2 = (0 until dims).map(j => col(s"s$j") * col(s"s$j")).reduce(_ + _)
    val emb = array((0 until dims).map(j =>
      round(col(s"s$j").cast("double") / sqrt(nrm2.cast("double")), 6)): _*)
    agg.select(col("id"), col("n_toks"),
      when(nrm2 === 0, lit(null)).otherwise(emb).as("emb"))
  }
}
