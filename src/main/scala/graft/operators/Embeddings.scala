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

  /** (id, n_toks, emb): `dims`-dimensional L2-normalized hashed
    * random projection of the word-unigram bag (with multiplicity).
    * dims ≤ 64 (16 hex chars × 4 bits of one md5). */
  def project(docs: DataFrame, id: Column, text: Column, dims: Int = 16): DataFrame = {
    require(dims >= 1 && dims <= 64, s"dims must be in [1,64], got $dims")
    val hashed = docs
      .select(id.as("id"),
        explode_outer(graft.plans.TextExpressions.wordNgrams(lower(text), 1)).as("tok"))
      .select(col("id"), md5(col("tok")).as("h"))
    // sign_j = 2·bit_j − 1 ∈ {−1, +1}; one integer sum per dim, all
    // in a single aggregation (state = dims longs per doc)
    val sums = (0 until dims).map { j =>
      val bit = shiftright(hexVal(col("h"), j / 4 + 1), j % 4).bitwiseAND(lit(1))
      sum(when(col("h").isNull, lit(0)).otherwise(bit * 2 - 1).cast("long")).as(s"s$j")
    }
    val n = count(col("h")).as("n_toks")
    val agg = hashed.groupBy(col("id")).agg(sums.head, (sums.tail :+ n): _*)
    // exact-integer norm, then one rounded division per element —
    // identical operation order to the SQL oracle
    val nrm2 = (0 until dims).map(j => col(s"s$j") * col(s"s$j")).reduce(_ + _)
    val emb = array((0 until dims).map(j =>
      round(col(s"s$j").cast("double") / sqrt(nrm2.cast("double")), 6)): _*)
    agg.select(col("id"), col("n_toks"),
      when(nrm2 === 0, lit(null)).otherwise(emb).as("emb"))
  }
}
