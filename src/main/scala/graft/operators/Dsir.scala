package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR data selection (SURVEY C46) — hashed n-gram importance
  * weighting (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023): score every raw document
  * by log(p_target/p_raw) under bag-of-hashed-ngram unigram models
  * of a small TARGET corpus (the domain you want more of) and the
  * RAW corpus. High log-weight docs look like the target; resampling
  * by the weights (C33/C40's machinery) retargets the mixture
  * without training a classifier.
  *
  * Features are word unigrams + bigrams of `lower(text)` hashed into
  * a FIXED bucket space — the hash is an md5-hex PREFIX (`prefixLen`
  * hex chars ⇒ 16^prefixLen buckets), so the oracle reproduces it
  * exactly (SURVEY §4.1: oracle-visible hashes are md5-only).
  * Bucketing is what makes the method corpus-size-free: both models
  * are ≤ B rows no matter how big the corpora are.
  *
  * Portability discipline (§4): per-bucket log-ratios λ(b) round to
  * 8 decimals in the model; per-doc sums run in DECIMAL over those
  * rounded terms (the one order-sensitive reduction), cast to double
  * and round 6 at the end — bit-identical across engines.
  *
  * Shape at 100 TB: two feature explodes (map-side, native
  * WordNgrams) feeding bucket-count hash aggs whose results are ≤ B
  * rows; the totals are driver scalars of those COUNT tables (never
  * a corpus rescan — C39/C43's rule); scoring is one map-side
  * explode + broadcast join on the B-row model + one per-doc agg.
  * Nothing is pairwise, and the only corpus-sized shuffle is the
  * per-doc aggregation on id.
  */
object Dsir {

  /** (b, lam) model table (≤ 16^prefixLen rows, broadcastable) plus
    * the unseen-bucket fallback — λ for a bucket absent from BOTH
    * corpora (only reachable when scoring docs outside `raw`).
    * `compiled` is the collected scoring-kernel form — bucket-table-
    * sized driver traffic, the same budget the broadcast join paid;
    * lazy + transient so the frozen-model streaming gate (D13)
    * builds it once per model. */
  final case class Model(table: DataFrame, unkLam: Double, prefixLen: Int) {
    @transient lazy val compiled: graft.plans.CompiledBucketWeights =
      new graft.plans.CompiledBucketWeights(
        table.select(col("b"), col("lam")).collect()
          .map(r => (r.getString(0), r.getDouble(1))), unkLam, prefixLen)
  }

  /** Hashed features with multiplicity: md5-hex prefixes of the word
    * unigrams AND bigrams of lower(text). explode_outer keeps
    * feature-less docs (null/short text) as a single null row so
    * scorers can emit them with n_feats = 0. */
  private def feats(df: DataFrame, id: Column, text: Column,
                    prefixLen: Int): DataFrame = {
    val t = graft.plans.TextExpressions
    df.select(id.as("id"),
      explode_outer(concat(t.wordNgrams(lower(text), 1),
        t.wordNgrams(lower(text), 2))).as("g"))
      .select(col("id"), substring(md5(col("g")), 1, prefixLen).as("b"))
  }

  /** Train the per-bucket log-ratio model:
    * λ(b) = round(ln((c_t(b)+0.5)/(N_t+0.5·B)) −
    *              ln((c_r(b)+0.5)/(N_r+0.5·B)), 8).
    * N_t/N_r are driver scalars summed from the ≤ B-row count
    * tables; the add-half smoothing denominator uses the FIXED
    * bucket count B, so the model is defined for any bucket. */
  def train(target: DataFrame, raw: DataFrame, id: Column, text: Column,
            prefixLen: Int = 3): Model = {
    require(prefixLen >= 1 && prefixLen <= 8,
      s"prefixLen must be in [1,8], got $prefixLen")
    val b = math.pow(16.0, prefixLen)
    // ONE byte-walk pass per corpus via the fused BucketCountAgg
    // kernel (the training twin of DsirScore): per-partition state is
    // one B-long array, the shuffle carries one partial per
    // partition, and the count tables come back bit-identical to the
    // explode→md5→groupBy plan (exact longs; countsDeclarative is
    // the spec-pinned parity oracle, and remains the executed path
    // for prefixLen > 5, where a 16^p-long per-partition buffer
    // stops being "model-bounded" in any useful sense).
    // format_string's %x is lowercase — exactly
    // substring(md5(g), 1, prefixLen)'s alphabet.
    def bucketCountTable(df: DataFrame, cname: String): DataFrame =
      if (prefixLen <= 5) countsFused(df, text, prefixLen, cname)
      else countsDeclarative(df, id, text, prefixLen, cname)
    val tc = bucketCountTable(target, "ct").localCheckpoint(true)
    val rc = bucketCountTable(raw, "cr").localCheckpoint(true)
    // totals: scalars of the bucket-count tables, never a corpus rescan
    val nt = tc.agg(coalesce(sum(col("ct")), lit(0L))).head().getLong(0).toDouble
    val nr = rc.agg(coalesce(sum(col("cr")), lit(0L))).head().getLong(0).toDouble
    val table = tc.join(rc, Seq("b"), "full_outer")
      .select(col("b"),
        round(log((coalesce(col("ct"), lit(0L)) + 0.5) / (nt + 0.5 * b)) -
          log((coalesce(col("cr"), lit(0L)) + 0.5) / (nr + 0.5 * b)), 8).as("lam"))
    val unk = BigDecimal(math.log(0.5 / (nt + 0.5 * b)) -
        math.log(0.5 / (nr + 0.5 * b)))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    Model(table, unk, prefixLen)
  }

  /** (id, n_feats, logw) per document: logw = Σ λ(bucket) over the
    * doc's features WITH multiplicity, decimal-summed, rounded 6.
    * Feature-less docs score 0.0 (no evidence either way — weight 1,
    * unlike C28's pessimistic floor, because DSIR resampling should
    * not favor or bury empty docs).
    *
    * Runs as ONE map-side pass via the fused `DsirScore` kernel — no
    * per-feature explode, no md5 column, no join, no shuffle (the
    * same cure as C28/C52). Fixed-point sums make it bit-identical
    * to `scoreDeclarative`'s decimal pipeline (parity spec-pinned);
    * oracle c46 unchanged. */
  def score(docs: DataFrame, id: Column, text: Column, model: Model): DataFrame =
    docs.select(id.as("id"), scoreCol(text, model).as("r"))
      .select(col("id"), col("r.n_feats").as("n_feats"),
        col("r.logw").as("logw"))

  /** The per-document verdict as a COLUMN — `struct<n_feats, logw>`
    * of exactly what `score` emits, usable as a plain filter term
    * (the streaming gates drop their per-batch semi-joins this way). */
  def scoreCol(text: Column, model: Model): Column =
    graft.plans.TextExpressions.dsirScore(
      coalesce(lower(text).cast("string"), lit("")), model.compiled)

  /** The fused count table: (b, count) over nonzero buckets. */
  private[graft] def countsFused(df: DataFrame, text: Column,
                                 prefixLen: Int, cname: String): DataFrame =
    df.agg(graft.plans.CountAggregates
        .bucketCounts(lower(text), prefixLen).as("a"))
      .select(posexplode(col("a")).as(Seq("i", cname)))
      .filter(col(cname) > 0)
      .select(format_string(s"%0${prefixLen}x", col("i")).as("b"), col(cname))

  /** The pre-kernel declarative count plan — the parity oracle for
    * `train`'s fused kernel (same (b, count) rows exactly) and the
    * executed path for bucket spaces too large to buffer. */
  private[graft] def countsDeclarative(df: DataFrame, id: Column, text: Column,
                                       prefixLen: Int, cname: String): DataFrame =
    feats(df, id, text, prefixLen).filter(col("b").isNotNull)
      .groupBy(col("b")).agg(count(lit(1)).as(cname))

  /** The pre-kernel declarative scoring plan — retained as the parity
    * oracle for `score`'s kernel: same rows, bit-identical scores, at
    * one-row-per-FEATURE cost. */
  private[graft] def scoreDeclarative(docs: DataFrame, id: Column, text: Column,
                                      model: Model): DataFrame = {
    val perFeat = feats(docs, id, text, model.prefixLen)
      .join(broadcast(model.table), Seq("b"), "left")
      .select(col("b").isNotNull.as("has"),
        when(col("b").isNull, null)
          .otherwise(coalesce(col("lam"), lit(model.unkLam)))
          .cast("decimal(20,8)").as("lp"),
        col("id"))
    perFeat.groupBy(col("id"))
      .agg(count(col("lp")).as("n_feats"),
        coalesce(sum(col("lp")), lit(BigDecimal(0))).as("s"))
      .select(col("id"), col("n_feats"),
        // round IN DECIMAL, cast after: the sum is an EXACT 8-decimal
        // value, so casting first hands round() a double whose
        // shortest decimal representation can land exactly on a
        // ....50 tie that engines resolve differently (found at
        // sf0.1: one doc off by exactly 1e-6). Decimal HALF_UP is
        // identical in Spark and DuckDB.
        round(col("s"), 6).cast("double").as("logw"))
  }
}
