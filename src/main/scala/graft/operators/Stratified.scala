package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stratified corpus rebalancing (SURVEY C33): deterministic
  * per-stratum down-sampling with a √-damped quota — the
  * "temperature sampling" used to keep over-represented languages /
  * sources from drowning the rest of a training mix (the α < 1
  * exponent of multilingual LM data schedules, fixed at α = 1/2 so
  * the quota math is sqrt — correctly rounded IEEE in EVERY engine,
  * unlike pow, which keeps the oracle bit-portable).
  *
  * Quota per stratum g with |g| = c: min(c, scale · ⌈√c⌉). Small
  * strata survive whole; a stratum 100× larger contributes only 10×
  * the rows. Selection inside a stratum is by md5 rank (the same
  * engine-portable determinism as C17's split): stable across runs,
  * partition counts, and engines — re-running the sampler on a grown
  * corpus keeps a prefix-stable sample per stratum modulo hash order.
  *
  * Shape: one tiny count aggregate (rows = strata — broadcast), one
  * row_number window on the stratum key, one filter. The window sorts
  * each stratum by md5; at extreme stratum sizes the documented scale
  * path is a two-phase presample — md5 is UNIFORM over its hex space,
  * so a map-side `md5 < cutoff` filter with cutoff ≈ safety ×
  * quota/c keeps the exact-ranked survivor set tiny — followed by
  * this exact rank over survivors (verify survivors ≥ quota per
  * stratum, else fall back to the full rank for that stratum). The
  * exact form below IS the correctness contract either way.
  */
object Stratified {

  /** Sampled rows: (id, stratum, rk) with rk = the row's md5 rank
    * within its stratum, rk ≤ quota(stratum). `scale` multiplies the
    * ⌈√c⌉ damped quota. */
  def sampleSqrt(df: DataFrame, id: Column, stratum: Column, scale: Int = 4): DataFrame = {
    require(scale >= 1, s"Stratified.sampleSqrt: scale must be >= 1, got $scale")
    val rows = df.select(id.as("id"), stratum.as("stratum"))
    val quotas = rows.groupBy(col("stratum"))
      .agg(count(lit(1)).as("c"))
      .select(col("stratum"),
        least(col("c"), lit(scale) * ceil(sqrt(col("c"))).cast("long")).as("quota"))
    // salt-prefixed md5 rank (C17's determinism pattern); the id
    // tie-break makes the order total even under md5 collisions
    val w = Window.partitionBy(col("stratum"))
      .orderBy(md5(concat(lit("s:"), col("id").cast("string"))), col("id"))
    rows.withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq("stratum"))
      .filter(col("rk") <= col("quota"))
      .select(col("id"), col("stratum"), col("rk"))
  }

  /** The two-phase presampled form — IDENTICAL output to
    * `sampleSqrt` (StratifiedSpec pins equality), built for strata
    * too large to window-sort whole.
    *
    * Phase 1 drops rows MAP-SIDE: md5 hex is uniform over its space,
    * so per stratum only rows whose first 8 hex digits fall below
    * cutoff ≈ safety·quota/c survive to the sort. Phase 2 exact-ranks
    * the survivors. Correctness is not probabilistic: survivors are a
    * PREFIX of the stratum's md5 order (everything below the cutoff),
    * so whenever a stratum retains ≥ quota survivors the quota
    * smallest overall are exactly the quota smallest survivors; the
    * (astronomically rare at sane `safety`, but possible) shortfall
    * strata are detected by a count and fall back to the full rank —
    * exactness is guaranteed, the presample only decides how much the
    * sort sees. Expected sorted volume per stratum: safety·quota ≈
    * safety·scale·√c rows instead of c. */
  def sampleSqrtPresampled(df: DataFrame, id: Column, stratum: Column,
                           scale: Int = 4, safety: Double = 4.0): DataFrame = {
    require(scale >= 1, s"sampleSqrtPresampled: scale must be >= 1, got $scale")
    require(safety > 0, s"sampleSqrtPresampled: safety must be > 0, got $safety")
    val rows = df.select(id.as("id"), stratum.as("stratum"))
    val quotas = rows.groupBy(col("stratum"))
      .agg(count(lit(1)).as("c"))
      .select(col("stratum"), col("c"),
        least(col("c"), lit(scale) * ceil(sqrt(col("c"))).cast("long")).as("quota"))
      // first-8-hex-digit cutoff; 2^32 = the whole prefix space means
      // "keep everything" (also covers safety·quota/c >= 1)
      .select(col("stratum"), col("quota"),
        format_string("%08x", least(lit(4294967296L),
          ceil(lit(safety) * col("quota") * 4294967296L / col("c")).cast("long"))).as("cut"))
    val hashed = rows
      .withColumn("h", md5(concat(lit("s:"), col("id").cast("string"))))
      .join(broadcast(quotas), Seq("stratum"))
    // prefix-of-order filter: h's first 8 hex < cut (a "100000000"
    // cut from the keep-everything clamp compares greater than every
    // 8-digit prefix, so no row drops). Rows equal to the cut prefix
    // drop CONSERVATIVELY — the shortfall check below covers them.
    val surv = hashed.filter(substring(col("h"), 1, 8) < col("cut"))
    val got = surv.groupBy(col("stratum")).agg(count(lit(1)).as("nsurv"))
    val enough = got // quota ≤ c = nsurv when the cut clamps to keep-everything
      .join(quotas.select(col("stratum"), col("quota")), Seq("stratum"))
      .filter(col("nsurv") >= col("quota"))
      .select(col("stratum"))
    val w = Window.partitionBy(col("stratum")).orderBy(col("h"), col("id"))
    def rank(in: DataFrame) =
      in.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= col("quota"))
        .select(col("id"), col("stratum"), col("rk"))
    // presampled strata sort only their survivors; shortfall strata
    // (usually none) re-rank in full — never a wrong answer either way
    rank(surv.join(broadcast(enough), Seq("stratum")))
      .unionByName(rank(hashed.join(broadcast(enough), Seq("stratum"), "left_anti")))
  }

  /** Training-mixture planner (SURVEY C40): √-damped TOKEN-budget
    * allocation per stratum — C33 damps row counts at sampling time,
    * this plans the mixture at TOKEN granularity and reports the
    * per-stratum epoch factor (alloc/tokens > 1 ⇒ that stratum
    * repeats; < 1 ⇒ it is subsampled): the bookkeeping step of every
    * multilingual/multi-source data schedule (α = 1/2 temperature
    * form, same fixed exponent as C33 and for the same reason — sqrt
    * is correctly-rounded IEEE in every engine, pow is not).
    *
    * Returns (stratum, tokens, weight, alloc_tokens, epochs):
    * weight = round(√tokens, 6), share = round(w/Σw, 6),
    * alloc = ⌊budget · share⌋, epochs = round(alloc/tokens, 6).
    *
    * Engine-portability by construction: every REDUCTION is exact
    * (long token sums; Σw sums the ALREADY-ROUNDED weights as
    * decimals), so all double operations have deterministic operands
    * and IEEE gives bit-identical results in any engine — the
    * float-summation-order trap (SURVEY §4.2) never arises.
    *
    * Shape: ONE job — one corpus aggregation (map-side partialed)
    * down to strata-count rows, then Σw as an unpartitioned window
    * sum OVER THAT TINY TABLE (strata counts are dozens, so the
    * single-partition window is free), then per-row arithmetic.
    * The previous formulation materialized the aggregate
    * (localCheckpoint) and pulled Σw to the driver (head) — three
    * scheduled jobs and a driver roundtrip where one suffices;
    * measured 0.64 s → ~0.25 s at sf0.1 for the c40 surface query. */
  def mixturePlan(df: DataFrame, stratum: Column, tokenCount: Column,
                  budget: Long): DataFrame = {
    require(budget > 0, s"Stratified.mixturePlan: budget must be > 0, got $budget")
    val base = df.groupBy(stratum.as("stratum"))
      .agg(sum(tokenCount.cast("long")).as("tokens"))
      .filter(col("tokens") > 0)
    val w = round(sqrt(col("tokens")), 6)
    // exact decimal sum of the ALREADY-ROUNDED weights: order-free,
    // engine-free; the double cast happens once on the exact total —
    // identical to the former driver-side getDecimal.doubleValue.
    //
    // Σw is DELIBERATELY an unpartitioned window over the strata
    // table (round 18, after measuring the alternatives): its input
    // is PROVABLY bounded-small — base's rows are the distinct strata
    // of the groupBy above (languages × sources, dozens; never corpus
    // rows — PlanSpec pins that the window's child is the strata
    // Aggregate), so the single partition the engine warns about is
    // exactly right and costs microseconds at any corpus size. Both
    // warning-free rewrites were measured and REJECTED: the one-row
    // aggregate + broadcast cross-join doubled the query (0.22 →
    // 0.41 s — the broadcast build's extra AQE stage round-trip costs
    // more than a dozen-row window), and a constant partition key is
    // stripped by the optimizer's foldable-window-partition
    // elimination, landing back on the same unpartitioned window.
    // The engine's per-execution WARN for this PROVEN-bounded window
    // is silenced in the driver-contract mains (see Bench/Verify),
    // where it drowned real signals six lines at a time.
    val tot = sum(w.cast("decimal(28,6)"))
      .over(Window.partitionBy()).cast("double")
    val share = round(w / tot, 6)
    val alloc = floor(lit(budget.toDouble) * share).cast("long")
    base.select(col("stratum"), col("tokens"), w.as("weight"),
      alloc.as("alloc_tokens"),
      round(alloc.cast("double") / col("tokens"), 6).as("epochs"))
  }
}
