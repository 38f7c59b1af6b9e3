package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: plant BOILERPLATE SKEW into an existing scale dir's
  * documents table (SURVEY §6 round-12) — the regime ScaleGen
  * deliberately avoids. ScaleGen's copies carry disjoint vocabularies,
  * so every band/prefix/line key stays uniform; real web corpora are
  * the opposite: a shared template (header, footer, cookie banner)
  * concentrates candidate generation onto a handful of hot keys, and
  * within-bucket pair count is QUADRATIC in the hot-key multiplicity —
  * AQE's skew split can rebalance input bytes but cannot reduce the
  * pair count, and a hot key's pairs are emitted by ONE task.
  *
  * Construction: every doc with doc_id % denom == 0 (fraction 1/denom,
  * default 10%) gets a fixed `tmplTokens`-token template prepended AS
  * ITS OWN LINE. One knob stresses all three skew surfaces at once:
  *  - C2: template shingles dominate the minhash draw, so planted
  *    docs collide on band keys (hot bk buckets);
  *  - C4: template shingle hashes that fall low in the xxhash64 order
  *    enter every planted doc's prefix (hot prefix-index keys);
  *  - C45: the template line itself is one normalized line shared by
  *    10% of the corpus (hot line key).
  * The template length is chosen so planted pairs share ~tmplTokens−2
  * shingles but stay BELOW the 0.5 Jaccard threshold (J ≈ T/(2·sz−T)
  * ≈ 0.26 at the defaults) — candidate volume explodes, the TRUE pair
  * set is unchanged, so any timing delta is pure engine behavior, not
  * a larger answer.
  *
  * Only documents.parquet is rewritten; every other table is copied
  * through so the dir is a drop-in SPARK_GRAFT_SF_DIR.
  */
object SkewGen {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/tmp/sf1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf1skew"
    val denom = if (args.length > 2) args(2).toInt else 10
    val tmplTokens = if (args.length > 3) args(3).toInt else 60
    // "prepend" (default): template + the doc's own text — hot
    // band/prefix/line keys, true pair set unchanged. "replace": the
    // doc BECOMES the template verbatim — an exact-duplicate cluster
    // (the crawl error-page / cookie-wall regime), the one plant that
    // concentrates SimHash: identical text ⟹ identical fingerprint ⟹
    // every planted pair shares every chunk key. Replace-mode planted
    // pairs ARE near-dups (hamming 0, Jaccard 1), so the answer set
    // GROWS by C(planted, 2) — fine for straggler A/Bs (both variants
    // return it), unusable for wall-clock twins against the uniform
    // corpus.
    val mode = if (args.length > 4) args(4) else "prepend"
    require(mode == "prepend" || mode == "replace", s"bad mode $mode")
    require(denom >= 2 && tmplTokens >= 3, s"bad args denom=$denom tmpl=$tmplTokens")
    // overwrite-while-reading guard: same dir as src and dst would
    // destroy the source mid-copy (compare canonical paths so
    // /tmp/sf1 and /tmp//sf1/. don't slip through)
    // the message names the CANONICAL path actually compared, not the
    // raw argument — a collision via symlinks/relative paths should
    // say what it resolved to (ADVICE r13)
    val srcCanon = new java.io.File(src).getCanonicalPath
    require(srcCanon != new java.io.File(dst).getCanonicalPath,
      s"src and dst must differ (both resolve to $srcCanon)")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // vocabulary disjoint from ScaleGen's k<k>-prefixed copies and the
    // base corpus (the skew must come from the PLANT, not accidents)
    val template = (0 until tmplTokens).map(i => s"boiler·$i").mkString(" ")

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings")) {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val plantedText =
      if (mode == "replace") lit(template)
      else concat(lit(template + "\n"), col("text"))
    val planted = docs.select(
      col("doc_id"),
      when(col("doc_id") % denom === 0, plantedText).otherwise(col("text")).as("text"),
      col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    planted.write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val n = spark.read.parquet(s"$dst/documents.parquet").count()
    val p = spark.read.parquet(s"$dst/documents.parquet")
      .filter(col("text").startsWith("boiler·0 ")).count()
    println(s"[skewgen] $dst: $n docs, $p planted (${100.0 * p / n}%), " +
      s"template $tmplTokens tokens, mode $mode")
    spark.stop()
  }
}
