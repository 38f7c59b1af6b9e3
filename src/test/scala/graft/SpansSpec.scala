package graft

import org.apache.spark.sql.functions._
import graft.operators.{Spans, Stratified}

/** C32 duplicated-span stats and C33 stratified sampling. */
class SpansSpec extends SparkSpec {
  import spark.implicits._

  test("dupSpans: cross-doc spans counted, within-doc repeats don't self-dup") {
    val docs = Seq(
      (1L, "a b c d e f"),       // spans {a b c d e, b c d e f}
      (2L, "x a b c d e"),       // spans {x a b c d, a b c d e}
      (3L, "z z"),               // too short: no spans
      (4L, "p q r s t p q r s t p q r s t") // 5 distinct spans, all unique to doc 4
    ).toDF("doc_id", "text")
    val got = Spans.dupSpans(docs, col("doc_id"), col("text"), 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 2L, 1L, 0.5)))  // shares "a b c d e" with doc 2
    assert(got(1) == ((2L, 2L, 1L, 0.5)))
    assert(got(2) == ((3L, 0L, 0L, 0.0)))
    // repetition INSIDE one document is not duplication across docs
    assert(got(3) == ((4L, 5L, 0L, 0.0)))
  }

  test("dupSpans: a span in three docs counts once per doc; frac rounds to 6") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 u1"),
      (2L, "w1 w2 w3 w4 w5 u2"),
      (3L, "w1 w2 w3 w4 w5 u3")).toDF("doc_id", "text")
    val got = Spans.dupSpans(docs, col("doc_id"), col("text"), 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    got.foreach { case (_, n, d, f) =>
      assert(n == 2L && d == 1L && f == 0.5)
    }
  }

  test("removeDupSpans: covered tokens cut, survivors rejoin in order") {
    val docs = Seq(
      (1L, "a b c d e f"),        // "a b c d e" shared with doc 2 → covers a..e, keeps f
      (2L, "x a b c d e"),        // covers a..e, keeps x
      (3L, "z z"),                // too short: survives whole
      (4L, "p q r s t p q r s t") // within-doc repeat only: not cross-doc, survives whole
    ).toDF("doc_id", "text")
    val got = Spans.removeDupSpans(docs, col("doc_id"), col("text"), 5)
      .as[(Long, Long, Long, Double, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 6L, 1L, round6(5.0 / 6), "f")))
    assert(got(1) == ((2L, 6L, 1L, round6(5.0 / 6), "x")))
    assert(got(2) == ((3L, 2L, 2L, 0.0, "z z")))
    assert(got(3) == ((4L, 10L, 10L, 0.0, "p q r s t p q r s t")))
  }

  test("removeDupSpans: overlapping shared spans merge their coverage; full removal → empty text") {
    val docs = Seq(
      (1L, "a b c d e f g"),  // both 5-spans shared → all 7 tokens covered
      (2L, "a b c d e f g"),
      (3L, "k a b c d e m")   // only "a b c d e" shared → keeps "k m"
    ).toDF("doc_id", "text")
    val got = Spans.removeDupSpans(docs, col("doc_id"), col("text"), 5)
      .as[(Long, Long, Long, Double, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 7L, 0L, 1.0, "")))
    assert(got(1) == ((2L, 7L, 0L, 1.0, "")))
    assert(got(2) == ((3L, 7L, 2L, round6(5.0 / 7), "k m")))
  }

  test("removeDupSpans: null/empty text and case folding") {
    val docs = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, ""),
      (3L, "  A   B  "),   // lowercased, ws-normalized, unique → kept
      (4L, "p Q r S t x"), // case-insensitive match with doc 5
      (5L, "P q R s T y")
    ).toDF("doc_id", "text")
    val got = Spans.removeDupSpans(docs, col("doc_id"), col("text"), 5)
      .as[(Long, Long, Long, Double, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 0L, 0L, 0.0, "")))
    assert(got(1) == ((2L, 0L, 0L, 0.0, "")))
    assert(got(2) == ((3L, 2L, 2L, 0.0, "a b")))
    assert(got(3) == ((4L, 6L, 1L, round6(5.0 / 6), "x")))
    assert(got(4) == ((5L, 6L, 1L, round6(5.0 / 6), "y")))
  }

  private def round6(x: Double): Double = math.round(x * 1e6) / 1e6

  test("generationNovelty: span-level overlap, stitched-from-old counts as old") {
    val oldGen = Seq(
      (1L, "a b c d e f"),       // spans: {a..e, b..f}
      (2L, "p q r s t")).toDF("doc_id", "text")
    val newGen = Seq(
      (10L, "a b c d e f"),      // 2 spans, both old
      (11L, "p q r s t a b c d e"), // stitched from old pieces: 6 spans, 2 old, 4 new seams
      (12L, "x y z w v")).toDF("doc_id", "text") // 1 new span
    val got = Spans.generationNovelty(oldGen, newGen, col("doc_id"), col("text"), 5)
      .as[(Long, Long, Double)].head()
    // distinct new-gen spans: doc10 {a..e,b..f}, doc11 {p..t, q..a, r..b,
    // s..c, t..d, a..e}, doc12 {x..v} → 2+6+1 minus dup a..e = 8
    // shared with old: a..e, b..f, p..t → 3
    assert(got._1 == 8L && got._2 == 3L)
    assert(got._3 == math.round((1.0 - 3.0 / 8) * 1e6) / 1e6)
    // empty old generation → full novelty; unshingleable new → 0-guard
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Spans.generationNovelty(empty, newGen, col("doc_id"), col("text"), 5)
      .as[(Long, Long, Double)].head() == ((8L, 0L, 1.0)))
    assert(Spans.generationNovelty(oldGen, empty, col("doc_id"), col("text"), 5)
      .as[(Long, Long, Double)].head() == ((0L, 0L, 0.0)))
  }

  test("Drift.unigramKl: zero for identical generations, positive under shift, matches reference") {
    import graft.operators.Drift
    val a = Seq((1L, "x y x y z"), (2L, "x z z")).toDF("doc_id", "text")
    val same = Drift.unigramKl(a, a, col("text"))
      .as[(Long, Long, Long, Double)].head()
    assert(same == ((8L, 8L, 3L, 0.0)))
    // shifted: new generation heavy on w
    val b = Seq((10L, "w w w w x")).toDF("doc_id", "text")
    val got = Drift.unigramKl(a, b, col("text"))
      .as[(Long, Long, Long, Double)].head()
    assert(got._1 == 8L && got._2 == 5L && got._3 == 4L)
    // scala-side reference with the same factored single-pass form:
    // KL = S/(N_new+V/2) + ln((N_old+V/2)/(N_new+V/2)),
    // S = Σ (c_new+½)·ln((c_new+½)/(c_old+½)) rounded 12 per term
    val cOld = Map("x" -> 3L, "y" -> 2L, "z" -> 3L, "w" -> 0L)
    val cNew = Map("x" -> 1L, "y" -> 0L, "z" -> 0L, "w" -> 4L)
    val v = 4.0
    val s = cNew.keys.map { w =>
      val cn = cNew(w) + 0.5
      val co = cOld(w) + 0.5
      BigDecimal(cn * math.log(cn / co)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val kl = BigDecimal(
      s.toDouble / (5 + 0.5 * v) + math.log((8 + 0.5 * v) / (5 + 0.5 * v)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(got._4 == kl.toDouble)
    assert(got._4 > 0.1)
    // both empty → defined zero row
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Drift.unigramKl(empty, empty, col("text"))
      .as[(Long, Long, Long, Double)].head() == ((0L, 0L, 0L, 0.0)))
  }

  test("removeDupSpans: a corpus with no cross-doc spans is a normalized identity") {
    // unique per-doc vocabularies → nothing shared → kept_text is
    // exactly the lowercased, whitespace-normalized input, dup stats 0
    val docs = (1L to 30L)
      .map(i => (i, (1 to 10).map(t => s"D${i}w$t").mkString("  ") + "\t end$i"))
      .toDF("doc_id", "text")
    val got = Spans.removeDupSpans(docs, col("doc_id"), col("text"), 5)
      .as[(Long, Long, Long, Double, String)].collect()
    val want = docs.select(col("doc_id"),
        array_join(filter(split(lower(col("text")), "\\s+"), t => t =!= ""), " "))
      .as[(Long, String)].collect().toMap
    got.foreach { case (id, n, kept, frac, text) =>
      assert(n == kept && frac == 0.0, s"doc $id lost tokens")
      assert(text == want(id), s"doc $id text changed")
    }
  }

  test("sampleSqrt: quota = min(c, scale*ceil(sqrt(c))), md5-rank deterministic") {
    // stratum "big": 100 rows → quota min(100, 4*10) = 40
    // stratum "small": 5 rows → quota min(5, 4*3) = 5 (kept whole)
    val df = (spark.range(100).select(col("id"), lit("big").as("g")) union
      spark.range(100, 105).select(col("id"), lit("small").as("g")))
    val got = Stratified.sampleSqrt(df, col("id"), col("g"), scale = 4)
      .as[(Long, String, Long)].collect()
    val byStratum = got.groupBy(_._2)
    assert(byStratum("big").length == 40)
    assert(byStratum("small").length == 5)
    // ranks are exactly 1..quota
    assert(byStratum("big").map(_._3).sorted.toSeq == (1L to 40L))
    // selection = the 40 lowest by salted md5 (engine-portable order)
    val wantBig = spark.range(100)
      .select(col("id"), md5(concat(lit("s:"), col("id").cast("string"))).as("h"))
      .orderBy(col("h"), col("id")).limit(40).select("id").as[Long].collect().toSet
    assert(byStratum("big").map(_._1).toSet == wantBig)
    // deterministic across partition counts
    val again = Stratified.sampleSqrt(df.repartition(7), col("id"), col("g"), scale = 4)
      .as[(Long, String, Long)].collect()
    assert(again.toSet == got.toSet)
  }

  test("sampleSqrtPresampled equals sampleSqrt, including forced-shortfall fallback") {
    val df = (spark.range(300).select(col("id"), lit("big").as("g")) union
      spark.range(300, 307).select(col("id"), lit("small").as("g")))
    val want = Stratified.sampleSqrt(df, col("id"), col("g"), scale = 3)
      .as[(Long, String, Long)].collect().toSet
    // default safety: presample path carries the big stratum
    val pre = Stratified.sampleSqrtPresampled(df, col("id"), col("g"), scale = 3)
      .as[(Long, String, Long)].collect().toSet
    assert(pre == want)
    // safety so low the cutoff keeps too few: every stratum falls
    // back to the full rank — still identical, never a wrong answer
    val starved = Stratified.sampleSqrtPresampled(df, col("id"), col("g"),
        scale = 3, safety = 0.001)
      .as[(Long, String, Long)].collect().toSet
    assert(starved == want)
  }

  test("mixturePlan: sqrt damping, epoch factors, empty strata dropped") {
    // strata: big 40000 tokens, small 400 → weights 200, 20; shares
    // 200/220, 20/220; budget 22000 → allocs 20000·...: share rounds
    // to 6 then floors, compute expected exactly as the operator does
    val df = Seq(("big", 40000L), ("small", 400L), ("empty", 0L))
      .toDF("g", "tok")
    val got = Stratified.mixturePlan(df, col("g"), col("tok"), budget = 22000L)
      .as[(String, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(!got.contains("empty")) // zero-token strata have no weight
    val shareBig = math.round(200.0 / 220.0 * 1e6) / 1e6
    val shareSmall = math.round(20.0 / 220.0 * 1e6) / 1e6
    val allocBig = math.floor(22000.0 * shareBig).toLong
    val allocSmall = math.floor(22000.0 * shareSmall).toLong
    assert(got("big") == (("big", 40000L, 200.0, allocBig,
      math.round(allocBig.toDouble / 40000.0 * 1e6) / 1e6)))
    assert(got("small") == (("small", 400L, 20.0, allocSmall,
      math.round(allocSmall.toDouble / 400.0 * 1e6) / 1e6)))
    // damping direction: the small stratum repeats (>1 epoch), the
    // big one is subsampled (<1) — the point of temperature mixing
    assert(got("small")._5 > 1.0 && got("big")._5 < 1.0)
    // all-empty input: no rows, no crash
    assert(Stratified.mixturePlan(
      Seq(("g", 0L)).toDF("g", "tok"), col("g"), col("tok"), 100L).count() == 0)
  }

  test("sampleSqrt: sample is md5-prefix-stable as a stratum grows") {
    val small = spark.range(50).select(col("id"), lit("g").as("g"))
    val grown = spark.range(200).select(col("id"), lit("g").as("g"))
    def ranked(df: org.apache.spark.sql.DataFrame) =
      Stratified.sampleSqrt(df, col("id"), col("g"), scale = 2)
        .orderBy(col("rk")).select("id").as[Long].collect().toSeq
    val s = ranked(small)  // quota min(50, 2*8) = 16
    val gr = ranked(grown) // quota min(200, 2*15) = 30
    assert(s.length == 16 && gr.length == 30)
    // ids from the original 0..49 keep their relative md5 order in the
    // grown sample (hash order is data-independent)
    val oldInGrown = gr.filter(_ < 50)
    assert(oldInGrown == s.filter(oldInGrown.toSet))
  }
}
