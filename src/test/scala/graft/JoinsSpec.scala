package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, RangeJoin}

/** As-of and keyless interval joins (SURVEY B12/B13) — brute-force
  * differential tests on adversarial small data (equal timestamps,
  * no-match rows, window boundaries) plus generated-corpus
  * differentials against naive reference joins.
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def tsAt(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000L)

  test("AsOf.join matches newest right at-or-before, null when none, tolerance drops stale") {
    val trades = Seq(
      (1L, 100L, "2024-01-01 10:00:00"),
      (1L, 101L, "2024-01-01 10:05:00"),
      (2L, 200L, "2024-01-01 09:00:00"), // before any quote → null
      (3L, 300L, "2024-01-01 10:00:00")) // exactly at quote ts → match
      .map { case (u, i, t) => (u, i, ts(t)) }.toDF("user_id", "trade_id", "ts")
    val quotes = Seq(
      (1L, 900L, "2024-01-01 09:59:00", 5.0),
      (1L, 901L, "2024-01-01 10:01:00", 6.0),
      (2L, 902L, "2024-01-01 12:00:00", 7.0),
      (3L, 903L, "2024-01-01 10:00:00", 8.0))
      .map { case (u, i, t, v) => (u, i, ts(t), v) }.toDF("user_id", "quote_id", "qts", "px")

    val got = AsOf.join(trades, quotes, Seq("user_id"), "ts", "qts", Seq("quote_id", "px"))
      .select("trade_id", "quote_id", "px")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    assert(got == Set(
      (100L, 900L, 5.0), // 09:59 quote, not the later 10:01
      (101L, 901L, 6.0),
      (200L, -1L, -1.0), // quote only exists later
      (300L, 903L, 8.0))) // same-instant quote matches (inclusive)

    // 120s tolerance: trade 100's quote is 60s old (kept); trade
    // 101's is 240s old (dropped); same-instant match always kept
    val tol = AsOf.join(trades, quotes, Seq("user_id"), "ts", "qts",
        Seq("quote_id", "px"), toleranceSeconds = Some(120L))
      .select("trade_id", "quote_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(tol == Set((100L, 900L), (101L, -1L), (200L, -1L), (300L, 903L)))
  }

  test("AsOf.join equals the naive argmax join on a generated corpus") {
    // deterministic pseudo-random corpus: 40 trades + 30 quotes over
    // 12 users with colliding timestamps across (but not within) keys
    val base = 1700000000L
    val trades = (0 until 40).map { i =>
      (i % 12L, i.toLong, tsAt(base + (i * 7919) % 600)) }.toDF("k", "tid", "ts")
    val quotes = (0 until 30).map { i =>
      (i % 12L, 100L + i, tsAt(base + (i * 104729) % 600), i * 1.5) }
      .toDF("k", "qid", "qts", "px")
    val got = AsOf.join(trades, quotes, Seq("k"), "ts", "qts", Seq("qid", "px"))
      .select("tid", "qid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // naive reference: max-qts quote per trade via a range join + argmax
    val naive = trades.join(quotes, Seq("k"), "left")
      .filter(col("qts").isNull || col("qts") <= col("ts"))
      .groupBy(col("tid"))
      .agg(max(struct(col("qts"), col("qid"))).as("m"))
      .select(col("tid"), col("m.qid"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // the naive left-join drops trades whose every quote is later →
    // re-add them as null matches
    val missing = trades.select("tid").as[Long].collect().toSet -- naive.map(_._1)
    assert(got == naive ++ missing.map(_ -> -1L))
    assert(got.size == 40)
  }

  test("Skyline.of matches brute-force dominance incl. duplicates and min/max mix") {
    import graft.operators.Skyline
    // hand case, both maximized: frontier {(1,5),(3,3),(5,1)}; (2,2)
    // dominated; duplicate frontier points BOTH survive
    val pts = Seq((1.0, 5.0), (5.0, 1.0), (3.0, 3.0), (2.0, 2.0), (3.0, 3.0))
      .toDF("x", "y")
    val sky = Skyline.of(pts, Seq(("x", false), ("y", false)))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq.sorted
    assert(sky == Seq((1.0, 5.0), (3.0, 3.0), (3.0, 3.0), (5.0, 1.0)))

    // generated differential, minimize x / maximize y, across partitions
    val gen = (0 until 300).map { i =>
      (i.toLong, ((i * 7919) % 101).toDouble, ((i * 104729) % 97).toDouble) }
    val df = gen.toDF("id", "x", "y").repartition(7)
    val got = Skyline.of(df, Seq(("x", true), ("y", false)))
      .select("id").as[Long].collect().toSet
    val brute = gen.filter { case (_, px, py) =>
      !gen.exists { case (_, qx, qy) =>
        qx <= px && qy >= py && (qx < px || qy > py) }
    }.map(_._1).toSet
    assert(got == brute && brute.nonEmpty)
  }

  test("RangeJoin.intervalJoin equals brute force incl. window boundaries") {
    val left = (0L until 40L).map(i => (i, ts(f"2024-01-01 10:${i % 60}%02d:00")))
      .toDF("lid", "lts")
    val right = (0L until 120L).map(i => (i, ts(f"2024-01-01 ${10 + i.toInt / 60}%02d:${i % 60}%02d:30")))
      .toDF("rid", "rts")
    val got = RangeJoin.intervalJoin(left, col("lts"), right, col("rts"), -300L, 120L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val brute = left.crossJoin(right)
      .filter(unix_micros(col("rts")) >= unix_micros(col("lts")) - 300L * 1000000L &&
        unix_micros(col("rts")) <= unix_micros(col("lts")) + 120L * 1000000L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == brute)
    assert(brute.nonEmpty)
    // exact boundary inclusion: a right row precisely lo/hi away matches
    val l1 = Seq((1L, ts("2024-01-01 10:10:00"))).toDF("lid", "lts")
    val r1 = Seq((1L, ts("2024-01-01 10:05:00")), (2L, ts("2024-01-01 10:12:00")),
      (3L, ts("2024-01-01 10:04:59")), (4L, ts("2024-01-01 10:12:01")))
      .toDF("rid", "rts")
    val edge = RangeJoin.intervalJoin(l1, col("lts"), r1, col("rts"), -300L, 120L)
      .select("rid").as[Long].collect().toSet
    assert(edge == Set(1L, 2L))
  }
}
