package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Funnel

/** Funnel/retention (B18/B19): greedy strictly-ordered stage
  * semantics and the cohort grid. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val steps = Seq("view", "click", "purchase")

  test("steps: order is enforced, not just presence") {
    // u1 completes in order; u2 has all three types but purchase
    // BEFORE click → stalls at stage 2; u3 only views; u4 never
    // enters (click without view)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (2L, ts("2024-01-01 09:10:00"), "purchase"),
      (2L, ts("2024-01-01 09:20:00"), "click"),
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (4L, ts("2024-01-01 07:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.steps(ev, col("user_id"), col("ts"), col("event_type"), steps)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, "view", 3L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("steps: a later view can never resurrect an earlier click") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 11:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.steps(ev, col("user_id"), col("ts"), col("event_type"), steps)
      .collect().map(r => r.getLong(2))
    assert(out.toSeq === Seq(1L, 0L, 0L)) // view reached, click not
  }

  test("retentionCohorts: offsets count from each user's own first day") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")), (2L, ts("2024-01-04 10:00:00")),
      (2L, ts("2024-01-04 23:00:00"))
    ).toDF("user_id", "ts")
    val out = Funnel.retentionCohorts(ev, col("user_id"), col("ts"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-03", 0L, 1L), ("2024-01-03", 1L, 1L)))
  }
}
