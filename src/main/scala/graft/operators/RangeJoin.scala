package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless interval/range join (SURVEY B13): pairs (l, r) with
  * rightTs ∈ [leftTs + lo, leftTs + hi] and NO equi-key — the
  * "events near events" shape (co-occurrence windows, incident
  * correlation) that Spark would otherwise execute as a
  * BroadcastNestedLoopJoin over every pair.
  *
  * Bucketing turns it into an EQUI-join: with bucket width
  * w = hi − lo, a left row's window [leftTs+lo, leftTs+hi] overlaps
  * at most TWO buckets — floor((leftTs+lo)/w) and
  * floor((leftTs+hi)/w) — so the left side explodes to ≤ 2 bucket
  * keys, the right side computes one, and a shuffled equi-join on
  * the bucket plus the exact BETWEEN predicate (evaluated inside the
  * join, so non-qualifying pairs never materialize) returns exactly
  * the interval matches. One shuffle on the bucket key; per-bucket
  * fan-out is bounded by the event rate × window, not by n².
  */
object RangeJoin {

  /** Inner interval join on microsecond precision. `leftTs`/`rightTs`
    * are timestamp columns; offsets in seconds (lo ≤ hi). Output:
    * all left columns + all right columns (alias upstream to avoid
    * collisions). */
  def intervalJoin(left: DataFrame, leftTs: Column, right: DataFrame, rightTs: Column,
                   loSeconds: Long, hiSeconds: Long): DataFrame = {
    require(loSeconds <= hiSeconds, "need loSeconds <= hiSeconds")
    val wUs = math.max((hiSeconds - loSeconds) * 1000000L, 1L)
    val loUs = loSeconds * 1000000L
    val hiUs = hiSeconds * 1000000L
    // integral `div`, not double division: epoch-micros quotients sit
    // close enough to 2^53 that a one-ulp float error could misplace
    // a boundary row's bucket. (Truncating div == floor for the
    // positive post-epoch timestamps this operates on.)
    val l = left
      .withColumn("__lus", unix_micros(leftTs))
      .withColumn("__bkt", explode(array_distinct(array(
        expr(s"(__lus + ${loUs}L) div ${wUs}L"),
        expr(s"(__lus + ${hiUs}L) div ${wUs}L")))))
    val r = right
      .withColumn("__rus", unix_micros(rightTs))
      .withColumn("__bkt", expr(s"__rus div ${wUs}L"))
    l.join(r,
        l("__bkt") === r("__bkt") &&
          col("__rus") >= col("__lus") + loUs &&
          col("__rus") <= col("__lus") + hiUs)
      .drop("__bkt", "__lus", "__rus")
  }
}
