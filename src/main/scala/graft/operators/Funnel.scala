package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence event analytics: funnel conversion and retention
  * cohorts (SURVEY B18/B19) — the product-analytics queries every
  * event warehouse runs nightly.
  *
  * Scale shapes:
  *  - `steps`: ONE shuffle on the user key, then a per-user sorted
  *    fold (`aggregate` HOF over the sorted event structs, codegen'd
  *    — no UDF, no re-shuffle per funnel stage). The naive form is a
  *    cascade of k dependent min-aggregations = k shuffles + k joins;
  *    this is k-stage-count independent. Per-user event lists are
  *    bounded (product analytics, not firehose) — same contract as
  *    sessionization.
  *  - `retentionCohorts`: the user's first-event day comes from a
  *    window over the SAME user-key shuffle the fold uses (no
  *    firsts-table join), day offsets are map-side, then one
  *    (cohort, offset) count-distinct shuffle.
  */
object Funnel {

  /** Users advance through `stepTypes` greedily over their events in
    * (ts, id) order, each stage strictly later than the one before
    * (greedy ≡ the min-ts cascade: first match of stage 1, then first
    * match of stage 2 after it, …). Returns one row per stage:
    * (step, step_name, n_users) with n_users = users whose furthest
    * stage ≥ step. */
  def steps(events: DataFrame, user: Column, ts: Column, evType: Column,
            stepTypes: Seq[String]): DataFrame = {
    require(stepTypes.nonEmpty, "need at least one funnel step")
    // stage advance table as a chained when(): state is
    // (stage reached, ts of the event that reached it)
    def advance(st: Column, e: Column): Column = {
      val init = when(lit(false), st)
      val cases = stepTypes.zipWithIndex.foldLeft(init) { case (acc, (tpe, i)) =>
        // step 0 has no predecessor timestamp to compare against — a
        // Scala-level branch, not `lit(i) === 0`, which built a
        // constant `0 == 0` predicate (Spark warns "trivially true
        // equals" on every run; same truth table: true || x ≡ true,
        // false || x ≡ x, nulls included)
        val tsOk = if (i == 0) lit(true)
                   else e.getField("ts") > st.getField("ts")
        acc.when(
          st.getField("stage") === i && e.getField("tpe") === tpe && tsOk,
          struct(lit(i + 1).as("stage"), e.getField("ts").as("ts")))
      }
      cases.otherwise(st)
    }
    val reached = events
      .filter(evType.isin(stepTypes: _*))
      .select(user.as("u"), struct(ts.as("ts"), evType.as("tpe")).as("e"))
      .groupBy(col("u"))
      .agg(array_sort(collect_list(col("e"))).as("ev"))
      .select(col("u"),
        aggregate(col("ev"),
          struct(lit(0).as("stage"), lit("1900-01-01").cast("timestamp").as("ts")),
          (st, e) => advance(st, e)).getField("stage").as("stage"))
    // n_users(step) = users with stage ≥ step: one conditional agg
    // producing k columns, exploded back to k rows — no global-order
    // window, no join
    val counts = reached.agg(
      sum(when(col("stage") >= 1, 1L).otherwise(0L)).as("s1"),
      stepTypes.indices.drop(1).map(i =>
        sum(when(col("stage") >= i + 1, 1L).otherwise(0L)).as(s"s${i + 1}")): _*)
    counts.select(explode(array(stepTypes.zipWithIndex.map { case (tpe, i) =>
        struct(lit(i + 1).cast("long").as("step"), lit(tpe).as("step_name"),
          coalesce(col(s"s${i + 1}"), lit(0L)).as("n_users"))
      }: _*)).as("r"))
      .select(col("r.step"), col("r.step_name"), col("r.n_users"))
      .orderBy(col("step"))
  }

  /** Classic retention grid: cohort = calendar day of the user's
    * first event (via a user-key window, not a firsts-table join),
    * day_offset = days since it; counts distinct active users per
    * (cohort, offset). */
  def retentionCohorts(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val w = Window.partitionBy(col("u"))
    events.select(user.as("u"), ts.as("ts"))
      .withColumn("first_day", to_date(min(col("ts")).over(w)))
      .select(col("u"), col("first_day"),
        datediff(to_date(col("ts")), col("first_day")).as("day_offset"))
      .groupBy(col("first_day").cast("string").as("cohort"), col("day_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
      .select(col("cohort"), col("day_offset").cast("long").as("day_offset"),
        col("n_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }
}
