package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.ReAgg

/** B20 re-aggregated rollup/cube: identical results to native
  * rollup/cube (which Expand-replicate every input row per grouping
  * set), from ONE finest-grain aggregation. */
class ReAggSpec extends SparkSpec {
  import spark.implicits._

  private def orders: DataFrame = Seq(
    ("F", "1-URGENT", 10.50), ("F", "1-URGENT", 2.25), ("F", "2-HIGH", 7.00),
    ("O", "1-URGENT", 1.10), ("O", "3-LOW", 99.99), ("O", "3-LOW", 0.01),
    ("P", "2-HIGH", 45.00)
  ).toDF("status", "prio", "price")

  private val aggs = Seq(
    ReAgg.sumOf("rev", col("price").cast("decimal(18,2)")),
    ReAgg.countAll("n"),
    ReAgg.minOf("mn", col("price").cast("decimal(18,2)")),
    ReAgg.maxOf("mx", col("price").cast("decimal(18,2)")))

  private def canon(df: DataFrame): Set[(String, String, Double, Long, Double, Double)] =
    df.select(coalesce(col("status"), lit("∅")), coalesce(col("prio"), lit("∅")),
        col("rev").cast("double"), col("n"),
        col("mn").cast("double"), col("mx").cast("double"))
      .as[(String, String, Double, Long, Double, Double)].collect().toSet

  test("rollup equals native rollup, cube equals native cube") {
    val native = orders.rollup(col("status"), col("prio"))
      .agg(sum(col("price").cast("decimal(18,2)")).as("rev"), count(lit(1)).as("n"),
        min(col("price").cast("decimal(18,2)")).as("mn"),
        max(col("price").cast("decimal(18,2)")).as("mx"))
    assert(canon(ReAgg.rollup(orders, Seq("status", "prio"), aggs)) == canon(native))

    val nativeCube = orders.cube(col("status"), col("prio"))
      .agg(sum(col("price").cast("decimal(18,2)")).as("rev"), count(lit(1)).as("n"),
        min(col("price").cast("decimal(18,2)")).as("mn"),
        max(col("price").cast("decimal(18,2)")).as("mx"))
    assert(canon(ReAgg.cube(orders, Seq("status", "prio"), aggs)) == canon(nativeCube))
  }

  test("groupingSets picks exactly the requested sets") {
    val got = ReAgg.groupingSets(orders, Seq("status", "prio"), aggs,
      Seq(Seq("status"), Nil))
    // one row per status + one grand total; no (status, prio) rows
    assert(got.count() == 3 + 1)
    assert(got.filter(col("status").isNotNull && col("prio").isNotNull).count() == 0)
    val total = got.filter(col("status").isNull && col("prio").isNull)
      .select(col("rev").cast("double"), col("n")).as[(Double, Long)].head()
    assert(total == ((165.85, 7L)))
  }

  test("no Expand in the plan; one exchange feeds every level") {
    val plan = ReAgg.cube(orders, Seq("status", "prio"), aggs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"re-aggregated cube must not Expand:\n$plan")
    // native cube DOES Expand — the contrast that motivates the operator
    val nativePlan = orders.cube(col("status"), col("prio"))
      .agg(sum(col("price")).as("rev"))
      .queryExecution.executedPlan.toString
    assert(nativePlan.contains("Expand"))
  }
}
