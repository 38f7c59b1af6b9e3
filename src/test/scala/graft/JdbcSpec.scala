package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.Sink

/** JDBC source/sink (SURVEY E7) against embedded Derby — the
  * offline-safe stand-in for the reference's Postgres layer
  * (db_loader.py:117 batched writes, telegraph_processor.py:82-88
  * reads). Asserts the scale behaviors, not just the round-trip:
  * partitioned parallel reads and filter pushdown into the scan.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def seed = (1L to 100L).map(i => (i, s"msg$i", i % 7)).toDF("id", "msg", "grp")

  test("writeJdbc batched round-trip, then append") {
    Sink.writeJdbc(seed, url, "messages", SaveMode.Overwrite, batchSize = 16, props)
    val back = Tables.loadJdbc(spark, url, "messages", props)
    assert(back.count() == 100)
    assert(back.filter(col("id") === 42).select("msg").as[String].head() == "msg42")
    Sink.writeJdbc(Seq((101L, "msg101", 3L)).toDF("id", "msg", "grp"),
      url, "messages", SaveMode.Append, 16, props)
    assert(Tables.loadJdbc(spark, url, "messages", props).count() == 101)
  }

  test("partitioned read splits into parallel range queries") {
    Sink.writeJdbc(seed, url, "part_read", SaveMode.Overwrite, 32, props)
    val df = Tables.loadJdbc(spark, url, "part_read", "id", 1L, 100L, 4, props)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100) // range predicates cover every row exactly once
    assert(df.agg(sum("id")).as[Long].head() == (1L to 100L).sum)
  }

  test("filters and projection push into the JDBC scan") {
    Sink.writeJdbc(seed, url, "pushdown", SaveMode.Overwrite, 32, props)
    val df = Tables.loadJdbc(spark, url, "pushdown", props)
      .filter(col("id") > 90).select("id", "grp")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(ID,90)")
      || plan.contains("GreaterThan(id,90)"), plan)
    assert(df.count() == 10)
  }
}
