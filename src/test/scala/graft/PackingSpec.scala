package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Shard packing (C30): the two-phase distributed prefix sum equals
  * the global-window form at any partition count, and oversized docs
  * claim their own shards. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("matches the global-window prefix sum across partition counts") {
    val docs = (1L to 997L).map(i => (i, (i * 37 % 120))).toDF("doc_id", "tok")
    val expected = docs.withColumn("shard",
        floor(coalesce(sum(col("tok")).over(
          Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0)) / 500).cast("long"))
      .select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (parts <- Seq("3", "16")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        val out = Packing.packByBudget(docs, col("doc_id"), col("tok"), 500L)
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        assert(out == expected, s"mismatch at $parts partitions")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("a doc bigger than the budget owns its shard; packing is monotone") {
    val docs = Seq((1L, 10L), (2L, 5000L), (3L, 10L), (4L, 10L))
      .toDF("doc_id", "tok")
    val out = Packing.packByBudget(docs, col("doc_id"), col("tok"), 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 0L && out(2L) == 0L) // giant doc starts in shard 0
    assert(out(3L) == 50L && out(4L) == 50L) // everyone after lands past it
  }
}
