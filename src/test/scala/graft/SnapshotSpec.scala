package graft

import org.apache.spark.sql.functions._
import graft.operators.Snapshot

/** Snapshot diff (A18): all three change classes, null-safe
  * fingerprints, and change-sized output. */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed and drops unchanged") {
    val before = Seq(
      (1L, "a", Some(10.0)), // unchanged
      (2L, "b", Some(20.0)), // changed value
      (3L, "c", None),       // null → value appears
      (4L, "d", Some(40.0))  // removed
    ).toDF("k", "v1", "v2")
    val after = Seq(
      (1L, "a", Some(10.0)),
      (2L, "b", Some(21.0)),
      (3L, "c", Some(0.0)),
      (5L, "e", Some(50.0))  // added
    ).toDF("k", "v1", "v2")
    val out = Snapshot.diff(before, after, Seq("k"), Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "changed", 4L -> "removed", 5L -> "added"))
  }

  test("fingerprint is null-safe and concat-unambiguous") {
    // ("ab", "c") vs ("a", "bc") must differ; null vs "~" must differ
    val before = Seq((1L, "ab", "c"), (2L, "~", "x")).toDF("k", "v1", "v2")
    val after = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "a", "bc"),
        org.apache.spark.sql.Row(2L, null, "x"))),
      before.schema.copy(fields = before.schema.fields.map(_.copy(nullable = true))))
    val out = Snapshot.diff(before, after, Seq("k"), Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "changed", 2L -> "changed"))
  }
}
