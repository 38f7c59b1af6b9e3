package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{Multimodal, Sink}

class MultimodalSinkSpec extends SparkSpec {
  import spark.implicits._

  test("C12 media schema + deterministic stub decode in batches") {
    val media = Multimodal.synthesize(spark, 30)
    assert(media.schema == Multimodal.mediaSchema)
    val feats = Multimodal.decodeFeatures(media, batchSize = 7)
    assert(feats.schema.fieldNames.last == "features")
    val rows = feats.select("media_id", "features").as[(Long, Seq[Float])].collect()
    assert(rows.length == 30)
    rows.foreach { case (_, f) => assert(f.length == Multimodal.FeatureDim) }
    // deterministic: same input → same features on a second run
    val again = Multimodal.decodeFeatures(media, batchSize = 11)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    rows.foreach { case (id, f) => assert(again(id) == f) }
  }

  test("C12 frame sampling explodes per-frame before decode") {
    val media = Multimodal.synthesize(spark, 9)
    val frames = Multimodal.sampleFrames(media, everyMs = 500)
    val byId = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    // only video rows (ids 2,5,8), duration 2000+53i → ceil(d/500) frames
    assert(byId.keySet == Set(2L, 5L, 8L))
    val d2 = 2000L + 2 * 53L
    assert(byId(2L) == (d2 + 499) / 500)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame_ms"))
  }

  test("E4 partitioned sink enables partition pruning") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/events"
    val df = Seq(
      ("2024-01-01 10:00:00", 1L), ("2024-01-02 11:00:00", 2L),
      ("2024-01-02 12:00:00", 3L)).toDF("ts", "id")
      .withColumn("ts", to_timestamp(col("ts")))
    Sink.writeByDate(df, dir, "ts")
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    val pruned = back.filter(col("dt") === "2024-01-02")
    assert(pruned.count() == 2)
    // pruning proof: the scan carries a partition filter on dt
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("dt"), scan)
  }

  test("E4 bucketed table joins without exchange on the bucket key") {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    Sink.writeBucketed(df, "graft_b1", "k", 4)
    Sink.writeBucketed(df, "graft_b2", "k", 4)
    val joined = spark.table("graft_b1").join(spark.table("graft_b2"), "k")
    assert(joined.count() == 100)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should be shuffle-free:\n$plan")
  }
}
