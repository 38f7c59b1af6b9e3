package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
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

  test("C12 probeImage parses real PNG/JPEG/GIF/BMP headers, rejects junk") {
    def png(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(26)
      b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h).put(8.toByte).put(6.toByte)
      b.array()
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(2 + 18 + 2 + 9)
      b.put(Array(0xff, 0xd8).map(_.toByte))
      b.put(Array(0xff, 0xe0).map(_.toByte)).putShort(16.toShort).put(new Array[Byte](14)) // APP0
      b.put(Array(0xff, 0xc0).map(_.toByte)).putShort(9.toShort) // SOF0
      b.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      b.array()
    }
    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes ++ Array[Byte]((w & 0xff).toByte, (w >> 8).toByte,
        (h & 0xff).toByte, (h >> 8).toByte)
    def bmp(w: Int, h: Int): Array[Byte] = { // BITMAPINFOHEADER: 32-bit dims
      val b = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(26).putInt(0).putInt(26).putInt(40)
      b.putInt(w).putInt(h)
      b.array()
    }
    def bmpCore(w: Int, h: Int): Array[Byte] = { // BITMAPCOREHEADER: 16-bit dims
      val b = java.nio.ByteBuffer.allocate(22).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(22).putInt(0).putInt(22).putInt(12)
      b.putShort(w.toShort).putShort(h.toShort)
      b.array()
    }
    // JPEG with 0xFF fill padding before the APP0 marker (spec-legal)
    def jpegPadded(w: Int, h: Int): Array[Byte] = {
      val base = jpeg(w, h)
      base.take(2) ++ Array(0xff.toByte, 0xff.toByte) ++ base.drop(2)
    }
    assert(Multimodal.probeImage(png(640, 480)) == Some(("png", 640, 480)))
    assert(Multimodal.probeImage(jpeg(222, 333)) == Some(("jpeg", 222, 333)))
    assert(Multimodal.probeImage(jpegPadded(222, 333)) == Some(("jpeg", 222, 333)))
    assert(Multimodal.probeImage(gif(77, 55)) == Some(("gif", 77, 55)))
    assert(Multimodal.probeImage(bmp(1024, 768)) == Some(("bmp", 1024, 768)))
    assert(Multimodal.probeImage(bmpCore(100, 200)) == Some(("bmp", 100, 200)))
    assert(Multimodal.probeImage(Array[Byte](1, 2, 3, 4, 5)) == None)
    assert(Multimodal.probeImage(null) == None)

    // DataFrame op: probed struct appended map-side
    val rows = Seq(
      Row(0L, "image", png(64, 32), null),
      Row(1L, "image", Array[Byte](9, 9, 9, 9), null),
      Row(2L, "image", null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val probed = Multimodal.probeMeta(df)
      .select("media_id", "probed.format", "probed.width", "probed.height")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) "-" else r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
    assert(probed == Set((0L, "png", 64, 32), (1L, "-", -1, -1), (2L, "-", -1, -1)))
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
