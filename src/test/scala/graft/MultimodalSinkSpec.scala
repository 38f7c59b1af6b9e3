package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.sources.{Multimodal, Sink}

class MultimodalSinkSpec extends SparkSpec {
  import spark.implicits._

  test("C12 media schema + batched decode: real pixels/samples, video stub") {
    val media = Multimodal.synthesize(spark, 30)
    assert(media.schema == Multimodal.mediaSchema)
    val feats = Multimodal.decodeFeatures(media, batchSize = 7)
    assert(feats.schema.fieldNames.takeRight(2).toSeq == Seq("features", "decoded"))
    // every synthetic payload decodes for REAL → decoded = true on all
    assert(feats.filter(!col("decoded")).count() == 0)
    val rows = feats.select("media_id", "features").as[(Long, Seq[Float])].collect()
    assert(rows.length == 30)
    rows.foreach { case (_, f) => assert(f.length == Multimodal.FeatureDim) }
    // deterministic: same input → same features on a second run
    val again = Multimodal.decodeFeatures(media, batchSize = 11)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    rows.foreach { case (id, f) => assert(again(id) == f) }
    // the distributed decode must agree with the local real decoders
    // (video = per-frame mean of the real MJPEG frame features)
    val local = media.select("media_id", "kind", "content")
      .as[(Long, String, Array[Byte])].collect().map { case (id, kind, c) =>
        id -> (kind match {
          case "image" => Multimodal.imageFeatures(c).get.toSeq
          case "audio" => Multimodal.audioFeatures(c).get.toSeq
          case _ =>
            val per = Multimodal.videoFrames(c).flatMap(Multimodal.imageFeatures)
            assert(per.nonEmpty, s"video $id should decode for real")
            (0 until Multimodal.FeatureDim).map(i => per.map(_(i)).sum / per.length)
        })
      }.toMap
    rows.foreach { case (id, f) => assert(f == local(id), s"media $id") }
    // image rows carry real dims in features[0..1] matching meta
    val img = feats.filter(col("kind") === "image")
      .select("meta.width", "meta.height", "features")
      .as[(Int, Int, Seq[Float])].collect()
    img.foreach { case (w, h, f) => assert(f(0) == w && f(1) == h) }
  }

  test("C12 real pixel decode: PNG exact round-trip, JPEG dims, resize") {
    // solid-color PNG: means are exact, luma std is 0
    val img = new java.awt.image.BufferedImage(20, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 10).foreach(y => (0 until 20).foreach(x => img.setRGB(x, y, 0x80C040)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val f = Multimodal.imageFeatures(png).get
    assert(f(0) == 20f && f(1) == 10f)
    assert(f(2) == 0x80.toFloat && f(3) == 0xC0.toFloat && f(4) == 0x40.toFloat)
    assert(f(6) == 0f) // solid color → zero luma deviation
    assert(f(7) == 2f) // aspect
    // the 8-bin luma histogram concentrates in the bin of the color's luma
    val luma = 0.299 * 0x80 + 0.587 * 0xC0 + 0.114 * 0x40
    assert(f(8 + math.min((luma / 32).toInt, 7)) == 1f)
    // JPEG (lossy): dims exact, channel means near the original
    val bj = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bj)
    val fj = Multimodal.imageFeatures(bj.toByteArray).get
    assert(fj(0) == 20f && fj(1) == 10f)
    assert(math.abs(fj(2) - 0x80) < 4 && math.abs(fj(3) - 0xC0) < 4)
    // resize: longest side → 5, aspect preserved, color preserved
    val small = Multimodal.resizeImage(png, 5).get
    val fs = Multimodal.imageFeatures(small).get
    assert(fs(0) == 5f && fs(1) == 3f)
    assert(math.abs(fs(2) - 0x80) < 2 && math.abs(fs(4) - 0x40) < 2)
    // junk and null are refused, not thrown
    assert(Multimodal.imageFeatures(Array[Byte](1, 2, 3)) == None)
    assert(Multimodal.imageFeatures(null) == None)
    assert(Multimodal.resizeImage(Array[Byte](9, 9), 5) == None)
  }

  test("C12 real video decode: MJPEG-AVI probe, frame extraction, per-frame rows") {
    val avi = Multimodal.synthAvi(seed = 3, w = 32, h = 24, frames = 4)
    // container probe reads the avih header + vids handler
    assert(Multimodal.probeVideo(avi) == Some(("avi/mjpg", 32, 24, 4)))
    // every extracted frame chunk is a standalone, decodable JPEG
    val frames = Multimodal.videoFrames(avi)
    assert(frames.length == 4)
    frames.foreach { fb =>
      assert(Multimodal.probeImage(fb).map(_._1) == Some("jpeg"))
      val f = Multimodal.imageFeatures(fb).get
      assert(f(0) == 32f && f(1) == 24f)
    }
    // non-AVI payloads are refused, not thrown
    assert(Multimodal.probeVideo("RIFFxxxxWAVE".getBytes) == None)
    assert(Multimodal.probeVideo(Array[Byte](1, 2, 3)) == None)
    assert(Multimodal.probeVideo(null) == None)
    assert(Multimodal.videoFrames("garbage".getBytes).isEmpty)

    // distributed per-frame rows agree with local per-frame decode
    val rows = Seq(
      Row(7L, "video", avi, null),
      Row(8L, "video", Array[Byte](9, 9, 9), null), // undecodable → no rows
      Row(9L, "image", Multimodal.synthPng(1, 8, 8), null)) // filtered out
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val out = Multimodal.decodeFrameFeatures(df)
      .select("media_id", "frame_idx", "features")
      .as[(Long, Int, Seq[Float])].collect().sortBy(_._2)
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((7L, 0), (7L, 1), (7L, 2), (7L, 3)))
    out.foreach { case (_, i, f) =>
      assert(f == Multimodal.imageFeatures(frames(i)).get.toSeq) }

    // a container the JDK cannot decode yields NULL features with
    // decoded = false by default — never fabricated vectors in the
    // same column as real pixel-derived ones
    val blob = Array.tabulate[Byte](64)(j => (j * 7).toByte)
    val stubRow = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "video", blob, null)), 1),
      Multimodal.mediaSchema)
    val honest = Multimodal.decodeFeatures(stubRow)
      .select(col("features").isNull, col("decoded")).as[(Boolean, Boolean)].head()
    assert(honest == ((true, false)))
    // the deterministic stand-in exists only behind the explicit
    // opt-in, and even then the row stays flagged decoded = false
    val stubbed = Multimodal.decodeFeatures(stubRow, stubUndecodableVideo = true)
      .select(col("features"), col("decoded")).as[(Seq[Float], Boolean)].head()
    assert(stubbed._1.length == Multimodal.FeatureDim && !stubbed._2)
  }

  test("C12 hostile payloads degrade to null, never kill the task") {
    // decompression bomb: a valid PNG header declaring 60000×60000
    // (3.6 Gpx ≈ 14 GB decoded) — header-gated before any allocation
    val bomb = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val b = bos.toByteArray
      // IHDR dims live big-endian at offsets 16 (w) and 20 (h)
      val huge = java.nio.ByteBuffer.allocate(8).putInt(60000).putInt(60000).array()
      System.arraycopy(huge, 0, b, 16, 8)
      b
    }
    assert(Multimodal.decodeImage(bomb) == None)
    assert(Multimodal.imageFeatures(bomb) == None)
    // a legitimate image under the cap still decodes
    assert(Multimodal.imageFeatures(Multimodal.synthPng(1, 32, 16)).isDefined)
    // nested-LIST RIFF bomb: thousands of 12-byte LIST levels would
    // StackOverflowError an uncapped recursive walk (an Error — it
    // escapes NonFatal and kills the task); the depth cap refuses it
    val levels = 50000
    val buf = java.nio.ByteBuffer.allocate(12 + levels * 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(4 + levels * 12).put("AVI ".getBytes)
    (0 until levels).foreach { i =>
      val remaining = (levels - i) * 12 - 8
      buf.put("LIST".getBytes).putInt(remaining).put("movi".getBytes)
    }
    val riffBomb = buf.array()
    assert(Multimodal.probeVideo(riffBomb) == None)
    assert(Multimodal.videoFrames(riffBomb).isEmpty)
  }

  test("C12 fuzz: no probe or decoder throws on arbitrary bytes") {
    val rnd = new scala.util.Random(42)
    // random blobs + structured prefixes that enter each parser's
    // deep path (RIFF/PNG/JPEG/fLaC magics with garbage bodies)
    val magics: Seq[Array[Byte]] = Seq(
      "RIFF????AVI ".getBytes("US-ASCII"),
      "RIFF????WAVE".getBytes("US-ASCII"),
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte), // JPEG SOI+APP0
      "fLaC".getBytes("US-ASCII"),
      "GIF89a".getBytes("US-ASCII"),
      "BM".getBytes("US-ASCII"))
    val blobs = (0 until 200).map { i =>
      val n = rnd.nextInt(512)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      if (i % 4 == 0 && n >= 16) {
        val m = magics(i % magics.size)
        System.arraycopy(m, 0, b, 0, math.min(m.length, n))
      }
      b
    } :+ Array.empty[Byte]
    blobs.foreach { b =>
      Multimodal.probeImage(b); Multimodal.probeAudio(b)
      Multimodal.probeVideo(b); Multimodal.videoFrames(b)
      Multimodal.decodeImage(b); Multimodal.imageFeatures(b)
      Multimodal.decodeAudio(b); Multimodal.audioFeatures(b)
      Multimodal.resizeImage(b, 8)
    }
    succeed
  }

  test("C12 real sample decode: WAV sine RMS, stereo fold, junk refused") {
    // mono sine at amplitude 0.5 → rms ≈ 0.5/√2, peak ≈ 0.5
    val wav = Multimodal.synthWav(seed = 1, rate = 16000, durMs = 500)
    val f = Multimodal.audioFeatures(wav).get
    assert(f(0) == 1f && f(1) == 16000f)
    assert(f(2) == 500f) // durationMs from the actual sample count
    assert(math.abs(f(3) - 0.5 / math.sqrt(2)) < 0.01, s"rms=${f(3)}")
    assert(math.abs(f(4) - 0.5) < 0.01, s"peak=${f(4)}")
    // stereo with L = +0.25, R = -0.25 folds to ~silent mono
    val pcm = new Array[Byte](1000 * 4)
    val (l, r) = ((0.25 * 32767).toInt, (-0.25 * 32767).toInt)
    (0 until 1000).foreach { i =>
      pcm(i * 4) = (l & 0xff).toByte; pcm(i * 4 + 1) = ((l >> 8) & 0xff).toByte
      pcm(i * 4 + 2) = (r & 0xff).toByte; pcm(i * 4 + 3) = ((r >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 1000L)
    val b2 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, b2)
    val fs = Multimodal.audioFeatures(b2.toByteArray).get
    assert(fs(0) == 2f && math.abs(fs(3)) < 0.001, s"stereo fold rms=${fs(3)}")
    assert(Multimodal.audioFeatures("nonsense".getBytes) == None)
    assert(Multimodal.audioFeatures(null) == None)
  }

  test("C12 frame sampling explodes per-frame before decode") {
    val media = Multimodal.synthesize(spark, 9)
    val frames = Multimodal.sampleFrames(media, everyMs = 200)
    val byId = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    // only video rows (ids 2,5,8); duration_ms derives from the REAL
    // payload (frames/fps: 5 frames at 10 fps → 500 ms each here)
    assert(byId.keySet == Set(2L, 5L, 8L))
    assert(byId(2L) == (500L + 199) / 200)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame_ms"))
    // meta matches payload: sampling at the frame period (1000/fps)
    // yields exactly one slot per REAL extractable frame
    val perFrame = Multimodal.sampleFrames(media, everyMs = 100)
      .groupBy("media_id").count().as[(Long, Long)].collect().toMap
    val real = media.filter(col("kind") === "video")
      .select("media_id", "content").as[(Long, Array[Byte])].collect()
      .map { case (id, c) => id -> Multimodal.videoFrames(c).length.toLong }.toMap
    assert(perFrame == real)
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

  test("C12 probeAudio parses real WAV/FLAC headers, rejects junk") {
    // canonical 44-byte WAV header + data payload; fmt after a
    // spec-legal LIST chunk in the shuffled variant
    def wav(channels: Int, rate: Int, dataBytes: Int, pre: Array[Byte] = Array()): Array[Byte] = {
      val byteRate = rate * channels * 2
      val b = java.nio.ByteBuffer.allocate(12 + pre.length + 24 + 8 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
      b.put(pre)
      b.put("fmt ".getBytes).putInt(16).putShort(1.toShort).putShort(channels.toShort)
      b.putInt(rate).putInt(byteRate).putShort((channels * 2).toShort).putShort(16.toShort)
      b.put("data".getBytes).putInt(dataBytes).put(new Array[Byte](dataBytes))
      b.array()
    }
    def list(n: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes).putInt(n).put(new Array[Byte](n))
      b.array()
    }
    def flac(channels: Int, rate: Int, totalSamples: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 + 4 + 34)
      b.put("fLaC".getBytes)
      b.put(0x80.toByte).put(0.toByte).put(0.toByte).put(34.toByte) // last block, STREAMINFO
      b.put(new Array[Byte](10)) // block/frame sizes
      // 20-bit rate | 3-bit channels-1 | 5-bit bps-1 | 36-bit samples
      b.put((rate >> 12).toByte).put(((rate >> 4) & 0xff).toByte)
      b.put((((rate & 0xf) << 4) | ((channels - 1) << 1) | 0).toByte)
      b.put(((totalSamples >> 32) & 0xf).toByte)
      b.put(((totalSamples >> 24) & 0xff).toByte).put(((totalSamples >> 16) & 0xff).toByte)
      b.put(((totalSamples >> 8) & 0xff).toByte).put((totalSamples & 0xff).toByte)
      b.array()
    }
    // 16000 Hz stereo 16-bit → byteRate 64000; 32000 bytes = 500 ms
    assert(Multimodal.probeAudio(wav(2, 16000, 32000)) == Some(("wav", 2, 16000, 500L)))
    // fmt chunk AFTER a LIST chunk still found by the walk
    assert(Multimodal.probeAudio(wav(1, 8000, 8000, list(10))) == Some(("wav", 1, 8000, 500L)))
    // 44100 Hz, 22050 samples = 500 ms
    assert(Multimodal.probeAudio(flac(2, 44100, 22050L)) == Some(("flac", 2, 44100, 500L)))
    assert(Multimodal.probeAudio(flac(1, 96000, 96000L * 3600)) == Some(("flac", 1, 96000, 3600000L)))
    assert(Multimodal.probeAudio("RIFFxxxxJUNK".getBytes) == None)
    assert(Multimodal.probeAudio(Array[Byte](1, 2, 3)) == None)
    assert(Multimodal.probeAudio(null) == None)

    val rows = Seq(
      Row(0L, "audio", wav(2, 16000, 32000), null),
      Row(1L, "audio", Array[Byte](9, 9, 9), null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val probed = Multimodal.probeAudioMeta(df)
      .select("media_id", "probed_audio.format", "probed_audio.duration_ms")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) "-" else r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(probed == Set((0L, "wav", 500L), (1L, "-", -1L)))
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
