package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing (SURVEY C12).
  *
  * Media travel as opaque BINARY columns with a typed metadata struct
  * — the lake-native layout (the decoded pixels/samples never hit the
  * shuffle; only features do). Heavy per-item work runs through
  * `mapPartitions` with explicit micro-batching: the Scala-native
  * equivalent of Python's `mapInPandas` batch contract (batch shape =
  * `batchSize` items, schema preserved + feature column appended).
  *
  * The DECODE ITSELF IS A STUB: real image/audio codecs aren't in
  * this environment, so `decodeStub` derives a deterministic fake
  * feature vector from the bytes' md5. Everything around it — schema,
  * binary handling, batch iteration, partitioning, frame-sample
  * explode — is the real Spark plumbing and is what the specs test.
  *
  * Scale: decode is pure map-side (zero shuffle); `partitionHint`
  * repartitions only when the caller asks (codec work is CPU-bound, so
  * partitions should track cores, not input splits). Frame sampling
  * explodes to (media_id, frame_idx) rows BEFORE decoding so work
  * distributes per-frame, not per-video.
  */
object Multimodal {

  val FeatureDim = 16

  /** Canonical media schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Deterministic synthetic media table (test/bench input): payload
    * bytes are a seeded function of the id, metadata is plausible per
    * kind. */
  def synthesize(spark: SparkSession, n: Int): DataFrame = {
    val kinds = Seq("image", "audio", "video")
    val rows = (0 until n).map { i =>
      val kind = kinds(i % kinds.size)
      val content = Array.tabulate[Byte](64 + i % 64)(j => ((i * 31 + j * 7) % 251).toByte)
      val meta = kind match {
        case "image" => Row(64 + (i % 8) * 16, 48 + (i % 6) * 16, null, null)
        case "audio" => Row(null, null, 16000, (1000L + i * 37L).asInstanceOf[AnyRef])
        case _       => Row(320, 240, null, (2000L + i * 53L).asInstanceOf[AnyRef])
      }
      Row(i.toLong, kind, content, meta)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), mediaSchema)
  }

  /** STUB decode: deterministic fake features from the content's md5
    * (stands in for a real codec + model embedding; marked per the
    * build contract). Returns FeatureDim floats in [-1, 1). */
  private[sources] def decodeStub(content: Array[Byte]): Array[Float] = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(content)
    Array.tabulate(FeatureDim)(i => (d(i % d.length).toInt & 0xff) / 128.0f - 1.0f)
  }

  /** Append a `features array<float>` column, decoding in explicit
    * micro-batches of `batchSize` items per partition (the batch
    * contract a vectorized/stateful codec needs — model weights load
    * once per batch group, not once per row). Null content → null
    * features. */
  def decodeFeatures(media: DataFrame, batchSize: Int = 32): DataFrame = {
    val outSchema = media.schema.add("features", ArrayType(FloatType), nullable = true)
    val enc = RowEncoder.encoderFor(outSchema)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (codec init / model load)
        batch.iterator.map { r =>
          val content = r.get(contentIdx).asInstanceOf[Array[Byte]]
          val feats = if (content == null) null else decodeStub(content)
          Row.fromSeq(r.toSeq :+ feats)
        }
      }
    }(enc)
  }

  /** One row per sampled frame for video media: (media_id, frame_idx,
    * frame_ms) every `everyMs` within meta.duration_ms — the explode
    * happens BEFORE decode so frame work distributes evenly. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video" && col("meta.duration_ms").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))).as("frame_ms"))
      .withColumn("frame_idx", (col("frame_ms") / everyMs).cast("int"))
      .select(col("media_id"), col("frame_idx"), col("frame_ms"))
}
