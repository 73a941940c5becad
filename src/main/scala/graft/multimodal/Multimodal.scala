package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payloads + typed metadata, processed by
  * partition-batched transforms.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch iteration shape — while the codec itself is STUBBED with a
  * deterministic fake (this container has no image/audio libraries; a
  * deployment drops in a real decoder with the same signature). The
  * Scala analogue of `mapInPandas`: `mapPartitions` over an iterator
  * of rows, so a decoder amortizes model/codec init per partition,
  * not per row.
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("content", BinaryType, nullable = false),   // opaque payload
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Wrap raw binary rows into the media schema (ingest adapter). */
  def asMedia(df: DataFrame, idCol: String, contentCol: String,
              kind: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(contentCol).cast("binary").as("content"),
      lit(mime).as("mime"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /** STUB decoder: a real deployment replaces this with an image
    * codec. The fake is deterministic in the payload bytes: "decodes"
    * dimensions and a fixed-length feature vector from a rolling hash
    * — so pipelines exercising the plumbing have stable golden values.
    */
  def fakeDecode(content: Array[Byte], featDim: Int): (Int, Int, Array[Float]) = {
    var h = 1125899906842597L // FNV-ish rolling hash over the payload
    var i = 0
    while (i < content.length) { h = 31 * h + content(i); i += 1 }
    val w = 16 + math.floorMod(h, 241).toInt
    val ht = 16 + math.floorMod(h >> 8, 241).toInt
    val feats = Array.tabulate(featDim) { d =>
      val hd = h * (d * 2654435761L + 1)
      (math.floorMod(hd, 2000003L) / 1000001.5f) - 1.0f
    }
    (w, ht, feats)
  }

  /** Decode + feature-extract over partition batches (the
    * `mapInPandas` shape): one iterator pass per partition, codec
    * state initialized once per partition. Output keeps the id and
    * adds (width, height, embedding).
    */
  def decodeFeatures(media: DataFrame, featDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val idIdx = media.schema.fieldIndex("media_id")
    val cIdx = media.schema.fieldIndex("content")
    val rdd = media.queryExecution.toRdd.mapPartitions { it =>
      // per-partition codec init happens HERE in a real decoder
      it.map { internal =>
        val id = internal.getLong(idIdx)
        val content = internal.getBinary(cIdx)
        val (w, h, feats) = fakeDecode(content, featDim)
        Row(id, w, h, feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling for video-like payloads: split the payload into
    * `frameSize`-byte frames, keep every `stride`-th — pure
    * expression form (substring over binary), stays distributed.
    */
  def sampleFrames(media: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col("content")) / frameSize).cast("int")
    media.select(col("media_id"),
      posexplode(transform(
        filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => i % stride === 0),
        i => substring(col("content"), (i * frameSize + 1).cast("int"), lit(frameSize))))
        .as(Seq("frame_idx", "frame")))
      .filter(length(col("frame")) === frameSize)
  }

  /** "Resize" stub: truncate/pad payloads to a fixed byte budget —
    * stands in for an image resize; the plumbing (projection over
    * binary, no shuffle) is what's real. */
  def resizeTo(media: DataFrame, bytes: Int): DataFrame =
    media.withColumn("content",
      substring(col("content"), 1, bytes))
      .withColumn("width", least(col("width"), lit(bytes)))
}
