package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media (image/audio/video) as opaque
  * `binary` payload columns with typed metadata, and a batched
  * decode/feature-extract operator.
  *
  * Design for 100 TB:
  *  - payloads stay opaque `BinaryType` columns — Parquet stores them
  *    contiguously, column pruning means metadata-only queries never read
  *    the bytes;
  *  - decode runs per-partition over an iterator (mapPartitions on a
  *    typed Dataset), so a real codec can amortize init (model load,
  *    JNI context) across a whole batch — the Scala analog of a batched
  *    pandas-UDF;
  *  - partitioning guidance: media rows are large, so size partitions by
  *    bytes (spark.sql.files.maxPartitionBytes), not row count, and keep
  *    feature outputs in a separate narrow table keyed by id so later
  *    joins never drag payloads through a shuffle.
  *
  * STUB: the actual byte decoding is a deterministic fake (this
  * environment ships no image/audio codecs). `decodeStub` derives
  * pseudo-features from payload length and a content hash; swap
  * [[MediaDecoder.decode]] with a real codec in deployment. The Spark
  * plumbing — schema, typed encoders, batch iteration, partition sizing —
  * is the real, tested surface.
  */
object Multimodal {

  final case class MediaItem(id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      id: Long, kind: String, nBytes: Int,
      width: Int, height: Int, nFrames: Int, checksum: Long)

  /** Swappable per-batch decoder. Real deployments replace `decode`
    * with a codec call; init cost is paid once per partition. */
  trait MediaDecoder extends Serializable {
    def decode(item: MediaItem): MediaFeatures
  }

  /** Deterministic fake decode: features from payload size and a weak
    * rolling checksum. Marks the stubbed boundary. */
  object decodeStub extends MediaDecoder {
    def decode(item: MediaItem): MediaFeatures = {
      var sum = 0L
      var i = 0
      while (i < item.payload.length) {
        sum = sum * 31 + (item.payload(i) & 0xff)
        i += 1
      }
      val n = item.payload.length
      MediaFeatures(item.id, item.kind, n,
        width = (math.abs(sum) % 640).toInt + 1,
        height = (math.abs(sum / 640) % 480).toInt + 1,
        nFrames = n / 100 + 1,
        checksum = sum)
    }
  }

  /** Wrap a DataFrame with (idCol, kindCol, payloadCol binary) into the
    * typed media Dataset. */
  def asMedia(df: DataFrame, idCol: String, kindCol: String, payloadCol: String): Dataset[MediaItem] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(kindCol).as("kind"),
      col(payloadCol).cast("binary").as("payload")).as[MediaItem]
  }

  /** Batched decode: one decoder instance per partition, features out.
    * The mapPartitions boundary is where a real pipeline would hold the
    * codec/model handle. */
  def decodeBatched(media: Dataset[MediaItem], decoder: MediaDecoder = decodeStub): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init would go here (codec context, model load)
      it.map(decoder.decode)
    }
  }

  /** End-to-end: attach payloads, decode, return the narrow feature
    * table (payloads dropped before any downstream shuffle). */
  def extractFeatures(df: DataFrame, idCol: String, kindCol: String, payloadCol: String): DataFrame =
    decodeBatched(asMedia(df, idCol, kindCol, payloadCol)).toDF()

  /** Frame sampling: one row per kept frame, every `everyN`-th frame of
    * each item — pure sequence/explode, no payload touched (frame decode
    * happens later, batched, only for kept frames). */
  def sampleFrames(features: DataFrame, everyN: Int): DataFrame =
    features.withColumn("frame_idx",
      explode(expr(s"sequence(0, nFrames - 1, $everyN)")))

  /** Resize plan: clamp decoded dimensions into a bounding box keeping
    * aspect (integer math, deterministic). The actual pixel resample is
    * part of the stubbed codec boundary. */
  def resizePlan(features: DataFrame, maxW: Int, maxH: Int): DataFrame =
    features
      .withColumn("scale_num",
        least(lit(maxW) * col("height"), lit(maxH) * col("width")))
      .withColumn("out_w",
        least(col("width"), expr(s"scale_num div height")).cast("int"))
      .withColumn("out_h",
        least(col("height"), expr(s"scale_num div width")).cast("int"))
      .drop("scale_num")
}
