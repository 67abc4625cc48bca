package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing (builder-brief first-class component).
  *
  * Pattern: media lives as an opaque `binary` column + typed metadata
  * struct; decode / feature-extract run per-partition over the typed
  * Dataset (the Scala analogue of `mapInPandas` batches). The image/audio
  * codecs are NOT in this container, so `decodeStub` is a clearly-marked
  * deterministic fake — the Spark-side contract (schema, batch iteration,
  * partition parallelism, binary handling) is real and tested, and swapping
  * the stub for a JNI/libffi codec changes no plumbing.
  *
  * Scale notes: payloads never leave their partition (no shuffle before
  * feature extraction); metadata-only queries prune the binary column from
  * the parquet scan.
  */
object Multimodal {

  final case class Asset(doc_id: Long, mime: String, width: Int, height: Int,
                         payload: Array[Byte])
  final case class AssetFeature(doc_id: Long, n_bytes: Long, mean_byte: Double,
                                frames_sampled: Int)

  /** Synthesize the asset table from `documents` (text bytes as the opaque
    * payload — the testdata ships no real media). */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    val spark2 = spark
    import spark2.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        lit("image/fake").as("mime"),
        (col("n_chars") % 640).cast(IntegerType).as("width"),
        lit(480).as("height"),
        col("text").cast(BinaryType).as("payload"))
      .as[Asset]
  }

  /** STUB — stands in for the real media decoder (not available in this
    * container). Deterministic: derives features from the raw bytes only.
    * The real implementation replaces ONLY this function. */
  def decodeStub(a: Asset): AssetFeature = {
    val bytes = a.payload
    val mean =
      if (bytes.isEmpty) 0.0
      else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
    // "frame sampling": every 64th byte-offset window stands in for a frame
    val frames = math.max(1, bytes.length / 64)
    AssetFeature(a.doc_id, bytes.length.toLong,
      math.round(mean * 10000).toDouble / 10000, frames)
  }

  /** Per-partition batch decode over the typed Dataset — the mapInPandas
    * batch shape: one iterator per partition, features out. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(decodeStub))
  }

  /** STUB resize — stands in for a real scaler. Deterministic: metadata is
    * rewritten to the target dims; the payload is resampled proportionally
    * (every k-th byte) so payload size tracks the area ratio the way a real
    * resampler's output would. Payloads never leave their partition. */
  def resizeStub(a: Asset, w: Int, h: Int): Asset = {
    val srcArea = math.max(1L, a.width.toLong * a.height)
    val ratio = math.min(1.0, (w.toLong * h).toDouble / srcArea)
    val keep = math.max(1, math.round(a.payload.length * ratio).toInt)
    val step = math.max(1, a.payload.length / keep)
    val out = a.payload.indices.collect {
      case i if i % step == 0 => a.payload(i)
    }.toArray
    Asset(a.doc_id, a.mime, w, h, out)
  }

  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(resizeStub(_, w, h)))
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: every `stride`-th byte window stands in for a decoded
    * video frame (the real decoder replaces the windowing only). One input
    * row fans out to its frames within the partition — no shuffle. */
  def frameSamples(assets: Dataset[Asset], stride: Int = 64): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      val n = math.max(1, a.payload.length / stride)
      (0 until n).map { i =>
        Frame(a.doc_id, i,
          a.payload.slice(i * stride, math.min((i + 1) * stride,
            a.payload.length)))
      }
    }
  }

  /** Registered query: metadata + stub features profile. The corpus-level
    * mean is derived from an exact integer sum of the (already 4dp-rounded)
    * per-doc means — AVG over doubles would depend on partition summation
    * order, which can flip the rounded hash at a different parallelism. */
  def query(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(assets(spark, dir)).toDF()
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        round(sum(round(col("mean_byte") * 10000).cast(LongType))
          .cast(DoubleType) / count(lit(1)) / 10000.0, 4).as("avg_mean_byte"),
        sum(col("frames_sampled")).as("total_frames"))
}
