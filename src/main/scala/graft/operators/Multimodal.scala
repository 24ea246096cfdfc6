package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with typed metadata, processed in
  * partition-sized batches.
  *
  * The container has no media codecs, so the DECODE step is a STUB — a
  * deterministic fake feature extractor (documented below) — while
  * everything Spark-side is real and tested: the binary schema, the
  * executor-side batching (`mapPartitions` over a typed Dataset — the
  * Scala analogue of `mapInPandas` batch processing), chunking for
  * range-fetch-style IO, and metadata derivation with codegen'd built-ins.
  */
object Multimodal {

  /** A binary asset row. `bytes` is the opaque media payload. */
  final case class Asset(asset_id: Long, kind: String, bytes: Array[Byte])

  /** Decoded features for one asset (decode step stubbed). */
  final case class AssetFeature(
      asset_id: Long, kind: String, size_bytes: Long, feature: Array[Float])

  /** Build a deterministic synthetic asset table from the documents
    * corpus: payload = utf-8 text bytes, modality round-robins by id.
    * Stands in for a real parquet of media blobs with identical plumbing.
    */
  def syntheticAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"))

  /** Metadata from the binary payload alone (no decode): byte size and a
    * chunk count for `chunkBytes`-sized range reads.
    */
  def withMeta(assets: DataFrame, chunkBytes: Int = 256): DataFrame =
    assets.select(col("asset_id"), col("kind"),
      length(col("bytes")).cast("long").as("size_bytes"),
      ceil(length(col("bytes")) / chunkBytes.toDouble).cast("long").as("n_chunks"))

  /** STUB decode: a real implementation would decode the payload (JPEG
    * grid, PCM frames, video keyframes) inside this partition loop; the
    * container ships no codecs, so features are a deterministic fake —
    * 4 floats derived from payload length and first/middle/last bytes.
    * The Spark-side shape (typed Dataset, per-partition batch loop,
    * fixed-width output vector) is the real contract.
    */
  def decodeFeatures(spark: SparkSession, assets: DataFrame): Dataset[AssetFeature] = {
    import spark.implicits._
    assets.select("asset_id", "kind", "bytes").as[Asset].mapPartitions { it =>
      it.map { a =>
        val n = a.bytes.length
        val f = Array(
          n.toFloat,
          if (n > 0) (a.bytes(0) & 0xff).toFloat else 0f,
          if (n > 0) (a.bytes(n / 2) & 0xff).toFloat else 0f,
          if (n > 0) (a.bytes(n - 1) & 0xff).toFloat else 0f)
        AssetFeature(a.asset_id, a.kind, n.toLong, f)
      }
    }
  }
}
