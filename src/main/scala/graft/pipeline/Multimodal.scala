package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2c #35): treat image/audio
  * payloads as opaque `binary` columns with typed metadata, and run
  * feature extraction as a partition-batched transform.
  *
  * The decode step is a STUB — this container has no image/audio
  * codecs — but everything Spark-side is real: the schema (binary +
  * metadata struct), the partitioning (repartition on a content key so
  * one executor batches related payloads), and the batch shape (a
  * `mapPartitions` over typed rows, the Scala analogue of
  * `mapInPandas`: one iterator in, one iterator out, no per-row
  * driver involvement). Swapping the stub for a real JNI/codec call
  * changes no plan shape.
  */
object Multimodal {

  /** A row carrying an opaque media payload + typed metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte],
      width: Int, height: Int, format: String)

  /** Extracted features (what a real decoder would emit). */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
      width: Int, height: Int, format: String, mean_luma: Double)

  /** Attach a synthetic binary payload + metadata to `documents`:
    * the utf-8 bytes of `text` stand in for encoded media; metadata is
    * derived deterministically (so specs can assert on it). */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      ((col("doc_id") % 64) * 16 + 64).cast("int").as("width"),
      ((col("doc_id") % 48) * 16 + 48).cast("int").as("height"),
      when(col("doc_id") % 3 === 0, "png").when(col("doc_id") % 3 === 1, "jpeg")
        .otherwise("webp").as("format"))

  /** STUBBED decode: a real implementation would decode `payload` with
    * an image codec; here we emit deterministic pseudo-features
    * (length, additive checksum, fake luma) so the plumbing is
    * testable. Batch shape: whole-partition iterator — amortizes any
    * per-batch model/codec init exactly like mapInPandas batches. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real codec init would happen once per partition here
      rows.map { r =>
        val checksum = r.payload.foldLeft(0L)((acc, b) => (acc * 131 + (b & 0xff)) % 2147483647L)
        val luma = if (r.payload.isEmpty) 0.0
          else r.payload.map(b => (b & 0xff).toDouble).sum / r.payload.length / 255.0
        MediaFeatures(r.doc_id, r.payload.length.toLong, checksum,
          r.width, r.height, r.format, luma)
      }
    }
  }

  /** End-to-end: attach → repartition by content key → batch-decode.
    * The repartition is the real-world step that co-locates payloads
    * sharing a decode context (same format/shard) before the expensive
    * stage. */
  def pipeline(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    val media = attachBinary(graft.Tables.documents(spark, dir))
      .repartition(col("format"))
    decodeFeatures(spark, media)
  }
}
