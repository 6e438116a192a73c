package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING twin of [[graft.pipeline.Dedup.exact]] — first-sighting
  * exact dedup on a LIVE document stream: every document whose content
  * digest was already seen inside the watermark horizon is dropped,
  * the first sighting flows through. This is the ingest-time guard a
  * continuously-fed training corpus needs — exact batch dedup still
  * runs downstream for cross-horizon duplicates; this stage keeps the
  * hot path from ever landing the bulk of them.
  *
  * Built on `dropDuplicatesWithinWatermark`: state holds one entry per
  * DISTINCT digest seen within the watermark delay and is evicted as
  * the watermark passes — state size is O(distinct recent docs),
  * independent of stream length, and the digest-keyed state exchange
  * is the same per-key layout as every stateful operator here. (Plain
  * `dropDuplicates` would grow state forever; a 100 TB/day feed would
  * OOM the state store in hours.)
  */
object StreamingDedup {

  /** Deduplicate a streaming document frame on md5(text). `timeCol`
    * is the event-time column the watermark rides on; duplicates
    * arriving within `watermarkDelay` of each other collapse to the
    * first sighting (later-than-horizon repeats are the batch layer's
    * job — the standard streaming/batch split of responsibility). */
  def dedup(docs: DataFrame, timeCol: String, watermarkDelay: String): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .withWatermark(timeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("digest")
}
