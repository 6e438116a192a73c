package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import CdcStreamConsumer.Change

/** Watermarked STREAM-STREAM interval join: correlate two live CDC
  * change streams on the same stream key within an event-time window
  * — "which changes on stream B landed within ±Δ of each change on
  * stream A" (cross-table write correlation, replication-lag pairing,
  * cause→effect windows). The streaming analogue of the batch
  * interval join ([[graft.analytics.Queries.qRangeJoin]] /
  * the auto-rewritten [[graft.plans.RangeJoinRewrite]] form).
  *
  * This is Structured Streaming's native stream-stream inner join:
  * BOTH sides carry a watermark and the join condition bounds the two
  * event times against each other, so Spark can evict each side's
  * buffered rows once the watermark passes `other side's time + Δ` —
  * state is bounded by (arrival rate × (window + confidence)) per
  * stream key, the same budget the reference's confidence-window
  * reordering buffer obeys (WorkerConfiguration
  * confidenceWindowSizeMs).
  *
  * Scale: state and shuffle key by `streamId` — identical
  * partitioning to every other per-stream operator (64..2^20 streams
  * → natural parallelism); no global state, no driver involvement.
  */
object StreamingIntervalJoin {

  /** Pairs (a, b) with `a.streamId == b.streamId` and
    * `|b.time − a.time| ≤ windowMs`, each side watermarked by
    * `confidenceMs`. Output columns are prefixed `a_` / `b_`. */
  def changesWithin(left: Dataset[Change], right: Dataset[Change],
      windowMs: Long, confidenceMs: Long): DataFrame = {
    val a = left.toDF()
      .withColumn("a_time", timestamp_micros(col("timeUs")))
      .withWatermark("a_time", s"$confidenceMs milliseconds")
      .select(col("streamId").as("a_stream"), col("a_time"),
        col("timeUs").as("a_time_us"), col("eventId").as("a_event"),
        col("operation").as("a_op"))
    val b = right.toDF()
      .withColumn("b_time", timestamp_micros(col("timeUs")))
      .withWatermark("b_time", s"$confidenceMs milliseconds")
      .select(col("streamId").as("b_stream"), col("b_time"),
        col("timeUs").as("b_time_us"), col("eventId").as("b_event"),
        col("operation").as("b_op"))
    a.join(b,
        col("a_stream") === col("b_stream") &&
          col("b_time") >= col("a_time") - expr(s"INTERVAL $windowMs MILLISECONDS") &&
          col("b_time") <= col("a_time") + expr(s"INTERVAL $windowMs MILLISECONDS"))
      .select(col("a_stream").as("stream_id"),
        col("a_event"), col("a_op"), col("a_time_us"),
        col("b_event"), col("b_op"), col("b_time_us"),
        (col("b_time_us") - col("a_time_us")).as("gap_us"))
  }
}
