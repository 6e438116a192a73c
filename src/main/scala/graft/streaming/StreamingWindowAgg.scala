package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import CdcStreamConsumer.Change

/** Watermarked tumbling-window aggregation over a CDC change stream —
  * the streaming analogue of [[graft.cdc.CdcOps.windowScan]]: per
  * (stream, window) change counts and operation mix, emitted once the
  * watermark passes the window end.
  *
  * Reference semantics: the worker reads each task's changes in
  * bounded time windows and only up to now − confidenceWindow
  * (TaskState.java window arithmetic + WorkerConfiguration
  * confidenceWindowSizeMs); here the window is an event-time `window()`
  * aggregate and the confidence bound is the watermark.
  *
  * Scale: streaming state is keyed by (stream_id, window) — the same
  * per-stream partitioning as every batch operator; watermark eviction
  * bounds state to (streams × windows-in-flight).
  */
object StreamingWindowAgg {

  def windowedCounts(spark: SparkSession, changes: Dataset[Change],
      windowMs: Long, confidenceMs: Long): DataFrame = {
    changes
      .withColumn("event_time", timestamp_micros(col("timeUs")))
      .withWatermark("event_time", s"$confidenceMs milliseconds")
      .groupBy(col("streamId"),
        window(col("event_time"), s"$windowMs milliseconds"))
      .agg(count(lit(1)).as("n_changes"),
        count(when(col("operation") === 2, 1)).as("n_inserts"),
        count(when(col("operation") === 1, 1)).as("n_updates"),
        count(when(col("operation") === 3, 1)).as("n_deletes"),
        min(col("timeUs")).as("window_min_us"),
        max(col("timeUs")).as("window_max_us"))
      .select(col("streamId"), col("window.start").as("window_start"),
        col("n_changes"), col("n_inserts"), col("n_updates"), col("n_deletes"),
        col("window_min_us"), col("window_max_us"))
  }
}
