package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING gap-based sessionization — the live twin of
  * [[graft.analytics.Queries.qSessionize]] built on Structured
  * Streaming's native session_window state: windows within `gapMs`
  * of each other merge, and a session is emitted exactly once, when
  * the watermark passes its close (start of the next gap) — the same
  * emit-behind-the-confidence-barrier contract every consumer here
  * follows.
  *
  * Scale: state is keyed by (user, open session) — one open window
  * per active user, evicted at emit; the watermark bounds state to
  * users active inside the confidence horizon, independent of stream
  * history. Session merging is Spark's built-in state-store merge —
  * no custom flatMapGroupsWithState needed for THIS state shape (the
  * CDC consumers keep theirs because per-change ordered delivery is
  * not a windowed aggregate).
  *
  * Input columns: user_id, time_us, value. */
object StreamingSessionize {

  def sessions(events: DataFrame, gapMs: Long, confidenceMs: Long): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(col("time_us")))
      .withWatermark("event_time", s"$confidenceMs milliseconds")
      .groupBy(col("user_id"),
        session_window(col("event_time"), s"$gapMs milliseconds").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"), col("session_value"))
}
