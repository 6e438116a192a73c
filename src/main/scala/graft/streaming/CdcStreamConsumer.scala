package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming CDC consumer: per-stream ordered, exactly-once
  * delivery with checkpointable progress.
  *
  * Reference semantics (scylla-cdc-base .../model/worker/Worker.java,
  * TaskAction.java, scylla-cdc-lib/CDCConsumer.java): a worker loops
  * per task — read the next window's changes in ChangeId order, hand
  * each to the consumer, remember lastConsumedChangeId so a restart
  * resumes without re-delivering.
  *
  * Spark-first re-expression: `groupByKey(stream_id)` +
  * `flatMapGroupsWithState` — the framework shuffles each stream's
  * changes to one task (the vnode→worker assignment), the state store
  * holds lastConsumed (the reference's TaskState/checkpoint), and
  * `writeStream.option("checkpointLocation", …)` makes resume exactly
  * the reference's saved-state restart. Scale: state is per-stream
  * (2^20 streams at 100 TB), partitioned by the shuffle — no
  * single-node state bottleneck.
  */
object CdcStreamConsumer {

  /** One CDC change addressed by (streamId, ChangeId=(timeUs, eventId)). */
  case class Change(streamId: Long, timeUs: Long, eventId: Long,
      operation: Int, value: Double)

  /** Per-stream checkpoint state: the reference's lastConsumedChangeId. */
  case class StreamProgress(lastTimeUs: Long, lastEventId: Long, delivered: Long)

  /** A delivered change, stamped with its per-stream sequence number. */
  case class Delivered(streamId: Long, timeUs: Long, eventId: Long,
      operation: Int, value: Double, seqNo: Long)

  private def isAfter(c: Change, p: StreamProgress): Boolean =
    c.timeUs > p.lastTimeUs || (c.timeUs == p.lastTimeUs && c.eventId > p.lastEventId)

  /** Deliver one micro-batch's changes for a stream: sort to ChangeId
    * order, drop anything at or before the checkpoint (duplicates /
    * replays), advance the checkpoint. */
  def deliverGroup(streamId: Long, changes: Iterator[Change],
      state: GroupState[StreamProgress]): Iterator[Delivered] = {
    val progress = state.getOption.getOrElse(StreamProgress(Long.MinValue, Long.MinValue, 0L))
    val ordered = changes.toSeq
      .filter(isAfter(_, progress))
      .sortBy(c => (c.timeUs, c.eventId))
    if (ordered.isEmpty) Iterator.empty
    else {
      val out = ordered.zipWithIndex.map { case (c, i) =>
        Delivered(c.streamId, c.timeUs, c.eventId, c.operation, c.value,
          progress.delivered + i + 1)
      }
      val lastC = ordered.last
      state.update(StreamProgress(lastC.timeUs, lastC.eventId, progress.delivered + ordered.size))
      out.iterator
    }
  }

  /** Wire a streaming Dataset of raw changes into ordered per-stream
    * delivery. Append-mode output; pair with
    * `.writeStream.option("checkpointLocation", dir)` for resume. */
  def consume(spark: SparkSession, changes: Dataset[Change]): Dataset[Delivered] = {
    import spark.implicits._
    changes.groupByKey(_.streamId)
      .flatMapGroupsWithState[StreamProgress, Delivered](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(deliverGroup)
  }
}
