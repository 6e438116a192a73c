package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming replication of a non-frozen collection column — the
  * stateful twin of the batch epoch fold in
  * [[graft.cdc.CdcOps.collectionApplyFromLog]], with identical
  * semantics (UnpreparedUpdateOperationHandler.java:55-95: each change
  * is exactly one of putAll / removeAll(cdc$deleted_elements) /
  * whole-cell overwrite).
  *
  * Where the batch operator folds the full history with window
  * arithmetic, this consumer maintains the LIVE collection per key in
  * the state store and applies each change as it arrives, in ChangeId
  * order with checkpoint dedupe — the destination table a reference
  * replicator instance would hold, continuously. State size is
  * O(keys × live entries), the destination's own cardinality;
  * per-stream parallelism comes from the groupByKey shuffle exactly
  * like [[CdcStreamConsumer]].
  */
object CdcCollectionConsumer {

  /** One collection change (kinds are mutually exclusive per row, as
    * in the CDC log: overwrite=true → replace with `put`;
    * `del` non-empty → remove those keys; else merge `put`). */
  case class CollChange(userId: Long, timeUs: Long, eventId: Long,
      put: Map[Int, Double], del: Seq[Int], overwrite: Boolean)

  /** Per-key state: checkpoint + the live collection. */
  case class CollState(lastTimeUs: Long, lastEventId: Long,
      applied: Long, entries: Map[Int, Double])

  /** The collection after a change was applied (one row per applied
    * change — the replicator's write). */
  case class CollSnapshot(userId: Long, timeUs: Long, eventId: Long,
      applied: Long, entries: Map[Int, Double])

  private def isAfter(c: CollChange, s: CollState): Boolean =
    c.timeUs > s.lastTimeUs || (c.timeUs == s.lastTimeUs && c.eventId > s.lastEventId)

  /** Apply one micro-batch's changes for a key: ChangeId order,
    * checkpoint dedupe, fold, snapshot per applied change. */
  def applyGroup(userId: Long, changes: Iterator[CollChange],
      state: GroupState[CollState]): Iterator[CollSnapshot] = {
    var s = state.getOption.getOrElse(CollState(Long.MinValue, Long.MinValue, 0L, Map.empty))
    val ordered = changes.toSeq
      .filter(isAfter(_, s))
      .distinctBy(c => (c.timeUs, c.eventId))
      .sortBy(c => (c.timeUs, c.eventId))
    val out = ordered.map { c =>
      val entries =
        if (c.overwrite) c.put                       // whole-cell tombstone + new value
        else if (c.del.nonEmpty) s.entries -- c.del  // removeAll
        else s.entries ++ c.put                      // putAll / addAll
      s = CollState(c.timeUs, c.eventId, s.applied + 1, entries)
      CollSnapshot(userId, c.timeUs, c.eventId, s.applied, entries)
    }
    if (ordered.nonEmpty) state.update(s)
    out.iterator
  }

  /** Wire a streaming Dataset of collection changes into per-key
    * stateful replication. Pair with
    * `.writeStream.option("checkpointLocation", dir)`; the state store
    * carries the live collections across restarts. */
  def consume(spark: SparkSession, changes: Dataset[CollChange]): Dataset[CollSnapshot] = {
    import spark.implicits._
    changes.groupByKey(_.userId)
      .flatMapGroupsWithState[CollState, CollSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(applyGroup)
  }
}
