package graft.streaming

import graft.SparkSpec
import graft.cdc.{CdcOps, CdcSchema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** One conforming CDC-log row (top-level so Spark can derive its
  * encoder without an outer instance). */
case class MvChange(user_id: Long, event_id: Long, time_us: Long,
    cdc_operation: Int, value: Double, props: String)

/** The streaming MV maintainer must track exactly what the batch
  * operator (and a full replay) would produce at every micro-batch
  * boundary — under cross-bucket updates, delete-then-reinsert,
  * out-of-order late arrivals, and at-least-once replays. */
class StreamingMvMaintainSpec extends SparkSpec {

  import CdcSchema._

  private val batches: Seq[Seq[MvChange]] = Seq(
    // buckets are floor(value / 50.00)
    Seq(MvChange(1L, 1L, 10L, RowInsert, 10.00, "{}"),   // b0
      MvChange(2L, 2L, 20L, RowInsert, 60.00, "{}"),     // b1
      MvChange(3L, 3L, 30L, RowInsert, 40.00, "{}")),    // b0
    Seq(MvChange(3L, 4L, 110L, RowUpdate, 120.00, "{}"), // cross-bucket 0 → 2
      MvChange(2L, 5L, 120L, RowDelete, 0.00, "{}"),     // b1 emptied...
      MvChange(4L, 6L, 130L, RowInsert, 55.00, "{}")),   // ...and refilled
    // late arrivals older than what already merged — zero MV effect
    Seq(MvChange(3L, 7L, 50L, RowUpdate, 260.00, "{}"),
      MvChange(2L, 8L, 60L, RowInsert, 99.00, "{}")),
    Seq(MvChange(2L, 9L, 200L, RowInsert, 70.00, "{}"))  // reinsert after delete
  )

  private def asLog(rows: Seq[MvChange]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  /** What a full replay materializes: the batch operator with the
    * whole prefix as the slice over an empty T0 snapshot, live rows. */
  private def replayMv(prefix: Seq[MvChange]): Set[(Long, Long, Double)] =
    CdcOps.mvMaintainFromLog(asLog(prefix), cutoffUs = -1L)
      .filter(col("n_rows") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet

  test("maintained MV ≡ full replay at EVERY micro-batch boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MvChange]
    val keyStore = new StreamingSnapshotMerge.InMemorySnapshotStore(spark)
    val mvStore = new StreamingMvMaintain.InMemoryMvStore(spark)
    val q = StreamingMvMaintain.attach(input.toDF(), keyStore, mvStore)
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b); q.processAllAvailable()
        val got = mvStore.readView().collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val expected = replayMv(batches.take(i + 1).flatten)
        assert(got == expected, s"after batch $i: $got vs $expected")
      }
    } finally q.stop()
    // the final state pins the interesting endgame: b0 lost user 3,
    // b1 carries users 4 and the reinserted 2, b2 holds user 3
    val fin = mvStore.readView().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fin == Seq((0L, 1L, 10.00), (1L, 2L, 125.00), (2L, 1L, 120.00)), fin)
  }

  test("at-least-once: replaying an already-applied slice is a zero delta") {
    val all = asLog(batches.flatten)
    val reduced = StreamingSnapshotMerge.reduceSlice(all).localCheckpoint()
    val state = StreamingSnapshotMerge.mergeReduced(
      StreamingSnapshotMerge.emptySnapshot(spark), reduced).localCheckpoint()
    val mv = StreamingMvMaintain.applyBatch(
      StreamingMvMaintain.emptyMv(spark), StreamingSnapshotMerge.emptySnapshot(spark),
      state, reduced.select(col("user_id"))).localCheckpoint()
    // replay the LAST batch: its merge is a no-op, so pre ≡ post and
    // the MV delta must be exactly zero
    val replayReduced = StreamingSnapshotMerge.reduceSlice(asLog(batches.last))
    val post = StreamingSnapshotMerge.mergeReduced(state, replayReduced)
    val mvAfter = StreamingMvMaintain.applyBatch(
      mv, state, post, replayReduced.select(col("user_id")))
    assert(mvAfter.collect().toSet == mv.collect().toSet)
  }
}
