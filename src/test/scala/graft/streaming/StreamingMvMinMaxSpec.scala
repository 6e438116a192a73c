package graft.streaming

import graft.SparkSpec
import graft.cdc.{CdcOps, CdcSchema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** r11 verdict directive #3: the streaming MIN/MAX maintainer must
  * equal the oracle-gated batch operator at every micro-batch
  * boundary — including the delete-the-max-surfaces-the-runner-up
  * case happening LIVE — and replays must be zero-delta. */
class StreamingMvMinMaxSpec extends SparkSpec {

  import CdcSchema._

  private val batches: Seq[Seq[MvChange]] = Seq(
    // buckets are floor(value / 50.00)
    Seq(MvChange(1L, 1L, 10L, RowInsert, 10.00, "{}"),   // b0
      MvChange(2L, 2L, 20L, RowInsert, 60.00, "{}"),     // b1 (runner-up)
      MvChange(3L, 3L, 30L, RowInsert, 70.00, "{}"),     // b1 max
      MvChange(4L, 4L, 40L, RowInsert, 120.00, "{}")),   // b2 — untouched
    // delete b1's max LIVE: the stored runner-up must surface
    Seq(MvChange(3L, 5L, 110L, RowDelete, 0.0, "{}"),
      MvChange(5L, 6L, 120L, RowInsert, 170.00, "{}")),  // b3 created
    // late arrivals older than what already merged — zero MV effect
    Seq(MvChange(3L, 7L, 50L, RowUpdate, 90.00, "{}"),
      MvChange(2L, 8L, 15L, RowInsert, 99.00, "{}")),
    Seq(MvChange(5L, 9L, 200L, RowUpdate, 220.00, "{}")) // cross-bucket 3 → 4
  )

  private def asLog(rows: Seq[MvChange]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  /** What a full replay materializes: the batch operator with the
    * whole prefix as the slice over an empty T0 snapshot, live rows. */
  private def replayMv(prefix: Seq[MvChange]): Set[(Long, Long, Double, Double)] =
    CdcOps.mvMinMaxFromLog(asLog(prefix), cutoffUs = -1L)
      .filter(col("n_rows") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet

  private def view(store: StreamingMvMinMax.InMemoryMvStore): Set[(Long, Long, Double, Double)] =
    store.readView().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet

  test("maintained MIN/MAX MV ≡ batch operator at EVERY micro-batch boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MvChange]
    val keyStore = new StreamingSnapshotMerge.InMemorySnapshotStore(spark)
    val mvStore = new StreamingMvMinMax.InMemoryMvStore(spark)
    val q = StreamingMvMinMax.attach(input.toDF(), keyStore, mvStore)
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b); q.processAllAvailable()
        val got = view(mvStore)
        val expected = replayMv(batches.take(i + 1).flatten)
        assert(got == expected, s"after batch $i: $got vs $expected")
        if (i == 1) // the family's reason to exist, pinned live:
          assert(got.contains((1L, 1L, 60.00, 60.00)),
            s"runner-up did not surface after deleting b1's max: $got")
      }
    } finally q.stop()
    // endgame: b0 intact, b1 on the runner-up, b2 untouched, b4 from
    // the cross-bucket move (b3 emptied and absent)
    assert(view(mvStore) == Set(
      (0L, 1L, 10.00, 10.00), (1L, 1L, 60.00, 60.00),
      (2L, 1L, 120.00, 120.00), (4L, 1L, 220.00, 220.00)))
  }

  test("at-least-once: replaying an already-applied slice is a zero delta") {
    val all = asLog(batches.flatten)
    val reduced = StreamingSnapshotMerge.reduceSlice(all).localCheckpoint()
    val state = StreamingSnapshotMerge.mergeReduced(
      StreamingSnapshotMerge.emptySnapshot(spark), reduced).localCheckpoint()
    val mv = StreamingMvMinMax.applyBatch(
      StreamingMvMinMax.emptyMv(spark), StreamingSnapshotMerge.emptySnapshot(spark),
      state, reduced.select(col("user_id"))).localCheckpoint()
    val replayReduced = StreamingSnapshotMerge.reduceSlice(asLog(batches.last))
    val post = StreamingSnapshotMerge.mergeReduced(state, replayReduced)
    val mvAfter = StreamingMvMinMax.applyBatch(
      mv, state, post, replayReduced.select(col("user_id")))
    assert(mvAfter.collect().toSet == mv.collect().toSet)
  }

  test("randomized sweep: maintainer ≡ batch recompute across seeds, collisions, tombstones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val ops = (1 to 200).map { i =>
        val op = if (rnd.nextInt(5) == 0) RowDelete
          else if (rnd.nextBoolean()) RowUpdate else RowInsert
        // 12 keys and ~25 timestamps force heavy collisions; values
        // straddle several buckets including negatives (floor-div path)
        MvChange(rnd.nextInt(12).toLong, i.toLong, (rnd.nextInt(25) * 10).toLong,
          op, (rnd.nextInt(500) - 100).toDouble + 0.25 * rnd.nextInt(4), "{}")
      }
      val splits = ops.grouped(1 + rnd.nextInt(60)).toSeq
      val input = MemoryStream[MvChange]
      val keyStore = new StreamingSnapshotMerge.InMemorySnapshotStore(spark)
      val mvStore = new StreamingMvMinMax.InMemoryMvStore(spark)
      val q = StreamingMvMinMax.attach(input.toDF(), keyStore, mvStore)
      try {
        splits.foreach { b => input.addData(b); q.processAllAvailable() }
        assert(view(mvStore) == replayMv(ops), s"seed $seed diverged")
      } finally q.stop()
    }
  }
}
