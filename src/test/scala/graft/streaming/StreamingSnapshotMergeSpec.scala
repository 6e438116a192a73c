package graft.streaming

import graft.SparkSpec
import graft.cdc.{CdcOps, CdcSchema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** One conforming CDC-log row (top-level so Spark can derive its
  * encoder without an outer instance). */
case class SnapMergeChange(user_id: Long, event_id: Long, time_us: Long,
    cdc_operation: Int, value: Double, props: String)

/** The streaming snapshot merger must converge to exactly the batch
  * LWW replay, under out-of-order delivery across micro-batches, and
  * its merge must be idempotent (at-least-once safe). */
class StreamingSnapshotMergeSpec extends SparkSpec {

  import CdcSchema._

  private type Change = SnapMergeChange
  private val Change = SnapMergeChange

  private val batches: Seq[Seq[Change]] = Seq(
    Seq(Change(1L, 1L, 10L, RowInsert, 1.0, "{}"),
      Change(2L, 2L, 20L, RowInsert, 2.0, "{}"),
      Change(4L, 3L, 30L, RowInsert, 4.0, "{}")),
    Seq(Change(1L, 5L, 80L, RowUpdate, 1.5, "{}"),
      Change(2L, 4L, 50L, RowDelete, 0.0, "{}"),
      Change(3L, 6L, 70L, RowInsert, 3.0, "{}")),
    // late arrivals: older than what already merged — must not win
    Seq(Change(1L, 7L, 40L, RowUpdate, 9.9, "{}"),
      Change(2L, 8L, 45L, RowInsert, 8.8, "{}")))

  private def asLog(rows: Seq[Change]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  test("converges to the batch LWW replay under out-of-order micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val store = new StreamingSnapshotMerge.InMemorySnapshotStore(spark)
    val q = StreamingSnapshotMerge.attach(input.toDF(), store, confidenceUs = 1000000L)
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val got = StreamingSnapshotMerge.liveView(store.read()).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("last_event_id"),
        r.getAs[Long]("last_write_us"), r.getAs[Double]("value"))).toSet
    val replay = CdcOps.replicateLwwFromLog(asLog(batches.flatten)).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("last_event_id"),
        r.getAs[Long]("last_write_us"), r.getAs[Double]("value"))).toSet
    assert(got == replay)
    // the deleted key is a tombstone, not a live row
    assert(!got.exists(_._1 == 2L))
    assert(store.read().filter("user_id = 2 AND deleted").count() == 1)
  }

  test("random logs in random micro-batches converge to the LWW replay (3 seeds)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    for (seed <- Seq(4, 13, 77)) {
      val rnd = new scala.util.Random(seed)
      val ops = (1 to 150).map { i =>
        val op = rnd.nextInt(10) match {
          case 0 | 1 | 2 => RowDelete
          case x if x < 7 => RowInsert
          case _ => RowUpdate
        }
        Change(rnd.nextInt(10).toLong, i.toLong, rnd.nextInt(300).toLong * 10,
          op, rnd.nextInt(1000) / 100.0, "{}")
      }
      val arrival = rnd.shuffle(ops)
      val batches = {
        var rest = arrival
        val acc = scala.collection.mutable.Buffer[Seq[Change]]()
        while (rest.nonEmpty) {
          val k = math.min(rest.length, rnd.nextInt(50) + 1)
          acc += rest.take(k); rest = rest.drop(k)
        }
        acc.toSeq
      }
      val input = MemoryStream[Change]
      val store = new StreamingSnapshotMerge.InMemorySnapshotStore(spark)
      // wide confidence: no tombstone ages out, so anti-resurrection
      // holds for arbitrarily late arrivals in this sweep
      val q = StreamingSnapshotMerge.attach(input.toDF(), store, confidenceUs = 1000000000L)
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()
      val got = StreamingSnapshotMerge.liveView(store.read()).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("last_event_id"),
          r.getAs[Long]("last_write_us"), r.getAs[Double]("value"))).toSet
      val want = CdcOps.replicateLwwFromLog(asLog(ops)).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("last_event_id"),
          r.getAs[Long]("last_write_us"), r.getAs[Double]("value"))).toSet
      assert(got == want, s"seed $seed: ${got.size} vs ${want.size} live rows")
    }
  }

  test("merge is idempotent: re-merging a replayed slice is a no-op") {
    val snapshot = StreamingSnapshotMerge.mergeReduced(
      StreamingSnapshotMerge.emptySnapshot(spark),
      StreamingSnapshotMerge.reduceSlice(asLog(batches.flatten)))
    val again = StreamingSnapshotMerge.mergeReduced(
      snapshot, StreamingSnapshotMerge.reduceSlice(asLog(batches.last)))
    assert(again.collect().toSet == snapshot.collect().toSet)
  }

  test("tombstones age out after the confidence window; live rows stay") {
    val snapshot = StreamingSnapshotMerge.mergeReduced(
      StreamingSnapshotMerge.emptySnapshot(spark),
      StreamingSnapshotMerge.reduceSlice(asLog(batches.flatten)))
    // now=80, confidence=10: the u2 tombstone (t50) is out of window
    val trimmed = StreamingSnapshotMerge.trim(snapshot, nowUs = 80L, confidenceUs = 10L)
    assert(trimmed.filter("deleted").count() == 0)
    assert(trimmed.count() == snapshot.filter("NOT deleted").count())
    // inside the window the tombstone survives
    assert(StreamingSnapshotMerge.trim(snapshot, 80L, 40L).filter("deleted").count() == 1)
  }

}
