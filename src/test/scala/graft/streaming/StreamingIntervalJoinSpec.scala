package graft.streaming

import graft.SparkSpec
import graft.streaming.CdcStreamConsumer.Change
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Spec for [[StreamingIntervalJoin]]: pairs form exactly within the
  * window, only on the same stream key, across batches, and the
  * result matches the equivalent batch join. */
class StreamingIntervalJoinSpec extends SparkSpec {

  test("stream-stream pairs form within the window per stream, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val leftIn = MemoryStream[Change]
    val rightIn = MemoryStream[Change]
    val name = s"sij_${System.nanoTime()}"
    // window ±1s, confidence 100ms
    val query = StreamingIntervalJoin
      .changesWithin(leftIn.toDS(), rightIn.toDS(), windowMs = 1000, confidenceMs = 100)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      val lefts = Seq(
        Change(1, 1000000, 1, 2, 0.0), // pairs with b events at 500ms..2000ms
        Change(2, 1000000, 2, 2, 0.0)) // different stream: only pairs with stream-2 b
      val rights = Seq(
        Change(1, 500000, 11, 1, 0.0),   // in window of a#1 (gap −500ms)
        Change(1, 2000000, 12, 1, 0.0),  // exactly on the +1s boundary of a#1
        Change(1, 2000001, 13, 1, 0.0),  // 1µs past the boundary — no pair
        Change(2, 1500000, 14, 3, 0.0))  // stream 2 only
      leftIn.addData(lefts)
      query.processAllAvailable()
      rightIn.addData(rights) // arrives a batch later: left side is buffered state
      query.processAllAvailable()

      val got = spark.table(name)
        .select("stream_id", "a_event", "b_event", "gap_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = (for {
        a <- lefts; b <- rights
        if a.streamId == b.streamId && math.abs(b.timeUs - a.timeUs) <= 1000000L
      } yield (a.streamId, a.eventId, b.eventId, b.timeUs - a.timeUs)).toSet
      assert(want == Set((1L, 1L, 11L, -500000L), (1L, 1L, 12L, 1000000L),
        (2L, 2L, 14L, 500000L)))
      assert(got == want)
    } finally query.stop()
  }

  test("matches the equivalent batch join on a replayed log") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(3L)
    val lefts = Seq.tabulate(40)(i =>
      Change(rnd.nextInt(3).toLong, rnd.nextInt(5000).toLong * 1000, i.toLong, 2, 0.0))
    val rights = Seq.tabulate(40)(i =>
      Change(rnd.nextInt(3).toLong, rnd.nextInt(5000).toLong * 1000, 100L + i, 1, 0.0))

    val leftIn = MemoryStream[Change]
    val rightIn = MemoryStream[Change]
    val name = s"sijb_${System.nanoTime()}"
    val query = StreamingIntervalJoin
      .changesWithin(leftIn.toDS(), rightIn.toDS(), windowMs = 1000, confidenceMs = 100)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // one batch per side: replay order is arbitrary WITHIN a batch,
      // but a second batch would sit behind the advanced watermark and
      // (correctly) lose its late rows — batch equivalence only holds
      // for data the watermark hasn't passed
      leftIn.addData(lefts); rightIn.addData(rights)
      query.processAllAvailable()

      val streamed = spark.table(name)
        .select("stream_id", "a_event", "b_event").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = (for {
        a <- lefts; b <- rights
        if a.streamId == b.streamId && math.abs(b.timeUs - a.timeUs) <= 1000000L
      } yield (a.streamId, a.eventId, b.eventId)).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally query.stop()
  }
}
