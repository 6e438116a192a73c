package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** One event on the ingest stream. */
case class SessEvent(user_id: Long, time_us: Long, value: Double)

/** session_window semantics: gap-merge, once-only emit behind the
  * watermark, per-user isolation. */
class StreamingSessionizeSpec extends SparkSpec {

  test("sessions merge within the gap, split across it, emit once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 10L          // 10 ms gap
    val confidenceMs = 5L

    val input = MemoryStream[SessEvent]
    val q = StreamingSessionize.sessions(input.toDF(), gapMs, confidenceMs)
      .writeStream.format("memory").outputMode("append")
      .queryName(s"sess_${System.nanoTime()}").start()
    val name = q.name
    try {
      // user 1: events at 0ms, 5ms (merge), 40ms (new session)
      // user 2: single event at 2ms
      input.addData(Seq(
        SessEvent(1L, 0L, 1.0), SessEvent(1L, 5000L, 2.0),
        SessEvent(2L, 2000L, 5.0)))
      q.processAllAvailable()
      input.addData(Seq(SessEvent(1L, 40000L, 3.0)))
      q.processAllAvailable()
      // far-future event pushes the watermark past every open session
      input.addData(Seq(SessEvent(9L, 10000000L, 0.0)))
      q.processAllAvailable()

      val rows = spark.table(name).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
          r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"),
          r.getAs[Double]("session_value")))
        .filter(_._1 != 9L).sortBy(r => (r._1, r._2)).toSeq
      assert(rows == Seq(
        // [0, 5ms+gap): two merged events; end = last event + gap
        (1L, 0L, 15000L, 2L, 3.0),
        (1L, 40000L, 50000L, 1L, 3.0),
        (2L, 2000L, 12000L, 1L, 5.0)))
      // emitted exactly once: all rows distinct
      assert(rows.distinct.size == rows.size)
    } finally q.stop()
  }
}
