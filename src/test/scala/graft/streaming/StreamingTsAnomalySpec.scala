package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class TsEvent(event_type: String, t_us: Long, value: Double)

/** StreamingTsAnomaly: the maintained monitor must equal the
  * oracle-gated batch detector at every micro-batch boundary —
  * including a LATE event revising an old day's verdict — and a
  * replayed batch id must be a committed no-op. */
class StreamingTsAnomalySpec extends SparkSpec {

  private val day = 86400000000L

  private def asEvents(rows: Seq[TsEvent]): DataFrame = {
    import spark.implicits._
    rows.toDF().select(col("event_type"),
      expr("timestamp_micros(t_us)").as("ts"), col("value"))
  }

  // alternating baseline over days 0..8, then a spike day 9, then a
  // LATE event landing back on day 9 (revises the spike), plus a
  // second type whose days arrive out of order
  private val batches: Seq[Seq[TsEvent]] = Seq(
    (0 to 8).map(d => TsEvent("a", d.toLong * day + 100L, if (d % 2 == 0) 10.0 else 11.0)),
    Seq(TsEvent("a", 9L * day + 100L, 100.0),
      TsEvent("b", 3L * day, 5.0), TsEvent("b", 1L * day, 5.0)),
    Seq(TsEvent("a", 9L * day + 200L, -80.0), // late: day 9 total 100 → 20
      TsEvent("b", 2L * day, 9.0), TsEvent("b", 0L, 5.0))
  )

  private def scored(df: DataFrame): Set[(String, Long, Double, Double, Boolean)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getBoolean(4))).toSet

  test("maintained monitor ≡ batch detector at EVERY micro-batch boundary (late revision included)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TsEvent]
    val store = new StreamingTsAnomaly.InMemoryDailyStore(spark)
    val q = StreamingTsAnomaly.attach(
      input.toDF().select(col("event_type"),
        expr("timestamp_micros(t_us)").as("ts"), col("value")), store)
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b); q.processAllAvailable()
        val got = scored(store.anomalies())
        val expected = scored(graft.analytics.TimeSeries.tsAnomalyOn(
          asEvents(batches.take(i + 1).flatten)))
        assert(got == expected, s"after batch $i: $got vs $expected")
        if (i == 1) // the spike flags LIVE when day 9 first lands
          assert(got.exists { case (t, d, _, _, fl) => t == "a" && d == 9L && fl }, got.toString)
      }
    } finally q.stop()
    // after the late −80 revision, day 9's total is 20 and its verdict
    // recomputed against the same baseline (z drops below the spike's)
    val end = scored(store.anomalies())
    val d9 = end.find { case (t, d, _, _, _) => t == "a" && d == 9L }.get
    assert(d9._3 == 20.0, end.toString)
  }

  test("a replayed batch id is a committed no-op (exactly-once by batch id)") {
    val store = new StreamingTsAnomaly.InMemoryDailyStore(spark)
    val b0 = asEvents(batches.head)
    // simulate the foreachBatch body directly, replaying batch id 0
    def run(df: DataFrame, id: Long): Unit =
      if (id > store.appliedThrough)
        store.swap(StreamingTsAnomaly.applyBatch(store.read(), df).localCheckpoint(), id)
    run(b0, 0L)
    val once = store.read().collect().map(_.toSeq).toSet
    run(b0, 0L) // checkpoint-restart replay: same id, must not double-add
    assert(store.read().collect().map(_.toSeq).toSet == once)
    run(b0, 1L) // a genuinely new batch DOES add
    assert(store.read().collect().map(_.toSeq).toSet != once)
  }
}
