package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DebeziumAdapter contract: envelope-by-envelope mapping on literal
  * messages, loud rejection with first-failing-rule reasons, and the
  * round-trip that matters — a Debezium feed synthesized from the
  * native adapter's own log replicates (LWW) to exactly the same
  * table. */
class DebeziumAdapterSpec extends SparkSpec {

  private def frame(jsons: String*) = {
    import spark.implicits._
    jsons.toDF("value")
  }

  test("literal envelopes: op mapping, image choice, stream/time derivation") {
    val rows = DebeziumAdapter.fromDebeziumJson(frame(
      """{"op":"c","ts_ms":1000,"after":{"user_id":7,"event_id":1,"value":1.5,"props":"{}"}}""",
      """{"op":"u","ts_ms":2000,"before":{"user_id":7,"event_id":1,"value":1.5,"props":"{}"},"after":{"user_id":7,"event_id":2,"value":2.5,"props":"{}"}}""",
      """{"op":"d","ts_ms":3000,"before":{"user_id":7,"event_id":3,"value":2.5,"props":"{}"}}""",
      """{"op":"r","ts_ms":500,"after":{"user_id":71,"event_id":4,"value":9.0,"props":"x"}}"""))
      .orderBy(col("time_us"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Int]("cdc_operation"), r.getAs[Long]("time_us"),
        r.getAs[Long]("cdc_stream_id"), r.getAs[Double]("value")))
    assert(rows.toSeq == Seq(
      (71L, 4L, CdcSchema.RowInsert, 500000L, 71L % CdcSchema.NumStreams, 9.0),
      (7L, 1L, CdcSchema.RowInsert, 1000000L, 7L, 1.5),
      (7L, 2L, CdcSchema.RowUpdate, 2000000L, 7L, 2.5),  // update reads AFTER
      (7L, 3L, CdcSchema.RowDelete, 3000000L, 7L, 2.5))) // delete reads BEFORE
  }

  test("malformed envelopes are rejected with first-failing-rule reasons") {
    val in = frame(
      "not json at all",
      """{"op":"x","ts_ms":1,"after":{"user_id":1,"event_id":1,"value":0.0,"props":""}}""",
      """{"op":"c","after":{"user_id":1,"event_id":1,"value":0.0,"props":""}}""",
      """{"op":"c","ts_ms":1}""",
      """{"op":"d","ts_ms":1,"after":{"user_id":1,"event_id":1,"value":0.0,"props":""}}""",
      """{"op":"c","ts_ms":1,"after":{"value":0.0,"props":""}}""",
      """{"op":"c","ts_ms":9,"after":{"user_id":1,"event_id":1,"value":0.0,"props":""}}""")
    val rej = DebeziumAdapter.rejects(in).collect()
      .map(r => (r.getString(0).take(12), r.getString(1))).toSeq
    assert(rej == Seq(
      ("not json at ", "unparseable_json"),
      ("""{"op":"x","t""", "unknown_op"),
      ("""{"op":"c","a""", "missing_ts"),
      ("""{"op":"c","t""", "missing_image"),
      ("""{"op":"d","t""", "missing_image"),   // a delete's image is BEFORE
      ("""{"op":"c","t""", "missing_key")), rej.mkString("\n"))
    // main path and rejects partition the input
    assert(DebeziumAdapter.fromDebeziumJson(in).count() + rej.length == 7)
  }

  test("streaming topology: envelope stream → adapter → snapshot merge converges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the production shape: Kafka value strings → from_json adapter →
    // continuous snapshot maintenance, across out-of-order batches
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val store = new graft.streaming.StreamingSnapshotMerge.InMemorySnapshotStore(spark)
    val q = graft.streaming.StreamingSnapshotMerge.attach(
      DebeziumAdapter.fromDebeziumJson(input.toDF()), store, confidenceUs = 1000000000L)
    try {
      input.addData(
        """{"op":"c","ts_ms":10,"after":{"user_id":1,"event_id":1,"value":1.0,"props":"{}"}}""",
        """{"op":"c","ts_ms":20,"after":{"user_id":2,"event_id":2,"value":2.0,"props":"{}"}}""")
      q.processAllAvailable()
      input.addData(
        """{"op":"u","ts_ms":80,"after":{"user_id":1,"event_id":3,"value":1.5,"props":"{}"}}""",
        """{"op":"d","ts_ms":50,"before":{"user_id":2,"event_id":4,"value":2.0,"props":"{}"}}""")
      q.processAllAvailable()
      // late arrival older than what merged — must not win
      input.addData(
        """{"op":"u","ts_ms":40,"after":{"user_id":1,"event_id":5,"value":9.9,"props":"{}"}}""")
      q.processAllAvailable()
    } finally q.stop()
    val live = graft.streaming.StreamingSnapshotMerge.liveView(store.read())
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"))).toSet
    assert(live == Set((1L, 1.5)), live.toString)
    assert(store.read().filter("user_id = 2 AND deleted").count() == 1)
  }

  test("round-trip: a Debezium feed of the native log replicates to the same table") {
    val native = CdcLogAdapter.fromEvents(
      graft.Tables.events(spark, "/root/testdata/sf0.001"))
      .filter(col("cdc_operation").isin(
        CdcSchema.RowInsert, CdcSchema.RowUpdate, CdcSchema.RowDelete))
    // synthesize envelopes from the native log (µs reinterpreted as
    // ms — a uniform monotone rescale, so LWW winners are unaffected)
    val opStr = when(col("cdc_operation") === CdcSchema.RowInsert, "c")
      .when(col("cdc_operation") === CdcSchema.RowUpdate, "u")
      .otherwise("d")
    val row = struct(col("user_id"), col("event_id"), col("value"), col("props"))
    val feed = native.select(to_json(struct(
      opStr.as("op"),
      col("time_us").as("ts_ms"),
      when(opStr === "d", row).as("before"),
      when(opStr =!= "d", row).as("after"))).as("value"))

    val viaDebezium = CdcOps.replicateLwwFromLog(
        DebeziumAdapter.fromDebeziumJson(feed))
      .select(col("user_id"), col("last_event_id"), col("value"), col("props"))
      .collect().map(_.toSeq).toSet
    val direct = CdcOps.replicateLwwFromLog(native)
      .select(col("user_id"), col("last_event_id"), col("value"), col("props"))
      .collect().map(_.toSeq).toSet
    assert(viaDebezium == direct && direct.nonEmpty)
    // nothing well-formed was rejected
    assert(DebeziumAdapter.rejects(feed).isEmpty)
  }
}
