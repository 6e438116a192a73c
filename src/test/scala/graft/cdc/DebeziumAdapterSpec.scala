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

  // ------------------------------------------------------------ emit side

  private def reEmit(log: org.apache.spark.sql.DataFrame) =
    DebeziumAdapter.fromDebeziumJson(
      DebeziumAdapter.toDebeziumEnvelopes(log).select(col("envelope").as("value")))

  test("emit∘parse is identity on emit-normal-form logs; first pass degrades only delete images") {
    val feed = DebeziumAdapter.envelopesFromEvents(
      graft.Tables.events(spark, "/root/testdata/sf0.001"))
    val l0 = DebeziumAdapter.fromDebeziumJson(feed)
    val l1 = reEmit(l0)
    // First pass: every non-delete row round-trips EXACTLY; a delete
    // row's value/props degrade to the key-only `before` (the Scylla
    // convention — a delete mutation carries no non-key values unless
    // a preimage row accompanies it, and a parse-produced log has no
    // preimage rows to pair).
    val expected = l0
      .withColumn("value",
        when(col("cdc_operation") === CdcSchema.RowDelete, lit(null).cast("double"))
          .otherwise(col("value")))
      .withColumn("props",
        when(col("cdc_operation") === CdcSchema.RowDelete, lit(null).cast("string"))
          .otherwise(col("props")))
    assert(l0.count() > 0 && l1.count() == l0.count())
    assert(l1.exceptAll(expected).isEmpty && expected.exceptAll(l1).isEmpty)
    // Emit-normal form reached: the second pass is exact identity.
    val l2 = reEmit(l1)
    assert(l2.exceptAll(l1).isEmpty && l1.exceptAll(l2).isEmpty)
  }

  test("a feed emitted from the native log LWW-replicates identically through the parse path") {
    import org.apache.spark.sql.expressions.Window
    val native = CdcLogAdapter.fromEvents(
      graft.Tables.events(spark, "/root/testdata/sf0.001"))
    val feed = DebeziumAdapter.toDebeziumEnvelopes(native)
      .select(col("envelope").as("value"))
    val wire = CdcOps.replicateLwwFromLog(DebeziumAdapter.fromDebeziumJson(feed))
      .select(col("user_id"), col("last_event_id"), col("value"), col("props"))
      .collect().map(_.toSeq).toSet
    // Expected: the native LWW winners with the deleted-cell projection
    // the wire format applies (a cell whose cdc_deleted_value flag is
    // set serializes as an ABSENT value field — the deletion IS the
    // information; the stale pre-delete bytes are not).
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("time_us").desc, col("event_id").desc)
    val nat = native
      .filter(col("cdc_operation").isin(
        CdcSchema.RowInsert, CdcSchema.RowUpdate, CdcSchema.RowDelete))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1 && col("cdc_operation") =!= CdcSchema.RowDelete)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        when(col("cdc_deleted_value"), lit(null).cast("double"))
          .otherwise(col("value")).as("value"),
        col("props"))
      .collect().map(_.toSeq).toSet
    assert(wire == nat && nat.nonEmpty)
    // and the emitted feed is fully well-formed under the parse gate
    assert(DebeziumAdapter.rejects(feed).isEmpty)
  }

  import DebeziumAdapterSpec.LogRow

  test("pre/postimage rows ride their paired delta; orphans and deletes take the documented lanes") {
    import spark.implicits._
    val log = Seq(
      // one Scylla batch: preimage + update + postimage (full new row)
      LogRow(1L, 5000L, 0, CdcSchema.PreImage, 7L, 3L, Some(1.0), Some("a"), false),
      LogRow(1L, 5000L, 1, CdcSchema.RowUpdate, 7L, 3L, Some(2.0), Some("b"), false),
      LogRow(1L, 5000L, 2, CdcSchema.PostImage, 7L, 3L, Some(9.0), Some("c"), false),
      // delete with preimage: `before` is the preimage, not key-only
      LogRow(1L, 6000L, 0, CdcSchema.PreImage, 7L, 4L, Some(2.5), Some("p"), false),
      LogRow(1L, 6000L, 1, CdcSchema.RowDelete, 7L, 4L, None, None, false),
      // orphan postimage: no delta in its batch — nothing to attach to
      LogRow(2L, 7000L, 0, CdcSchema.PostImage, 8L, 5L, Some(1.0), Some("x"), false)
    ).toDF()
    val env = DebeziumAdapter.toDebeziumEnvelopes(log)
      .orderBy(col("time_us")).collect()
    assert(env.length == 2) // images are consumed, never standalone envelopes
    val u = env(0).getAs[String]("envelope")
    val d = env(1).getAs[String]("envelope")
    // postimage REPLACES the delta's own image as `after` (deltas carry
    // changed columns; Debezium's after is the full row)
    assert(u ==
      """{"op":"u","ts_ms":5,"before":{"user_id":7,"event_id":3,"value":1.00,"props":"a"},"after":{"user_id":7,"event_id":3,"value":9.00,"props":"c"}}""",
      u)
    assert(d ==
      """{"op":"d","ts_ms":6,"before":{"user_id":7,"event_id":4,"value":2.50,"props":"p"}}""",
      d)
    val lanes = DebeziumAdapter.emitLanes(log)
      .groupBy(col("lane")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lanes == Map(
      "emitted" -> 2L, "consumed_preimage" -> 2L,
      "consumed_postimage" -> 1L, "orphan_postimage" -> 1L), lanes.toString)
  }

  test("randomized sweep: hostile props strings survive emit∘parse byte-for-byte") {
    import spark.implicits._
    // JSON-escaping-hostile alphabet: quotes, backslashes, control
    // chars, newlines/tabs, unicode, JSON-lookalike fragments — the
    // classes where a to_json/from_json asymmetry would corrupt
    // payloads silently
    val fragments = Seq("\"", "\\", "\n", "\t", "\r", "{", "}", "[", "]",
      ":", ",", "é", "→", "", "", "plain", "a b", "{\"k\":1}",
      "\\\"nested\\\"", "end\\")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 120).map { i =>
        val op = rnd.nextInt(3) match {
          case 0 => CdcSchema.RowInsert
          case 1 => CdcSchema.RowUpdate
          case _ => CdcSchema.RowDelete
        }
        val props = if (rnd.nextInt(10) == 0) None
          else Some((1 to (1 + rnd.nextInt(4)))
            .map(_ => fragments(rnd.nextInt(fragments.size))).mkString)
        val value = if (rnd.nextInt(10) == 0) None
          else Some((rnd.nextInt(40000) - 20000) / 100.0)
        DebeziumAdapterSpec.LogRow(rnd.nextInt(4).toLong, (1000 + i).toLong * 1000L,
          0, op, rnd.nextInt(20).toLong, i.toLong, value, props,
          rnd.nextInt(12) == 0)
      }
      val log = rows.toDF()
      val parsed = DebeziumAdapter.fromDebeziumJson(
        DebeziumAdapter.toDebeziumEnvelopes(log).select(col("envelope").as("value")))
      // nothing emitted fails the parse gate
      assert(parsed.count() == rows.size, s"seed $seed lost rows")
      val byId = parsed.collect().map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Double]("value")).map(_.toDouble),
          Option(r.getAs[String]("props"))))).toMap
      rows.foreach { in =>
        val (v, p) = byId(in.event_id)
        if (in.cdc_operation == CdcSchema.RowDelete) {
          // unpaired delete: key-only before, the documented class
          assert(v.isEmpty && p.isEmpty, s"seed $seed delete ${in.event_id}")
        } else {
          // deleted-value cells serialize absent; everything else is
          // byte-identical through the wire — hostile props included
          val expectV = if (in.cdc_deleted_value) None else in.value
          assert(v == expectV, s"seed $seed value ${in.event_id}: $v vs $expectV")
          assert(p == in.props, s"seed $seed props ${in.event_id}: $p vs ${in.props}")
        }
      }
    }
  }

  test("envelope Kafka frame: stream-keyed, offset headers, envelope payload") {
    import spark.implicits._
    val log = Seq(
      LogRow(3L, 9000L, 0, CdcSchema.RowInsert, 11L, 6L, Some(4.0), Some("q"), false)
    ).toDF()
    val frame = DebeziumAdapter.envelopeKafkaFrame(
      DebeziumAdapter.toDebeziumEnvelopes(log), "cdc.events").collect()
    assert(frame.length == 1)
    val r = frame(0)
    assert(r.getAs[String]("key") == "3" && r.getAs[String]("topic") == "cdc.events")
    assert(r.getAs[String]("value").startsWith("""{"op":"c","ts_ms":9,"""))
    val headers = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("headers")
      .map(h => h.getAs[String]("key") -> new String(h.getAs[Array[Byte]]("value"), "UTF-8"))
      .toMap
    assert(headers == Map(
      "cdc.streamId" -> "3", "cdc.timeUs" -> "9000", "cdc.eventId" -> "6"), headers.toString)
  }
}

object DebeziumAdapterSpec {
  /** Constructed-log row shape for the emit-side pairing tests
    * (top-level so Spark can derive its product encoder). */
  case class LogRow(cdc_stream_id: Long, time_us: Long,
      cdc_batch_seq_no: Int, cdc_operation: Int, user_id: Long, event_id: Long,
      value: Option[Double], props: Option[String], cdc_deleted_value: Boolean)
}
