package graft.streaming

import graft.SparkSpec
import graft.cdc.{CdcSchema, DebeziumAdapter}
import graft.cdc.DebeziumAdapterSpec.LogRow
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming Debezium emit: the published topic must equal the batch
  * operator at every micro-batch boundary (whole Scylla batches
  * arrive together — the native contract), a split image degrades to
  * the DOCUMENTED lanes rather than silently, and replayed
  * micro-batches are re-emitted byte-identically and dropped by the
  * header-resume rule. */
class StreamingDebeziumEmitSpec extends SparkSpec {

  import CdcSchema._

  private def asLog(rows: Seq[LogRow]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  private val batches: Seq[Seq[LogRow]] = Seq(
    Seq( // plain inserts across two streams
      LogRow(1L, 1000L, 0, RowInsert, 7L, 1L, Some(1.25), Some("a"), false),
      LogRow(2L, 1000L, 0, RowInsert, 8L, 2L, Some(2.50), Some("b"), false)),
    Seq( // one full Scylla batch: preimage + update + postimage
      LogRow(1L, 2000L, 0, PreImage, 7L, 3L, Some(1.25), Some("a"), false),
      LogRow(1L, 2000L, 1, RowUpdate, 7L, 3L, Some(9.00), Some("c"), false),
      LogRow(1L, 2000L, 2, PostImage, 7L, 3L, Some(9.00), Some("c"), false),
      // and a delete with its preimage
      LogRow(2L, 2000L, 0, PreImage, 8L, 4L, Some(2.50), Some("b"), false),
      LogRow(2L, 2000L, 1, RowDelete, 8L, 4L, None, None, false)),
    Seq( // deleted-value cell: value serializes as an absent field
      LogRow(1L, 3000L, 0, RowUpdate, 7L, 5L, Some(4.00), Some("d"), true))
  )

  private def frameSet(df: DataFrame): Set[(String, String)] =
    df.select(col("key"), col("value")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  test("published topic ≡ the batch emit at every micro-batch boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LogRow]
    val topic = new StreamingDebeziumEmit.InMemoryTopic(spark)
    val q = StreamingDebeziumEmit.attach(input.toDF(), "cdc.events", topic)
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b); q.processAllAvailable()
        val got = frameSet(topic.read())
        val expected = frameSet(DebeziumAdapter.envelopeKafkaFrame(
          DebeziumAdapter.toDebeziumEnvelopes(asLog(batches.take(i + 1).flatten)),
          "cdc.events"))
        assert(got == expected, s"after batch $i: $got vs $expected")
      }
    } finally q.stop()
    // the paired update rode the postimage as after and preimage as
    // before; the deleted-value cell has NO value field
    val values = topic.read().select(col("value")).collect().map(_.getString(0))
    assert(values.exists(_.contains(
      """"before":{"user_id":7,"event_id":3,"value":1.25,"props":"a"}""")))
    assert(values.exists(v => v.contains(""""op":"d"""") &&
      v.contains(""""before":{"user_id":8,"event_id":4,"value":2.50,"props":"b"}""")))
    val deletedCell = values.find(_.contains(""""event_id":5""")).get
    assert(!deletedCell.contains(""""value""""), deletedCell)
  }

  test("an image split from its delta degrades to the documented lanes, never silently") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pre = Seq(LogRow(1L, 5000L, 0, PreImage, 9L, 6L, Some(3.00), Some("x"), false))
    val del = Seq(LogRow(1L, 5000L, 1, RowDelete, 9L, 6L, None, None, false))
    val input = MemoryStream[LogRow]
    val topic = new StreamingDebeziumEmit.InMemoryTopic(spark)
    val q = StreamingDebeziumEmit.attach(input.toDF(), "t", topic)
    try {
      input.addData(pre); q.processAllAvailable()
      input.addData(del); q.processAllAvailable()
    } finally q.stop()
    // the delta still emits — with the KEY-ONLY before (its preimage
    // was in another batch), the documented degradation class
    val values = topic.read().select(col("value")).collect().map(_.getString(0))
    assert(values.toSeq == Seq(
      """{"op":"d","ts_ms":5,"before":{"user_id":9,"event_id":6}}"""), values.toSeq)
    // and the stranded image is LOUD in its own batch's lane audit
    val lanes = DebeziumAdapter.emitLanes(asLog(pre))
      .select(col("lane")).collect().map(_.getString(0)).toSeq
    assert(lanes == Seq("orphan_preimage"))
  }

  test("replayed micro-batches re-emit byte-identically; header resume drops them") {
    val rows = batches.head
    val topic = new StreamingDebeziumEmit.InMemoryTopic(spark)
    val first = StreamingDebeziumEmit.frameOf(asLog(rows), "t").localCheckpoint()
    topic.publish(first)
    topic.publish(StreamingDebeziumEmit.frameOf(asLog(rows), "t").localCheckpoint())
    val all = topic.read()
    assert(all.count() == 2 * rows.size)
    assert(frameSet(all).size == rows.size, "replay must be byte-identical")
    // external consumer read the first edition's header high-water
    // marks: the replayed duplicates are strictly-older and drop out
    val marks = Map(1L -> (1000L, 1L), 2L -> (1000L, 2L))
    assert(StreamingDebeziumEmit.resumeAfter(all, marks).count() == 0)
    // a mark BEHIND stream 2 readmits only stream 2's newer change
    val partial = Map(1L -> (1000L, 1L), 2L -> (999L, 0L))
    val re = StreamingDebeziumEmit.resumeAfter(all, partial)
    assert(re.select(col("key")).collect().map(_.getString(0)).toSet == Set("2"))
    // unknown streams pass through (no mark = consume from start)
    assert(StreamingDebeziumEmit.resumeAfter(all, Map(99L -> (0L, 0L))).count() ==
      all.count())
  }
}
