package graft.streaming

import graft.SparkSpec
import graft.streaming.CdcStreamConsumer.Delivered

/** Spec for [[CdcKafkaSink]] — the kafka-connect module's frame:
  * stream-keyed, JSON-valued, topic-tagged. */
class CdcKafkaSinkSpec extends SparkSpec {

  test("projects key/value/topic with stream-ordered keying") {
    import spark.implicits._
    val ds = Seq(
      Delivered(7, 100, 1, 2, 1.5, 1),
      Delivered(8, 200, 2, 3, 2.5, 1)).toDS()
    val rows = CdcKafkaSink.toKafkaFrame(ds, "cdc-log").collect()
    assert(rows.map(_.getAs[String]("key")).toSet == Set("7", "8"))
    assert(rows.forall(_.getAs[String]("topic") == "cdc-log"))
    val v = rows.find(_.getAs[String]("key") == "7").get.getAs[String]("value")
    for (frag <- Seq("\"streamId\":7", "\"timeUs\":100", "\"eventId\":1",
        "\"operation\":2", "\"seqNo\":1"))
      assert(v.contains(frag), v)
  }

  test("fromKafkaFrame round-trips the sink frame and drops foreign messages") {
    import spark.implicits._
    val original = Seq(
      Delivered(7, 100, 1, 2, 1.5, 1),
      Delivered(8, 200, 2, 3, 2.5, 1))
    val frame = CdcKafkaSink.toKafkaFrame(original.toDS(), "cdc-log")
      // foreign messages on the same topic must be tolerated: garbage,
      // valid JSON missing required fields, and explicit nulls
      .unionByName(Seq(
        ("x", "not json", "cdc-log"),
        ("y", """{"streamId":9}""", "cdc-log"),
        ("z", """{"streamId":9,"timeUs":null,"eventId":1,"operation":2,"value":0.5,"seqNo":1}""", "cdc-log"))
        .toDF("key", "value", "topic"), allowMissingColumns = true)
    val back = CdcKafkaSink.fromKafkaFrame(frame).collect().toSet
    assert(back == original.toSet)
  }

  test("headers carry the source offset; resumeAfter filters on the change id") {
    import spark.implicits._
    val original = Seq(
      Delivered(7, 100, 1, 2, 1.5, 1),
      Delivered(7, 200, 5, 2, 2.5, 2),
      Delivered(8, 150, 3, 3, 3.5, 1))
    val frame = CdcKafkaSink.toKafkaFrame(original.toDS(), "cdc-log")
    // headers are (key, binary-utf8-value) pairs an external consumer
    // can read without parsing the JSON payload
    val hs = frame.selectExpr("key",
      "transform(headers, h -> named_struct('k', h.key, 'v', cast(h.value as string)))  as h")
      .collect().map(r => r.getAs[String]("key") ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => x.getString(0) -> x.getString(1)).toMap)
      .toMap
    assert(hs("8") == Map("cdc.streamId" -> "8", "cdc.timeUs" -> "150", "cdc.eventId" -> "3"))

    // an external consumer resuming from (stream 7 @ timeUs 100,
    // eventId 1) sees only strictly-newer changes of stream 7 — seqNo
    // never participates (it restarts under a fresh producing query)
    val resumed = CdcKafkaSink.resumeAfter(
      CdcKafkaSink.fromKafkaFrame(frame), Map(7L -> ((100L, 1L)))).collect().toSet
    assert(resumed == Set(original(1), original(2)))
  }
}
