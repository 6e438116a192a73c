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
      // a foreign/garbage message on the same topic must be tolerated
      .unionByName(Seq(("x", "not json", "cdc-log")).toDF("key", "value", "topic"))
    val back = CdcKafkaSink.fromKafkaFrame(frame).collect().toSet
    assert(back == original.toSet)
  }
}
