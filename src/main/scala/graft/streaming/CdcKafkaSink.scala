package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import CdcStreamConsumer.Delivered

/** Kafka-ready projection of delivered changes — the essence of the
  * reference's scylla-cdc-kafka-connect module (a source connector
  * that publishes each change keyed by stream with a structured
  * payload). Spark-side, publishing IS `writeStream.format("kafka")`;
  * what the module contributes is the (key, value, topic) frame and
  * key choice:
  *
  *  - key = the stream id → one Kafka partition consumes each stream
  *    in order (the connector keys by partition key the same way)
  *  - value = JSON of the full change + its delivery sequence
  *
  * Keeping this as a pure projection makes it testable with no broker;
  * wiring it is one `.writeStream.format("kafka")` call. */
object CdcKafkaSink {

  def toKafkaFrame(changes: Dataset[Delivered], topic: String): DataFrame =
    changes.select(
      col("streamId").cast("string").as("key"),
      to_json(struct(col("streamId"), col("timeUs"), col("eventId"),
        col("operation"), col("value"), col("seqNo"))).as("value"),
      lit(topic).as("topic"))

  /** Inverse projection: parse a Kafka (key, value) frame back into
    * delivered changes — the consumer side of the connector topic
    * (a downstream pipeline reading the CDC topic gets typed rows
    * back; `readStream.format("kafka")` + this projection). Rows whose
    * value fails to parse are dropped (null-safe), matching the
    * connector's tolerance of foreign messages on the topic. */
  def fromKafkaFrame(frame: DataFrame): Dataset[Delivered] = {
    import frame.sparkSession.implicits._
    val schema = org.apache.spark.sql.Encoders.product[Delivered].schema
    frame
      .select(from_json(col("value").cast("string"), schema).as("c"))
      .filter(col("c").isNotNull && col("c.streamId").isNotNull)
      .select(col("c.*"))
      .as[Delivered]
  }
}
