package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Source adapter for DEBEZIUM-STYLE CDC envelopes — the other wire
  * format a Spark CDC library meets in practice: a Kafka topic (or a
  * JSONL dump of one) whose messages carry
  * `{"op": "c|u|d|r", "ts_ms": ..., "before": {row}|null,
  * "after": {row}|null}` (the Debezium change-event envelope; `r` is
  * a snapshot read). [[fromDebeziumJson]] parses such a frame into
  * the SAME conforming CDC-log relation [[CdcLogAdapter]] produces,
  * so every `*FromLog` operator — replication, snapshot merge, MV
  * maintenance, compaction, SCD2, checksum audit, the streaming
  * consumers — runs on a Debezium feed unchanged.
  *
  * Mapping:
  *  - `c` / `r` → ROW_INSERT (a snapshot read upserts like an
  *    insert — the Debezium consumer convention), `u` → ROW_UPDATE,
  *    `d` → ROW_DELETE;
  *  - the row image is `after` for c/u/r and `before` for d (a
  *    Debezium delete's `after` is null — the key lives in the
  *    preimage);
  *  - `time_us = ts_ms · 1000`; stream id is the library's
  *    key-hash convention (`user_id % NumStreams`), since a Kafka
  *    feed's partition is already a key hash;
  *  - envelopes have no Scylla batch structure → seq 0 / end true;
  *    no TTL; no per-column deleted flags.
  *
  * MALFORMED input (unparseable JSON, unknown op, missing image or
  * timestamp) is never silently dropped on the main path alone:
  * [[rejects]] returns the complement with first-failing-rule reason
  * codes — the [[CdcOps.dlq]] posture at the parse boundary.
  *
  * Scale: one `from_json` projection — map-only, fuses into the
  * Kafka/file scan; the conforming relation then shuffles once on
  * whatever key its consumer needs, exactly as with the native
  * adapter. */
object DebeziumAdapter {

  private val rowDdl = "user_id BIGINT, event_id BIGINT, value DOUBLE, props STRING"

  /** The envelope schema `from_json` parses (unknown JSON fields are
    * ignored; absent ones read as null). */
  val envelopeSchema: StructType =
    DataType.fromDDL(
      s"op STRING, ts_ms BIGINT, before STRUCT<$rowDdl>, after STRUCT<$rowDdl>")
      .asInstanceOf[StructType]

  private def parsed(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).as("raw"),
      from_json(col(valueCol), envelopeSchema).as("e"))

  private val image: Column =
    when(col("e.op") === "d", col("e.before")).otherwise(col("e.after"))

  private val wellFormed: Column =
    col("e").isNotNull && col("e.op").isin("c", "u", "d", "r") &&
      col("e.ts_ms").isNotNull && image.isNotNull &&
      image.getField("user_id").isNotNull && image.getField("event_id").isNotNull

  /** Parse a frame carrying envelope JSON in `valueCol` into the
    * conforming CDC-log relation (well-formed envelopes only — route
    * [[rejects]] to a dead-letter sink). */
  def fromDebeziumJson(df: DataFrame, valueCol: String = "value"): DataFrame = {
    val op = when(col("e.op") === "u", CdcSchema.RowUpdate)
      .when(col("e.op") === "d", CdcSchema.RowDelete)
      .otherwise(CdcSchema.RowInsert) // c and r
    parsed(df, valueCol)
      .filter(wellFormed)
      .select(
        (image.getField("user_id") % CdcSchema.NumStreams).as("cdc_stream_id"),
        timestamp_millis(col("e.ts_ms")).as("cdc_time"),
        (col("e.ts_ms") * 1000L).as("time_us"),
        lit(0).as("cdc_batch_seq_no"),
        lit(true).as("cdc_end_of_batch"),
        op.cast("int").as("cdc_operation"),
        lit(null).cast("bigint").as("cdc_ttl"),
        image.getField("user_id").as("user_id"),
        image.getField("event_id").as("event_id"),
        image.getField("value").as("value"),
        image.getField("props").as("props"),
        lit(false).as("cdc_deleted_value"))
  }

  /** The complement of [[fromDebeziumJson]]: every input row that
    * failed parsing, with its first failing rule. */
  def rejects(df: DataFrame, valueCol: String = "value"): DataFrame =
    parsed(df, valueCol)
      .filter(!wellFormed)
      .select(col("raw"),
        // PERMISSIVE from_json yields an all-null struct (not a NULL
        // struct) for garbage, so "didn't parse" is the all-fields-
        // null shape; an empty '{}' envelope is the same class
        when(col("e").isNull || (col("e.op").isNull && col("e.ts_ms").isNull
          && col("e.before").isNull && col("e.after").isNull), "unparseable_json")
          .when(!col("e.op").isin("c", "u", "d", "r"), "unknown_op")
          .when(col("e.ts_ms").isNull, "missing_ts")
          .when(image.isNull, "missing_image")
          .otherwise("missing_key").as("reject_reason"))
}
