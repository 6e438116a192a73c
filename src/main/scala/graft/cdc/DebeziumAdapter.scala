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

  // the parse is FENCED (guide §4.4 via [[graft.functions.OptimizerFence]]):
  // un-fenced, filter pushdown + per-field JSON schema pruning cloned
  // this from_json into 15 copies in the replicate plan, each
  // re-tokenizing the envelope (and re-running the inline to_json
  // synthesis feeding it) — r14, plan-verified. One parse per row.
  private def parsed(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).as("raw"),
      graft.functions.OptimizerFence.once(
        from_json(col(valueCol), envelopeSchema)).as("e"))

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

  /** Deterministic Debezium-envelope synthesis from the `events`
    * table (the piiScrub/multimodal synthesize-from-fields precedent:
    * the oracle rebuilds the IDENTICAL feed with string concatenation
    * and re-parses it with DuckDB's JSON functions, so the whole
    * parse→conform→replicate path is oracle-gated, not just spec'd).
    *
    * Mapping: view→`c`, click→`u`, purchase→`d` (image in `before`),
    * signup→`r`; `ts_ms` = floor(µs/1000); `value` rides as
    * DECIMAL(18,2) so both engines serialize the same number and
    * re-read the same double. ERROR rows become five MALFORMED
    * shapes by `event_id % 5` — one per [[rejects]] reason code
    * (truncated JSON, unknown op, missing ts, imageless delete,
    * keyless image) — so the reject lane is exercised by the driver
    * data itself, not only by literal spec rows. Map-only both ways. */
  def envelopesFromEvents(events: DataFrame): DataFrame = {
    val ms = expr("unix_micros(ts) div 1000") // µs ≥ 0 → div ≡ floor
    val img = struct(col("user_id"), col("event_id"),
      col("value").cast("decimal(18,2)").as("value"), col("props"))
    val kind = when(col("event_type") === "view", "c")
      .when(col("event_type") === "click", "u")
      .when(col("event_type") === "purchase", "d")
      .when(col("event_type") === "signup", "r")
    val well = to_json(struct(
      kind.as("op"), ms.as("ts_ms"),
      when(kind === "d", img).as("before"),
      when(kind =!= "d", img).as("after")))
    val num = (c: Column) => c.cast("string")
    val malformed = when(col("event_id") % 5 === 0,
        concat(lit("{\"op\":\"c\",\"ts_ms\":"), num(ms)))
      .when(col("event_id") % 5 === 1,
        concat(lit("{\"op\":\"x\",\"ts_ms\":"), num(ms),
          lit(",\"after\":{\"user_id\":"), num(col("user_id")),
          lit(",\"event_id\":"), num(col("event_id")), lit(",\"value\":0.0}}")))
      .when(col("event_id") % 5 === 2,
        concat(lit("{\"op\":\"u\",\"after\":{\"user_id\":"), num(col("user_id")),
          lit(",\"event_id\":"), num(col("event_id")), lit(",\"value\":0.0}}")))
      .when(col("event_id") % 5 === 3,
        concat(lit("{\"op\":\"d\",\"ts_ms\":"), num(ms), lit("}")))
      .otherwise(
        concat(lit("{\"op\":\"c\",\"ts_ms\":"), num(ms),
          lit(",\"after\":{\"event_id\":"), num(col("event_id")), lit(",\"value\":0.0}}")))
    events.select(when(kind.isNotNull, well).otherwise(malformed).as("value"))
  }

  /** The envelope feed + oracle CTEs shared by the two driver entries:
    * DuckDB rebuilds the same feed by concatenation and parses it
    * back with json_valid / json_extract — an independent JSON path,
    * not a re-statement of the Spark plan. */
  private val oracleEnvCte: String =
    """WITH env AS (
      |  SELECT CASE event_type WHEN 'view' THEN 'c' WHEN 'click' THEN 'u'
      |           WHEN 'purchase' THEN 'd' WHEN 'signup' THEN 'r' END AS kind,
      |    epoch_us(ts) // 1000 AS ms, user_id, event_id, value, props
      |  FROM events),
      |raw AS (
      |  SELECT CASE
      |    WHEN kind IS NOT NULL THEN
      |      '{"op":"' || kind || '","ts_ms":' || CAST(ms AS VARCHAR) || ',"' ||
      |      CASE WHEN kind = 'd' THEN 'before' ELSE 'after' END ||
      |      '":{"user_id":' || CAST(user_id AS VARCHAR) ||
      |      ',"event_id":' || CAST(event_id AS VARCHAR) ||
      |      ',"value":' || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) ||
      |      ',"props":' || to_json(props) || '}}'
      |    WHEN event_id % 5 = 0 THEN '{"op":"c","ts_ms":' || CAST(ms AS VARCHAR)
      |    WHEN event_id % 5 = 1 THEN '{"op":"x","ts_ms":' || CAST(ms AS VARCHAR)
      |      || ',"after":{"user_id":' || CAST(user_id AS VARCHAR)
      |      || ',"event_id":' || CAST(event_id AS VARCHAR) || ',"value":0.0}}'
      |    WHEN event_id % 5 = 2 THEN '{"op":"u","after":{"user_id":'
      |      || CAST(user_id AS VARCHAR)
      |      || ',"event_id":' || CAST(event_id AS VARCHAR) || ',"value":0.0}}'
      |    WHEN event_id % 5 = 3 THEN '{"op":"d","ts_ms":' || CAST(ms AS VARCHAR) || '}'
      |    ELSE '{"op":"c","ts_ms":' || CAST(ms AS VARCHAR)
      |      || ',"after":{"event_id":' || CAST(event_id AS VARCHAR) || ',"value":0.0}}'
      |  END AS raw_json FROM env),
      |parsed AS (
      |  SELECT raw_json,
      |    json_extract_string(vj, '$.op') AS op,
      |    TRY_CAST(json_extract_string(vj, '$.ts_ms') AS BIGINT) AS ts_ms,
      |    CASE WHEN json_extract_string(vj, '$.op') = 'd'
      |         THEN json_extract(vj, '$.before')
      |         ELSE json_extract(vj, '$.after') END AS img
      |  FROM (SELECT raw_json,
      |          CASE WHEN json_valid(raw_json) THEN raw_json END AS vj
      |        FROM raw)
      |  WHERE vj IS NOT NULL)
      |""".stripMargin

  /** #17z3 driver entry: the full Debezium path — synthesize the
    * envelope feed from `events`, parse with [[fromDebeziumJson]],
    * LWW-replicate the conforming log ([[CdcOps.replicateLwwFromLog]]).
    * Same output shape as `cdc_replicate_lww`, so the oracle proves
    * the second wire format is first-class end to end. */
  def debeziumReplicate(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    CdcOps.replicateLwwFromLog(
      fromDebeziumJson(envelopesFromEvents(graft.Tables.events(spark, dir))))

  val debeziumReplicateSql: String = oracleEnvCte +
    """, log AS (
      |  SELECT CAST(json_extract_string(img, '$.user_id') AS BIGINT) AS user_id,
      |    CAST(json_extract_string(img, '$.event_id') AS BIGINT) AS event_id,
      |    ts_ms * 1000 AS time_us,
      |    CASE op WHEN 'u' THEN 1 WHEN 'd' THEN 3 ELSE 2 END AS cdc_operation,
      |    CAST(json_extract_string(img, '$.value') AS DOUBLE) AS value,
      |    json_extract_string(img, '$.props') AS props
      |  FROM parsed
      |  WHERE op IN ('c', 'u', 'd', 'r') AND ts_ms IS NOT NULL AND img IS NOT NULL
      |    AND json_extract_string(img, '$.user_id') IS NOT NULL
      |    AND json_extract_string(img, '$.event_id') IS NOT NULL)
      |SELECT user_id, event_id AS last_event_id, time_us AS last_write_us,
      |  cdc_operation AS last_op, value, props
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY time_us DESC, event_id DESC) AS rn
      |  FROM log)
      |WHERE rn = 1 AND cdc_operation <> 3
      |ORDER BY user_id""".stripMargin

  /** #17z4 driver entry: the reject lane over the same feed — count
    * per first-failing-rule reason. The oracle classifies with
    * DuckDB's own JSON validator in the same precedence order. */
  def debeziumRejects(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    rejects(envelopesFromEvents(graft.Tables.events(spark, dir)))
      .groupBy(col("reject_reason"))
      .agg(count(lit(1)).as("n_envelopes"))
      .orderBy(col("reject_reason"))

  val debeziumRejectsSql: String = oracleEnvCte +
    """, cls AS (
      |  SELECT json_valid(raw_json) AS ok,
      |    CASE WHEN ok THEN json_extract_string(raw_json, '$.op') END AS op,
      |    CASE WHEN ok THEN TRY_CAST(json_extract_string(raw_json, '$.ts_ms') AS BIGINT) END AS ts_ms,
      |    CASE WHEN ok THEN (CASE WHEN json_extract_string(raw_json, '$.op') = 'd'
      |      THEN json_extract(raw_json, '$.before')
      |      ELSE json_extract(raw_json, '$.after') END) END AS img
      |  FROM raw)
      |SELECT reject_reason, COUNT(*) AS n_envelopes FROM (
      |  SELECT CASE
      |    WHEN NOT ok THEN 'unparseable_json'
      |    WHEN op IS NULL OR op NOT IN ('c', 'u', 'd', 'r') THEN 'unknown_op'
      |    WHEN ts_ms IS NULL THEN 'missing_ts'
      |    WHEN img IS NULL THEN 'missing_image'
      |    WHEN json_extract_string(img, '$.user_id') IS NULL
      |      OR json_extract_string(img, '$.event_id') IS NULL THEN 'missing_key'
      |    END AS reject_reason
      |  FROM cls)
      |WHERE reject_reason IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------ EMIT side

  /** EMIT-side Debezium (#17z5-#17z7): the inverse of
    * [[fromDebeziumJson]] — the actual job of the reference's
    * kafka-connect module (scylla-cdc-kafka-connect/README.md points
    * at the scylla-cdc-source-connector, whose OUTPUT is Debezium
    * change-event envelopes). [[toDebeziumEnvelopes]] maps the
    * conforming CDC log to `op c/u/d` envelopes; [[emitWithSnapshot]]
    * prepends the connector's initial-snapshot phase as `r` (read)
    * envelopes; [[emitLanes]] is the no-silent-drop audit of what the
    * row-envelope format cannot carry.
    *
    * Envelope construction:
    *  - ROW_INSERT → `c` (after = row image), ROW_UPDATE → `u`
    *    (after = row image, before = the paired PRE_IMAGE row's image
    *    when the log carries preimages), ROW_DELETE → `d` (before =
    *    paired preimage, else the key-only image; after null — the
    *    Debezium delete convention [[fromDebeziumJson]] parses).
    *  - A paired POST_IMAGE row (same batch, after the delta — the
    *    Scylla postimage convention) REPLACES the delta's own image
    *    as `after`: deltas carry changed columns, the postimage is
    *    the full row, and Debezium's `after` is the full row.
    *  - A cell whose `cdc_deleted_value` flag is set serializes as an
    *    ABSENT `value` field (null-field omission both engines share).
    *  - `ts_ms` = floor(time_us / 1000) — the envelope's millisecond
    *    clock; the µs residue is the documented information loss of
    *    the wire format (see [[fromDebeziumJson]]'s `time_us` =
    *    `ts_ms·1000`).
    *
    * Image rows are CONSUMED by their paired delta, never emitted as
    * standalone envelopes; partition and range deletes are not
    * representable as Debezium row envelopes at all. Neither class is
    * silently dropped: [[emitLanes]] assigns every log row exactly one
    * lane (the [[rejects]] posture, emit-side).
    *
    * Scale: pairing is a window over the (stream, time, key) batch —
    * batches are a handful of rows, so the frame work is O(batch) per
    * key; one exchange on the batch key, then map-only JSON
    * serialization. The snapshot phase is [[CdcOps.replicateLwwFromLog]]
    * (one key exchange). */
  def toDebeziumEnvelopes(log: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val batch = Window.partitionBy(col("cdc_stream_id"), col("time_us"),
      col("user_id"), col("event_id")).orderBy(col("cdc_batch_seq_no"))
    def img(value: Column, props: Column): Column =
      struct(col("user_id"), col("event_id"), value.as("value"), props.as("props"))
    val rowImg = img(
      when(col("cdc_deleted_value"), lit(null).cast("decimal(18,2)"))
        .otherwise(col("value").cast("decimal(18,2)")),
      col("props"))
    val preImg = last(
        when(col("cdc_operation") === CdcSchema.PreImage, rowImg), ignoreNulls = true)
      .over(batch.rowsBetween(Window.unboundedPreceding, -1))
    val postImg = first(
        when(col("cdc_operation") === CdcSchema.PostImage, rowImg), ignoreNulls = true)
      .over(batch.rowsBetween(1, Window.unboundedFollowing))
    val keyOnly = img(lit(null).cast("decimal(18,2)"), lit(null).cast("string"))
    val op = when(col("cdc_operation") === CdcSchema.RowInsert, "c")
      .when(col("cdc_operation") === CdcSchema.RowUpdate, "u")
      .otherwise("d")
    log
      .filter(col("cdc_operation").isin(CdcSchema.PreImage, CdcSchema.PostImage,
        CdcSchema.RowInsert, CdcSchema.RowUpdate, CdcSchema.RowDelete))
      .select(col("*"), preImg.as("pre_img"), postImg.as("post_img"))
      .filter(col("cdc_operation")
        .isin(CdcSchema.RowInsert, CdcSchema.RowUpdate, CdcSchema.RowDelete))
      .select(col("cdc_stream_id"), col("user_id"), col("event_id"),
        col("time_us"), op.as("op"),
        expr(CdcOps.floorDivSql("time_us", 1000L)).as("ts_ms"),
        when(op === "d", coalesce(col("pre_img"), keyOnly))
          .when(op === "u", col("pre_img")).as("before_img"),
        when(op =!= "d", coalesce(col("post_img"), rowImg)).as("after_img"))
      .select(col("cdc_stream_id"), col("user_id"), col("event_id"),
        col("time_us"), col("op"), col("ts_ms"),
        to_json(struct(col("op"), col("ts_ms"),
          col("before_img").as("before"), col("after_img").as("after")))
          .as("envelope"))
  }

  /** The connector LIFECYCLE: an initial consistent snapshot emitted
    * as `r` (read) envelopes — the LWW state of the log at `cutoffUs`,
    * stamped with the cutoff's millisecond clock — followed by the
    * post-cutoff stream as `c`/`u`/`d`. An external Debezium consumer
    * bootstrapping from this feed materializes exactly the table a
    * native consumer would (the round-trip spec's claim, via
    * [[fromDebeziumJson]]'s r→upsert convention). */
  def emitWithSnapshot(log: DataFrame, cutoffUs: Long): DataFrame = {
    val cutMs = java.lang.Math.floorDiv(cutoffUs, 1000L)
    val rRows = CdcOps.replicateLwwFromLog(log.filter(col("time_us") <= cutoffUs))
      .select(
        (col("user_id") % CdcSchema.NumStreams).as("cdc_stream_id"),
        col("user_id"), col("last_event_id").as("event_id"),
        lit(cutoffUs).as("time_us"), lit("r").as("op"), lit(cutMs).as("ts_ms"),
        to_json(struct(lit("r").as("op"), lit(cutMs).as("ts_ms"),
          struct(col("user_id"), col("last_event_id").as("event_id"),
            col("value").cast("decimal(18,2)").as("value"), col("props"))
            .as("after"))).as("envelope"))
    rRows.unionByName(toDebeziumEnvelopes(log.filter(col("time_us") > cutoffUs)))
  }

  /** Every log row's emit-side fate, exactly one lane per row (the
    * no-silent-drop audit): `emitted` (c/u/d), `consumed_preimage` /
    * `consumed_postimage` (image rows that ride a paired delta's
    * before/after), `orphan_preimage` / `orphan_postimage` (images
    * with no delta in their batch — nothing to attach to),
    * `partition_delete` / `range_delete_bound` (not representable as
    * Debezium row envelopes; a downstream consumer needs the native
    * log for these, exactly as the source connector documents). */
  def emitLanes(log: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val batch = Window.partitionBy(col("cdc_stream_id"), col("time_us"),
      col("user_id"), col("event_id")).orderBy(col("cdc_batch_seq_no"))
    val isRowOp = col("cdc_operation").isin(
      CdcSchema.RowInsert, CdcSchema.RowUpdate, CdcSchema.RowDelete)
    val opsBefore = coalesce(
      sum(when(isRowOp, 1L).otherwise(0L))
        .over(batch.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val opsAfter = coalesce(
      sum(when(isRowOp, 1L).otherwise(0L))
        .over(batch.rowsBetween(1, Window.unboundedFollowing)), lit(0L))
    log.select(col("*"),
      when(isRowOp, "emitted")
        .when(col("cdc_operation") === CdcSchema.PreImage,
          when(opsAfter > 0, "consumed_preimage").otherwise("orphan_preimage"))
        .when(col("cdc_operation") === CdcSchema.PostImage,
          when(opsBefore > 0, "consumed_postimage").otherwise("orphan_postimage"))
        .when(col("cdc_operation") === CdcSchema.PartitionDelete, "partition_delete")
        .otherwise("range_delete_bound").as("lane"))
  }

  /** The publish frame for an emitted envelope feed — the
    * [[graft.streaming.CdcKafkaSink]] discipline applied to the
    * connector's OUTPUT format: key = the stream id (one Kafka
    * partition consumes each stream in order, the connector's
    * partition-key convention), value = the Debezium envelope JSON,
    * and the source offset (streamId, timeUs, eventId) as individual
    * headers so an EXTERNAL consumer can read a partition's tail
    * headers and resume without parsing payloads. Pure projection —
    * wiring it is one `writeStream.format("kafka")` call with
    * `includeHeaders=true`. */
  def envelopeKafkaFrame(envelopes: DataFrame, topic: String): DataFrame = {
    def header(name: String, v: Column) =
      struct(lit(name).as("key"), v.cast("string").cast("binary").as("value"))
    envelopes.select(
      col("cdc_stream_id").cast("string").as("key"),
      col("envelope").as("value"),
      lit(topic).as("topic"),
      array(
        header("cdc.streamId", col("cdc_stream_id")),
        header("cdc.timeUs", col("time_us")),
        header("cdc.eventId", col("event_id"))).as("headers"))
  }

  /** #17z5 driver entry: the emitted feed — snapshot `r` envelopes at
    * [[CdcOps.SnapshotCutoffUs]] + the post-cutoff c/u/d stream, one
    * JSON envelope per row. The oracle rebuilds the IDENTICAL strings
    * with DuckDB concatenation (the string-level gate: field order,
    * null-field omission, decimal rendering and JSON escaping all
    * must agree byte for byte). */
  def debeziumEmit(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    emitWithSnapshot(
      CdcLogAdapter.fromEvents(graft.Tables.events(spark, dir)), CdcOps.SnapshotCutoffUs)
      .select(col("user_id"), col("event_id"), col("op"), col("ts_ms"), col("envelope"))
      .orderBy(col("user_id"), col("event_id"))

  val debeziumEmitSql: String = {
    val cutoff = CdcOps.SnapshotCutoffUs
    val cutMs = java.lang.Math.floorDiv(cutoff, 1000L)
    CdcLogAdapter.oracleCte +
      s""", img AS (
         |  SELECT *,
         |    CASE WHEN cdc_deleted_value THEN NULL
         |         ELSE CAST(value AS DECIMAL(18,2)) END AS img_value
         |  FROM cdc WHERE cdc_operation IN (1, 2, 3)),
         |snap AS (
         |  SELECT user_id, event_id, value, props FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY time_us DESC, event_id DESC) AS rn
         |    FROM cdc WHERE cdc_operation IN (1, 2, 3) AND time_us <= $cutoff)
         |  WHERE rn = 1 AND cdc_operation <> 3),
         |emitted AS (
         |  SELECT user_id, event_id, 'r' AS op, CAST($cutMs AS BIGINT) AS ts_ms,
         |    '{"op":"r","ts_ms":$cutMs,"after":{"user_id":' || CAST(user_id AS VARCHAR)
         |      || ',"event_id":' || CAST(event_id AS VARCHAR)
         |      || COALESCE(',"value":' || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR), '')
         |      || COALESCE(',"props":' || to_json(props), '')
         |      || '}}' AS envelope
         |  FROM snap
         |  UNION ALL
         |  SELECT user_id, event_id,
         |    CASE cdc_operation WHEN 2 THEN 'c' WHEN 1 THEN 'u' ELSE 'd' END AS op,
         |    time_us // 1000 AS ts_ms,
         |    CASE WHEN cdc_operation = 3 THEN
         |      '{"op":"d","ts_ms":' || CAST(time_us // 1000 AS VARCHAR)
         |        || ',"before":{"user_id":' || CAST(user_id AS VARCHAR)
         |        || ',"event_id":' || CAST(event_id AS VARCHAR) || '}}'
         |    ELSE
         |      '{"op":"' || (CASE cdc_operation WHEN 2 THEN 'c' ELSE 'u' END)
         |        || '","ts_ms":' || CAST(time_us // 1000 AS VARCHAR)
         |        || ',"after":{"user_id":' || CAST(user_id AS VARCHAR)
         |        || ',"event_id":' || CAST(event_id AS VARCHAR)
         |        || COALESCE(',"value":' || CAST(img_value AS VARCHAR), '')
         |        || COALESCE(',"props":' || to_json(props), '')
         |        || '}}'
         |    END AS envelope
         |  FROM img WHERE time_us > $cutoff)
         |SELECT user_id, event_id, op, ts_ms, envelope
         |FROM emitted ORDER BY user_id, event_id""".stripMargin
  }

  /** #17z6 driver entry: the emit-side lane audit over the native log
    * — proves by count that emit + consumed images + unrepresentable
    * deletes PARTITION the log (no silent drop). */
  def debeziumEmitLanes(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    emitLanes(CdcLogAdapter.fromEvents(graft.Tables.events(spark, dir)))
      .groupBy(col("lane"))
      .agg(count(lit(1)).as("n_changes"))
      .orderBy(col("lane"))

  val debeziumEmitLanesSql: String = CdcLogAdapter.oracleCte +
    """, lanes AS (
      |  SELECT cdc_operation,
      |    COALESCE(SUM(CASE WHEN cdc_operation IN (1, 2, 3) THEN 1 ELSE 0 END) OVER
      |      (PARTITION BY cdc_stream_id, time_us, user_id, event_id
      |       ORDER BY cdc_batch_seq_no
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ops_before,
      |    COALESCE(SUM(CASE WHEN cdc_operation IN (1, 2, 3) THEN 1 ELSE 0 END) OVER
      |      (PARTITION BY cdc_stream_id, time_us, user_id, event_id
      |       ORDER BY cdc_batch_seq_no
      |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS ops_after
      |  FROM cdc)
      |SELECT lane, COUNT(*) AS n_changes FROM (
      |  SELECT CASE
      |    WHEN cdc_operation IN (1, 2, 3) THEN 'emitted'
      |    WHEN cdc_operation = 0 AND ops_after > 0 THEN 'consumed_preimage'
      |    WHEN cdc_operation = 0 THEN 'orphan_preimage'
      |    WHEN cdc_operation = 9 AND ops_before > 0 THEN 'consumed_postimage'
      |    WHEN cdc_operation = 9 THEN 'orphan_postimage'
      |    WHEN cdc_operation = 4 THEN 'partition_delete'
      |    ELSE 'range_delete_bound' END AS lane
      |  FROM lanes)
      |GROUP BY 1 ORDER BY 1""".stripMargin

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
