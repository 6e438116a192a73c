package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adapts the driver's `events` table into a CDC-log-shaped relation.
  *
  * The reference consumes a Scylla CDC log table whose rows carry
  * `cdc$stream_id / cdc$time / cdc$batch_seq_no / cdc$operation /
  * cdc$ttl / cdc$end_of_batch` metadata plus the base-table columns
  * (scylla-cdc-base .../worker/RawChange.java:43-65). We don't have a
  * Scylla cluster, so this adapter derives an equivalent log
  * deterministically from `events` using only arithmetic that is
  * expressible identically in DuckDB (for the oracle) and in Spark
  * column expressions (whole-stage codegen, no UDFs).
  *
  * Mapping (documented in SURVEY.md §3):
  *  - stream_id   = user_id % 64                (64 CDC streams)
  *  - time        = ts                          (change timestamp)
  *  - batch_seq_no= event_id % 4, end_of_batch = (batch_seq_no == 3)
  *  - operation   = view→ROW_INSERT, click→ROW_UPDATE,
  *                  purchase→ROW_DELETE,
  *                  signup→PRE_IMAGE/POST_IMAGE (event_id parity),
  *                  error→PARTITION_DELETE or one of the four
  *                  range-delete bounds (event_id % 5 buckets)
  *  - ttl         = 86400 for every 10th event, else NULL
  *  - base-table primary key = (user_id, event_id); payload (value,
  *    props); cdc_deleted_value models the per-column `cdc$deleted_X`
  *    flag (RawChange.java:151-182).
  *
  * Scale: this is a pure narrow projection — no shuffle, fully
  * pushdown-friendly; at 100 TB it is a map-only stage fused into
  * whatever consumes it.
  */
object CdcLogAdapter {

  def fromEvents(events: DataFrame): DataFrame = fromEvents(events, Nil)

  /** [[fromEvents]] plus caller-supplied extra payload columns
    * (computed over the raw `events` columns) — used by the
    * collection-cell variant below. */
  def fromEvents(events: DataFrame, extra: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val eid = col("event_id")
    val op = when(col("event_type") === "view", CdcSchema.RowInsert)
      .when(col("event_type") === "click", CdcSchema.RowUpdate)
      .when(col("event_type") === "purchase", CdcSchema.RowDelete)
      .when(col("event_type") === "signup",
        when(eid % 2 === 0, CdcSchema.PreImage).otherwise(CdcSchema.PostImage))
      .otherwise( // "error" bucketized into partition/range deletes
        when(eid % 5 === 0, CdcSchema.PartitionDelete)
          .when(eid % 5 === 1, CdcSchema.RangeDeleteInclLeft)
          .when(eid % 5 === 2, CdcSchema.RangeDeleteExclLeft)
          .when(eid % 5 === 3, CdcSchema.RangeDeleteInclRight)
          .otherwise(CdcSchema.RangeDeleteExclRight))
    events.select(Seq(
      (col("user_id") % CdcSchema.NumStreams).as("cdc_stream_id"),
      col("ts").as("cdc_time"),
      unix_micros(col("ts")).as("time_us"),
      (eid % 4).cast("int").as("cdc_batch_seq_no"),
      (eid % 4 === 3).as("cdc_end_of_batch"),
      op.cast("int").as("cdc_operation"),
      when(eid % 10 === 0, lit(86400L)).as("cdc_ttl"),
      col("user_id"),
      col("event_id"),
      col("value"),
      col("props"),
      (eid % 7 === 0 && col("event_type") === "click").as("cdc_deleted_value"))
      ++ extra.map { case (n, c) => c.as(n) }: _*)
  }

  /** The CDC log extended with a non-frozen `map<int,double>` column
    * `attrs`, modeling Scylla's collection-cell encoding
    * (RawChange.java cdc$deleted_elements accessors;
    * UnpreparedUpdateOperationHandler.java:55-95): per change exactly
    * one of
    *  - put: `attrs` carries the added/updated entries
    *    (cdc$deleted_attrs false, cdc$deleted_elements_attrs null),
    *  - element-delete: `cdc_deleted_elements_attrs` carries the
    *    removed keys (attrs null),
    *  - overwrite: `cdc_deleted_attrs` true — the collection is
    *    REPLACED by the entries in `attrs` (Scylla emits a whole-cell
    *    tombstone + the new entries for `SET m = {...}`).
    *
    * Synthetic mapping (DuckDB-expressible): kind = error→overwrite,
    * purchase→element-delete, else put; each row carries
    * n = event_id%3+1 entries with key_i = (event_id+2i)%7 and
    * value_i = value+i (i in 0..n-1); deletes remove the same key set.
    * The 7-key domain forces heavy cross-change key collisions, so
    * every fold branch is exercised. */
  def fromEventsWithCollections(events: DataFrame): DataFrame = {
    val eid = col("event_id")
    val n = (eid % 3 + 1).cast("int")
    val idx = sequence(lit(0), n - lit(1))
    val keys = transform(idx, i => ((eid + i * 2) % 7).cast("int"))
    val vals = transform(idx, i => col("value") + i)
    fromEvents(events, Seq(
      "attrs" -> when(col("event_type") =!= "purchase", map_from_arrays(keys, vals)),
      "cdc_deleted_elements_attrs" -> when(col("event_type") === "purchase", keys),
      "cdc_deleted_attrs" -> (col("event_type") === "error")))
  }

  /** The CDC log extended with a non-frozen `list<double>` column
    * `items`, modeling Scylla's list encoding: a list cell is
    * internally `map<timeuuid, value>` — appends mint fresh,
    * time-ordered timeuuid keys, per-element deletes name the victim
    * keys in `cdc$deleted_elements_X`, and `SET l = [...]` emits a
    * whole-cell tombstone plus fresh entries
    * (UnpreparedUpdateOperationHandler.java:61-67,75-80,108-122 →
    * ListSetIdxTimeUUIDAssignment.java).
    *
    * Synthetic mapping (DuckDB-expressible): each user's changes are
    * sequenced `rn` by (time_us, event_id); the "timeuuid" for the
    * i-th element minted by change rn is `rn*4+i` — unique and
    * MONOTONE per user in change order, exactly the property real
    * timeuuids give Scylla. Kinds: error→overwrite (tombstone + new
    * entries), purchase→element-delete of two keys aimed at recent
    * appends (some hit, some miss — both no-op-delete and live-delete
    * branches are exercised), else append of `event_id%3+1` entries
    * with values `value+i`.
    *
    * The rn window makes this variant one hash exchange on user_id
    * (data synthesis only — a real CDC log arrives with timeuuids
    * already minted, and the fold itself stays one-shuffle). */
  def fromEventsWithList(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")), col("event_id"))
    val ev = events.withColumn("rn", row_number().over(w).cast("long"))
    val e = col("event_id")
    val n = (e % 3 + 1).cast("int")
    val idx = sequence(lit(0), n - lit(1))
    val tuids = transform(idx, i => col("rn") * 4 + i)
    val vals = transform(idx, i => col("value") + i)
    val delKeys = array((col("rn") - 1) * 4 + e % 3, (col("rn") - 2) * 4 + (e + 1) % 3)
    fromEvents(ev, Seq(
      "items" -> when(col("event_type") =!= "purchase", map_from_arrays(tuids, vals)),
      "cdc_deleted_elements_items" -> when(col("event_type") === "purchase", delKeys),
      "cdc_deleted_items" -> (col("event_type") === "error")))
  }

  /** The CDC log extended with a non-frozen UDT column `udt`
    * (struct<f0:double, f1:bigint, f2:string>) plus
    * `cdc$deleted_elements_udt` as a FIELD-INDEX set, modeling
    * Scylla's UDT encoding (UnpreparedUpdateOperationHandler.java:
    * 85-105 → UdtSetFieldAssignment.java): per change, a non-null
    * field is a per-field set, a null field whose index appears in
    * the deleted set is a per-field delete, and a null field absent
    * from the set leaves the destination field UNTOUCHED;
    * `cdc$deleted_udt` is the whole-cell overwrite.
    *
    * Synthetic mapping: field j is null iff (event_id+j)%3==0 (so
    * every change sets ≥2 of 3 fields), deleted iff additionally
    * (event_id+j)%2==0 — i.e. iff (event_id+j)%6==0; error rows
    * overwrite. Pure per-row arithmetic — map-only, like
    * [[fromEventsWithCollections]]. */
  def fromEventsWithUdt(events: DataFrame): DataFrame = {
    val e = col("event_id")
    val f0 = when(e % 3 =!= 0, col("value") + 0.5)
    val f1 = when((e + 1) % 3 =!= 0, e * 7)
    val f2 = when((e + 2) % 3 =!= 0, concat(lit("u"), (e % 10).cast("string")))
    val delIdx = filter(sequence(lit(0), lit(2)), j => (e + j) % 6 === 0)
    fromEvents(events, Seq(
      "udt" -> struct(f0.as("f0"), f1.as("f1"), f2.as("f2")),
      "cdc_deleted_elements_udt" -> when(size(delIdx) > 0, delIdx),
      "cdc_deleted_udt" -> (col("event_type") === "error")))
  }

  /** The same relation as [[fromEvents]], as a DuckDB CTE body over the
    * `events` view — prepended to every CDC oracle query.
    */
  val oracleCte: String =
    """WITH cdc AS (
      |  SELECT
      |    user_id % 64 AS cdc_stream_id,
      |    ts AS cdc_time,
      |    epoch_us(ts) AS time_us,
      |    CAST(event_id % 4 AS INT) AS cdc_batch_seq_no,
      |    (event_id % 4 = 3) AS cdc_end_of_batch,
      |    CAST(CASE event_type
      |      WHEN 'view' THEN 2 WHEN 'click' THEN 1 WHEN 'purchase' THEN 3
      |      WHEN 'signup' THEN (CASE WHEN event_id % 2 = 0 THEN 0 ELSE 9 END)
      |      ELSE (CASE event_id % 5 WHEN 0 THEN 4 WHEN 1 THEN 5 WHEN 2 THEN 6 WHEN 3 THEN 7 ELSE 8 END)
      |    END AS INT) AS cdc_operation,
      |    CASE WHEN event_id % 10 = 0 THEN CAST(86400 AS BIGINT) END AS cdc_ttl,
      |    user_id,
      |    event_id,
      |    value,
      |    props,
      |    (event_id % 7 = 0 AND event_type = 'click') AS cdc_deleted_value
      |  FROM events
      |)
      |""".stripMargin
}
