package graft.cdc

import org.apache.spark.sql.{DataFrame, Row}

/** Typed per-change facade over a CDC-log Row — the reference's
  * `RawChange` accessor surface (scylla-cdc-base
  * .../model/worker/RawChange.java:16-66 and :131-182), re-expressed
  * over Spark rows so consumer callbacks written against the reference
  * port mechanically.
  *
  * This is a VIEW (zero-copy wrapper) for row-at-a-time consumer code —
  * relational operators should use the `cdc_*` columns directly and
  * stay in codegen; the wrapper exists for the
  * [[graft.streaming.GraftCdcConsumer]] callback path and for tests.
  */
final class RawChange private[cdc] (row: Row) {

  private def idx(name: String): Int = row.fieldIndex(name)

  /** ChangeId = (stream, time[, batch seq]); total order within a stream
    * (ChangeId.java). */
  def getId: (Long, Long, Int) =
    (getStreamId, getTimeUs, getBatchSequenceNumber)

  def getStreamId: Long = row.getLong(idx("cdc_stream_id"))
  def getTimeUs: Long = row.getLong(idx("time_us"))

  /** Operation byte parsed to the reference enum name; throws on an
    * unknown byte exactly like OperationType.parse. */
  def getOperationType: String = {
    val op = row.getInt(idx("cdc_operation"))
    CdcSchema.operationNames.getOrElse(op,
      throw new IllegalArgumentException(op.toString))
  }

  def getBatchSequenceNumber: Int = row.getInt(idx("cdc_batch_seq_no"))

  def isEndOfBatch: Boolean = {
    val i = idx("cdc_end_of_batch")
    !row.isNullAt(i) && row.getBoolean(i)
  }

  /** TTL in seconds, or None (RawChange.getTTL returns nullable Long). */
  def getTTL: Option[Long] = {
    val i = idx("cdc_ttl")
    if (row.isNullAt(i)) None else Some(row.getLong(i))
  }

  /** Value of a base-table column as a plain object (getAsObject). */
  def getAsObject(column: String): Any = row.get(idx(column))

  /** Typed cell access (RawChange.getCell → worker/cql/Field.java):
    * the value paired with its CQL data type, with the reference's
    * cast-style accessor surface. Requires a schema-carrying Row
    * (every DataFrame row qualifies). */
  def getField(column: String): CqlTypes.Field = {
    val i = idx(column)
    CqlTypes.Field(row.get(i), CqlTypes.fromSparkType(row.schema(i).dataType))
  }

  def isNull(column: String): Boolean = row.isNullAt(idx(column))

  /** The per-column `cdc$deleted_X` flag (RawChange.java:151-182):
    * true iff the change explicitly writes NULL to (deletes) X. */
  def isDeleted(column: String): Boolean = {
    val i = idx(s"cdc_deleted_$column")
    !row.isNullAt(i) && row.getBoolean(i)
  }
}

object RawChanges {
  /** Wrap one CDC-log row. */
  def of(row: Row): RawChange = new RawChange(row)

  /** Row-at-a-time iterator over a CDC-log relation — the shape a
    * ported RawChangeConsumer loop expects. Driver-side; scale path is
    * the relational operators in [[CdcOps]]. */
  def iterate(log: DataFrame): Iterator[RawChange] = {
    val it = log.toLocalIterator()
    new Iterator[RawChange] {
      def hasNext: Boolean = it.hasNext
      def next(): RawChange = new RawChange(it.next())
    }
  }
}
