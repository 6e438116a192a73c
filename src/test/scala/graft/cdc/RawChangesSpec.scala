package graft.cdc

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Spec for [[RawChanges]] — the RawChange accessor surface
  * (RawChange.java:16-66, :131-182) over the adapted CDC log. */
class RawChangesSpec extends SparkSpec {

  private def log = CdcLogAdapter.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))

  test("accessors agree with the underlying columns") {
    val rows = log.orderBy(col("event_id")).limit(200).collect()
    rows.foreach { r =>
      val c = RawChanges.of(r)
      assert(c.getStreamId == r.getAs[Long]("cdc_stream_id"))
      assert(c.getTimeUs == r.getAs[Long]("time_us"))
      assert(c.getBatchSequenceNumber == r.getAs[Int]("cdc_batch_seq_no"))
      assert(c.isEndOfBatch == r.getAs[Boolean]("cdc_end_of_batch"))
      assert(CdcSchema.operationNames(r.getAs[Int]("cdc_operation")) == c.getOperationType)
      val eid = r.getAs[Long]("event_id")
      assert(c.getTTL == (if (eid % 10 == 0) Some(86400L) else None))
      assert(c.getAsObject("user_id") == r.getAs[Long]("user_id"))
      assert(c.isDeleted("value") == r.getAs[Boolean]("cdc_deleted_value"))
    }
  }

  test("getId orders changes like the worker's ChangeId") {
    val ids = RawChanges.iterate(
        log.filter(col("cdc_stream_id") === 3).orderBy(col("time_us"), col("event_id")).limit(50))
      .map(_.getId).toSeq
    assert(ids == ids.sortBy(i => (i._1, i._2)))
  }

  test("unknown operation byte throws like OperationType.parse") {
    val bad = log.limit(1).withColumn("cdc_operation", lit(42)).collect().head
    intercept[IllegalArgumentException](RawChanges.of(bad).getOperationType)
  }
}
