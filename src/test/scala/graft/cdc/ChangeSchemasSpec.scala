package graft.cdc

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Spec for [[ChangeSchemas]] + [[ChangePrinter]] — ChangeSchema
  * column classification (ChangeSchema.java:284-380) and the printer
  * module's rendering. */
class ChangeSchemasSpec extends SparkSpec {

  private def log = CdcLogAdapter.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))

  test("classifies cdc metadata, keys, and regular columns") {
    val cs = ChangeSchemas.ofAdaptedLog(log.schema)
    assert(cs.cdcColumns.map(_.columnName).toSet ==
      Set("cdc_stream_id", "cdc_time", "time_us", "cdc_batch_seq_no",
        "cdc_end_of_batch", "cdc_operation", "cdc_ttl"))
    assert(cs.partitionKeys.map(_.columnName) == Seq("user_id"))
    assert(cs.clusteringKeys.map(_.columnName) == Seq("event_id"))
    assert(cs.regularColumns.map(_.columnName).toSet == Set("value", "props"))
    // deleted companion attaches to its base column, not standalone
    assert(cs.columnDefinition("value").deletedColumn.contains("cdc_deleted_value"))
    assert(cs.columns.forall(c => !c.columnName.startsWith(ChangeSchemas.DeletedPrefix)))
    intercept[NoSuchElementException](cs.columnDefinition("nope"))
  }

  test("printer renders DURATION/DATE cells via the reference value formats") {
    import spark.implicits._
    // a CDC-shaped row with a duration-layout struct and a DATE column
    val df = Seq((7L, 100L, 0, 2, true, Option.empty[Long], 1L, (14, 2, 3L),
        java.sql.Date.valueOf("1969-12-31")))
      .toDF("cdc_stream_id", "time_us", "cdc_batch_seq_no", "cdc_operation",
        "cdc_end_of_batch", "cdc_ttl", "pk", "dur", "d")
      .select(col("cdc_stream_id"), col("time_us"), col("cdc_batch_seq_no"),
        col("cdc_operation"), col("cdc_end_of_batch"), col("cdc_ttl"), col("pk"),
        struct(col("dur._1").as("months"), col("dur._2").as("days"),
          col("dur._3").as("nanoseconds")).as("dur"), col("d"))
    val cs = ChangeSchemas.fromStruct(df.schema,
      partitionKeys = Seq("pk"), clusteringKeys = Nil)
    // the duration-layout struct classifies as DURATION, not TUPLE
    assert(cs.columnDefinition("dur").cqlDataType.cqlType == CqlTypes.Duration)
    val out = ChangePrinter.format(RawChanges.of(df.head()), cs)
    assert(out.contains("1y2mo2d3ns"), out)     // not struct Row noise
    assert(out.contains("1969-12-31"), out)     // pre-epoch date, padded
  }

  test("printer renders operation, id, batch and cells") {
    val cs = ChangeSchemas.ofAdaptedLog(log.schema)
    val row = log.filter(col("cdc_operation") === CdcSchema.RowInsert)
      .orderBy(col("event_id")).limit(1).collect().head
    val out = ChangePrinter.format(RawChanges.of(row), cs)
    assert(out.contains("ROW_INSERT"))
    assert(out.contains("stream:"))
    assert(out.contains("user_id"))
    assert(out.contains("PartitionKey"))
    assert(out.contains("value"))
  }
}
