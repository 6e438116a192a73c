package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CQL type model (reference ChangeSchema.CqlType/DataType/UdtType +
  * worker/cql/Field.java). */
class CqlTypesSpec extends SparkSpec {

  import CqlTypes._

  test("native / collection split and atomicity match the reference rules") {
    assert(native(Int).isNative && native(Int).isAtomic && !native(Int).isFrozen)
    assert(native(Duration).isNative) // last native ordinal
    val s = set(native(Int))
    assert(!s.isNative && !s.isAtomic) // non-frozen collection: partial updates
    assert(set(native(Int), frozen = true).isAtomic) // frozen: whole-cell only
    assert(tuple(Seq(native(Int), native(Text))).isAtomic) // tuples always frozen
    val u = udt("ks", "addr", Seq("street" -> native(Text), "zip" -> native(Int)))
    assert(!u.isAtomic)
    assert(udt("ks", "addr", Seq("street" -> native(Text)), frozen = true).isAtomic)
  }

  test("construction validation mirrors ChangeSchema.DataType preconditions") {
    intercept[IllegalArgumentException](CqlDataType(Map)) // needs args
    intercept[IllegalArgumentException](CqlDataType(Int, Seq(native(Int)))) // native with args
    intercept[IllegalArgumentException](CqlDataType(Udt)) // UDT needs UdtType
    intercept[IllegalArgumentException](native(List)) // not native
  }

  test("toString renders the reference format") {
    assert(map(native(Int), native(Text)).toString == "MAP<INT, TEXT>")
    assert(set(native(Uuid), frozen = true).toString == "FROZEN<SET<UUID>>")
    val u = udt("ks", "addr", Seq("street" -> native(Text)))
    assert(u.toString == "UDT(ks.addr){street TEXT}")
  }

  test("CQL → Spark → CQL keeps the CDC-relevant classification") {
    val roundTrips = Seq(
      native(Text) -> StringType,
      native(Bigint) -> LongType,
      native(Double) -> DoubleType,
      native(Blob) -> BinaryType,
      list(native(Int)) -> ArrayType(IntegerType),
      map(native(Int), native(Double)) -> MapType(IntegerType, DoubleType))
    for ((cql, spark) <- roundTrips) {
      assert(toSparkType(cql) == spark, s"$cql")
      assert(fromSparkType(spark).cqlType == cql.cqlType ||
        (cql.cqlType == Varchar && fromSparkType(spark).cqlType == Text))
    }
    // lossy-but-documented representations
    assert(toSparkType(native(Uuid)) == StringType)
    assert(toSparkType(native(Varint)) == DecimalType(38, 0))
    assert(toSparkType(udt("k", "u", Seq("a" -> native(Int)))) ==
      StructType(Seq(StructField("a", IntegerType))))
  }

  test("Field accessors type collection cells like the reference") {
    import spark.implicits._
    val df = Seq((1L, scala.Predef.Map(1 -> 1.5, 2 -> 2.5), Seq("a", "b"))).toDF("pk", "m", "l")
    val row = df.head()
    val m = Field(row.getMap[Any, Any](1), map(native(Int), native(Double)))
    val entries = m.getMap.map { case (k, v) => (k.getInt.intValue, v.getDouble.doubleValue) }.sorted
    assert(entries == Seq((1, 1.5), (2, 2.5)))
    val l = Field(row.getSeq[Any](2), list(native(Text)))
    assert(l.getList.map(_.getString) == Seq("a", "b"))
    assert(Field(null, native(Int)).isNull)
  }

  test("CqlDuration renders the reference appendUnit format") {
    // CqlDuration.java:47-76: sign prefix, then y/mo/d/h/m/s/ms/us/ns
    assert(CqlDuration(1, 2, 3).toString == "1mo2d3ns")
    assert(CqlDuration(14, 2, 3).toString == "1y2mo2d3ns")
    assert(CqlDuration(0, 0, 0).toString == "")
    assert(CqlDuration(-1, -2, -3).toString == "-1mo2d3ns")
    // 1h + 1m + 1s + 1ms + 1us + 1ns
    assert(CqlDuration(0, 0, 3661001001001L).toString == "1h1m1s1ms1us1ns")
    assert(CqlDuration(24, 0, 0).toString == "2y")
    assert(CqlDuration(0, 0, 90000000000L).toString == "1m30s")
  }

  test("CqlDate renders y-MM-dd with month/day padding only; pre-epoch legal") {
    assert(CqlDate(2024, 1, 2).toString == "2024-01-02")
    assert(CqlDate(1969, 12, 31).toString == "1969-12-31")
    assert(CqlDate(7, 1, 1).toString == "7-01-01") // year is NOT padded
    assert(CqlDate(2024, 1, 2) == CqlDate(2024, 1, 2))
  }

  test("Field.getDuration/getDate round-trip the Spark lakehouse layouts") {
    import spark.implicits._
    // duration lands as the (months, days, nanoseconds) struct
    val df = Seq((1L, (1, 2, 3L), java.sql.Date.valueOf("2024-01-02")))
      .toDF("pk", "dur", "d")
      .select(col("pk"),
        col("dur._1").as("months"), col("dur._2").as("days"),
        col("dur._3").as("nanoseconds"), col("d"))
      .select(col("pk"),
        struct(col("months"), col("days"), col("nanoseconds")).as("dur"), col("d"))
    val row = df.head()
    val dur = Field(row.getStruct(1), native(Duration)).getDuration
    assert(dur == CqlDuration(1, 2, 3))
    assert(dur.toString == "1mo2d3ns")
    val date = Field(row.getDate(2), native(Date)).getDate
    assert(date == CqlDate(2024, 1, 2))
    assert(date.toString == "2024-01-02")
    // the value classes pass through unchanged
    assert(Field(CqlDuration(0, 1, 0), native(Duration)).getDuration.toString == "1d")
    assert(Field(CqlDate(1, 2, 3), native(Date)).getDate.toString == "1-02-03")
    intercept[IllegalStateException](Field("x", native(Duration)).getDuration)
    intercept[IllegalStateException](Field(5, native(Date)).getDate)
  }

  test("ColumnDefinition exposes the CQL view; RawChange.getField types cells") {
    import spark.implicits._
    val log = CdcLogAdapter.fromEventsWithCollections(
      Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 5L, "view", 1.0, "{}"))
        .toDF("user_id", "ts", "event_id", "event_type", "value", "props"))
    val schema = ChangeSchemas.ofAdaptedLog(log.schema)
    val attrs = schema.columnDefinition("attrs")
    assert(attrs.cqlDataType.cqlType == CqlTypes.Map)
    assert(!attrs.isAtomic) // collection column → collectionApply path
    assert(schema.columnDefinition("value").isAtomic)

    val change = RawChanges.of(log.head())
    val f = change.getField("attrs")
    assert(f.dataType.cqlType == CqlTypes.Map)
    // eid 5, view → put of n=3 entries {5%7→1.0, 0→2.0, 2→3.0}
    val kv = f.getMap.map { case (k, v) => (k.getInt.intValue, v.getDouble.doubleValue) }.sorted
    assert(kv == Seq((0, 2.0), (2, 3.0), (5, 1.0)))
    assert(change.getField("value").getDouble == 1.0)
  }
}
