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
