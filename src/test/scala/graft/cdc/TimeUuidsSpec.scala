package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spec for [[TimeUuids]] — SURVEY.md §2a #17.
  * Reference behavior: TimeUUID.java:33-56 (v1 UUID window bounds). */
class TimeUuidsSpec extends SparkSpec {

  import TimeUuids._

  test("UUID v1 epoch constant matches 1582-10-15T00:00:00Z") {
    assert(StartEpochMs == -12219292800000L)
  }

  test("makeMsb sets version 1 and round-trips the timestamp") {
    for (ms <- Seq(0L, 1L, 1704067200000L, 1577836800123L, 4102444800000L)) {
      val msb = startOfMsb(ms)
      assert(((msb >> 12) & 0xf) == 1, "version nibble")
      assert(unixMsOf(msb) == ms)
    }
  }

  test("startOf/endOf bracket exactly one millisecond") {
    val ms = 1704067200000L
    val s = timestampOf(startOfMsb(ms))
    val e = timestampOf(endOfMsb(ms))
    assert(s == fromUnixTimestamp(ms))
    assert(e == fromUnixTimestamp(ms + 1) - 1)
    assert(e - s == 9999) // 10000 ticks of 100ns per ms, inclusive bounds
    assert(MinClockSeqAndNode < 0 && MaxClockSeqAndNode > 0) // full lsb range
  }

  test("window bounds order correctly across milliseconds") {
    val a = 1000000L; val b = a + 1
    assert(timestampOf(endOfMsb(a)) < timestampOf(startOfMsb(b)))
  }

  test("column expressions agree with the scala implementation") {
    import spark.implicits._
    val ms = Seq(0L, 1L, 999L, 1704067200000L, 1577836800123L)
    val rows = ms.toDF("ms")
      .select(col("ms"), makeMsbCol(col("ms")).as("msb"),
        startOf(col("ms")).as("s"), endOf(col("ms")).as("e"))
      .withColumn("roundtrip", unixMsCol(col("msb")))
      .withColumn("end_roundtrip", unixMsCol(col("e.msb")))
      .collect()
    rows.foreach { r =>
      val m = r.getAs[Long]("ms")
      assert(r.getAs[Long]("msb") == startOfMsb(m))
      assert(r.getAs[Long]("roundtrip") == m)
      // endOf's last-tick timestamps are NOT exactly representable in a
      // double — the column round-trip must still return the same ms
      assert(r.getAs[Long]("end_roundtrip") == m, s"endOf($m)")
      val s = r.getStruct(r.fieldIndex("s"))
      val e = r.getStruct(r.fieldIndex("e"))
      assert(s.getAs[Long]("msb") == startOfMsb(m))
      assert(s.getAs[Long]("lsb") == MinClockSeqAndNode)
      assert(e.getAs[Long]("msb") == endOfMsb(m))
      assert(e.getAs[Long]("lsb") == MaxClockSeqAndNode)
    }
  }
}
