package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spec for [[StreamIds]] — the 16-byte stream-id wire format
  * (StreamId.java:15-21: vnode = (lowerDword & 0x3FFFFF0) >> 4). */
class StreamIdsSpec extends SparkSpec {

  test("scala round-trip: makeBlob then vnodeOf") {
    for (v <- Seq(0, 1, 7, 255, 4095, (1 << 22) - 1)) {
      assert(StreamIds.vnodeOf(StreamIds.makeBlob(v)) == v)
      // low 4 bits and the upper word must not leak into the vnode
      assert(StreamIds.vnodeOf(StreamIds.makeBlob(v, upperWord = -1L, randomBits = 0xf)) == v)
    }
  }

  test("column extraction matches the reference arithmetic") {
    import spark.implicits._
    val blobs = Seq(0, 3, 42, 8191, 1 << 21).map(v =>
      (v, StreamIds.makeBlob(v, upperWord = 0x0123456789abcdefL, randomBits = 0x9)))
    val rows = blobs.toDF("expected", "blob")
      .select(col("expected"), StreamIds.vnodeId(col("blob")).as("vnode"))
      .collect()
    rows.foreach(r => assert(r.getInt(1) == r.getInt(0)))
  }

  test("vnode ignores bits outside the 4..25 window") {
    import spark.implicits._
    // a blob whose lower dword is all ones: vnode must be the full 22-bit mask
    val all = Array.fill[Byte](16)(-1)
    val rows = Seq(Tuple1(all)).toDF("blob")
      .select(StreamIds.vnodeId(col("blob")).as("vnode")).collect()
    assert(rows.head.getInt(0) == (1 << 22) - 1)
  }
}
