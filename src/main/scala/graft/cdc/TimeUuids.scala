package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Version-1 time-UUID window bounds, as both plain Scala and Spark
  * column expressions (pure bit arithmetic — codegen'd, no UDF).
  *
  * Reference semantics: scylla-cdc-base .../model/worker/TimeUUID.java:33-56 —
  * a window [start, end] over the CDC log is expressed as
  * `startOf(ms)` (min clock-seq-and-node) .. `endOf(ms)` (max), where
  * the UUID MSB packs the 100-ns-since-1582 timestamp as
  * time_low(32) | time_mid(16) | version(4)=1 | time_hi(12).
  *
  * A timeuuid is modeled as struct<msb:long, lsb:long> (the two UUID
  * words); ordering by extracted timestamp matches the reference's
  * window comparisons.
  */
object TimeUuids {

  /** 1582-10-15T00:00:00Z in unix ms (UUID v1 epoch; TimeUUID.java:58-69). */
  val StartEpochMs: Long = -12219292800000L
  val MinClockSeqAndNode: Long = 0x8080808080808080L
  val MaxClockSeqAndNode: Long = 0x7f7f7f7f7f7f7f7fL

  // ---------------------------------------------------------------- plain Scala

  /** Unix ms → 100-ns intervals since the UUID epoch. */
  def fromUnixTimestamp(ms: Long): Long = (ms - StartEpochMs) * 10000L

  /** Pack a 60-bit 100-ns timestamp into a v1 UUID MSB (TimeUUID.java:49-56). */
  def makeMsb(t: Long): Long =
    ((t & 0x00000000ffffffffL) << 32) |
      ((t & 0x0000ffff00000000L) >>> 16) |
      ((t & 0x0fff000000000000L) >>> 48) |
      0x0000000000001000L

  /** Inverse of [[makeMsb]]: recover the 100-ns timestamp. */
  def timestampOf(msb: Long): Long =
    ((msb >>> 32) & 0x00000000ffffffffL) |
      ((msb & 0x00000000ffff0000L) << 16) |
      ((msb & 0x0000000000000fffL) << 48)

  /** MSB of the smallest timeuuid with unix-ms timestamp `ms`. */
  def startOfMsb(ms: Long): Long = makeMsb(fromUnixTimestamp(ms))

  /** MSB of the largest timeuuid with unix-ms timestamp `ms`
    * (TimeUUID.java:37-39: last 100-ns tick of the millisecond). */
  def endOfMsb(ms: Long): Long = makeMsb(fromUnixTimestamp(ms + 1) - 1)

  /** Unix ms encoded in a v1 UUID MSB. */
  def unixMsOf(msb: Long): Long = timestampOf(msb) / 10000L + StartEpochMs

  // ---------------------------------------------------------------- column side

  /** Bit-pack a 100-ns timestamp column into a v1 UUID MSB. */
  private def packMsb(t: Column): Column =
    shiftleft(t.bitwiseAND(lit(0x00000000ffffffffL)), 32)
      .bitwiseOR(shiftrightunsigned(t.bitwiseAND(lit(0x0000ffff00000000L)), 16))
      .bitwiseOR(shiftrightunsigned(t.bitwiseAND(lit(0x0fff000000000000L)), 48))
      .bitwiseOR(lit(0x1000L))

  /** Column: unix-ms → v1 MSB (same bit packing, Catalyst bit ops). */
  def makeMsbCol(ms: Column): Column = packMsb((ms - StartEpochMs) * 10000L)

  /** Column: v1 MSB → unix ms (inverse packing). Integer division —
    * Column./ is double division whose 53-bit mantissa misrounds
    * 100-ns counts (endOf bounds came back ms+1). */
  def unixMsCol(msb: Column): Column = {
    val t = shiftrightunsigned(msb, 32).bitwiseAND(lit(0x00000000ffffffffL))
      .bitwiseOR(shiftleft(msb.bitwiseAND(lit(0x00000000ffff0000L)), 16))
      .bitwiseOR(shiftleft(msb.bitwiseAND(lit(0x0000000000000fffL)), 48))
    (t - pmod(t, lit(10000L))).cast("decimal(20,0)")
      .divide(lit(10000L)).cast("long") + StartEpochMs
  }

  /** Column: struct<msb,lsb> start-of-window bound for a unix-ms col. */
  def startOf(ms: Column): Column =
    struct(makeMsbCol(ms).as("msb"), lit(MinClockSeqAndNode).as("lsb"))

  /** Column: struct<msb,lsb> end-of-window bound for a unix-ms col
    * (last 100-ns tick of the millisecond, TimeUUID.java:37-39). */
  def endOf(ms: Column): Column =
    struct(packMsb((ms + 1 - StartEpochMs) * 10000L - 1).as("msb"),
      lit(MaxClockSeqAndNode).as("lsb"))
}
