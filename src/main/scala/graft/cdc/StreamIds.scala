package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Real Scylla stream-id semantics: a stream id is a 16-byte blob; the
  * vnode index is bits 4..25 of the second 8-byte (big-endian) word —
  * `(lowerDword & 0x3FFFFF0) >> 4` (scylla-cdc-base
  * .../model/StreamId.java:15-21). The synthetic CDC log in
  * [[CdcLogAdapter]] uses small integer stream ids for oracle
  * friendliness; this module handles the production wire format.
  *
  * All pure column expressions over a `binary` column — codegen'd,
  * map-only, usable directly on a raw CDC log scan at 100 TB.
  */
object StreamIds {

  val VNodeMask: Long = 0x3FFFFF0L

  /** The lower (second) big-endian dword of a 16-byte stream id.
    * Only its low 4 bytes can carry vnode bits, so decoding bytes
    * 13..16 (1-based) as an unsigned 32-bit int suffices. */
  def lowerWord32(streamId: Column): Column =
    conv(hex(substring(streamId, 13, 4)), 16, 10).cast("long")

  /** vnode index encoded in a 16-byte stream-id blob. */
  def vnodeId(streamId: Column): Column =
    shiftright(lowerWord32(streamId).bitwiseAND(lit(VNodeMask)), 4).cast("int")

  /** Hex rendering matching the reference's StreamId.toString payload. */
  def toHex(streamId: Column): Column = hex(streamId)

  // ---------------------------------------------------------------- scala side

  /** Build a 16-byte stream-id blob carrying the given vnode index
    * (inverse of [[vnodeId]]; for tests and synthetic data). */
  def makeBlob(vnode: Int, upperWord: Long = 0L, randomBits: Int = 0): Array[Byte] = {
    require(vnode >= 0 && vnode < (1 << 22), "vnode is a 22-bit index")
    val lower = ((vnode.toLong << 4) & VNodeMask) | (randomBits & 0xf)
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(upperWord)
    bb.putLong(lower)
    bb.array()
  }

  /** Scala-side vnode extraction (reference arithmetic verbatim). */
  def vnodeOf(blob: Array[Byte]): Int = {
    val lowerDword = java.nio.ByteBuffer.wrap(blob).getLong(8)
    ((lowerDword & VNodeMask) >> 4).toInt
  }
}
