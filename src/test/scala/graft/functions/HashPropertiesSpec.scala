package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-style spec for the hash model shared by the Spark columns
  * and the native expression: each property is checked over hundreds
  * of seeded-random inputs (deterministic run to run). */
class HashPropertiesSpec extends AnyFunSuite {

  import Hashes.{B, M, minhashA, minhashB, NumHashes}

  private def polyScala(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * B + c.toLong) % M)

  private def asciiText(rnd: Random, maxLen: Int = 200): String =
    Iterator.continually((32 + rnd.nextInt(95)).toChar).take(rnd.nextInt(maxLen)).mkString

  test("polyhash stays in [0, M) and is deterministic") {
    val rnd = new Random(42)
    for (_ <- 1 to 500) {
      val s = asciiText(rnd)
      val h = polyScala(s)
      assert(h >= 0 && h < M)
      assert(h == polyScala(s))
    }
  }

  test("polyhash is prefix-sensitive: appending a char extends the fold") {
    val rnd = new Random(43)
    for (_ <- 1 to 500) {
      val s = asciiText(rnd)
      val c = (33 + rnd.nextInt(94)).toChar
      assert(polyScala(s + c) == (polyScala(s) * B + c.toLong) % M)
    }
  }

  test("minhash permutation arithmetic never overflows into negatives") {
    val rnd = new Random(44)
    for (_ <- 1 to 2000) {
      val h = math.abs(rnd.nextLong()) % M
      val j = rnd.nextInt(NumHashes)
      val v = (h * minhashA(j) + minhashB(j)) % M
      assert(v >= 0 && v < M)
    }
  }

  test("native ShingleHash.compute equals the per-window scala fold") {
    val k = 5
    val rnd = new Random(45)
    for (_ <- 1 to 300) {
      val s = asciiText(rnd)
      val got = ShingleHash.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), k)
        .toLongArray().toSeq
      val n = s.length
      val windows = (0 until math.max(n - k + 1, 1))
        .map(i => polyScala(s.substring(i, math.min(i + k, n))))
      assert(got == windows.distinct, s"text=${s.take(40)}")
    }
  }

  test("stream-id vnode round-trips across random blobs") {
    import graft.cdc.StreamIds
    val rnd = new Random(46)
    for (_ <- 1 to 2000) {
      val v = rnd.nextInt(1 << 22)
      assert(StreamIds.vnodeOf(StreamIds.makeBlob(v, rnd.nextLong(), rnd.nextInt(16))) == v)
    }
  }
}
