package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spec for [[Hashes]]: the column expressions agree with a direct
  * Scala reimplementation of the same arithmetic. */
class HashesSpec extends SparkSpec {

  import Hashes._

  private def polyScala(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * B + c.toLong) % M)

  private def shingleScala(s: String, k: Int): Seq[Long] =
    (0 to s.length - k).map(i => polyScala(s.substring(i, i + k))).distinct

  test("polyHash(charCodes) matches the scala fold") {
    import spark.implicits._
    val texts = Seq("hello world", "a", "the quick brown fox", "zzzzzz")
    val rows = texts.toDF("t")
      .select(col("t"), polyHash(charCodes(col("t"))).as("h")).collect()
    rows.foreach(r => assert(r.getLong(1) == polyScala(r.getString(0))))
  }

  test("shingleHashesFromCodes matches scala shingling") {
    import spark.implicits._
    val texts = Seq("abcdefghij", "hello world hello", "aaaaaaa")
    val rows = texts.toDF("t")
      .select(col("t"), charCodes(col("t")).as("codes"))
      .select(col("t"), shingleHashesFromCodes(col("codes"), 5).as("sh")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == shingleScala(r.getString(0), 5))
    }
  }

  test("minhash signature has NumHashes entries, each a valid min") {
    import spark.implicits._
    val rows = Seq("some text to hash into shingles").toDF("t")
      .select(charCodes(col("t")).as("codes"))
      .select(shingleHashesFromCodes(col("codes"), 5).as("sh"))
      .select(col("sh"), minhashSig(col("sh")).as("sig")).collect()
    val sh = rows.head.getSeq[Long](0)
    val sig = rows.head.getSeq[Long](1)
    assert(sig.length == NumHashes)
    sig.zipWithIndex.foreach { case (m, j) =>
      val expected = sh.map(h => (h * minhashA(j) + minhashB(j)) % M).min
      assert(m == expected)
    }
  }

  test("identical texts collide; different texts (almost surely) don't") {
    import spark.implicits._
    val rows = Seq("duplicate content here", "duplicate content here", "other words")
      .toDF("t").select(polyHash(charCodes(col("t"))).as("h")).collect().map(_.getLong(0))
    assert(rows(0) == rows(1))
    assert(rows(0) != rows(2))
  }
}
