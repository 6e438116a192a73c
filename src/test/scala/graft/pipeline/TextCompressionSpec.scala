package graft.pipeline

import graft.SparkSpec

/** text_compression contract: the codegen'd DeflateLen equals an
  * independent local Deflater run byte-for-byte, and the ratio orders
  * texts the way a compressibility signal must — repetitive below
  * prose, prose below high-entropy spray. */
class TextCompressionSpec extends SparkSpec {

  private def localDeflateLen(s: String): Int = {
    val input = s.getBytes("UTF-8")
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(input); d.finish()
      val buf = new Array[Byte](input.length + 128)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  test("expression equals a local Deflater; ratio orders rep < prose < spray") {
    import spark.implicits._
    val rep = "the same line again and again " * 40
    val prose = "a quick brown fox jumps over the lazy dog while seventeen " +
      "sailors argue about the weather in a small harbour town every evening " * 8
    // deterministic pseudo-random base36 spray
    val spray = {
      val sb = new StringBuilder
      var x = 123456789L
      for (_ <- 1 to 1200) {
        x = (x * 6364136223846793005L + 1442695040888963407L)
        sb.append(java.lang.Long.toUnsignedString(x, 36).take(4))
      }
      sb.toString
    }
    val docs = Seq((1L, rep), (2L, prose), (3L, spray)).toDF("doc_id", "text")
    val out = TextAnalysis.compressionOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

    Seq(1L -> rep, 2L -> prose, 3L -> spray).foreach { case (id, s) =>
      val (nb, nd, ratio) = out(id)
      assert(nb == s.getBytes("UTF-8").length.toLong)
      assert(nd == localDeflateLen(s).toLong, s"doc $id deflate len")
      assert(ratio > 0.0 && math.abs(ratio - nd.toDouble / nb) < 1e-6)
    }
    assert(out(1L)._3 < out(2L)._3, "repetition should compress below prose")
    assert(out(2L)._3 < out(3L)._3, "prose should compress below random spray")
    assert(out(3L)._3 > 0.5, "spray should barely compress")
  }

  test("real corpus scan stays map-only and non-degenerate") {
    import org.apache.spark.sql.functions.col
    val pre = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), graft.functions.DeflateLen.of(col("text")).as("d"))
    val plan = pre.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val rows = TextAnalysis.compression(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) > 0L))
    // word-salad docs over a tiny vocab are highly compressible; very
    // short docs can legitimately INFLATE (zlib header dominates), so
    // judge only bodies long enough for the signal to mean anything
    val longDocs = rows.filter(_.getLong(1) >= 200L)
    assert(longDocs.nonEmpty)
    assert(longDocs.map(_.getDouble(3)).max < 0.8)
  }
}
