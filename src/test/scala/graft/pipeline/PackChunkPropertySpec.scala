package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Seeded randomized-invariant sweeps for the two layout operators
  * (the UrlCanonPropertySpec pattern): corpus_pack_sequences must
  * CONSERVE and tile the token stream (no gap, no overlap, exact
  * prefix sums — the invariants any range-partitioned prefix-sum bug
  * breaks first), and text_chunk must equal a from-scratch model of
  * the sliding window INCLUDING the content digests (so a slice
  * off-by-one cannot hide behind matching counts). */
class PackChunkPropertySpec extends SparkSpec {

  private val Words =
    Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")

  private def corpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until nDocs).map { i =>
      val n = rnd.nextInt(40) // includes empty docs
      (i.toLong, Seq.fill(n)(Words(rnd.nextInt(Words.size))).mkString(" "))
    }
  }

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("pack_sequences: per-shard tiling — zero start, no gap, no overlap, conserved total") {
    for (seed <- Seq(3, 19, 53)) {
      val rows = corpus(seed, 200)
      val got = Corpus.packSequencesOn(df(rows)).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(got.length == rows.length)
      got.foreach { case (docId, shard, _, off, seqIdx) =>
        assert(shard == (docId % Corpus.NumShards).toInt)
        assert(seqIdx == off / Corpus.SeqLen)
      }
      // within each shard, docs tile the token stream exactly
      got.groupBy(_._2).foreach { case (shard, g) =>
        val ordered = g.sortBy(_._1)
        var expectedOff = 0L
        ordered.foreach { case (docId, _, nTok, off, _) =>
          assert(off == expectedOff,
            s"seed $seed shard $shard doc $docId: offset $off, expected $expectedOff")
          expectedOff += nTok
        }
        val wantTokens = ordered.map { case (docId, _, _, _, _) =>
          rows(docId.toInt)._2.split(" ").count(_.nonEmpty).toLong
        }.sum
        assert(expectedOff == wantTokens, s"seed $seed shard $shard total")
      }
    }
  }

  test("text_chunk: equals the from-scratch sliding-window model, digests included") {
    for (seed <- Seq(7, 29, 61)) {
      val rows = corpus(seed, 120)
      val chunks = TextAnalysis.chunkOn(df(rows)).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getString(4)))
        .toSeq
      val want = rows.flatMap { case (docId, text) =>
        val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
        (1 to toks.length by TextAnalysis.ChunkStride).map { start =>
          val slice = toks.slice(start - 1,
            math.min(start - 1 + TextAnalysis.ChunkTokens, toks.length))
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(slice.mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          (docId, (start - 1) / TextAnalysis.ChunkStride, start,
            slice.length.toLong, digest)
        }
      }.sortBy(c => (c._1, c._2))
      assert(chunks == want, s"seed $seed: ${chunks.length} vs ${want.length} chunks")
    }
  }
}
