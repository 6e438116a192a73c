package graft.pipeline

import graft.SparkSpec

/** Independent invariant checks for the round-3 pipeline operators,
  * beyond the SQL oracle: conservation laws and brute-force
  * cross-checks a hash-compare can't express. */
class CorpusOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bpeMerges learns the same merge table as a sequential reference BPE") {
    import spark.implicits._
    // the classic Sennrich-style fixture plus corpus weighting across docs
    val d = Seq(
      (1L, "low low low low low lower lower newest newest"),
      (2L, "newest newest newest newest widest widest widest low!"),
      (3L, "Wide, wide new NEW newer: lowest")).toDF("doc_id", "text")
    val got = Corpus.bpeMergesOn(d).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq

    // sequential reference: same tokenization, same tie-breaks
    var vocab: Map[Vector[String], Long] = d.collect()
      .flatMap(_.getString(1).toLowerCase.replaceAll("[^a-z0-9]+", " ")
        .split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, o) => w.map(_.toString).toVector -> o.length.toLong }
    val expected = (1 to Corpus.BpeMerges).flatMap { step =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, wc) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + wc
        }
      }
      if (counts.isEmpty) None
      else {
        val ((pa, pb), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        vocab = vocab.map { case (syms, wc) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == pa && syms(i + 1) == pb) {
              out += pa + pb; i += 2 // left-to-right, non-overlapping
            } else { out += syms(i); i += 1 }
          }
          out.toVector -> wc
        }
        Some((step, pa, pb, pa + pb, cnt))
      }
    }
    assert(got == expected)
    assert(expected.size == Corpus.BpeMerges, "fixture exhausted pairs early")
    // the table must contain at least one multi-char merge input
    // (a merge built on an earlier merge — the whole point of BPE)
    assert(expected.exists(m => m._2.length > 1 || m._3.length > 1))

    // the resulting vocabulary equals the reference pipeline's final
    // state: subword occurrences weighted by word count, word-type
    // reach, (count desc, subword) order
    val gotVocab = Corpus.bpeVocabOn(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val occ = vocab.toSeq
      .flatMap { case (syms, wc) => syms.map(s => (s, wc)) }
      .groupBy(_._1).map { case (s, o) => s -> o.map(_._2).sum }
    val types = vocab.keys.toSeq.flatMap(_.distinct)
      .groupBy(identity).map { case (s, l) => s -> l.size.toLong }
    val expVocab = occ.toSeq
      .map { case (s, n) => (s, n, types(s)) }
      .sortBy { case (s, n, _) => (-n, s) }
      .take(Corpus.BpeVocabTopK)
    assert(gotVocab == expVocab)
    // merged subwords must appear in the vocabulary (the merges paid off)
    assert(gotVocab.exists(_._1.length > 1))

    // per-doc application: token counts follow the reference's final
    // word encodings, and merges actually compress (tokens < chars)
    val encLen = vocab.map { case (syms, _) => syms.mkString("") -> syms.length.toLong }
    val docWords = d.collect().map(r => r.getLong(0) ->
      r.getString(1).toLowerCase.replaceAll("[^a-z0-9]+", " ").split(" ").filter(_.nonEmpty).toSeq).toMap
    val gotEnc = Corpus.bpeEncodeOn(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    docWords.foreach { case (id, ws) =>
      val expTokens = ws.map(encLen).sum
      val expChars = ws.map(_.length.toLong).sum
      assert(gotEnc(id) == ((ws.length.toLong, expTokens, expChars)), s"doc $id")
      assert(expTokens < expChars, s"doc $id: merges bought no compression")
    }
  }

  test("bpeMergesBatched: M=1 ≡ sequential table; M=64 batches disjoint merges that compress") {
    import spark.implicits._
    val d = Seq(
      (1L, "low low low low low lower lower newest newest"),
      (2L, "newest newest newest newest widest widest widest low!"),
      (3L, "Wide, wide new NEW newer: lowest")).toDF("doc_id", "text")

    // M = 1 must reproduce the oracle'd sequential path EXACTLY —
    // same selection, same tie-breaks, same counts, one merge per
    // iteration
    val seqTable = Corpus.bpeMergesOn(d).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    val m1Rows = Corpus.bpeMergesBatchedOn(d, Corpus.BpeMerges, 1).collect()
    val m1 = m1Rows
      .map(r => (r.getInt(0), r.getString(2), r.getString(3), r.getString(4), r.getLong(5)))
      .toSeq
    assert(m1 == seqTable)
    assert(m1Rows.map(_.getInt(1)).toSeq == (1 to Corpus.BpeMerges))

    // M = 64: more than one merge per round, global steps contiguous,
    // and every iteration's merges symbol-DISJOINT (the rule that
    // makes the batch order-independent and its counts exact)
    val iters = 3
    val b = Corpus.bpeMergesBatchedOn(d, iters, 64).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5))).toSeq
    assert(b.map(_._1) == (1 to b.size), "global steps not contiguous")
    assert(b.size > iters, "batching never applied more than one merge per round")
    b.groupBy(_._2).foreach { case (it, ms) =>
      // FULL claim sets {a, b, a+b} pairwise disjoint — merged symbols
      // included, so no replace's output token is another's input token
      val syms = ms.flatMap(m => Seq(m._3, m._4, m._3 + m._4))
      assert(syms.distinct.size == syms.size, s"iteration $it merges share a symbol")
      // within a round, picks follow (count desc, pair) among kept
      assert(ms.sortBy(_._1).map(_._6).sliding(2).forall(w => w.size < 2 || w(0) >= w(1)),
        s"iteration $it batch not count-ordered")
    }

    // plausibility: applying the batched table with the reference
    // applier strictly compresses the corpus encoding
    var vocab: Map[Vector[String], Long] = d.collect()
      .flatMap(_.getString(1).toLowerCase.replaceAll("[^a-z0-9]+", " ")
        .split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, o) => w.map(_.toString).toVector -> o.length.toLong }
    def totalSyms = vocab.map { case (s, wc) => s.length * wc }.sum
    val before = totalSyms
    b.sortBy(_._1).foreach { case (_, _, pa, pb, _, _) =>
      vocab = vocab.map { case (syms, wc) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == pa && syms(i + 1) == pb) {
            out += pa + pb; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toVector -> wc
      }
    }
    assert(totalSyms < before, "batched merges bought no compression")
  }

  test("pickDisjointMerges claims merged symbols: output tokens never feed a later merge") {
    // The tiny-corpus path can't reach this case, so pin the picker
    // directly: a kept pair's MERGED symbol must block any later
    // candidate using it as a constituent, and a claimed constituent
    // must block any later candidate whose merged symbol equals it.
    val pool = Seq(
      ("ab", "cd", 100L),  // kept; claims {ab, cd, abcd}
      ("abcd", "e", 90L),  // REJECTED: constituent 'abcd' = kept merged output
      ("x", "y", 80L),     // kept; claims {x, y, xy}
      ("w", "xy", 70L),    // REJECTED: constituent 'xy' = kept merged output
      ("a", "bcd", 60L),   // REJECTED: merged 'abcd' already claimed
      ("q", "r", 50L))     // kept
    assert(Corpus.pickDisjointMerges(pool, 10) ==
      Seq(("ab", "cd", 100L), ("x", "y", 80L), ("q", "r", 50L)))
    // batchM still caps the batch after filtering
    assert(Corpus.pickDisjointMerges(pool, 2) ==
      Seq(("ab", "cd", 100L), ("x", "y", 80L)))
    // merged-equals-constituent in the OTHER direction: candidate whose
    // merged symbol collides with an already-claimed constituent
    assert(Corpus.pickDisjointMerges(Seq(("ab", "cd", 9L), ("a", "b", 8L)), 10) ==
      Seq(("ab", "cd", 9L)))
  }

  test("cleanStats conserves docs across stages and agrees with its component filters") {
    import org.apache.spark.sql.functions._
    val cs = Corpus.cleanStats(spark, dir).collect()
    assert(cs.nonEmpty)
    // per source: every doc lands in exactly one of the three buckets
    cs.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("n_dropped_dedup") + r.getAs[Long]("n_dropped_quality") +
          r.getAs[Long]("n_kept"), r.toString)
    }
    // totals agree with the standalone stages
    val totalDedupDrops = Dedup.keeplist(spark, dir).filter(!col("keep")).count()
    assert(cs.map(_.getAs[Long]("n_dropped_dedup")).sum == totalDedupDrops)
    assert(cs.map(_.getAs[Long]("n_docs")).sum ==
      graft.Tables.documents(spark, dir).count())
    // the pipeline must actually drop something AND keep something
    assert(cs.map(_.getAs[Long]("n_kept")).sum > 0)
    assert(cs.map(r => r.getAs[Long]("n_dropped_dedup") +
      r.getAs[Long]("n_dropped_quality")).sum > 0)
  }

  test("decontaminate flags only non-benchmark docs that truly share a shingle") {
    // brute force: shingle every doc driver-side, intersect with the
    // benchmark slice's shingle union
    val texts = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split(" ").filter(_.nonEmpty).toSeq).toMap
    def shingles(toks: Seq[String]): Set[String] =
      if (toks.length < Dedup.ShingleWords) Set.empty
      else toks.sliding(Dedup.ShingleWords).map(_.mkString(" ")).toSet
    val benchShingles = texts.collect {
      case (id, toks) if id % Dedup.BenchmarkMod == 0 => shingles(toks)
    }.fold(Set.empty)(_ ++ _)
    val expected = texts.collect {
      case (id, toks) if id % Dedup.BenchmarkMod != 0 &&
        shingles(toks).exists(benchShingles.contains) => id
    }.toSet

    val got = Dedup.decontaminate(spark, dir).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSet == expected)
    got.foreach { r =>
      assert(r.getAs[Long]("doc_id") % Dedup.BenchmarkMod != 0)
      assert(r.getAs[Long]("n_benchmark_docs") >= 1)
      assert(r.getAs[Long]("n_shared_shingles") >= 1)
    }
  }

  test("packSequences conserves tokens and packs contiguously per shard") {
    val rows = Corpus.packSequences(spark, dir).collect()
    // every doc appears once
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    // per shard: offsets are the exact running sum in doc_id order
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (shard, rs) =>
      var cum = 0L
      rs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("start_offset") == cum,
          s"shard $shard doc ${r.getAs[Long]("doc_id")}")
        assert(r.getAs[Long]("seq_idx") == cum / Corpus.SeqLen)
        assert(r.getAs[Long]("doc_id") % Corpus.NumShards == shard)
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("mixTemperature keeps the smallest source whole and subsamples the rest") {
    val rows = Corpus.mixTemperature(spark, dir).collect()
    val minOrig = rows.map(_.getAs[Long]("n_orig")).min
    rows.foreach { r =>
      val (orig, kept, thr) = (r.getAs[Long]("n_orig"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("threshold"))
      assert(kept <= orig)
      // sqrt(n_min/n_s) * 65536, floored — the smallest source's
      // threshold is the full bucket range, so it is kept whole
      assert(thr == math.floor(Corpus.MixScale.toDouble *
        math.sqrt(minOrig.toDouble / orig.toDouble)).toLong)
      if (orig == minOrig) assert(kept == orig)
    }
  }

  test("embQuantize: every dim saturates its floor, checksums stay in range") {
    val rows = Corpus.embQuantize(spark, dir).collect()
    val nVecs = graft.Tables.embeddings(spark, dir).count()
    assert(rows.length == nVecs)
    val dims = graft.Tables.embeddings(spark, dir)
      .selectExpr("size(embedding) AS d").head().getInt(0)
    // each dim's min element quantizes to exactly 0 → at least one
    // zero per dim across the corpus
    assert(rows.map(_.getAs[Long]("n_floor")).sum >= dims)
    rows.foreach { r =>
      val cs = r.getAs[Long]("checksum")
      assert(cs >= 0 && cs <= 255L * dims * (dims + 1) / 2)
      assert(r.getAs[Long]("n_floor") + r.getAs[Long]("n_ceil") <= dims)
    }
  }

  test("repetition signals match a brute-force per-doc count") {
    val texts = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split(" ").filter(_.nonEmpty).toSeq).toMap
    val rows = TextAnalysis.repetition(spark, dir).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id"))
      val counts = toks.groupBy(identity).map(_._2.length).toSeq
      val bigrams = if (toks.length < 2) Seq.empty[String]
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      val bcounts = bigrams.groupBy(identity).map(_._2.length).toSeq
      assert(r.getAs[Long]("n_tokens") == toks.length)
      assert(r.getAs[Long]("n_distinct") == counts.length)
      assert(r.getAs[Long]("n_bigrams") == bigrams.length)
      def frac(top: Int, n: Int): Double = top.toDouble / math.max(n, 1).toDouble
      assert(math.abs(r.getAs[Double]("top_token_frac") -
        frac(if (counts.isEmpty) 0 else counts.max, toks.length)) <= 1e-6)
      assert(math.abs(r.getAs[Double]("dup_token_frac") -
        frac(counts.filter(_ >= 2).sum, toks.length)) <= 1e-6)
      assert(math.abs(r.getAs[Double]("top_bigram_frac") -
        frac(if (bcounts.isEmpty) 0 else bcounts.max, bigrams.length)) <= 1e-6)
    }
  }

  test("commonness equals the brute-force global-frequency average") {
    val texts = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split(" ").filter(_.nonEmpty).toSeq).toMap
    val global = texts.values.flatten.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val rows = TextAnalysis.commonness(spark, dir).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id"))
      val sumFreq = toks.map(global).sum
      assert(r.getAs[Long]("n_tokens") == toks.length)
      assert(r.getAs[Long]("sum_freq") == sumFreq)
      assert(math.abs(r.getAs[Double]("avg_token_freq") -
        sumFreq.toDouble / math.max(toks.length, 1).toDouble) <= 1e-6)
    }
  }

  test("chunk covers every token with the documented stride geometry") {
    val rows = TextAnalysis.chunk(spark, dir).collect()
    val nToks = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id",
        "size(filter(split(lower(text), ' '), t -> length(t) > 0)) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, rs) =>
      val n = nToks(doc)
      // one chunk per stride start: ceil(n / stride)
      assert(rs.length == (n + TextAnalysis.ChunkStride - 1) / TextAnalysis.ChunkStride)
      rs.foreach { r =>
        val start = r.getAs[Int]("start_tok")
        assert(start == r.getAs[Int]("chunk_idx") * TextAnalysis.ChunkStride + 1)
        // full-size interior chunks, truncated tail
        assert(r.getAs[Long]("n_chunk_tokens") ==
          math.min(TextAnalysis.ChunkTokens, n - start + 1))
      }
    }
  }

  test("embPcaTopk: unit directions, mutually orthogonal, pc1 = normalized parent direction") {
    val rows = Corpus.embPcaTopk(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.length == 64)
    val pcs = Seq(rows.map(_._2), rows.map(_._3), rows.map(_._4))
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    pcs.foreach { p => assert(math.abs(dot(p, p) - 1.0) < 1e-4, s"not unit: ${dot(p, p)}") }
    for (i <- 0 until 3; j <- i + 1 until 3)
      assert(math.abs(dot(pcs(i), pcs(j))) < 0.05,
        s"pc${i + 1} and pc${j + 1} not orthogonal: ${dot(pcs(i), pcs(j))}")
    // pc1 is the parent operator's converged direction, normalized
    val u2 = Corpus.embPowerIteration(spark, dir).collect()
      .map(r => (r.getInt(0), r.getAs[Double]("u2"))).sortBy(_._1).map(_._2)
    val n = math.sqrt(dot(u2, u2))
    u2.map(_ / n).zip(pcs(0)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-5, s"pc1 drifts from parent: $a vs $b")
    }
  }

  test("embSeedFarthest equals a sequential farthest-first reference; radii non-increasing") {
    val vs = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    // sequential reference: Gonzalez farthest-first from vec 0
    var expected = List((1, 0L, 0.0))
    val md = scala.collection.mutable.Map(vs.keys.map(id => id -> d2(vs(id), vs(0L))).toSeq: _*)
    for (k <- 2 to Corpus.FarthestSeeds) {
      val (pick, pd) = md.toSeq.maxBy { case (id, d) => (d, -id) } // max d, tie lowest id
      expected ::= ((k, pick, BigDecimal(pd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      vs.keys.foreach(id => md(id) = math.min(md(id), d2(vs(id), vs(pick))))
    }
    val got = Corpus.embSeedFarthest(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toList
    assert(got == expected.reverse, s"$got\nvs\n${expected.reverse}")
    // selection radii are non-increasing after the anchor
    val radii = got.drop(1).map(_._3)
    assert(radii.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(got.map(_._2).distinct.length == Corpus.FarthestSeeds)
  }

  test("gopherRules: each rule trips exactly at its documented boundary") {
    import spark.implicits._
    val stops = "the be to of and that have with"   // 8 stop words, 24 chars
    val pass49 = stops + (" word" * 41)             // 49 words
    val pass50 = stops + (" word" * 42)             // 50 words — minimum
    val shortW = ("a " * 48) + "the to"             // mean word len 53/50 < 3
    val symbols = pass50 + (" # # # # # #")         // 6/56 ≈ 0.107 > 0.1
    val numeric = ("123 " * 50).trim                // no alpha, no stops
    val bullets = ("- " + stops + " item\n") * 10   // every line bullet-led
    val docs = Seq(
      (0L, pass50), (1L, pass49), (2L, shortW), (3L, symbols),
      (4L, numeric), (5L, bullets)).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRulesOn(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Boolean]("pass_gopher"), s"baseline doc should pass: ${out(0L)}")
    assert(out(0L).getAs[Long]("n_words") == 50L)
    assert(out(0L).getAs[Long]("n_stop_hits") == 8L)
    assert(!out(1L).getAs[Boolean]("pass_gopher")) // 49 words: one short of minimum
    assert(out(1L).getAs[Long]("n_words") == 49L)
    assert(!out(2L).getAs[Boolean]("pass_gopher")) // mean word length below 3
    assert(out(2L).getAs[Double]("mean_word_len") < 3.0)
    assert(!out(3L).getAs[Boolean]("pass_gopher")) // symbol-to-word over 0.1
    assert(out(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!out(4L).getAs[Boolean]("pass_gopher")) // no alphabetic words, no stops
    assert(out(4L).getAs[Double]("alpha_word_ratio") == 0.0)
    assert(out(4L).getAs[Long]("n_stop_hits") == 0L)
    assert(out(4L).getAs[Double]("mean_word_len") == 3.0) // boundary: inclusive
    assert(!out(5L).getAs[Boolean]("pass_gopher")) // all lines bullet-led
    assert(out(5L).getAs[Double]("bullet_line_ratio") == 1.0)
  }

  test("quantize sweep: reconstruction error strictly improves with bit width") {
    val rows = Corpus.embQuantizeSweep(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Corpus.QuantizeSweepBits)
    // same value population at every width
    assert(rows.map(_._2).distinct.size == 1)
    // more bits, strictly less squared error — the curve's whole point
    rows.map(_._3).toSeq.sliding(2).foreach { case Seq(a, b) => assert(b < a, s"$b !< $a") }
    assert(rows.last._3 > 0.0)
  }

  test("centroid shift matches a local recompute; parity halves stay aligned") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val got = Corpus.embCentroidShift(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val rows = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    def mean6(xs: Seq[Double]): Double =
      BigDecimal(xs.map(BigDecimal(_)).sum.toDouble / xs.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.groupBy(_._2).foreach { case (label, vs) =>
      val (ref, cur) = vs.partition(_._1 % 2 == 0)
      val dims = vs.head._3.indices
      val mr = dims.map(d => mean6(ref.toSeq.map(_._3(d))))
      val mc = dims.map(d => mean6(cur.toSeq.map(_._3(d))))
      val shift2 = BigDecimal(dims.map(d => BigDecimal((mr(d) - mc(d)) * (mr(d) - mc(d)))).sum.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val cos = {
        val dot = dims.map(d => BigDecimal(mr(d) * mc(d))).sum.toDouble
        val nr = math.sqrt(dims.map(d => BigDecimal(mr(d) * mr(d))).sum.toDouble)
        val nc = math.sqrt(dims.map(d => BigDecimal(mc(d) * mc(d))).sum.toDouble)
        BigDecimal(dot / (nr * nc)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val (nRef, nCur, gShift, gCos) = got(label)
      assert(nRef == ref.size.toLong && nCur == cur.size.toLong)
      assert(math.abs(gShift - shift2) <= 1e-6, s"label $label: $gShift vs $shift2")
      // note: these near-centered synthetic embeddings have tiny label
      // centroids, so cos is legitimately noisy — assert exactness,
      // not magnitude
      assert(math.abs(gCos - cos) <= 1e-6, s"label $label: $gCos vs $cos")
    }
  }

  test("writeShards lands balanced one-file shards that round-trip") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.spread(graft.Tables.documents(spark, dir))
    val path = java.nio.file.Files.createTempDirectory("graft_shards").toString + "/out"
    val r = Corpus.writeShards(docs, path)
    assert(r.nShards == Corpus.BalanceShards.toLong)
    assert(r.nDocs == docs.count())
    // one parquet file per shard directory
    assert(r.filesWritten == r.nShards)
    // size balance: round-robin by size keeps shards within a tight band
    assert(r.minShardChars * 2 > r.maxShardChars,
      s"shard spread ${r.minShardChars}..${r.maxShardChars}")
    // written artifact agrees with the planned report
    val planned = Corpus.shardBalance(spark, dir).collect()
      .map(ro => ro.getInt(0) -> (ro.getLong(1), ro.getLong(2))).toMap
    val got = spark.read.parquet(path).groupBy(col("shard"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(col("n_chars")).as("chars"))
      .collect().map(ro => ro.getInt(0) -> (ro.getLong(1), ro.getLong(2))).toMap
    assert(got == planned)
  }

  test("stratified sample draws exactly k per source, deterministically") {
    val got = Corpus.stratifiedSample(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = got.groupBy(_._2)
    bySource.foreach { case (s, rs) =>
      assert(rs.length <= Corpus.StratifiedK, s"source $s drew ${rs.length}")
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length.toLong), s"ranks not dense for $s")
    }
    // deterministic: a second evaluation is identical
    val again = Corpus.stratifiedSample(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == again.toSeq)
  }
}
