package graft.pipeline

import graft.SparkSpec

/** Independent checks for the dedup family beyond the SQL oracle:
  * the clustering fixpoint must equal a plain union-find over the
  * same candidate pairs. */
class DedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("span rewrite removes exactly the duplicated windows; cleaned corpus re-scores zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // A and B share a 20-token run; C and D are exact copies; E is
    // unique filler long enough to span
    val sharedRun = (1 to 20).map(i => s"shared$i")
    val docA = ((1 to 4).map(i => s"aa$i") ++ sharedRun ++ (1 to 6).map(i => s"az$i")).mkString(" ")
    val docB = ((1 to 10).map(i => s"bb$i") ++ sharedRun ++ (1 to 10).map(i => s"bz$i")).mkString(" ")
    val docC = (1 to 30).map(i => s"cc$i").mkString(" ")
    val docE = (1 to 30).map(i => s"ee$i").mkString(" ")
    val d = Seq((1L, docA), (2L, docB), (3L, docC), (4L, docC), (5L, docE))
      .toDF("doc_id", "text")
    val out = Dedup.spanRewriteOn(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // A: shared run occupies tokens 5..24 → exactly those 20 removed
    assert(out(1L) == ((30L, 20L,
      ((1 to 4).map(i => s"aa$i") ++ (1 to 6).map(i => s"az$i")).mkString(" "))))
    // B: shared run occupies tokens 11..30
    assert(out(2L) == ((40L, 20L,
      ((1 to 10).map(i => s"bb$i") ++ (1 to 10).map(i => s"bz$i")).mkString(" "))))
    // C/D: whole doc duplicated → everything removed
    assert(out(3L) == ((30L, 30L, "")))
    assert(out(4L) == ((30L, 30L, "")))
    // E: untouched (normalized join)
    assert(out(5L) == ((30L, 0L, docE)))
    // the cleaned corpus carries NO cross-doc duplicated span
    val rescored = Dedup.spanCoverageOn(
      Dedup.spanRewriteOn(d).select(col("doc_id"), col("clean_text").as("text")))
    assert(rescored.agg(sum(col("n_dup_spans"))).head.getLong(0) == 0L)
  }

  test("span rewrite on the corpus: removal is real and the cleaned corpus re-scores ≈ 0") {
    import org.apache.spark.sql.functions._
    val cleaned = Dedup.spanRewrite(spark, dir).localCheckpoint()
    assert(cleaned.filter(col("n_removed") > 0).count() > 0,
      "degenerate fixture: no duplicated spans removed")
    val re = Dedup.spanCoverageOn(
      cleaned.select(col("doc_id"), col("clean_text").as("text")))
      .agg(sum(col("n_dup_spans")).as("dup"), sum(col("n_spans")).as("all"))
      .head()
    // seam windows can in principle re-collide; anything beyond noise
    // means removal missed real duplication
    assert(re.getLong(0).toDouble <= 0.002 * math.max(re.getLong(1), 1L),
      s"cleaned corpus still scores ${re.getLong(0)}/${re.getLong(1)} dup spans")
  }

  test("band sweep: nested configs are monotone and the widest config has recall 1") {
    val rows = Dedup.minhashBandSweep(spark, dir).collect()
      .map(r => r.getAs[Int]("n_bands") ->
        ((r.getAs[Long]("n_candidates"), r.getAs[Long]("n_true_pairs"),
          r.getAs[Long]("n_hits"), r.getAs[Double]("recall")))).toMap
    assert(rows.keySet == Set(1, 2, 4, 8, 16))
    // truth frame is config-independent
    assert(rows.values.map(_._2).toSet.size == 1)
    val nTrue = rows(1)._2
    assert(nTrue > 0, "degenerate fixture: no true near-dup pairs")
    // an r-row band agreeing implies each of its sub-bands agrees:
    // candidates and hits must be monotone in n_bands
    val order = Seq(1, 2, 4, 8, 16)
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(rows(a)._1 <= rows(b)._1, s"candidates not nested at $a→$b")
      assert(rows(a)._3 <= rows(b)._3, s"hits not nested at $a→$b")
      assert(rows(a)._4 <= rows(b)._4, s"recall not monotone at $a→$b")
    }
    // every frame pair agrees on ≥1 permutation by construction, so
    // the 16-band config sees the whole frame: recall exactly 1
    assert(rows(16)._4 == 1.0)
    // the sweep must actually discriminate configs on this corpus
    assert(rows(1)._1 < rows(16)._1)
  }

  test("span coverage equals a brute-force span scan") {
    val cov = Dedup.spanCoverage(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Double]("dup_span_frac"))).toMap
    assert(cov.nonEmpty)

    // reference implementation: enumerate every sliding span locally
    val texts = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def spans(text: String): Seq[String] = {
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      if (toks.length < Dedup.SpanTokens) Seq.empty
      else (0 to toks.length - Dedup.SpanTokens by Dedup.SpanStride)
        .map(i => toks.slice(i, i + Dedup.SpanTokens).mkString(" "))
    }
    val all = texts.flatMap { case (id, t) => spans(t).map(s => (id, s)) }
    val dup = all.groupBy(_._2).filter { case (_, occ) =>
      occ.map(_._1).distinct.size > 1
    }.keySet
    val expected = texts.map { case (id, t) =>
      val ss = spans(t)
      val d = ss.count(dup)
      id -> (ss.size.toLong, d.toLong,
        BigDecimal(d.toDouble / math.max(ss.size, 1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    assert(cov == expected)
    assert(expected.values.exists(_._2 > 0),
      "corpus should contain at least one cross-doc duplicated span")
  }

  test("clusters fixpoint equals union-find over the candidate pairs") {
    val pairs = Dedup.ngramJaccard(spark, dir)
      .select("doc_id_1", "doc_id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // reference implementation: union-find with path compression
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(d => d -> find(d)).toMap

    val got = Dedup.clusters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_canonical"))).toMap

    assert(got.keySet == expected.keySet)
    got.foreach { case (doc, (cluster, canonical)) =>
      assert(cluster == expected(doc), s"doc $doc")
      assert(canonical == (doc == cluster))
    }
    // every cluster id is its own canonical member
    assert(got.values.map(_._1).toSet.subsetOf(got.keySet))
  }

  test("minhash clusters fixpoint equals union-find over the thresholded LSH pairs") {
    val pairs = Dedup.minhashLsh(spark, dir)
      .filter(org.apache.spark.sql.functions.col("est_jaccard") >= Dedup.LshClusterThreshold)
      .select("doc_id_1", "doc_id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "threshold left no clustering edges — test data degenerate")

    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(d => d -> find(d)).toMap

    val got = Dedup.minhashClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_canonical"))).toMap

    assert(got.keySet == expected.keySet)
    got.foreach { case (doc, (cluster, canonical)) =>
      assert(cluster == expected(doc), s"doc $doc")
      assert(canonical == (doc == cluster))
    }
  }

  test("exact dedup groups cover every document exactly once") {
    val total = graft.Tables.documents(spark, dir).count()
    val groups = Dedup.exact(spark, dir).collect()
    assert(groups.map(_.getAs[Long]("n_copies")).sum == total)
    assert(groups.map(_.getAs[Long]("canonical_doc_id")).distinct.length == groups.length)
  }

  test("shingle novelty equals a sequential first-occurrence reference") {
    val docs = graft.Tables.spread(graft.Tables.documents(spark, dir))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    def shingles(text: String): Set[String] = {
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      if (toks.length < Dedup.ShingleWords) Set.empty
      else toks.sliding(Dedup.ShingleWords).map(_.mkString(" ")).toSet
    }
    val firstSeen = scala.collection.mutable.Map[String, Long]()
    val expected = docs.flatMap { case (id, text) =>
      val sh = shingles(text)
      if (sh.isEmpty) None
      else {
        sh.foreach(s => if (!firstSeen.contains(s)) firstSeen(s) = id)
        val novel = sh.count(s => firstSeen(s) == id)
        Some((id, sh.size.toLong, novel.toLong,
          BigDecimal(novel.toDouble / sh.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.toSeq
    val got = Dedup.shingleNovelty(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
    // the corpus's first eligible doc is entirely novel by construction
    assert(got.head._4 == 1.0)
    // an exact duplicate of an earlier doc contributes nothing new
    val texts = docs.toMap
    val dupOfEarlier = docs.collectFirst {
      case (id, t) if shingles(t).nonEmpty &&
        docs.exists { case (j, u) => j < id && u == t } => id
    }
    dupOfEarlier.foreach { id =>
      assert(got.find(_._1 == id).get._4 == 0.0, s"exact dup $id must score 0")
    }
  }

  test("threshold sweep: every cutoff emits a row, volumes fall monotonically") {
    val rows = Dedup.thresholdSweep(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Dedup.JaccardSweep)
    // raising the cutoff can only drop pairs and dup docs
    rows.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, s"$a -> $b")
    }
    // a pair needs n_dup_docs ≤ n_pairs (each dup doc has ≥1 pair) and
    // the rate must mirror the doc count
    rows.foreach { case (_, np, ndd, rate) =>
      assert(ndd <= np)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("persisted keeplist: rateBySourceFrom over the artifact equals the inline report") {
    val path = java.nio.file.Files.createTempDirectory("keeplist").toString + "/keeplist"
    Dedup.writeKeeplist(spark, dir, path)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("source"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_exact_dups"),
        r.getAs[Long]("n_near_dups"), r.getAs[Long]("n_kept"), r.getAs[Double]("dup_rate"))
    val fromArtifact = Dedup.rateBySourceFrom(spark, dir, path).collect().map(key).toSeq
    val inline = Dedup.rateBySource(spark, dir).collect().map(key).toSeq
    assert(fromArtifact == inline,
      "the artifact path must reproduce the inline report exactly")
  }
}
