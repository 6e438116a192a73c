package graft.pipeline

import graft.SparkSpec

/** The hot-shingle df-cap is what keeps the inverted-index dedup
  * operators sub-quadratic on a boilerplate-heavy corpus: a shingle
  * shared by f docs emits f² candidate pairs — AQE can split the
  * join's input but never its output. This spec drives a corpus with
  * one viral shingle (df ≫ cap) through the candidate generator and
  * proves the pair count collapses from O(f²) to the genuine dups.
  */
class NgramCapSpec extends SparkSpec {

  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("ngramcap").toString
    import spark.implicits._
    val viral = "common header boiler plate" // one 4-gram shared by ALL docs
    val atCap = "under cap boundary marker"  // shared by exactly MaxShingleDf docs
    val docs =
      // 120 unrelated docs glued only by the viral shingle
      (0L until 120L).map(i => (i, s"$viral u${i}a u${i}b u${i}c u${i}d u${i}e")) ++
        // one genuine duplicate pair (identical tails, rare shingles)
        Seq((200L, s"$viral alpha beta gamma delta epsilon zeta"),
          (201L, s"$viral alpha beta gamma delta epsilon zeta")) ++
        // exactly-at-cap group: df = MaxShingleDf must SURVIVE (cap is >, not >=)
        (300L until (300L + Dedup.MaxShingleDf)).map(i =>
          (i, s"$atCap v${i}a v${i}b v${i}c v${i}d v${i}e"))
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("viral shingle (df > cap) generates no candidate pairs") {
    val n = 120 + 2 + Dedup.MaxShingleDf // corpus size
    val candidates = Dedup.ngramCandidates(spark, dir)
      .select("doc_id_1", "doc_id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // Uncapped, the viral shingle alone would emit C(122, 2) = 7381
    // pairs; capped, the only candidates are the duplicate pair and the
    // at-cap group's C(50, 2) internal pairs.
    val atCapPairs = for {
      a <- 300L until (300L + Dedup.MaxShingleDf)
      b <- (a + 1) until (300L + Dedup.MaxShingleDf)
    } yield (a, b)
    assert(candidates == (atCapPairs.toSet + ((200L, 201L))))
    assert(candidates.size < n.toLong * Dedup.MaxShingleDf,
      "candidate count must stay bounded by C·n")
  }

  test("capped jaccard keeps the genuine duplicate pair at 1.0") {
    val pairs = Dedup.ngramJaccard(spark, dir).collect()
      .map(r => ((r.getAs[Long]("doc_id_1"), r.getAs[Long]("doc_id_2")),
        r.getAs[Double]("jaccard"))).toMap
    // Docs 200/201 are byte-identical after the viral shingle is
    // dropped, so Jaccard over the capped universe is exactly 1.0; the
    // at-cap group's pairs share 1 of 2·sz−1 shingles and fall below
    // the threshold.
    assert(pairs.keySet == Set((200L, 201L)))
    assert(pairs((200L, 201L)) == 1.0)
  }

  test("containment flags the same pair and nothing glued by boilerplate") {
    val rows = Dedup.containment(spark, dir).collect()
    assert(rows.map(r => (r.getAs[Long]("doc_id_1"), r.getAs[Long]("doc_id_2"))).toSet ==
      Set((200L, 201L)))
    val r = rows.head
    assert(r.getAs[Double]("containment_1") == 1.0)
    assert(r.getAs[Double]("containment_2") == 1.0)
  }
}
