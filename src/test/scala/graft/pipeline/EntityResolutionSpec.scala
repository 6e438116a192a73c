package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** er_match contract (SURVEY §2c): record linkage must (1) match a
  * field-dropped record back to its entity with certainty when
  * entities are unique — the structural recall floor of adjacent
  * sorted-pair blocking (dropping one token removes ≤2 of the k−1
  * signatures), (2) leave sub-threshold records UNMATCHED rather
  * than guess, and (3) keep the df cap honest: a record whose every
  * blocking signature is viral goes unmatched — blocking recall is
  * a documented tradeoff, not a silent loss. */
class EntityResolutionSpec extends SparkSpec {

  private def sets(rows: Seq[(Long, Seq[String])], key: String, set: String): DataFrame = {
    import spark.implicits._
    rows.toDF(key, "raw").select(col(key),
      array_sort(array_distinct(col("raw"))).as(set))
  }

  private def run(left: Seq[(Long, Seq[String])], right: Seq[(Long, Seq[String])]) =
    EntityResolution.erMatchOn(sets(left, "l_key", "ls"), sets(right, "r_id", "rs"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getBoolean(4)))).toMap

  test("field-dropped records link back to unique entities with certainty") {
    val clean = Seq(
      1L -> Seq("anvil", "grey", "brandx", "economy", "sz10"),
      2L -> Seq("widget", "red", "brandy", "standard", "sz20"),
      3L -> Seq("bolt", "blue", "brandz", "promo", "sz30"))
    val dirty = Seq( // each lost one field
      1L -> Seq("anvil", "grey", "economy", "sz10"),
      2L -> Seq("widget", "red", "brandy", "sz20"),
      3L -> Seq("bolt", "blue", "brandz", "promo"))
    val got = run(clean, dirty)
    assert(got.keySet == Set(1L, 2L, 3L))
    got.foreach { case (rid, (matched, jacc, correct)) =>
      assert(matched == rid && correct, s"$rid matched $matched")
      assert(jacc == 800000L, s"$rid jacc $jacc") // 4/5 exactly
    }
  }

  test("sub-threshold records stay unmatched — no guessing") {
    val clean = Seq(1L -> Seq("anvil", "grey", "brandx", "economy", "sz10"))
    val dirty = Seq( // shares the adjacent (anvil, brandx) signature —
      // a candidate is generated — but Jaccard is only 2/9
      9L -> Seq("anvil", "brandx", "other1", "other2", "other3", "other4"))
    assert(run(clean, dirty).isEmpty)
  }

  test("a record blocked only by viral signatures goes unmatched (cap honesty)") {
    // every clean record shares the SAME two tokens, so the one
    // adjacent pair they all emit is viral (df > MaxSigDf) and gets
    // dropped; the dirty twin of entity 1 has no other signature
    val clean = (1L to (EntityResolution.MaxSigDf + 10L)).map { i =>
      i -> Seq("aaa", "bbb", s"unique$i")
    }
    val dirty = Seq(1L -> Seq("aaa", "bbb"))
    assert(run(clean, dirty).isEmpty,
      "the viral (aaa,bbb) signature must not generate candidates")
    // …but a dirty record keeping its unique token still links: its
    // (bbb, unique1) signature survives the cap
    val dirty2 = Seq(1L -> Seq("bbb", "unique1"))
    val got = run(clean, dirty2)
    assert(got.get(1L).exists(m => m._1 == 1L && m._3))
  }

  test("TWO lost fields: the adjacent-pair floor (≥ k−5 shared signatures) still links k≥7 records") {
    // Each lost token removes ≤2 adjacent pairs and adds ≤1 foreign
    // bridge, so two losses leave ≥ (k−1) − 4 = k−5 of the clean
    // record's signatures shared — ≥1 surviving signature from k = 6,
    // and Jaccard (k−2)/k clears the 0.6 threshold from k = 5. The
    // WORST case is two interior, non-adjacent losses; this pins it.
    val clean = Seq(
      1L -> Seq("anvil", "coil", "grey", "brandx", "economy", "small", "sz10"),
      2L -> Seq("widget", "wire", "red", "brandy", "standard", "large", "sz20"),
      3L -> Seq("bolt", "nut", "blue", "brandz", "promo", "medium", "sz30"))
    val dirty = Seq( // two interior non-adjacent fields lost (k=7 → floor 2 sigs)
      1L -> Seq("anvil", "coil", "grey", "economy", "sz10"),      // −brandx −small
      2L -> Seq("widget", "wire", "brandy", "standard", "sz20"),  // −red −large
      3L -> Seq("bolt", "nut", "brandz", "promo", "sz30"))        // −blue −medium
    val got = run(clean, dirty)
    assert(got.keySet == Set(1L, 2L, 3L), got.toString)
    got.foreach { case (rid, (matched, jacc, correct)) =>
      assert(matched == rid && correct, s"$rid matched $matched")
      assert(jacc == 714285L, s"$rid jacc $jacc") // 5/7 exactly
    }
  }

  test("blocking sweep: curves are monotone where the structure says they must be") {
    val dir = "/root/testdata/sf0.001"
    val rows = EntityResolution.erBlockingSweep(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(rows.size ==
      EntityResolution.SweepSchemes.size * EntityResolution.SweepDfCaps.size *
        EntityResolution.SweepThresholdsE6.size)
    for ((scheme, _) <- EntityResolution.SweepSchemes;
         t <- EntityResolution.SweepThresholdsE6) {
      // raising the df cap only ADDS signatures to blocking:
      // candidate pairs and correct matches are non-decreasing in cap
      val byCap = EntityResolution.SweepDfCaps.map(c => rows((scheme, c, t)))
      assert(byCap.sliding(2).forall { case Seq(a, b) => a._1 <= b._1 },
        s"$scheme/$t candidates not monotone in cap: $byCap")
      assert(byCap.sliding(2).forall { case Seq(a, b) => a._3 <= b._3 },
        s"$scheme/$t correct matches not monotone in cap: $byCap")
    }
    for ((scheme, _) <- EntityResolution.SweepSchemes;
         c <- EntityResolution.SweepDfCaps) {
      // raising the threshold only FILTERS the ranked matches
      val byThr = EntityResolution.SweepThresholdsE6.map(t => rows((scheme, c, t)))
      assert(byThr.sliding(2).forall { case Seq(a, b) => a._2 >= b._2 },
        s"$scheme/$c matches not monotone in threshold: $byThr")
    }
    // the production constants sit on a sensible point of the curve:
    // at (adjacent, 256, 600000) recall is no worse than the tightest
    // config and blocking cost is below the loosest cap's
    val prod = rows(("adjacent", EntityResolution.MaxSigDf.toLong,
      EntityResolution.MatchThresholdE6))
    assert(prod._2 > 0 && prod._3 > 0, prod.toString)
  }
}
