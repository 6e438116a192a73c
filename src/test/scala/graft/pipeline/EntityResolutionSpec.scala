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
}
