package graft

/** Guard spec for the driver contract: every declared query has an
  * oracle, and the flagship entry returns rows. */
class SparkEntrySpec extends SparkSpec {

  test("every query has a matching oracle (and no orphan oracles)") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
    assert(SparkEntry.queries.nonEmpty)
  }

  test("flagship entry runs on sf0.001 with rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL strings are non-empty and alias-disciplined") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      // every oracle is a SELECT pipeline (CTEs allowed)
      assert(sql.trim.toUpperCase.startsWith("SELECT") ||
        sql.trim.toUpperCase.startsWith("WITH"), name)
    }
  }
}
