package graft

import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint

/** Plan-shape regression guards — the scale properties the round-2
  * verdict demanded, locked in as tests:
  *  - no CDC operator may FORCE a broadcast: every cdc_* relation
  *    derives from the log, so a mandatory broadcast is a driver OOM
  *    on a delete-heavy 100× log (AQE decides at runtime instead);
  *  - no oracle query may plan a CartesianProduct: the only sanctioned
  *    all-pairs shape is dedup_embed_cosine's CONDITIONED
  *    broadcast-nested-loop (id1 < id2 rides the broadcast).
  * Planning only — nothing executes, so the whole surface checks in
  * seconds at sf0.001. */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** cdc_generation_assign broadcasts the generations RELATION — that
    * side is cluster metadata (tens of rows per cluster lifetime,
    * SURVEY §5), not log-derived, so its hint is sanctioned. */
  private val sanctionedCdcBroadcasts = Set("cdc_generation_assign")

  test("no cdc operator forces a broadcast of a log-derived relation") {
    val cdcNames = SparkEntry.queries.keys.filter(_.startsWith("cdc_")).toSeq.sorted
      .filterNot(sanctionedCdcBroadcasts)
    assert(cdcNames.nonEmpty)
    cdcNames.foreach { name =>
      val analyzed = SparkEntry.queries(name)(spark, dir).queryExecution.analyzed
      val hints = analyzed.collect { case h: ResolvedHint => h }
      assert(hints.isEmpty, s"$name carries a forced join hint")
    }
  }

  test("no oracle query plans an unconditioned cartesian product") {
    SparkEntry.queries.toSeq.sortBy(_._1)
      // q_range_join_auto needs the GraftExtensions session and
      // already fails fast if its rewrite didn't fire — its plan
      // shape is asserted in RangeJoinRewriteSpec
      .filterNot(_._1 == "q_range_join_auto")
      .foreach { case (name, fn) =>
        val physical = fn(spark, dir).queryExecution.executedPlan.toString
        assert(!physical.contains("CartesianProduct"),
          s"$name plans a CartesianProduct:\n$physical")
      }
  }
}
