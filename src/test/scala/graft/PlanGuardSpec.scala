package graft

import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint

/** Plan-shape regression guards — the scale properties the round-2/3
  * verdicts demanded, locked in as tests:
  *  - no CDC operator may FORCE a broadcast: every cdc_* relation
  *    derives from the log, so a mandatory broadcast is a driver OOM
  *    on a delete-heavy 100× log (AQE decides at runtime instead);
  *  - no oracle query may plan a CartesianProduct (dedup_embed_cosine's
  *    former conditioned nested-loop is gone too — it now equi-joins
  *    on triangle-pruned cell pairs, see EmbedCosineSpec);
  *  - the five skew-hardened operators may never regress to a window
  *    partitioned by their lone hot key over unreduced data (the
  *    DistributedRanks / two-stage-top-N rewrites of round 3).
  * Mostly planning-time; operators built on an EAGER localCheckpoint
  * (q_median, q_percentiles, corpus_interleave, corpus_shard_balance,
  * corpus_select_budget, text_tfidf, text_bigram_lm,
  * dedup_span_coverage, ann_pq, ann_ivf, dedup_*) do run their
  * checkpointed subtree at DataFrame-construction time — still seconds
  * at sf0.001. */
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

  test("skew-hardened operators keep no lone-hot-key window over unreduced data") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Window => LWindow}
    // window partitions cannot be skew-split by AQE, so a window keyed
    // by ONE few-valued column over the raw data pins a whole group in
    // one task — these five were rewritten in round 3 and must stay
    // rewritten. A lone-hot-key window IS legitimate above a reducer:
    // the (group × pid) offsets aggregate of DistributedRanks, or the
    // per-(group, pid) rank-filter prune of the two-stage top-N.
    val targets = Seq(
      "q_median" -> "c_mktsegment",
      "q_percentiles" -> "event_type",
      "corpus_interleave" -> "source",
      "corpus_shard_balance" -> "source",
      "emb_outliers" -> "label",
      // round-4 additions built on the same machinery: the constant
      // rank group of the deciles report, the per-source prefix sums,
      // and packSequences' per-shard running sum
      "corpus_quality_deciles" -> "__g",
      "corpus_budget_by_source" -> "source",
      "corpus_pack_sequences" -> "shard",
      // the RFM quintile ranks run three constant-group
      // DistributedRanks passes — the "__g" windows may only ever see
      // the (group × pid) offsets aggregate
      "q_rfm" -> "__g")
    def reduced(p: LogicalPlan): Boolean = p.collectFirst {
      case a: Aggregate if a.groupingExpressions.size >= 2 => ()
      case f: Filter if f.child.collectFirst {
        case w: LWindow if w.partitionSpec.size >= 2 => () }.nonEmpty => ()
    }.nonEmpty
    targets.foreach { case (name, hotKey) =>
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan
      plan.foreach {
        case w: LWindow if w.partitionSpec.size == 1 &&
            w.partitionSpec.head.references.map(_.name).toSeq == Seq(hotKey) =>
          assert(reduced(w.child),
            s"$name: window partitioned by lone hot key '$hotKey' over unreduced data:\n$w")
        case _ => ()
      }
    }
  }

  test("unpartitioned windows only ever run over aggregated day-grain relations") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window => LWindow}
    // an UNPARTITIONED window moves every input row into one task — it
    // is legitimate only above a grouping aggregate that reduced the
    // input to metadata/calendar grain first (q_rolling_distinct's
    // day-grain diff prefix sum). Guard every query: any empty
    // partitionSpec must have an Aggregate somewhere below it.
    def hasAgg(p: LogicalPlan): Boolean =
      p.collectFirst { case a: Aggregate if a.groupingExpressions.nonEmpty => () }.nonEmpty
    Seq("q_rolling_distinct").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan
      var found = 0
      plan.foreach {
        case w: LWindow if w.partitionSpec.isEmpty =>
          found += 1
          assert(hasAgg(w.child),
            s"$name: unpartitioned window over unreduced data:\n$w")
        case _ => ()
      }
      assert(found >= 1, s"$name: expected the day-grain cumulative window in the plan")
    }
  }
}
