package graft.analytics

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General analytics queries over the TPC-H-ish tables.
  *
  * Numeric policy (SURVEY.md §6): all double aggregations go through
  * DECIMAL (exact, order-independent under any partitioning — double
  * sums are not associative) and are CAST back to DOUBLE at the end so
  * DuckDB and Spark produce bit-identical values regardless of plan.
  */
object Queries {

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** TPC-H Q1 shape: pricing summary report. One scan + one partial-agg
    * shuffle on 6 groups — map-side combine collapses 100 TB to KBs.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount")))
          * (lit(1).cast("decimal(18,2)") + dec2(col("l_tax")))).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Revenue by nation: lineitem ⋈ orders ⋈ customer ⋈ nation.
    * Only the FIXED-cardinality dimension (nation, 25 rows at every
    * SF) carries a broadcast hint. customer is a ratio dim — small
    * relative to the fact but still growing with scale — so its edge
    * is left to AQE, which broadcasts at runtime exactly while the
    * post-scan side fits the threshold and falls back to a shuffle
    * join past it. orders is FACT-sized: a forced broadcast there
    * builds the hash relation single-threaded through the driver and
    * OOMs at scale, so that edge shuffles on l_orderkey.
    */
  def qJoinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  val qJoinBroadcastSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Top-k customers by revenue; deterministic tie-break on the key. */
  def qTopK(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.groupBy(col("o_custkey"))
      .agg(sum(dec2(col("o_totalprice"))).cast("double").as("total_spent"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("total_spent").desc, col("o_custkey"))
      .limit(25)
  }

  val qTopKSql: String =
    """SELECT o_custkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY total_spent DESC, o_custkey
      |LIMIT 25""".stripMargin

  /** Ranking + lag window functions per user over the event stream.
    * Single shuffle on user_id; both window specs share the same
    * partitioning so Catalyst plans one Exchange.
    */
  def qWindowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(
        col("user_id"), col("event_id"), unix_micros(col("ts")).as("time_us"),
        row_number().over(w).as("seq_no"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
      .filter(col("seq_no") <= 5)
      .orderBy(col("user_id"), col("seq_no"))
  }

  val qWindowFuncsSql: String =
    """SELECT * FROM (
      |  SELECT user_id, event_id, epoch_us(ts) AS time_us,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS seq_no,
      |    epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events)
      |WHERE seq_no <= 5
      |ORDER BY user_id, seq_no""".stripMargin

  /** Gap-based sessionization: a new session starts after >30min of
    * inactivity. Classic lag → cumulative-sum pattern; one shuffle on
    * user_id, then both windows are partition-local.
    */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("time_us"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    ev.select(col("user_id"), col("event_id"), col("value"), unix_micros(col("ts")).as("time_us"))
      .withColumn("new_sess",
        when(col("time_us") - lag(col("time_us"), 1).over(w) > gapUs || lag(col("time_us"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        min(col("time_us")).as("session_start_us"),
        max(col("time_us")).as("session_end_us"),
        sum(dec2(col("value"))).cast("double").as("session_value"))
      .orderBy(col("user_id"), col("session_no"))
  }

  val qSessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, value, epoch_us(ts) AS time_us,
      |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > 1800000000
      |           OR LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
      |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS new_sess
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, event_id, value, time_us,
      |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY time_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
      |  FROM flagged)
      |SELECT user_id, session_no, COUNT(*) AS n_events,
      |  MIN(time_us) AS session_start_us, MAX(time_us) AS session_end_us,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM sessions
      |GROUP BY user_id, session_no
      |ORDER BY user_id, session_no""".stripMargin

  /** Per-user pivot on event type: conditional aggregation — one
    * shuffle, no actual PIVOT operator needed at any scale.
    */
  def qEventPivot(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def cnt(t: String) = count(when(col("event_type") === t, 1)).as(s"n_$t")
    ev.groupBy(col("user_id"))
      .agg(cnt("view"), cnt("click"), cnt("purchase"), cnt("signup"), cnt("error"),
        sum(when(col("event_type") === "purchase", dec2(col("value")))).cast("double").as("purchase_value"))
      .orderBy(col("user_id"))
  }

  val qEventPivotSql: String =
    """SELECT user_id,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** JSON extraction from the event payload (`props` carries a JSON
    * object): parse-and-project stays in the scan stage (codegen'd
    * path expression, no UDF), then a normal aggregation. */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  val qJsonExtractSql: String =
    """SELECT event_type,
      |  COUNT(*) AS n_events,
      |  COUNT(CAST(props->>'$.k' AS BIGINT)) AS n_with_k,
      |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
      |  MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Exact per-group median (and quartile row counts), computed
    * POSITIONALLY — middle one/two sorted values averaged through
    * DECIMAL — so both engines agree bit-for-bit with no dependence on
    * their quantile interpolation flavors. Ranks come from
    * [[graft.functions.DistributedRanks]]: exact global position per
    * group without a group-partitioned window (approx sketches are
    * the alternative when exactness can yield). */
  def qMedian(spark: SparkSession, dir: String): DataFrame = {
    // 5 market segments: a segment-partitioned window = one task per
    // fifth of all customers; rank distributed instead (see
    // DistributedRanks scaladoc)
    val ranked = graft.functions.DistributedRanks.withGroupRanks(
      Tables.customer(spark, dir)
        .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey")),
      "c_mktsegment", Seq(col("c_acctbal"), col("c_custkey")))
    ranked
      // floor division to match the oracle's `//` (Column./ is double division)
      .filter(col("rn") === floor((col("n") + 1) / 2) ||
        col("rn") === floor((col("n") + 2) / 2))
      .groupBy(col("c_mktsegment"))
      .agg(avg(dec2(col("c_acctbal"))).cast("double").as("median_acctbal"),
        max(col("n")).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val qMedianSql: String =
    """WITH ranked AS (
      |  SELECT c_mktsegment, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS rn,
      |    COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      |  FROM customer)
      |SELECT c_mktsegment,
      |  CAST(AVG(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS median_acctbal,
      |  CAST(MAX(n) AS BIGINT) AS n_customers
      |FROM ranked
      |WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** ROLLUP aggregation over nation → region revenue; grouping keys
    * coalesced to a sentinel so the subtotal rows compare stably.
    * One shuffle; rollup adds no extra exchange (partial aggs expand
    * grouping sets map-side). */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(sum(dec2(col("c_acctbal"))).cast("double").as("total_acctbal"),
        count(lit(1)).as("n_customers"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("total_acctbal"), col("n_customers"))
      .orderBy(col("region"), col("nation"))
  }

  val qRollupSql: String =
    """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
      |  COUNT(*) AS n_customers
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY region, nation""".stripMargin

  /** CUBE over (priority, status): all four grouping sets in ONE
    * aggregation — map-side grouping-set expansion (each input row
    * fans to its 4 set memberships before the single shuffle), so the
    * full cross-tab costs one exchange, not four queries. At 100 TB
    * the fan-out factor (2^dims) is the knob: cube 2-3 dims, rollup
    * hierarchies, never cube a high-cardinality column. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total_price"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_orders"), col("total_price"))
      .orderBy(col("priority"), col("status"))

  val qCubeSql: String =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      |  coalesce(o_orderstatus, 'ALL') AS status,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY CUBE(o_orderpriority, o_orderstatus)
      |ORDER BY priority, status""".stripMargin

  /** Explicit GROUPING SETS over (priority) and (status) — the
    * non-hierarchical complement to [[qRollup]]/[[qCube]]: exactly the
    * two single-dimension marginals, no cross cells, in ONE
    * aggregation (each input row fans to its 2 set memberships before
    * the single shuffle — two GROUP BY queries for the price of one
    * exchange). The 100 TB note from cube applies: the fan-out is
    * |sets|, chosen explicitly instead of 2^dims. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total_price"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_orders"), col("total_price"))
      .orderBy(col("priority"), col("status"))

  val qGroupingSetsSql: String =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      |  coalesce(o_orderstatus, 'ALL') AS status,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
      |ORDER BY priority, status""".stripMargin

  /** Anti join: customers with no orders (NOT EXISTS → left_anti; the
    * shuffle is on the key both sides, broadcast when one side is
    * small — Catalyst picks per stats/AQE). */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers_without_orders"),
        sum(dec2(col("c_acctbal"))).cast("double").as("total_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  val qAntiJoinSql: String =
    """SELECT c_mktsegment,
      |  COUNT(*) AS n_customers_without_orders,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Semi join — orders with at least one returned line, counted by
    * priority (TPC-H Q4's EXISTS shape on the reduced schema):
    * left_semi never DUPLICATES the probe side, unlike the
    * inner-join-then-distinct a naive translation writes — at 100 TB
    * that naive shape explodes each order by its matching line count
    * and then pays a distinct shuffle to undo it. The returnflag
    * filter pushes to the lineitem scan, the semi join shuffles both
    * sides once on the key (broadcast if the filtered build side is
    * small — AQE decides), and the few-key rollup combines map-side.
    * [[qAntiJoin]] is the NOT EXISTS twin. */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val returned = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    Tables.orders(spark, dir)
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  val qSemiJoinSql: String =
    """SELECT o_orderpriority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** AS-OF join — for each event, the customer's most recent order at
    * or before the event time. Implemented with the scalable
    * union+window layout (tag both sides, one shuffle on the key,
    * `last(_, ignoreNulls)` over time order) instead of an inequality
    * join: no range-join explosion, one exchange, linear in input.
    * Events pair with customers via user_id ↔ o_custkey. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("t"),
        col("event_id"), lit(null).cast("long").as("o_key_in"),
        lit(null).cast("double").as("o_price_in"), lit(1).as("is_event"))
    val ord = Tables.orders(spark, dir)
      // parquet TIMESTAMP_NTZ → session-UTC timestamp (value-identical)
      .select(col("o_custkey").as("k"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
        lit(null).cast("long").as("event_id"), col("o_orderkey").as("o_key_in"),
        col("o_totalprice").as("o_price_in"), lit(0).as("is_event"))
    // orders sort before events at the same instant (is_event breaks ties)
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("is_event"), col("o_key_in").asc_nulls_last, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.unionByName(ev)
      .withColumn("asof_orderkey", last(col("o_key_in"), ignoreNulls = true).over(w))
      .withColumn("asof_totalprice", last(col("o_price_in"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1 && col("asof_orderkey").isNotNull)
      .select(col("k").as("user_id"), col("t").as("time_us"), col("event_id"),
        col("asof_orderkey"), col("asof_totalprice"))
      .orderBy(col("user_id"), col("time_us"), col("event_id"))
  }

  /** RANGE JOIN — pairs of the same user's events within ±6 hours —
    * via BUCKET EXPANSION, not an inequality join: both sides key by
    * floor(time / W); one side fans out to bucket ±1 (3 rows), so
    * every qualifying pair meets on an EQUI-join key exactly once
    * (bucket distance ≤ 1 when |Δt| ≤ W), then the exact |Δt| ≤ W
    * predicate refines. The plan is a plain hash shuffle join —
    * linear, skew-handled by AQE — where a naive `t BETWEEN a AND b`
    * join would plan as a nested-loop explosion. The standard
    * interval-join layout at 100 TB. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val windowUs = 6L * 3600 * 1000000
    val ev = Tables.events(spark, dir)
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("t"), col("event_id"))
    val left = ev.withColumn("bucket", floor(col("t") / windowUs))
      .select(col("k"), col("bucket"), col("t").as("ta"), col("event_id").as("ea"))
    val right = ev.withColumn("b0", floor(col("t") / windowUs))
      .select(col("k"), col("t").as("tb"), col("event_id").as("eb"),
        explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("bucket"))
    left.join(right, Seq("k", "bucket"))
      .filter(col("ea") < col("eb") && abs(col("ta") - col("tb")) <= windowUs)
      .groupBy(col("k").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("ta") - col("tb"))).as("min_gap_us"),
        max(abs(col("ta") - col("tb"))).as("max_gap_us"))
      .orderBy(col("user_id"))
  }

  /** RANGE JOIN, AUTOMATIC — the same interval-join problem written
    * the NAIVE way: a pure inequality join (`tb` within ±6 minutes of
    * `ta`, no manual buckets, no equi key), which Spark alone would
    * plan as a broadcast nested-loop join — quadratic, the worst plan
    * a 100 TB query can hit. The injected
    * [[graft.plans.RangeJoinRewrite]] optimizer rule (active via
    * [[graft.GraftExtensions]], width from
    * `spark.graft.rangeJoin.bucketWidth`) rewrites it into the same
    * bucket-expansion equi-join [[qRangeJoin]] builds by hand. The
    * `require` makes the dependency explicit: without the rule this
    * query must fail fast, not silently run O(n²).
    *
    * The width conf intentionally stays set on the session: Verify /
    * Bench re-optimize at write time (a new QueryExecution wraps the
    * plan), so unsetting it after building the frame would re-plan
    * the nested loop. No other operator's join is inequality-only, so
    * the session-wide setting perturbs nothing else. */
  def qRangeJoinAuto(spark: SparkSession, dir: String): DataFrame = {
    val windowUs = 360L * 1000000 // ±6 min; pairs/event stays O(10) at sf0.1
    spark.conf.set(graft.plans.RangeJoinRewrite.WidthConf, (2 * windowUs).toString)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("t"), col("event_type"))
    val a = ev.select(col("event_type").as("type_a"), col("t").as("ta"),
      col("event_id").as("ea"))
    val b = ev.select(col("t").as("tb"), col("event_id").as("eb"))
    val out = a.join(b,
        col("tb") >= col("ta") - windowUs && col("tb") <= col("ta") + windowUs &&
          col("ea") =!= col("eb"))
      .groupBy(col("type_a"))
      .agg(count(lit(1)).as("n_pairs"),
        max(abs(col("ta") - col("tb"))).as("max_gap_us"))
      .orderBy(col("type_a"))
    require(out.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }.nonEmpty,
      "RangeJoinRewrite did not fire (is graft.GraftExtensions on " +
        "spark.sql.extensions?) — refusing to run the naive interval join as a nested loop")
    out
  }

  val qRangeJoinAutoSql: String = {
    val w = 360L * 1000000
    s"""SELECT a.event_type AS type_a, COUNT(*) AS n_pairs,
       |  MAX(abs(epoch_us(a.ts) - epoch_us(b.ts))) AS max_gap_us
       |FROM events a JOIN events b
       |  ON epoch_us(b.ts) >= epoch_us(a.ts) - $w
       |  AND epoch_us(b.ts) <= epoch_us(a.ts) + $w
       |  AND a.event_id <> b.event_id
       |GROUP BY 1 ORDER BY type_a""".stripMargin
  }

  val qRangeJoinSql: String = {
    val w = 6L * 3600 * 1000000
    s"""SELECT a.user_id, COUNT(*) AS n_pairs,
       |  MIN(abs(epoch_us(a.ts) - epoch_us(b.ts))) AS min_gap_us,
       |  MAX(abs(epoch_us(a.ts) - epoch_us(b.ts))) AS max_gap_us
       |FROM events a JOIN events b ON a.user_id = b.user_id
       |  AND a.event_id < b.event_id
       |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= $w
       |GROUP BY a.user_id
       |ORDER BY a.user_id""".stripMargin
  }

  val qAsofJoinSql: String =
    """WITH tagged AS (
      |  SELECT o_custkey AS k, epoch_us(o_orderdate) AS t,
      |    CAST(NULL AS BIGINT) AS event_id, o_orderkey AS o_key_in,
      |    o_totalprice AS o_price_in, 0 AS is_event
      |  FROM orders
      |  UNION ALL
      |  SELECT user_id AS k, epoch_us(ts) AS t, event_id,
      |    CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), 1
      |  FROM events),
      |filled AS (
      |  SELECT *,
      |    LAST_VALUE(o_key_in IGNORE NULLS) OVER
      |      (PARTITION BY k ORDER BY t, is_event, o_key_in ASC NULLS LAST, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_orderkey,
      |    LAST_VALUE(o_price_in IGNORE NULLS) OVER
      |      (PARTITION BY k ORDER BY t, is_event, o_key_in ASC NULLS LAST, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_totalprice
      |  FROM tagged)
      |SELECT k AS user_id, t AS time_us, event_id, asof_orderkey, asof_totalprice
      |FROM filled
      |WHERE is_event = 1 AND asof_orderkey IS NOT NULL
      |ORDER BY user_id, time_us, event_id""".stripMargin

  // ------------------------------------------------------------ #23o retention

  val RetentionBucketUs: Long = 7L * 86400 * 1000000 // weekly cohorts

  /** Cohort retention matrix — users grouped by first-activity week,
    * counted in each later week they return (the other
    * product-analytics classic next to [[qFunnel]]). The cohort
    * assignment is a per-user min over the user partition — chained
    * in the SAME window pass as the activity rows, no self-join —
    * then one (cohort, offset) aggregate over distinct user-weeks.
    *
    * Scale: shuffle on user_id, distinct on (user, week) rides the
    * same partitioning prefix, final aggregate is cohort² rows
    * (tiny). Retention rate joins the cohort size back — a
    * cohort-keyed relation, AQE-broadcast. */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val base = Tables.events(spark, dir)
      // `div` (floor division) — Column./ would divide as DOUBLE
      .select(col("user_id"),
        expr(s"unix_micros(ts) div $RetentionBucketUs").as("week"))
      .withColumn("cohort_week", min(col("week")).over(w))
      .select(col("user_id"), col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .distinct()
    val cohortSizes = base.filter(col("week_offset") === 0)
      .groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_users"))
    base
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(cohortSizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"), col("cohort_users"),
        round(col("n_active").cast("double") / col("cohort_users").cast("double"), 6)
          .as("retention_rate"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val qRetentionSql: String =
    s"""WITH act AS (
       |  SELECT DISTINCT user_id,
       |    MIN(epoch_us(ts) // $RetentionBucketUs) OVER (PARTITION BY user_id) AS cohort_week,
       |    epoch_us(ts) // $RetentionBucketUs
       |      - MIN(epoch_us(ts) // $RetentionBucketUs) OVER (PARTITION BY user_id) AS week_offset
       |  FROM events),
       |sizes AS (
       |  SELECT cohort_week, COUNT(*) AS cohort_users FROM act WHERE week_offset = 0 GROUP BY 1),
       |cells AS (
       |  SELECT cohort_week, week_offset, COUNT(*) AS n_active FROM act GROUP BY 1, 2)
       |SELECT c.cohort_week, c.week_offset, c.n_active, s.cohort_users,
       |  round(CAST(c.n_active AS DOUBLE) / CAST(s.cohort_users AS DOUBLE), 6) AS retention_rate
       |FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week
       |ORDER BY c.cohort_week, c.week_offset""".stripMargin

  // ------------------------------------------------------------ #23n funnel

  /** Staged conversion funnel over the event stream (view →
    * click → purchase, each stage strictly after the previous): the
    * classic product-analytics query. Each user's stage times are
    * nested conditional minima computed in ONE pass over the user's
    * partition — min(click after first view) depends on min(view),
    * so the projections chain over the same window partition (no
    * re-shuffle, no self-join against a per-user aggregate). Gaps
    * sum as exact BIGINT µs; rates/averages are one IEEE divide at
    * the end (round 6).
    *
    * Scale: one shuffle on user_id, then a constant-width global
    * aggregate — the same two-exchange shape regardless of corpus
    * size. */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
    val staged = ev
      .withColumn("t1", min(when(col("event_type") === "view", col("t"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" && col("t") > col("t1"), col("t"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("t") > col("t2"), col("t"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3"))
    staged.agg(
      count(lit(1)).as("n_users"),
      count(col("t1")).as("n_viewed"),
      count(col("t2")).as("n_clicked"),
      count(col("t3")).as("n_purchased"),
      round(count(col("t2")).cast("double") / greatest(count(col("t1")), lit(1L)).cast("double"), 6)
        .as("view_to_click_rate"),
      round(count(col("t3")).cast("double") / greatest(count(col("t2")), lit(1L)).cast("double"), 6)
        .as("click_to_purchase_rate"),
      round(sum(col("t2") - col("t1")).cast("double") / greatest(count(col("t2")), lit(1L)).cast("double"), 6)
        .as("avg_view_to_click_us"),
      round(sum(col("t3") - col("t2")).cast("double") / greatest(count(col("t3")), lit(1L)).cast("double"), 6)
        .as("avg_click_to_purchase_us"))
  }

  val qFunnelSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
      |staged AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN t END) AS t1
      |  FROM ev GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, ANY_VALUE(s.t1) AS t1,
      |    MIN(CASE WHEN e.event_type = 'click' AND e.t > s.t1 THEN e.t END) AS t2
      |  FROM ev e JOIN staged s ON e.user_id = s.user_id GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, ANY_VALUE(s.t1) AS t1, ANY_VALUE(s.t2) AS t2,
      |    MIN(CASE WHEN e.event_type = 'purchase' AND e.t > s.t2 THEN e.t END) AS t3
      |  FROM ev e JOIN s2 s ON e.user_id = s.user_id GROUP BY 1)
      |SELECT COUNT(*) AS n_users,
      |  COUNT(t1) AS n_viewed,
      |  COUNT(t2) AS n_clicked,
      |  COUNT(t3) AS n_purchased,
      |  round(CAST(COUNT(t2) AS DOUBLE) / CAST(greatest(COUNT(t1), 1) AS DOUBLE), 6) AS view_to_click_rate,
      |  round(CAST(COUNT(t3) AS DOUBLE) / CAST(greatest(COUNT(t2), 1) AS DOUBLE), 6) AS click_to_purchase_rate,
      |  round(CAST(SUM(t2 - t1) AS DOUBLE) / CAST(greatest(COUNT(t2), 1) AS DOUBLE), 6) AS avg_view_to_click_us,
      |  round(CAST(SUM(t3 - t2) AS DOUBLE) / CAST(greatest(COUNT(t3), 1) AS DOUBLE), 6) AS avg_click_to_purchase_us
      |FROM s3""".stripMargin

  // ------------------------------------------------------------ #23k profit

  /** Product-line profit by (nation, year) — the TPC-H Q9 shape over
    * this schema: lineitem ⋈ orders is the one genuine big⋈big join
    * (both fact-sized → shuffle join on the order key, AQE-skew
    * handled), while part (filtered), supplier and nation are
    * broadcast dims. Unit cost is modeled off p_retailprice (this
    * schema carries no partsupp). All money math is DECIMAL-exact
    * until the final cast.
    *
    * Plan to check in `.explain`: the part filter prunes BEFORE its
    * broadcast (predicate pushdown into the dim scan), lineitem's scan
    * reads only its 6 needed columns, exactly ONE sort-merge/shuffle
    * exchange pair for l⋈o. */
  def qProfit(spark: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    val costFrac = lit(0.1).cast("decimal(18,2)")
    val amount = dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))) -
      dec2(col("p_retailprice")) * dec2(col("l_quantity")) * costFrac
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.part(spark, dir).filter(col("p_name").contains("red"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(amount).cast("double").as("profit"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("o_year"))
  }

  val qProfitSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |    - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(18,2))) AS DOUBLE) AS profit,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2 ORDER BY nation, o_year""".stripMargin

  // ------------------------------------------------------------ #23j percentiles

  /** (numerator, denominator, column name) — percentiles as exact
    * rationals so the index arithmetic is pure BIGINT in both engines
    * (0.9 * n in IEEE doubles rounds differently than you'd hope). */
  val Percentiles: Seq[(Int, Int, String)] =
    Seq((1, 4, "p25"), (1, 2, "p50"), (3, 4, "p75"), (9, 10, "p90"), (99, 100, "p99"))

  /** Exact per-group percentiles, positionally computed (type-1
    * quantile: the value at rank ⌈p·n⌉, ties broken by the unique
    * event_id) — interpolation-free, so the output is a VALUE FROM THE
    * DATA and hash-stable across engines.
    *
    * Scale: ranks and group counts via
    * [[graft.functions.DistributedRanks]] — range-partitioned, so a
    * hot event_type never occupies one task — then a single
    * partial-agg collapse. (For percentiles over a 100 TB UNGROUPED
    * column you'd reach for approx_percentile's t-digest instead —
    * sketches merge; global sorts don't.) */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    // ~5 event types: an event_type-partitioned rank window would pin
    // each type's full data in one task (windows can't skew-split) —
    // DistributedRanks range-partitions instead, so ranks stay exact
    // while every task stays bounded
    val ranked = graft.functions.DistributedRanks.withGroupRanks(
      Tables.events(spark, dir).select(col("event_type"), col("value"), col("event_id")),
      "event_type", Seq(col("value"), col("event_id")))
    val pcols = Percentiles.map { case (num, den, name) =>
      max(when(col("rn") === expr(s"($num * n + ${den - 1}) div $den"), col("value"))).as(name)
    }
    ranked.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_rows"), pcols: _*)
      .orderBy(col("event_type"))
  }

  val qPercentilesSql: String = {
    val pcols = Percentiles.map { case (num, den, name) =>
      s"MAX(CASE WHEN rn = ($num * n + ${den - 1}) // $den THEN value END) AS $name"
    }
    s"""WITH ranked AS (
       |  SELECT event_type, value, event_id,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n
       |  FROM events)
       |SELECT event_type, MAX(n) AS n_rows,
       |  ${pcols.mkString(",\n  ")}
       |FROM ranked GROUP BY 1 ORDER BY event_type""".stripMargin
  }

  /** Sketch accuracy for [[qPercentilesApprox]]: the rank error of any
    * reported quantile is bounded by n / accuracy. */
  val ApproxPercentileAccuracy = 1000

  /** APPROXIMATE per-group percentiles via `approx_percentile` — the
    * 100 TB path [[qPercentiles]]' scaladoc names: the sketch
    * (GK-style mergeable summary, the t-digest role) aggregates with
    * map-side partial merge in ONE exchange of sketch-sized partials,
    * no ranks, no range repartition, no per-row shuffle of the data
    * column at all — exactly what an ungrouped (or hot-grouped)
    * quantile over 100 TB needs, at the cost of a documented rank
    * error ≤ n / [[ApproxPercentileAccuracy]] (PercentilesApproxSpec
    * measures it against the exact operator). Not oracle-hashable by
    * design — sketch internals are engine-specific — so this is a
    * rows-gated entry; reach for the exact [[qPercentiles]] when the
    * answer must be reproducible to the row (audits, SLA cutoffs),
    * and for this one when it must be cheap at scale. */
  def qPercentilesApprox(spark: SparkSession, dir: String): DataFrame = {
    val ps = array(Percentiles.map { case (num, den, _) => lit(num.toDouble / den) }: _*)
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        percentile_approx(col("value"), ps, lit(ApproxPercentileAccuracy)).as("qs"))
      .select(col("event_type") +: col("n_rows") +:
        Percentiles.zipWithIndex.map { case ((_, _, name), i) =>
          element_at(col("qs"), i + 1).as(name) }: _*)
      .orderBy(col("event_type"))
  }

  // ------------------------------------------------------------ #23i salted join

  /** Salt fan-out for the skew-salted join. */
  val JoinSalt = 8

  /** Fact⋈dim join with EXPLICIT key salting — the standard fix when
    * one join key is hot enough to bury a task: the fact side gets a
    * deterministic salt (event_id % S), the dim side replicates S ways,
    * and the join key becomes (key, salt), spreading each hot key over
    * S tasks. The oracle is the PLAIN join — salting must not change
    * results, only the partition histogram.
    *
    * When to reach for it at 100 TB: AQE's skew-join splitting already
    * handles most sort-merge skew, and a broadcastable dim (like this
    * one) needs no salting at all — but when BOTH sides are large AND
    * a handful of keys dominate (power-law user activity), salting is
    * the layout that keeps the reducers balanced, at the documented
    * cost of an S× dim replication. Salt comes from a stored column
    * (event_id), not rand(): deterministic under retries and
    * speculative execution — a rand() salt silently breaks exactly-once
    * task retry semantics. */
  def qSkewSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    // pmod, not %: Scala/Spark % of a negative event_id would yield a
    // negative salt matching no dim replica — those rows would vanish
    val ev = Tables.events(spark, dir)
      .withColumn("e_salt", pmod(col("event_id"), lit(JoinSalt)).cast("int"))
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        explode(sequence(lit(0), lit(JoinSalt - 1))).as("d_salt"))
    ev.join(dim, col("user_id") === col("c_custkey") && col("e_salt") === col("d_salt"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
      .orderBy(col("c_mktsegment"))
  }

  val qSkewSaltedJoinSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin

  /** Correlated scalar subquery, decorrelated — lineitems priced above
    * their OWN order's average price, rolled up per order priority.
    * The oracle keeps the textbook correlated form
    * `l_extendedprice > (SELECT AVG(..) WHERE l2.l_orderkey = l.l_orderkey)`;
    * here the subquery becomes a window aggregate over the l_orderkey
    * partition — ONE shuffle on the key instead of a per-row rescan
    * (the standard decorrelation; written explicitly so the plan is a
    * visible Window + join rather than an opaque subquery).
    *
    * The per-order average is a DECIMAL-exact windowed sum divided
    * once — bit-stable under any partitioning on both engines, so the
    * `>` comparison can't flap on summation order.
    *
    * The groupBy(l_orderkey) straight after the window REUSES the
    * window's partitioning (no second exchange) and shrinks the
    * orders join to order grain — also what lets the priority rollup
    * use a plain count(*) instead of a countDistinct expand over
    * every lineitem. */
  def qCorrelated(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
    val perOrder = Tables.lineitem(spark, dir)
      .withColumn("order_avg",
        sum(dec2(col("l_extendedprice"))).over(w).cast("double") / count(lit(1)).over(w))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_li"),
        sum((col("l_extendedprice") > col("order_avg")).cast("int")).as("n_above"))
    perOrder.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("n_li")).as("n_lineitems"),
        sum(col("n_above")).as("n_above_own_avg"))
      .orderBy(col("o_orderpriority"))
  }

  val qCorrelatedSql: String =
    """SELECT o_orderpriority,
      |  COUNT(DISTINCT l.l_orderkey) AS n_orders,
      |  COUNT(*) AS n_lineitems,
      |  CAST(SUM(CASE WHEN l.l_extendedprice > (
      |    SELECT CAST(SUM(CAST(l2.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |    FROM lineitem l2 WHERE l2.l_orderkey = l.l_orderkey)
      |  THEN 1 ELSE 0 END) AS BIGINT) AS n_above_own_avg
      |FROM lineitem l JOIN orders ON l.l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------------ moving average

  /** Moving-average frame width: 7 days in event-time microseconds. */
  val MovingAvgWindowUs: Long = 7L * 86400 * 1000000

  /** Per-user trailing 7-day moving average of event value — the
    * RANGE-frame time-series smoother (rolling spend/engagement):
    * every event row annotated with the window's event count, exact
    * DECIMAL sum, and the average. Tie times are frame PEERS (RANGE,
    * not ROWS), so the result is deterministic under any tie order.
    *
    * Scale: ONE user_id-keyed exchange; user_id is high-cardinality
    * (the skew-audit grade for window keys), the frame is
    * partition-local, and the DECIMAL sum keeps the output
    * hash-stable at any partitioning. */
  def qMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("time_us"))
      .rangeBetween(-MovingAvgWindowUs, 0)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("time_us"),
        col("value"))
      .withColumn("n_in_window", count(lit(1)).over(w))
      .withColumn("win_sum", sum(dec2(col("value"))).over(w).cast("double"))
      .withColumn("moving_avg", round(col("win_sum") / col("n_in_window"), 6))
      .orderBy(col("event_id"))
  }

  val qMovingAvgSql: String =
    s"""SELECT user_id, event_id, epoch_us(ts) AS time_us, value,
       |  COUNT(*) OVER w AS n_in_window,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS win_sum,
       |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
       |    / (COUNT(*) OVER w), 6) AS moving_avg
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
       |  RANGE BETWEEN $MovingAvgWindowUs PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------ z-score outliers

  /** Per-type z-score anomaly report — events whose value sits more
    * than 3σ from their event_type's mean (the metrics-pipeline
    * tripwire). Mean/σ come from exact DECIMAL power sums (n, Σv,
    * Σv²) so both engines derive bit-identical doubles; sqrt and IEEE
    * division are hash-stable (the doc'd rule — no ln anywhere).
    *
    * Scale: the stats are a FEW-KEY groupBy — an aggregation, not a
    * window, so partial aggregation combines map-side and the hot
    * type never serializes through one task; the tiny stats relation
    * broadcasts back and the flag pass is map-only. */
  def qZscore(spark: SparkSession, dir: String): DataFrame = {
    val stats = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).as("s1"),
        sum(dec2(col("value")) * dec2(col("value"))).as("s2"))
      .withColumn("mean", col("s1").cast("double") / col("n"))
      .withColumn("ms2", col("s2").cast("double") / col("n"))
      .withColumn("std", sqrt(col("ms2") - col("mean") * col("mean")))
      .select(col("event_type"), col("mean"), col("std"))
    Tables.events(spark, dir)
      .join(broadcast(stats), Seq("event_type"))
      .filter(abs(col("value") - col("mean")) > lit(3.0d) * col("std"))
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("mean")) / col("std"), 6).as("zscore"))
      .orderBy(col("event_id"))
  }

  val qZscoreSql: String =
    """WITH s AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS s1,
      |    SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS s2
      |  FROM events GROUP BY 1),
      |m1 AS (
      |  SELECT event_type, CAST(s1 AS DOUBLE) / n AS mean, CAST(s2 AS DOUBLE) / n AS ms2 FROM s),
      |m AS (
      |  SELECT event_type, mean, sqrt(ms2 - mean * mean) AS std FROM m1)
      |SELECT e.event_id, e.event_type, e.value,
      |  round((e.value - m.mean) / m.std, 6) AS zscore
      |FROM events e JOIN m USING (event_type)
      |WHERE abs(e.value - m.mean) > 3.0 * m.std
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------ #23r RFM segmentation

  /** Quantile buckets for the RFM scores (quintiles, 1 = bottom). */
  val RfmBuckets = 5

  /** RFM customer segmentation over `orders` — the mart-analytics
    * classic: per customer, Recency (latest order date), Frequency
    * (order count), Monetary (lifetime spend), each bucketed into a
    * global quintile score 1-5, plus the composed 3-digit cell.
    *
    * The scale trap this layout dodges: the textbook
    * `ntile(5) OVER (ORDER BY metric)` is a GLOBAL window — every
    * customer row serializes through ONE task, three times over. Here
    * each score comes from [[graft.functions.DistributedRanks]] global
    * ranks (constant group): range-partitioned two-phase exact ranks,
    * so no task ever holds more than a range slice, at any customer
    * count. Bucket arithmetic is pure integer (`(rn·B − 1) div n + 1`,
    * the exact ceiling), deterministic under the (metric, custkey)
    * tie-break on both engines. */
  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    // Monetary sums in DECIMAL(18,2): a raw double sum is
    // order-dependent across partitions, so both the emitted value
    // and the m_score tie-breaks could flake run-to-run. The exact
    // decimal drives the ranking; the output casts back to double.
    val base = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(dec2(col("o_totalprice"))).as("monetary_dec"))
      .withColumn("__g", lit(0))
    def score(df: DataFrame, metric: Column, out: String): DataFrame =
      graft.functions.DistributedRanks.withGroupRanks(df, "__g",
          Seq(metric, col("o_custkey")))
        .withColumn(out, expr(s"CAST((rn * $RfmBuckets - 1) DIV n + 1 AS INT)"))
        .drop("rn", "n")
    score(score(score(base, col("last_order"), "r_score"),
        col("frequency"), "f_score"),
        col("monetary_dec"), "m_score")
      .withColumn("rfm_cell",
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).cast("int"))
      .select(col("o_custkey"), col("last_order"), col("frequency"),
        col("monetary_dec").cast("double").as("monetary"),
        col("r_score"), col("f_score"), col("m_score"), col("rfm_cell"))
      .orderBy(col("o_custkey"))
  }

  val qRfmSql: String =
    s"""WITH rfm AS (
       |  SELECT o_custkey, MAX(o_orderdate) AS last_order,
       |    COUNT(*) AS frequency,
       |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary_dec
       |  FROM orders GROUP BY 1),
       |ranked AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (ORDER BY last_order, o_custkey) AS rr,
       |    ROW_NUMBER() OVER (ORDER BY frequency, o_custkey) AS fr,
       |    ROW_NUMBER() OVER (ORDER BY monetary_dec, o_custkey) AS mr,
       |    COUNT(*) OVER () AS n
       |  FROM rfm),
       |scored AS (
       |  SELECT o_custkey, last_order, frequency,
       |    CAST(monetary_dec AS DOUBLE) AS monetary,
       |    CAST((rr * $RfmBuckets - 1) // n + 1 AS INT) AS r_score,
       |    CAST((fr * $RfmBuckets - 1) // n + 1 AS INT) AS f_score,
       |    CAST((mr * $RfmBuckets - 1) // n + 1 AS INT) AS m_score
       |  FROM ranked)
       |SELECT *, CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm_cell
       |FROM scored ORDER BY o_custkey""".stripMargin

  // ------------------------------------------------------------ correlation

  /** Per-type Pearson correlation between event value and day index —
    * "is this metric drifting over time", the classic cross-column
    * statistic the inventory's mean/σ/quantile ops don't cover.
    *
    * Computed from exact power sums (n, Σx, Σy, Σxy, Σx², Σy²) over
    * DECIMAL — not a streaming/Welford variance, which is
    * order-dependent in floating point and can't hash-match across
    * engines (the doc'd bit-stability rule). The day index keeps the
    * products small enough that every sum stays exact in DECIMAL; the
    * final r = (nΣxy−ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²)) is identical
    * double math on both sides.
    *
    * Scale: ONE few-key groupBy with map-side partial aggregation —
    * six sums per group, no window, no second pass, nothing resident
    * but the per-group accumulators. The 100 TB plan is the same plan. */
  def qCorr(spark: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400000000L
    val x = dec2(col("value"))
    val y = expr(s"unix_micros(ts) div $DayUs").cast("decimal(18,2)")
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .withColumn("num",
        col("n") * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double"))
      .withColumn("den", sqrt(
        (col("n") * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")) *
          (col("n") * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double"))))
      .select(col("event_type"), col("n"),
        round(col("num") / col("den"), 6).as("corr_value_day"))
      .orderBy(col("event_type"))
  }

  val qCorrSql: String =
    """WITH s AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS sx,
      |    SUM(CAST(epoch_us(ts) // 86400000000 AS DECIMAL(18,2))) AS sy,
      |    SUM(CAST(value AS DECIMAL(18,2)) * CAST(epoch_us(ts) // 86400000000 AS DECIMAL(18,2))) AS sxy,
      |    SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS sxx,
      |    SUM(CAST(epoch_us(ts) // 86400000000 AS DECIMAL(18,2))
      |      * CAST(epoch_us(ts) // 86400000000 AS DECIMAL(18,2))) AS syy
      |  FROM events GROUP BY 1)
      |SELECT event_type, n,
      |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |         * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
      |    AS corr_value_day
      |FROM s ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------ rolling distinct

  /** Rolling-window span in days. */
  val RollingDays = 7

  /** Exact 7-day rolling distinct users per activity day (trailing
    * DAU/WAU) — the aggregate every engagement dashboard wants and
    * the one that does NOT decompose: distinct is not summable across
    * the window's days, so the naive shapes are a per-day
    * count-distinct re-scan of 7× the data or a day×window
    * self-join. This layout makes it LINEAR:
    *
    *  1. (user, day) distinct pairs — the only data-sized shuffle;
    *  2. per-user interval merge: a user covers windows ending in
    *     [day, day+6]; overlapping covers merge via a running-max
    *     window over the user's OWN days (user_id is high-cardinality
    *     — bounded partitions);
    *  3. interval ends become ±1 diff events, aggregated to DAY grain
    *     and prefix-summed — the only unpartitioned window runs over
    *     the CALENDAR-sized day relation (3.7k rows for a decade),
    *     never over data.
    *
    * The count for day d = Σ deltas ≤ d = #users whose merged cover
    * contains d = exact distinct users active in [d−6, d]. */
  def qRollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400000000L
    val span = RollingDays - 1
    // (user, day) grain; feeds the interval pass, the per-day DAU and
    // the day-relation join — checkpoint so the scan+distinct runs once
    val ud = Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("time_us"), col("user_id"))
      .select(expr(s"time_us div $DayUs").as("day"), col("user_id"))
      .distinct()
      .localCheckpoint()
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intervals = ud
      .withColumn("prev_max_end", max(col("day") + lit(span.toLong)).over(wPrev))
      .withColumn("new_grp",
        when(col("prev_max_end").isNull || col("day") > col("prev_max_end"), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("new_grp")).over(wRun))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("day")).as("start"), (max(col("day")) + lit(span.toLong)).as("end"))
    val diffs = intervals.select(col("start").as("day"), lit(1L).as("delta"))
      .unionByName(intervals.select((col("end") + 1).as("day"), lit(-1L).as("delta")))
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val dayRel = diffs
      .unionByName(dau.select(col("day"), lit(0L).as("delta")))
      .groupBy(col("day")).agg(sum(col("delta")).as("delta"))
    // unpartitioned running sum — input is the aggregated DAY relation
    // (calendar-sized by construction), not data
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dayRel
      .withColumn("rolling_users_7d", sum(col("delta")).over(wCum))
      .join(dau, Seq("day"))
      .select(col("day"), col("dau"), col("rolling_users_7d"))
      .orderBy(col("day"))
  }

  val qRollingDistinctSql: String =
    s"""WITH ud AS (
       |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
       |dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1)
       |SELECT d.day, d.dau, COUNT(DISTINCT u.user_id) AS rolling_users_7d
       |FROM dau d JOIN ud u ON u.day BETWEEN d.day - ${RollingDays - 1} AND d.day
       |GROUP BY d.day, d.dau
       |ORDER BY d.day""".stripMargin

  // ------------------------------------------------------------ approx distinct

  /** Target relative standard deviation for the HyperLogLog++ sketch. */
  val ApproxDistinctRsd = 0.02

  /** APPROXIMATE distinct users per event type via HyperLogLog++ —
    * the 100 TB path for count-distinct, the other classic scale
    * killer next to quantiles (exact distinct means a shuffle of every
    * distinct key): the sketch aggregates with map-side partial merge
    * in ONE exchange of sketch-sized partials, error ~
    * [[ApproxDistinctRsd]] rsd. Rows-gated like [[qPercentilesApprox]]
    * (sketch internals are engine-specific — not oracle-hashable by
    * design); ApproxDistinctSpec bounds the error against the exact
    * count at sf0.1. Reach for exact `count_distinct` when the answer
    * must be reproducible to the row; for this when it must be cheap. */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id"), ApproxDistinctRsd).as("approx_users"))
      .orderBy(col("event_type"))

  // ------------------------------------------------------------ #23aa numeric histogram

  val HistogramBins = 10

  /** DATA-ADAPTIVE equi-width histogram of a continuous column
    * (events.value): bins derived from the observed min/max (one
    * 1-row aggregate broadcast back over the scan — the
    * q_top_change/zscore two-pass shape), every bin emitted INCLUDING
    * empties (a profiling report with silent holes misreads as "no
    * outliers"), DECIMAL-exact per-bin value mass. Distinct from
    * text_length_histogram's fixed integer bucketing: the bin
    * geometry here follows the data. Max value clamps into the last
    * bin (the standard closed-right-edge rule). */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("value"))
    val bounds = ev.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
    val w = (col("mx") - col("mn")) / lit(HistogramBins.toDouble)
    val binned = ev.crossJoin(broadcast(bounds))
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(floor((col("value") - col("mn")) / w),
            lit(HistogramBins - 1L))))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
    val bdim = { import spark.implicits._
      (0L until HistogramBins.toLong).toDF("bin") }
    bdim.join(broadcast(binned), Seq("bin"), "left")
      .crossJoin(broadcast(bounds))
      .select(col("bin"),
        round(col("mn") + col("bin").cast("double") * w, 6).as("bin_lo"),
        round(col("mn") + (col("bin") + 1).cast("double") * w, 6).as("bin_hi"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0d)).as("sum_value"))
      .orderBy(col("bin"))
  }

  val qHistogramSql: String =
    s"""WITH ev AS (SELECT value FROM events),
       |b AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM ev),
       |binned AS (
       |  SELECT CASE WHEN b.mx = b.mn THEN CAST(0 AS BIGINT)
       |         ELSE least(CAST(FLOOR((e.value - b.mn) /
       |           ((b.mx - b.mn) / CAST($HistogramBins AS DOUBLE))) AS BIGINT),
       |           CAST(${HistogramBins - 1} AS BIGINT)) END AS bin,
       |    COUNT(*) AS n_events,
       |    CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |  FROM ev e CROSS JOIN b GROUP BY 1),
       |bins AS (SELECT unnest(generate_series(0, ${HistogramBins - 1})) AS bin)
       |SELECT bins.bin,
       |  round(b.mn + CAST(bins.bin AS DOUBLE) * ((b.mx - b.mn) / CAST($HistogramBins AS DOUBLE)), 6) AS bin_lo,
       |  round(b.mn + CAST(bins.bin + 1 AS DOUBLE) * ((b.mx - b.mn) / CAST($HistogramBins AS DOUBLE)), 6) AS bin_hi,
       |  CAST(COALESCE(binned.n_events, 0) AS BIGINT) AS n_events,
       |  COALESCE(binned.sum_value, CAST(0.0 AS DOUBLE)) AS sum_value
       |FROM bins LEFT JOIN binned ON bins.bin = binned.bin CROSS JOIN b
       |ORDER BY bins.bin""".stripMargin

  // ------------------------------------------------------------ #23z funnel latency

  /** FUNNEL CONVERSION LATENCY — exact p50/p90 of the time between
    * funnel steps (view→click, click→purchase), per step: the tail
    * report [[qFunnel]]'s averages hide. Per-user step times reuse the
    * funnel staging; the two step-delta populations stack into one
    * (step, delta) relation and rank via
    * [[graft.functions.DistributedRanks]] — a step-partitioned window
    * would pin each step's full population in one task (2 hot keys;
    * the round-3 skew rule), range partitioning keeps ranks exact and
    * tasks bounded. Percentiles are closed-form from (rank, n), the
    * q_percentiles rule. */
  def qFunnelTime(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
    val staged = ev
      .withColumn("t1", min(when(col("event_type") === "view", col("t"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" && col("t") > col("t1"), col("t"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("t") > col("t2"), col("t"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3"))
    val deltas = staged.select(col("user_id"),
        explode_outer(array(
          struct(lit("view_to_click").as("step"), (col("t2") - col("t1")).as("delta_us")),
          struct(lit("click_to_purchase").as("step"), (col("t3") - col("t2")).as("delta_us")))).as("s"))
      .select(col("s.step").as("step"), col("s.delta_us").as("delta_us"), col("user_id"))
      .filter(col("delta_us").isNotNull)
    val ranked = graft.functions.DistributedRanks
      .withGroupRanks(deltas, "step", Seq(col("delta_us"), col("user_id")))
    val pc = Seq((1, 2, "p50_us"), (9, 10, "p90_us")).map { case (num, den, name) =>
      max(when(col("rn") === expr(s"($num * n + ${den - 1}) div $den"), col("delta_us"))).as(name)
    }
    ranked.groupBy(col("step"))
      .agg(max(col("n")).as("n_converted"), pc: _*)
      .orderBy(col("step"))
  }

  val qFunnelTimeSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
      |staged AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN t END) AS t1
      |  FROM ev GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, ANY_VALUE(s.t1) AS t1,
      |    MIN(CASE WHEN e.event_type = 'click' AND e.t > s.t1 THEN e.t END) AS t2
      |  FROM ev e JOIN staged s ON e.user_id = s.user_id GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, ANY_VALUE(s.t1) AS t1, ANY_VALUE(s.t2) AS t2,
      |    MIN(CASE WHEN e.event_type = 'purchase' AND e.t > s.t2 THEN e.t END) AS t3
      |  FROM ev e JOIN s2 s ON e.user_id = s.user_id GROUP BY 1),
      |deltas AS (
      |  SELECT 'view_to_click' AS step, t2 - t1 AS delta_us, user_id
      |  FROM s3 WHERE t1 IS NOT NULL AND t2 IS NOT NULL
      |  UNION ALL
      |  SELECT 'click_to_purchase' AS step, t3 - t2 AS delta_us, user_id
      |  FROM s3 WHERE t2 IS NOT NULL AND t3 IS NOT NULL),
      |ranked AS (
      |  SELECT step, delta_us,
      |    ROW_NUMBER() OVER (PARTITION BY step ORDER BY delta_us, user_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY step) AS n
      |  FROM deltas)
      |SELECT step, CAST(MAX(n) AS BIGINT) AS n_converted,
      |  MAX(CASE WHEN rn = (1 * n + 1) // 2 THEN delta_us END) AS p50_us,
      |  MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN delta_us END) AS p90_us
      |FROM ranked GROUP BY 1 ORDER BY step""".stripMargin

  // ------------------------------------------------------------ #23y top movers

  /** PERIOD-OVER-PERIOD MOVERS — per event_type volume and value
    * change between the two halves of the observed time range (the
    * "what changed this week" report): counts, DECIMAL-exact value
    * sums, absolute delta and relative change (NULL when the first
    * half is empty — no fake infinities). The range midpoint comes
    * from a 1-row min/max aggregate broadcast back over the scan; the
    * rollup is a \|types\|-key groupBy with map-side combine — two
    * passes over the fact table, nothing wider than \|types\| shuffles. */
  def qTopChange(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("t"), col("value"))
    val bounds = ev.agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
    ev.crossJoin(broadcast(bounds))
      .withColumn("first_half", col("t") * 2 <= col("mn") + col("mx"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("first_half"), 1L).otherwise(0L)).as("n_first"),
        sum(when(!col("first_half"), 1L).otherwise(0L)).as("n_second"),
        sum(when(col("first_half"), dec2(col("value")))).cast("double").as("value_first"),
        sum(when(!col("first_half"), dec2(col("value")))).cast("double").as("value_second"))
      .withColumn("delta", col("n_second") - col("n_first"))
      .withColumn("pct_change",
        when(col("n_first") === 0, lit(null).cast("double"))
          .otherwise(round((col("n_second") - col("n_first")).cast("double") /
            col("n_first").cast("double"), 6)))
      .orderBy(col("event_type"))
  }

  val qTopChangeSql: String =
    """WITH ev AS (SELECT event_type, epoch_us(ts) AS t, value FROM events),
      |b AS (SELECT MIN(t) AS mn, MAX(t) AS mx FROM ev),
      |halves AS (
      |  SELECT event_type, value, (t * 2 <= b.mn + b.mx) AS first_half
      |  FROM ev CROSS JOIN b),
      |agg AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN first_half THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
      |    CAST(SUM(CASE WHEN NOT first_half THEN 1 ELSE 0 END) AS BIGINT) AS n_second,
      |    CAST(SUM(CASE WHEN first_half THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS value_first,
      |    CAST(SUM(CASE WHEN NOT first_half THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS value_second
      |  FROM halves GROUP BY 1)
      |SELECT event_type, n_first, n_second, value_first, value_second,
      |  n_second - n_first AS delta,
      |  CASE WHEN n_first = 0 THEN NULL
      |       ELSE round(CAST(n_second - n_first AS DOUBLE) / CAST(n_first AS DOUBLE), 6)
      |  END AS pct_change
      |FROM agg ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------ #23x event transitions

  /** EVENT TRANSITION MATRIX — per-user behavioral Markov chain: for
    * every consecutive event pair in a user's timeline, count the
    * (from_type → to_type) transition and report its probability
    * conditioned on the from-state (row-stochastic). The per-user lag
    * window is keyed by user_id — high-cardinality, never a lone hot
    * key — and the transition rollup is a \|types\|²-key groupBy with
    * map-side combine; the conditional divides exact counts once
    * (hash-stable IEEE divide). The product-analytics twin of
    * q_funnel: funnel checks ONE ordered path, this reports the whole
    * first-order transition structure. */
  def qEventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("time_us"), col("event_id"))
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("time_us"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = trans.groupBy(col("from_type"))
      .agg(sum(col("n")).as("from_total"))
    trans.join(fromTotals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("from_total"),
        round(col("n").cast("double") / col("from_total").cast("double"), 6)
          .as("p_transition"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val qEventTransitionsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
      |  FROM events),
      |trans AS (
      |  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS from_total FROM trans GROUP BY 1)
      |SELECT t.from_type, t.to_type, t.n, tot.from_total,
      |  round(CAST(t.n AS DOUBLE) / CAST(tot.from_total AS DOUBLE), 6) AS p_transition
      |FROM trans t JOIN tot USING (from_type)
      |ORDER BY t.from_type, t.to_type""".stripMargin

  // ------------------------------------------------------------ #23w unpivot

  /** Wide→long UNPIVOT (melt) of a metrics block — the reshaping
    * half of q_event_pivot's pivot, and the feed shape for
    * metric-per-row sinks (dashboards, tidy-data exports). Uses the
    * Dataset `unpivot` API, which Catalyst plans as ONE Expand over
    * the aggregated frame — a single pass emitting |metrics| rows per
    * input row, instead of the |metrics|-scans UNION ALL the oracle
    * spells out. The expand runs over the POST-aggregate frame
    * (|groups|·|metrics| rows), so at 100 TB the melt is free next to
    * the one fact-table aggregation that feeds it. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        count(lit(1)).cast("double").as("count_order"))
      .unpivot(
        Array(col("l_returnflag"), col("l_linestatus")),
        Array(col("sum_qty"), col("sum_base_price"), col("count_order")),
        "metric", "value")
      .orderBy(col("l_returnflag"), col("l_linestatus"), col("metric"))
  }

  val qUnpivotSql: String =
    """WITH wide AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |    CAST(COUNT(*) AS DOUBLE) AS count_order
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_returnflag, l_linestatus, metric, value FROM (
      |  SELECT l_returnflag, l_linestatus, 'sum_qty' AS metric, sum_qty AS value FROM wide
      |  UNION ALL
      |  SELECT l_returnflag, l_linestatus, 'sum_base_price', sum_base_price FROM wide
      |  UNION ALL
      |  SELECT l_returnflag, l_linestatus, 'count_order', count_order FROM wide)
      |ORDER BY l_returnflag, l_linestatus, metric""".stripMargin

  // ------------------------------------------------------------ #23ab attribution

  /** LAST-TOUCH REVENUE ATTRIBUTION — each purchase credited to the
    * user's most recent strictly-earlier non-purchase event type (the
    * marketing-analytics classic; "which behavior precedes money").
    * The attributing channel is `last(non-purchase type, ignoreNulls)`
    * over the user's ordered history with a `(-∞, -1)` row frame —
    * ONE user-keyed exchange, no self-join against a per-user
    * aggregate, no event×event pairing. A purchase with no prior
    * event attributes to 'direct' (the empty-frame NULL). Revenue
    * sums are DECIMAL-exact; the rollup key space is \|event types\|,
    * so the final aggregate combines map-side.
    *
    * Scale: the same plan at any log size — shuffle on
    * high-cardinality user_id (never a lone hot key), then a few-key
    * aggregate. */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        dec2(col("value")).as("v"), unix_micros(col("ts")).as("t"))
      .withColumn("channel",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("v")).cast("double").as("attributed_value"))
      .orderBy(col("channel"))
  }

  val qAttributionSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(value AS DECIMAL(18,2)) AS v, epoch_us(ts) AS t
      |  FROM events),
      |attr AS (
      |  SELECT *,
      |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
      |  FROM ev)
      |SELECT COALESCE(channel, 'direct') AS channel,
      |  COUNT(*) AS n_purchases,
      |  CAST(SUM(v) AS DOUBLE) AS attributed_value
      |FROM attr WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------ #23ac new vs returning

  val DayUs: Long = 86400L * 1000000

  /** NEW vs RETURNING daily actives — the growth-accounting split
    * every activity dashboard leads with: per day, how many active
    * users are seen for the first time vs coming back. Activity
    * dedupes to (user, day) grain first (an event-grain count would
    * conflate volume with reach), each user's first day rides a
    * user-partition min window, the rollup keys on day.
    *
    * Scale: (user, day) distinct + the user window share one
    * user-prefixed exchange; the day rollup is \|days\| keys with
    * map-side combine. Nothing is event-grain after the dedupe. */
  def qNewVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val act = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div $DayUs").as("day"))
      .distinct()
      .withColumn("first_day", min(col("day")).over(Window.partitionBy(col("user_id"))))
    act.groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("day") =!= col("first_day"), 1L).otherwise(0L)).as("n_returning"))
      .withColumn("returning_share",
        round(col("n_returning").cast("double") / col("n_active").cast("double"), 6))
      .orderBy(col("day"))
  }

  val qNewVsReturningSql: String =
    s"""WITH act AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day FROM events),
       |tagged AS (
       |  SELECT day, MIN(day) OVER (PARTITION BY user_id) AS first_day FROM act)
       |SELECT day, COUNT(*) AS n_active,
       |  CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       |  CAST(SUM(CASE WHEN day <> first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_returning,
       |  round(CAST(SUM(CASE WHEN day <> first_day THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE), 6) AS returning_share
       |FROM tagged GROUP BY day ORDER BY day""".stripMargin

  // ------------------------------------------------------------ #23ad market concentration

  /** MARKET-CONCENTRATION report per nation — Herfindahl–Hirschman
    * index over supplier revenue shares, the antitrust/vendor-risk
    * lens ("is this market one supplier deep"). HHI is computed as
    * Σrev² / (Σrev)² so the only IEEE operations are the final
    * divides: per-supplier revenue sums through DECIMAL(18,2)·(1−d),
    * is then narrowed to DECIMAL(18,4) and squared EXACTLY into
    * (37,8) — never share-by-share double accumulation, whose sum
    * order differs across engines. effective_suppliers = 1/HHI (the
    * "equivalent equal-share supplier count" economists quote).
    *
    * Scale: supplier/nation broadcast dims, one (nation, supplier)
    * aggregate with map-side combine, then a \|nations\|-key rollup —
    * no window, no join after the rollup. */
  def qHhi(spark: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    val bySupp = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_suppkey"))
      .agg(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
        .cast("decimal(18,4)").as("rev"))
    bySupp.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("rev")).cast("double").as("total_revenue"),
        sum(col("rev") * col("rev")).as("sum_sq"),
        max(col("rev")).as("max_rev"),
        sum(col("rev")).as("tot"))
      .select(col("n_name"), col("n_suppliers"), col("total_revenue"),
        round(col("sum_sq").cast("double") /
          (col("tot").cast("double") * col("tot").cast("double")), 6).as("hhi"),
        round((col("tot").cast("double") * col("tot").cast("double")) /
          col("sum_sq").cast("double"), 6).as("effective_suppliers"),
        round(col("max_rev").cast("double") / col("tot").cast("double"), 6)
          .as("top_supplier_share"))
      .orderBy(col("n_name"))
  }

  val qHhiSql: String =
    """WITH by_supp AS (
      |  SELECT n.n_name, s.s_suppkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |      AS DECIMAL(19,4)) AS rev
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  GROUP BY 1, 2),
      |roll AS (
      |  SELECT n_name, COUNT(*) AS n_suppliers,
      |    CAST(SUM(rev) AS DOUBLE) AS total_revenue,
      |    SUM(rev * rev) AS sum_sq, MAX(rev) AS max_rev, SUM(rev) AS tot
      |  FROM by_supp GROUP BY 1)
      |SELECT n_name, n_suppliers, total_revenue,
      |  round(CAST(sum_sq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS hhi,
      |  round((CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) / CAST(sum_sq AS DOUBLE), 6) AS effective_suppliers,
      |  round(CAST(max_rev AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS top_supplier_share
      |FROM roll ORDER BY n_name""".stripMargin

  // ------------------------------------------------------------ #23ae revenue Pareto

  /** REVENUE PARETO / LORENZ CURVE — customers ranked by total spend,
    * bucketed into spend deciles (decile 1 = biggest spenders), each
    * with its revenue mass and the CUMULATIVE share down the curve —
    * "do 20% of customers carry 80% of revenue", answered exactly.
    * Global ranking via [[graft.functions.DistributedRanks]] (a bare
    * `ntile() over (order by spend)` is the canonical single-partition
    * window — the whole customer mart through one task); the decile
    * is the NTILE closed form from (rank, n), and the cumulative
    * window runs over the 10-row decile relation only. Revenue sums
    * are DECIMAL end to end; the shares are one IEEE divide each,
    * rounded.
    *
    * The [[qualityDeciles]] shape pointed at money — but where that
    * reports per-bucket ranges, the deliverable here is the cumulative
    * concentration curve. */
  def qPareto(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(dec2(col("o_totalprice"))).as("spend"))
      .withColumn("__g", lit(1))
    val ranked = graft.functions.DistributedRanks
      .withGroupRanks(spend, "__g", Seq(col("spend").desc, col("o_custkey")))
      .withColumn("decile", expr(
        """CAST(CASE WHEN rn <= (n div 10 + 1) * (n % 10)
          |  THEN (rn - 1) div (n div 10 + 1) + 1
          |  ELSE n % 10 + (rn - 1 - (n div 10 + 1) * (n % 10)) div (n div 10) + 1
          |END AS INT)""".stripMargin))
    val perDecile = ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("spend")).as("rev"))
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(1))
    // 10-row relation: the unpartitioned windows below never see data
    perDecile
      .withColumn("cum_rev", sum(col("rev")).over(wCum))
      .withColumn("tot", sum(col("rev")).over(wAll))
      .select(col("decile"), col("n_customers"),
        col("rev").cast("double").as("decile_revenue"),
        round(col("rev").cast("double") / col("tot").cast("double"), 6)
          .as("revenue_share"),
        round(col("cum_rev").cast("double") / col("tot").cast("double"), 6)
          .as("cumulative_share"))
      .orderBy(col("decile"))
  }

  val qParetoSql: String =
    """WITH spend AS (
      |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      |  FROM orders GROUP BY 1),
      |ranked AS (
      |  SELECT spend, NTILE(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
      |  FROM spend),
      |per_decile AS (
      |  SELECT decile, COUNT(*) AS n_customers, SUM(spend) AS rev
      |  FROM ranked GROUP BY 1),
      |cum AS (
      |  SELECT *,
      |    SUM(rev) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev,
      |    SUM(rev) OVER () AS tot
      |  FROM per_decile)
      |SELECT decile, n_customers, CAST(rev AS DOUBLE) AS decile_revenue,
      |  round(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS revenue_share,
      |  round(CAST(cum_rev AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cumulative_share
      |FROM cum ORDER BY decile""".stripMargin

  // --------------------------------------------------- Z-order layout

  /** Buckets per dimension for [[qZorderLayout]] (2⁵ = 32). */
  val ZorderBits = 5
  /** Files the layout audit packs the table into. */
  val ZorderFiles = 32

  /** Z-ORDER LAYOUT AUDIT — the multi-dimensional file-clustering
    * decision (Delta/Iceberg `OPTIMIZE ZORDER BY`, made relational):
    * events are queried by BOTH user and time, but a file layout can
    * only be sorted one way. This report packs the table into
    * [[ZorderFiles]] equal files under two layouts — the as-ingested
    * event_id order and the Morton (Z-curve) order of the
    * (user-bucket, time-bucket) pair — and measures, per layout, how
    * many files an equality query on each dimension must open (the
    * min/max-pruning cost a lakehouse scan planner pays). Ingest
    * order is perfect for time pruning and catastrophic for user
    * pruning (every file contains every user bucket); the Z-curve
    * bounds the WORST dimension — the whole point of interleaving.
    *
    * Everything is integer-exact: bit-interleaved Morton keys, file
    * assignment by exact global rank via [[graft.functions.
    * DistributedRanks]] (range-partitioned — no single-task sort),
    * pruning cost as COUNT(DISTINCT file·64 + bucket). At 100 TB the
    * layout itself is `repartitionByRange(zkey)` before the write —
    * this operator is the audit that justifies it, at the same plan
    * shape: two ranked passes + one two-key aggregate. */
  def qZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val b = 1 << ZorderBits
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("time_us"))
    val bounds = ev.agg(min(col("time_us")).as("t0"), max(col("time_us")).as("t1"))
    val bucketed = ev.crossJoin(broadcast(bounds))
      .withColumn("ub", col("user_id") % b)
      .withColumn("tb", expr(s"((time_us - t0) * $b) div (t1 - t0 + 1)"))
      .withColumn("zkey", (0 until ZorderBits).map(i =>
        shiftleft(shiftright(col("ub"), i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(col("tb"), i).bitwiseAND(lit(1L)), 2 * i + 1))
        .reduce(_ + _))
    def layout(name: String, sort: Seq[Column]): DataFrame =
      graft.functions.DistributedRanks.withGroupRanks(
          bucketed.withColumn("__g", lit(1)), "__g", sort)
        .select(lit(name).as("layout"),
          expr(s"(rn - 1) * $ZorderFiles div n").as("file"),
          col("ub"), col("tb"))
    layout("id_order", Seq(col("event_id")))
      .unionAll(layout("z_order", Seq(col("zkey"), col("event_id"))))
      .groupBy(col("layout"))
      .agg(countDistinct(col("file")).as("n_files"),
        countDistinct(col("file") * 64 + col("ub")).as("fu"),
        countDistinct(col("file") * 64 + col("tb")).as("ft"))
      .select(col("layout"), col("n_files"),
        round(col("fu").cast("double") / b, 6).as("avg_files_user"),
        round(col("ft").cast("double") / b, 6).as("avg_files_time"),
        round(greatest(col("fu"), col("ft")).cast("double") / b, 6)
          .as("worst_dim_files"))
      .orderBy(col("layout"))
  }

  val qZorderLayoutSql: String = {
    val b = 1 << ZorderBits
    val zSql = (0 until ZorderBits).map(i =>
      s"((ub >> $i) & 1) * ${1L << (2 * i)} + ((tb >> $i) & 1) * ${1L << (2 * i + 1)}")
      .mkString(" + ")
    s"""WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS time_us FROM events),
       |b AS (SELECT MIN(time_us) AS t0, MAX(time_us) AS t1 FROM ev),
       |bk AS (
       |  SELECT event_id, user_id % $b AS ub,
       |    ((time_us - t0) * $b) // (t1 - t0 + 1) AS tb
       |  FROM ev CROSS JOIN b),
       |z AS (SELECT event_id, ub, tb, $zSql AS zkey FROM bk),
       |r AS (SELECT ub, tb,
       |    ROW_NUMBER() OVER (ORDER BY event_id) AS rn_id,
       |    ROW_NUMBER() OVER (ORDER BY zkey, event_id) AS rn_z,
       |    COUNT(*) OVER () AS n
       |  FROM z),
       |f AS (
       |  SELECT 'id_order' AS layout, (rn_id - 1) * $ZorderFiles // n AS file, ub, tb FROM r
       |  UNION ALL
       |  SELECT 'z_order' AS layout, (rn_z - 1) * $ZorderFiles // n AS file, ub, tb FROM r)
       |SELECT layout,
       |  CAST(COUNT(DISTINCT file) AS BIGINT) AS n_files,
       |  round(CAST(COUNT(DISTINCT file * 64 + ub) AS DOUBLE) / $b.0, 6) AS avg_files_user,
       |  round(CAST(COUNT(DISTINCT file * 64 + tb) AS DOUBLE) / $b.0, 6) AS avg_files_time,
       |  round(CAST(greatest(COUNT(DISTINCT file * 64 + ub),
       |                      COUNT(DISTINCT file * 64 + tb)) AS DOUBLE) / $b.0, 6) AS worst_dim_files
       |FROM f GROUP BY layout ORDER BY layout""".stripMargin
  }
}
