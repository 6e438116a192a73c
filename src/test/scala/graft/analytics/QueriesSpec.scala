package graft.analytics

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Independent checks for analytics queries beyond the SQL oracle. */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("salted join returns exactly the plain join's aggregate") {
    val salted = Queries.qSkewSaltedJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val plain = Tables.events(spark, dir)
      .join(Tables.customer(spark, dir), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy(col("c_mktsegment")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(salted.nonEmpty)
    assert(salted == plain)
  }

  test("salted join joins on (key, salt) — the salt actually reaches the join") {
    val plan = Queries.qSkewSaltedJoin(spark, dir).queryExecution.optimizedPlan.toString
    assert(plan.contains("e_salt") && plan.contains("d_salt"),
      s"salt columns missing from the optimized plan:\n$plan")
  }

  test("rolling distinct interval-merge equals the brute-force window count") {
    val DayUs = 86400000000L
    val ud = Tables.events(spark, dir)
      .select(expr(s"unix_micros(ts) div $DayUs").as("day"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val expected = ud.map(_._1).toSeq.sorted.map { d =>
      val win = (d - (Queries.RollingDays - 1)) to d
      val dau = ud.count(_._1 == d)
      val rolling = ud.collect { case (day, u) if win.contains(day) => u }.size
      (d, dau.toLong, rolling.toLong)
    }

    val got = Queries.qRollingDistinct(spark, dir).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("dau"),
        r.getAs[Long]("rolling_users_7d"))).toSeq

    assert(got == expected)
  }

  test("unpivot melts each wide row into one row per metric via ONE Expand") {
    val df = Queries.qUnpivot(spark, dir)
    val rows = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
    val metrics = Set("sum_qty", "sum_base_price", "count_order")
    // every (flag, status) group appears exactly |metrics| times
    rows.groupBy(r => (r._1, r._2)).foreach { case (g, rs) =>
      assert(rs.map(_._3).toSet == metrics, s"group $g metrics ${rs.map(_._3).toSet}")
    }
    // count_order in long form equals the wide count
    val wide = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.filter(_._3 == "count_order").foreach { case (f, s, _, v) =>
      assert(v == wide((f, s)).toDouble)
    }
    // one-pass melt: a single Expand node, no Union of re-scans
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert(!plan.contains("Union"), plan)
  }

  test("event transitions are row-stochastic and match a sequential recompute") {
    val rows = Queries.qEventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // row-stochastic: each from-state's probabilities sum to ~1, and
    // its n's sum to its from_total exactly
    rows.groupBy(_._1).foreach { case (from, rs) =>
      assert(math.abs(rs.map(_._5).sum - 1.0) < 1e-4, s"$from p-sum ${rs.map(_._5).sum}")
      assert(rs.map(_._3).sum == rs.head._4, s"$from n-sum vs total")
    }
    // sequential recompute from the raw table
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._4, e._2)).map(_._3).toSeq.sliding(2).collect {
        case Seq(a, b) => (a, b)
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap == expected)
  }

  test("z-order layout bounds the worst pruning dimension; ingest order does not") {
    val rows = Queries.qZorderLayout(spark, dir).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_files"), r.getAs[Double]("avg_files_user"),
          r.getAs[Double]("avg_files_time"), r.getAs[Double]("worst_dim_files"))).toMap
    assert(rows.keySet == Set("id_order", "z_order"))
    val (idFiles, idU, idT, idWorst) = rows("id_order")
    val (zFiles, zU, zT, zWorst) = rows("z_order")
    assert(idFiles == Queries.ZorderFiles && zFiles == Queries.ZorderFiles)
    // ingest order is lopsided: great on the dimension it happens to
    // correlate with (time), poor on the other
    assert(idWorst > idT * 2, s"ingest order should be lopsided: $rows")
    // the Z-curve must at least halve the worst dimension, and stay
    // bounded on BOTH dims (neither dim degrades to a full scan)
    assert(zWorst <= idWorst / 2, s"z-order worst dim $zWorst vs ingest $idWorst")
    assert(zU < Queries.ZorderFiles && zT < Queries.ZorderFiles)
  }
}
