package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One conforming CDC-log row (top-level for encoder derivation). */
case class FdChange(user_id: Long, event_id: Long, time_us: Long,
    cdc_operation: Int, value: Double, props: String)

/** r11 ADVICE: Spark's `div` truncates toward zero while the paired
  * DuckDB oracles floor (`//`), so range/bucket assignment diverged
  * on NEGATIVE user_id or cents — a domain the driver testdata never
  * hits but the advertised bring-your-own-log surfaces
  * (checksumFrame, mvMaintainFromLog, mvMinMaxFromLog, the streaming
  * maintainer) explicitly accept. These pin the floor semantics with
  * a Math.floorDiv model over a mixed-sign log. */
class FloorDivNegativeDomainSpec extends SparkSpec {

  import CdcSchema._

  // mixed-sign keys and values; cents = value * 100, bucket = floor(cents / 5000)
  private val rows = Seq(
    FdChange(-7L, 1L, 10L, RowInsert, -0.07, "{}"),   // floor(-7/5000)   = -1, not 0
    FdChange(-23L, 2L, 20L, RowInsert, -123.45, "{}"), // floor(-12345/5000) = -3
    FdChange(5L, 3L, 30L, RowInsert, 49.99, "{}"),     // bucket 0
    FdChange(-1L, 4L, 40L, RowInsert, -50.00, "{}"),   // exact multiple: -1
    FdChange(17L, 5L, 50L, RowInsert, 120.00, "{}"),   // bucket 2
    // slice writes (past the cutoff) — cross-sign bucket moves
    FdChange(-7L, 6L, 110L, RowUpdate, 60.00, "{}"),   // -1 → 1
    FdChange(5L, 7L, 120L, RowUpdate, -0.01, "{}"),    // 0 → -1
    FdChange(-23L, 8L, 130L, RowDelete, 0.0, "{}"))
  private val cutoffUs = 100L

  private def log: DataFrame = { import spark.implicits._; rows.toDF() }

  private def modelState(upTo: Long): Map[Long, (Long, Long)] = // key → (event, cents)
    rows.filter(_.time_us <= upTo).groupBy(_.user_id).flatMap { case (k, ws) =>
      val last = ws.maxBy(w => (w.time_us, w.event_id))
      if (last.cdc_operation == RowDelete) None
      else Some(k -> (last.event_id,
        (BigDecimal(last.value).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact))
    }.toMap

  test("checksumFrame: negative keys land in FLOOR ranges, matching the // oracle") {
    val state = CdcOps.replicateLwwFromLog(log)
    val got = CdcOps.checksumFrame(state).collect()
      .map(r => r.getAs[Long]("range_id") -> r.getAs[Long]("n_rows")).toMap
    val expected = modelState(Long.MaxValue).keys
      .groupBy(k => Math.floorDiv(k, CdcOps.ChecksumRangeUsers))
      .view.mapValues(_.size.toLong).toMap
    assert(got == expected, s"$got vs $expected")
    // the r11-ADVICE literal: user -7 must checksum into range -1, not 0
    assert(got.contains(-1L))
  }

  test("mvMaintain: negative cents bucket by FLOOR and incremental ≡ full recompute") {
    val got = CdcOps.mvMaintainFromLog(log, cutoffUs)
      .filter(col("n_rows") > 0).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_rows"),
        r.getAs[Double]("sum_value"))).toSet
    val expected = modelState(Long.MaxValue).values
      .groupBy { case (_, c) => Math.floorDiv(c, CdcOps.MvBucketCents) }
      .map { case (b, vs) =>
        (b, vs.size.toLong, vs.map(_._2).sum.toDouble / 100.0) }.toSet
    assert(got == expected, s"$got vs $expected")
    // the advertised divergence case: -0.07 sits in bucket -1 pre-slice;
    // post-slice user 5's -0.01 keeps bucket -1 alive
    assert(got.exists(_._1 == -1L))
  }

  test("mvMinMax: FLOOR buckets, touched-bucket recompute ≡ full recompute") {
    val got = CdcOps.mvMinMaxFromLog(log, cutoffUs)
      .filter(col("n_rows") > 0).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_rows"),
        r.getAs[Double]("min_value"), r.getAs[Double]("max_value"))).toSet
    val expected = modelState(Long.MaxValue).values
      .groupBy { case (_, c) => Math.floorDiv(c, CdcOps.MvBucketCents) }
      .map { case (b, vs) =>
        val cs = vs.map(_._2)
        (b, cs.size.toLong, cs.min.toDouble / 100.0, cs.max.toDouble / 100.0) }.toSet
    assert(got == expected, s"$got vs $expected")
  }
}
