package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** cdc_mv_maintain contract (SURVEY §2a #14k): the incremental path —
  * stored T0 snapshot + (T0, now] slice deltas — must produce exactly
  * what a FULL REPLAY of the log would, including the value-defined
  * action tags, across the cases that break naive delta maintenance:
  * delete-then-reinsert inside the slice, a cross-bucket UPDATE (the
  * preimage-shaped case), a touched-but-net-zero bucket, a bucket
  * emptied by tombstones, a bucket born and emptied inside the slice,
  * and a TTL'd write (participates like any write — expiry is
  * ttlTrim's concern, per the reference's replication semantics). */
class MvMaintainSpec extends SparkSpec {

  private val T0 = 1000L

  // (user_id, event_id, time_us, cdc_operation, value, cdc_ttl)
  // ops: 1=update 2=insert 3=delete; buckets are floor(value/50.00)
  private def log(): DataFrame = {
    import spark.implicits._
    Seq(
      // base state (≤ T0)
      (1L, 1L, 100L, 2, 10.00, None),          // bucket 0
      (2L, 2L, 200L, 2, 60.00, None),          // bucket 1
      (3L, 3L, 300L, 2, 40.00, None),          // bucket 0
      (5L, 4L, 400L, 2, 160.00, None),         // bucket 3 (sole member)
      (6L, 5L, 500L, 2, 200.00, None),         // bucket 4 (sole member)
      // slice (> T0)
      (2L, 6L, 1100L, 3, 0.00, None),          // delete...
      (2L, 7L, 1200L, 2, 70.00, None),         // ...then reinsert, new value
      (3L, 8L, 1300L, 1, 120.00, None),        // cross-bucket update 0 → 2
      (4L, 9L, 1400L, 2, 55.00, Some(86400L)), // TTL'd insert, bucket 1
      (5L, 10L, 1500L, 3, 0.00, None),         // tombstone empties bucket 3
      (6L, 11L, 1600L, 1, 200.00, None),       // net-zero touch → carried
      (8L, 12L, 1700L, 2, 260.00, None),       // born in slice (bucket 5)...
      (8L, 13L, 1800L, 3, 0.00, None)          // ...and emptied — never emitted
    ).toDF("user_id", "event_id", "time_us", "cdc_operation", "value", "cdc_ttl")
  }

  test("incremental maintenance ≡ full replay, action for action") {
    val got = CdcOps.mvMaintainFromLog(log(), T0)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(
      (0L, "updated", 1L, 10.00),   // lost user 3 to bucket 2
      (1L, "updated", 2L, 125.00),  // reinserted 70 + TTL'd 55
      (2L, "created", 1L, 120.00),  // user 3 arrived
      (3L, "emptied", 0L, 0.00),    // user 5 tombstoned
      (4L, "carried", 1L, 200.00)   // touched, net zero
    ), got.mkString("\n"))
    // bucket 5 (born and emptied inside the slice) must be absent
    assert(!got.exists(_._1 == 5L))
  }

  test("min/max maintenance: deleting a bucket's max surfaces the runner-up") {
    import spark.implicits._
    // bucket 0 holds 10, 30, 45 at T0; the slice deletes the 45 (max)
    // and updates the 10 to 5 (new min) — both extremes move without
    // any insert, the case pure delta maintenance cannot handle
    val log = Seq(
      (1L, 1L, 100L, 2, 10.00),
      (2L, 2L, 200L, 2, 30.00),
      (3L, 3L, 300L, 2, 45.00),
      (4L, 4L, 400L, 2, 160.00),                 // bucket 3, untouched
      (3L, 5L, 1100L, 3, 0.00),                  // delete the max
      (1L, 6L, 1200L, 1, 5.00)                   // lower the min
    ).toDF("user_id", "event_id", "time_us", "cdc_operation", "value")
    val got = CdcOps.mvMinMaxFromLog(log, T0).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      (0L, "updated", 2L, 5.00, 30.00),   // runner-up 30 is the new max
      (3L, "carried", 1L, 160.00, 160.00)
    ), got.mkString("\n"))
  }

  test("min/max incremental ≡ full replay at any cutoff, including emptied buckets") {
    val rows = log().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    def replay(upToUs: Long): Map[Long, (Long, Long, Long)] =
      rows.filter(_._3 <= upToUs)
        .groupBy(_._1).values
        .map(_.maxBy(e => (e._3, e._2)))
        .filter(_._4 != 3)
        .map(e => math.round(e._5 * 100))
        .groupBy(_ / CdcOps.MvBucketCents)
        .map { case (b, cs) => b -> (cs.size.toLong, cs.min, cs.max) }
    for (cutoff <- Seq(0L, 450L, T0, 1350L, 2000L)) {
      val fin = replay(Long.MaxValue)
      val got = CdcOps.mvMinMaxFromLog(log(), cutoff).collect()
        .map(r => (r.getLong(0), r.getLong(2),
          if (r.isNullAt(3)) -1L else math.round(r.getDouble(3) * 100),
          if (r.isNullAt(4)) -1L else math.round(r.getDouble(4) * 100)))
      got.foreach { case (b, n, mn, mx) =>
        if (n > 0L) assert(fin(b) == (n, mn, mx), s"cutoff $cutoff bucket $b")
        else assert(!fin.contains(b), s"cutoff $cutoff bucket $b should be gone")
      }
      fin.keys.foreach { b =>
        assert(got.exists(g => g._1 == b && g._2 > 0), s"cutoff $cutoff missing $b")
      }
    }
  }

  test("random logs: both maintainers ≡ local replay at random cutoffs (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val ops = (1 to 300).map { i =>
        val op = rnd.nextInt(10) match {
          case 0 | 1 => 3            // ~20% deletes
          case x if x < 6 => 2       // inserts
          case _ => 1                // updates
        }
        // deliberate time collisions (event_id breaks the tie), values
        // spanning several buckets with exact 2-decimal cents
        (rnd.nextInt(25).toLong, i.toLong, rnd.nextInt(40).toLong * 10L,
          op, rnd.nextInt(20000) / 100.0)
      }
      val log = ops.toDF("user_id", "event_id", "time_us", "cdc_operation", "value")
      def state(upToUs: Long): Seq[Long] = ops
        .filter(_._3 <= upToUs)
        .groupBy(_._1).values
        .map(_.maxBy(e => (e._3, e._2)))
        .filter(_._4 != 3)
        .map(e => math.round(e._5 * 100)).toSeq
      val fin = state(Long.MaxValue)
      val finSum = fin.groupBy(_ / CdcOps.MvBucketCents)
        .map { case (b, cs) => b -> (cs.size.toLong, cs.sum) }
      val finMinMax = fin.groupBy(_ / CdcOps.MvBucketCents)
        .map { case (b, cs) => b -> (cs.size.toLong, cs.min, cs.max) }
      for (cutoff <- Seq(-1L, rnd.nextInt(400).toLong, 390L)) {
        val gotSum = CdcOps.mvMaintainFromLog(log, cutoff).collect()
          .filter(_.getLong(2) > 0)
          .map(r => r.getLong(0) -> ((r.getLong(2), math.round(r.getDouble(3) * 100)))).toMap
        assert(gotSum == finSum, s"seed $seed cutoff $cutoff (sum)")
        val gotMm = CdcOps.mvMinMaxFromLog(log, cutoff).collect()
          .filter(_.getLong(2) > 0)
          .map(r => r.getLong(0) -> ((r.getLong(2),
            math.round(r.getDouble(3) * 100), math.round(r.getDouble(4) * 100)))).toMap
        assert(gotMm == finMinMax, s"seed $seed cutoff $cutoff (minmax)")
      }
    }
  }

  test("incremental result equals an independent local replay at any cutoff") {
    val rows = log().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    def replayBuckets(upToUs: Long): Map[Long, (Long, Long)] =
      rows.filter(_._3 <= upToUs)
        .groupBy(_._1).values
        .map(_.maxBy(e => (e._3, e._2)))          // LWW per key
        .filter(_._4 != 3)                        // tombstoned keys absent
        .map(e => math.round(e._5 * 100) / CdcOps.MvBucketCents ->
          math.round(e._5 * 100))
        .groupBy(_._1)
        .map { case (b, cs) => b -> (cs.size.toLong, cs.map(_._2).sum) }
    for (cutoff <- Seq(0L, 150L, 450L, T0, 1250L, 1350L, 2000L)) {
      val fin = replayBuckets(Long.MaxValue)
      val got = CdcOps.mvMaintainFromLog(log(), cutoff)
        .collect()
        .map(r => (r.getLong(0), r.getLong(2), math.round(r.getDouble(3) * 100)))
      // every emitted bucket with rows matches the replay; emptied
      // buckets (n_rows = 0) must be absent from the replay state
      got.foreach { case (b, n, cents) =>
        if (n > 0L) assert(fin(b) == (n, cents), s"cutoff $cutoff bucket $b")
        else assert(!fin.contains(b), s"cutoff $cutoff bucket $b should be gone")
      }
      // ...and the replay has no bucket the incremental path missed
      fin.keys.foreach { b =>
        assert(got.exists(g => g._1 == b && g._2 > 0), s"cutoff $cutoff missing $b")
      }
    }
  }
}
