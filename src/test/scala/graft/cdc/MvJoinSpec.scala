package graft.cdc

import graft.SparkSpec

/** cdc_mv_join contract (SURVEY §2a #14p): the join-MV delta rules
  * must reproduce the full two-relation recompute, action for action,
  * across the cases that are SPECIFIC to join views: a dimension
  * write that moves its entire fact cohort between MV groups without
  * any of those fact rows appearing in a slice, and a dimension
  * delete that drops the cohort from the view entirely (inner-join
  * semantics). A randomized two-log sweep (timestamp collisions,
  * tombstones, segment moves, negative-value floor-div domain) then
  * checks incremental ≡ a driver-side model of the full recompute. */
class MvJoinSpec extends SparkSpec {

  private val T0 = 1000L

  test("dimension write moves its whole cohort; dimension delete drops it") {
    import spark.implicits._
    // fact log: (user_id, segment_id, event_id, time_us, op, cents)
    val rLog = Seq(
      (1L, 1L, 1L, 100L, 2, 100L),  // seg 1 @ T0
      (2L, 1L, 2L, 200L, 2, 200L),  // seg 1 @ T0
      (3L, 2L, 3L, 300L, 2, 300L),  // seg 2 @ T0
      (5L, 3L, 4L, 400L, 2, 500L),  // seg 3 @ T0 — the carried group
      (4L, 1L, 10L, 1100L, 2, 400L) // slice: new fact row in seg 1
    ).toDF("user_id", "segment_id", "event_id", "time_us", "cdc_operation", "cents")
    // dimension log: (segment_id, event_id, time_us, op, tier_cents)
    val sLog = Seq(
      (1L, 5L, 100L, 2, 1000L),   // seg 1 tier → group 0
      (2L, 6L, 200L, 2, 5000L),   // seg 2 tier → group 2
      (3L, 7L, 300L, 2, 2000L),   // seg 3 tier → group 1
      (1L, 11L, 1200L, 1, 9000L), // slice: seg 1 moves to group 4 —
                                  // cohort u1, u2 move WITHOUT a fact write
      (2L, 12L, 1300L, 3, 0L)     // slice: seg 2 dimension deleted —
                                  // u3 leaves the view entirely
    ).toDF("segment_id", "event_id", "time_us", "cdc_operation", "tier_cents")
    val got = CdcOps.mvJoinMaintainFromLogs(rLog, sLog, T0).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (0L, "emptied", 0L, 0.00), // seg 1's old group: whole cohort left
      (1L, "carried", 1L, 5.00), // seg 3 untouched
      (2L, "emptied", 0L, 0.00), // seg 2's group: dimension row deleted
      (4L, "created", 3L, 7.00)  // cohort u1, u2 + new u4 at the new tier
    ), got.mkString("\n"))
  }

  test("randomized two-log sweep: incremental ≡ full recompute, action for action") {
    import spark.implicits._
    for (seed <- Seq(11, 23, 47)) {
      val rnd = new scala.util.Random(seed)
      val rRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Int, Long)]
      val sRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Int, Long)]
      var eid = 0L
      for (_ <- 1 to 300) {
        eid += 1
        val t = rnd.nextInt(2000).toLong // colliding timestamps; eid breaks ties
        if (rnd.nextInt(5) == 0) {
          val seg = rnd.nextInt(6).toLong
          val op = if (rnd.nextInt(5) == 0) 3 else 2
          val tier = (rnd.nextInt(11) - 3) * 1000L // negative tiers too
          sRows += ((seg, eid, t, op, tier))
        } else {
          val u = rnd.nextInt(30).toLong
          val seg = rnd.nextInt(6).toLong // users move between segments
          val op = if (rnd.nextInt(5) == 0) 3 else 2
          val cents = (rnd.nextInt(21) - 5) * 100L // negative values too
          rRows += ((u, seg, eid, t, op, cents))
        }
      }
      val cutoff = 1000L
      val rLog = rRows.toSeq
        .toDF("user_id", "segment_id", "event_id", "time_us", "cdc_operation", "cents")
      val sLog = sRows.toSeq
        .toDF("segment_id", "event_id", "time_us", "cdc_operation", "tier_cents")
      val got = CdcOps.mvJoinMaintainFromLogs(rLog, sLog, cutoff).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq

      // driver-side model of the full recompute
      def lwwR(rows: Seq[(Long, Long, Long, Long, Int, Long)]): Map[Long, (Long, Long)] =
        rows.groupBy(_._1).flatMap { case (u, rs) =>
          val last = rs.maxBy(r => (r._4, r._3))
          if (last._5 == 3) None else Some(u -> ((last._2, last._6)))
        }
      def lwwS(rows: Seq[(Long, Long, Long, Int, Long)]): Map[Long, Long] =
        rows.groupBy(_._1).flatMap { case (s, rs) =>
          val last = rs.maxBy(r => (r._3, r._2))
          if (last._4 == 3) None else Some(s -> last._5)
        }
      def mv(r: Map[Long, (Long, Long)], s: Map[Long, Long]): Map[Long, (Long, Long)] =
        r.toSeq
          .flatMap { case (_, (seg, cents)) =>
            s.get(seg).map(tier => (Math.floorDiv(tier, CdcOps.MvTierCents), cents))
          }
          .groupBy(_._1)
          .map { case (t, xs) => t -> ((xs.size.toLong, xs.map(_._2).sum)) }
      val base = mv(lwwR(rRows.toSeq.filter(_._4 <= cutoff)),
        lwwS(sRows.toSeq.filter(_._3 <= cutoff)))
      val fin = mv(lwwR(rRows.toSeq), lwwS(sRows.toSeq))
      val want = (base.keySet ++ fin.keySet).toSeq.sorted.map { t =>
        val action = (base.get(t), fin.get(t)) match {
          case (None, _)                        => "created"
          case (_, None)                        => "emptied"
          case (Some(b), Some(f)) if b == f     => "carried"
          case _                                => "updated"
        }
        (t, action, fin.get(t).map(_._1).getOrElse(0L),
          fin.get(t).map(_._2).getOrElse(0L).toDouble / 100.0)
      }
      assert(got == want,
        s"seed $seed:\n got=${got.mkString("\n     ")}\nwant=${want.mkString("\n     ")}")
    }
  }
}
