package graft.cdc

import graft.SparkSpec

/** cdc_mv_topk contract (SURVEY §2a #14q): the touched-bucket
  * recompute must equal the full-log recompute rank list for rank
  * list — including the case that makes top-k non-self-maintainable:
  * deleting a ranked value surfaces the (K+1)-th, which no delta
  * stream carries. A randomized sweep then checks incremental ≡ a
  * driver-side model across colliding timestamps, tombstones and the
  * negative-value floor-div domain. */
class MvTopkSpec extends SparkSpec {

  private val T0 = 1000L

  private def row(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getString(2),
      Option(r.get(3)).map(_.asInstanceOf[Double]))

  test("deleting the top value surfaces the (K+1)-th; all four actions") {
    import spark.implicits._
    // (user_id, event_id, time_us, op, value); buckets of 50.00
    val log = Seq(
      (1L, 1L, 100L, 2, 1.00),   // bucket 0
      (2L, 2L, 200L, 2, 2.00),   // bucket 0
      (3L, 3L, 300L, 2, 3.00),   // bucket 0
      (4L, 4L, 400L, 2, 4.00),   // bucket 0 — the top; K=3 hides 1.00
      (5L, 5L, 500L, 2, 50.00),  // bucket 1 — untouched
      (7L, 6L, 600L, 2, 150.00), // bucket 3 — emptied by the slice
      (4L, 7L, 1100L, 3, 0.00),  // slice: delete bucket 0's top
      (6L, 8L, 1200L, 2, 100.00),// slice: bucket 2 born
      (7L, 9L, 1300L, 3, 0.00)   // slice: bucket 3 emptied
    ).toDF("user_id", "event_id", "time_us", "cdc_operation", "value")
    val got = CdcOps.mvTopkFromLog(log, T0).collect().map(row).toSeq
    assert(got == Seq(
      (0L, 1L, "updated", Some(3.00)), // ranks shift up...
      (0L, 2L, "updated", Some(2.00)),
      (0L, 3L, "updated", Some(1.00)), // ...and the hidden 4th surfaces
      (1L, 1L, "carried", Some(50.00)),
      (2L, 1L, "created", Some(100.00)),
      (3L, 0L, "emptied", None)
    ), got.mkString("\n"))
  }

  test("randomized sweep: incremental ≡ full recompute, rank list for rank list") {
    import spark.implicits._
    for (seed <- Seq(5, 17, 31)) {
      val rnd = new scala.util.Random(seed)
      var eid = 0L
      val rows = (1 to 300).map { _ =>
        eid += 1
        val u = rnd.nextInt(40).toLong
        val t = rnd.nextInt(2000).toLong
        val op = if (rnd.nextInt(5) == 0) 3 else 2
        val v = (rnd.nextInt(41) - 10).toDouble // negative values too
        (u, eid, t, op, v)
      }
      val cutoff = 1000L
      val log = rows.toDF("user_id", "event_id", "time_us", "cdc_operation", "value")
      val got = CdcOps.mvTopkFromLog(log, cutoff).collect().map(row).toSeq

      def lww(rs: Seq[(Long, Long, Long, Int, Double)]): Map[Long, Long] =
        rs.groupBy(_._1).flatMap { case (u, g) =>
          val last = g.maxBy(r => (r._3, r._2))
          if (last._4 == 3) None
          else Some(u -> (BigDecimal(last._5).setScale(2) * 100).toLongExact)
        }
      def tk(state: Map[Long, Long]): Map[Long, Seq[Long]] =
        state.toSeq
          .map { case (u, c) => (Math.floorDiv(c, CdcOps.MvBucketCents), u, c) }
          .groupBy(_._1)
          .map { case (b, xs) =>
            b -> xs.sortBy(x => (-x._3, -x._2)).take(CdcOps.MvTopK).map(_._3)
          }
      val base = tk(lww(rows.filter(_._3 <= cutoff)))
      val fin = tk(lww(rows))
      val want = (base.keySet ++ fin.keySet).toSeq.sorted.flatMap { b =>
        (base.get(b), fin.get(b)) match {
          case (None, Some(f)) =>
            f.zipWithIndex.map { case (c, i) =>
              (b, i + 1L, "created", Some(c.toDouble / 100.0)) }
          case (Some(_), None) => Seq((b, 0L, "emptied", None))
          case (Some(bs), Some(f)) =>
            val action = if (bs == f) "carried" else "updated"
            f.zipWithIndex.map { case (c, i) =>
              (b, i + 1L, action, Some(c.toDouble / 100.0)) }
          case (None, None) => Nil
        }
      }
      assert(got == want,
        s"seed $seed:\n got=${got.mkString("\n     ")}\nwant=${want.mkString("\n     ")}")
    }
  }
}
