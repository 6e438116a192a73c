package graft.cdc

import graft.SparkSpec

/** Model-based randomized check: the relational epoch fold
  * (collectionApplyFromLog) must equal a straightforward in-memory
  * replay of the reference handler semantics on arbitrary op
  * sequences. Seeded, so failures reproduce. */
class CollectionFoldPropertySpec extends SparkSpec {

  import spark.implicits._

  private case class Op(userId: Long, timeUs: Long, eventId: Long,
      put: Map[Int, Double], del: Seq[Int], overwrite: Boolean)

  /** The reference handler, literally: per key in ChangeId order,
    * one of putAll / removeAll / whole-cell overwrite. */
  private def model(ops: Seq[Op]): Map[(Long, Int), Double] = {
    val state = scala.collection.mutable.Map[Long, Map[Int, Double]]()
    ops.sortBy(o => (o.userId, o.timeUs, o.eventId)).foreach { o =>
      val cur = state.getOrElse(o.userId, Map.empty)
      state(o.userId) =
        if (o.overwrite) o.put
        else if (o.del.nonEmpty) cur -- o.del
        else cur ++ o.put
    }
    state.toSeq.flatMap { case (u, m) => m.map { case (k, v) => (u, k) -> v } }.toMap
  }

  test("random op sequences: relational fold == reference replay (3 seeds)") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val ops = (1 to 200).map { i =>
        val kind = rnd.nextInt(10)
        val keys = Seq.fill(rnd.nextInt(3) + 1)(rnd.nextInt(8)).distinct
        Op(
          userId = rnd.nextInt(6).toLong,
          timeUs = rnd.nextInt(50).toLong * 10, // deliberate time collisions
          eventId = i.toLong,                   // unique tiebreak
          put = if (kind == 9) Map.empty        // occasional empty overwrite
                else keys.map(k => k -> (rnd.nextInt(100) / 10.0)).toMap,
          del = Nil,
          overwrite = kind >= 8)
      } ++ (201 to 260).map { i =>
        val rnd2 = new scala.util.Random(seed * 1000 + i)
        Op(rnd2.nextInt(6).toLong, rnd2.nextInt(50).toLong * 10, i.toLong,
          Map.empty, Seq.fill(rnd2.nextInt(2) + 1)(rnd2.nextInt(8)).distinct,
          overwrite = false)
      }
      val log = ops.map(o => (o.userId, o.timeUs, o.eventId,
          if (o.del.nonEmpty) None else Some(o.put),
          if (o.del.nonEmpty) Some(o.del) else None,
          o.overwrite))
        .toDF("user_id", "time_us", "event_id",
          "attrs", "cdc_deleted_elements_attrs", "cdc_deleted_attrs")
      val got = CdcOps.collectionApplyFromLog(log)
        .as[(Long, Int, Double)].collect()
        .map { case (u, k, v) => (u, k) -> v }.toMap
      assert(got == model(ops), s"seed $seed diverged")
    }
  }
}
