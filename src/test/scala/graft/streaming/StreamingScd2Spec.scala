package graft.streaming

import graft.SparkSpec
import graft.cdc.{CdcOps, CdcSchema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** One conforming CDC-log row (top-level for encoder derivation). */
case class Scd2Change(user_id: Long, event_id: Long, time_us: Long,
    cdc_operation: Int, value: Double, props: String)

/** The streaming SCD2 maintainer must hold the batch operator's
  * version table live: a LATE out-of-order write inside the
  * confidence window SPLITS the covering version identically to the
  * batch recompute; a beyond-confidence late is ignored; frozen
  * versions never change; replay is a no-op (round-8 verdict
  * directive #7's done-criteria). */
class StreamingScd2Spec extends SparkSpec {

  import CdcSchema._

  private type Change = Scd2Change
  private val Change = Scd2Change

  private def asLog(rows: Seq[Change]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  private def table(df: DataFrame): Set[(Long, Int, Long, Long, Option[Long], Boolean, Double)] =
    df.collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version_no"),
      r.getAs[Long]("write_event_id"), r.getAs[Long]("valid_from_us"),
      Option(r.getAs[java.lang.Long]("valid_to_us")).map(_.longValue),
      r.getAs[Boolean]("is_current"), r.getAs[Double]("value"))).toSet

  test("late in-contract write splits an existing version identically to the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val store = new StreamingScd2.InMemoryScd2Store(spark)
    val q = StreamingScd2.attach(input.toDF(), store, confidenceUs = 150L)
    // u1: three on-time writes spread enough that the freeze line
    // (max 400 − 150 = 250) finalizes version [100, 200) immediately;
    // u2: an insert later closed by a DELETE (closes silently)
    val b1 = Seq(
      Change(1L, 1L, 100L, RowInsert, 1.0, "{}"),
      Change(1L, 2L, 200L, RowUpdate, 2.0, "{}"),
      Change(1L, 3L, 400L, RowUpdate, 3.0, "{}"),
      Change(2L, 10L, 100L, RowInsert, 9.0, "{}"),
      Change(2L, 11L, 260L, RowDelete, 0.0, "{}"))
    // the LATE write: event time 300 lands INSIDE u1's materialized
    // version [200, 400) and above the freeze line — must split it
    val late = Seq(Change(1L, 4L, 300L, RowUpdate, 2.5, "{}"))
    // beyond-confidence late (150 ≤ freeze 250): out of contract
    val tooLate = Seq(Change(1L, 5L, 150L, RowUpdate, 99.0, "{}"))
    try {
      input.addData(b1); q.processAllAvailable()
      // v1 of u1 is frozen before the late write ever arrives
      val frozenBefore = table(store.frozenView())
      assert(frozenBefore.exists(v => v._1 == 1L && v._2 == 1 && v._5.contains(200L)),
        s"expected [100,200) frozen, got $frozenBefore")

      input.addData(late); q.processAllAvailable()
      val afterSplit = table(store.read())
      val batchEquiv = table(CdcOps.scd2HistoryFromLog(asLog(b1 ++ late)))
      assert(afterSplit == batchEquiv,
        s"split mismatch:\n got  $afterSplit\n want $batchEquiv")
      // the covering version really did split: [200,300) + [300,400)
      assert(afterSplit.exists(v => v._1 == 1L && v._4 == 200L && v._5.contains(300L)))
      assert(afterSplit.exists(v => v._1 == 1L && v._4 == 300L && v._5.contains(400L)))
      // frozen rows were untouched by the correction
      assert(table(store.frozenView()).intersect(frozenBefore) == frozenBefore)

      // out-of-contract late: ignored, table unchanged
      input.addData(tooLate); q.processAllAvailable()
      assert(table(store.read()) == batchEquiv)

      // at-least-once replay of the late batch: a no-op
      input.addData(late); q.processAllAvailable()
      assert(table(store.read()) == batchEquiv)
    } finally q.stop()

    // the delete closed u2's only version and left nothing current
    val u2 = table(store.read()).filter(_._1 == 2L)
    assert(u2 == Set((2L, 1, 10L, 100L, Some(260L), false, 9.0)))
  }

  test("random logs in random micro-batches ≡ the batch operator (3 seeds, wide confidence)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // arbitrary interleavings of inserts/updates/deletes across keys,
    // shuffled into arrival order DECOUPLED from event time, split at
    // random batch boundaries; the confidence window spans the whole
    // log so every out-of-order arrival is in-contract — the final
    // maintained table must equal the batch recompute exactly
    for (seed <- Seq(2, 9, 31)) {
      val rnd = new scala.util.Random(seed)
      val ops = (1 to 150).map { i =>
        val op = rnd.nextInt(10) match {
          case 0 | 1 => RowDelete
          case x if x < 6 => RowInsert
          case _ => RowUpdate
        }
        // distinct event times per key are what SCD2 versions key on;
        // collisions across keys are fine and frequent here
        Change(rnd.nextInt(8).toLong, i.toLong, rnd.nextInt(500).toLong * 10 + i % 10,
          op, rnd.nextInt(1000) / 100.0, "{}")
      }
      val arrival = rnd.shuffle(ops)
      val batches = {
        var rest = arrival
        val acc = scala.collection.mutable.Buffer[Seq[Change]]()
        while (rest.nonEmpty) {
          val k = math.min(rest.length, rnd.nextInt(40) + 1)
          acc += rest.take(k); rest = rest.drop(k)
        }
        acc.toSeq
      }
      val input = MemoryStream[Change]
      val store = new StreamingScd2.InMemoryScd2Store(spark)
      val q = StreamingScd2.attach(input.toDF(), store, confidenceUs = 1000000L)
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()
      val got = table(store.read())
      val want = table(CdcOps.scd2HistoryFromLog(asLog(ops)))
      assert(got == want, s"seed $seed: ${got.size} vs ${want.size} versions")
    }
  }

  test("freeze line advances across batches and the frozen store only ever grows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val store = new StreamingScd2.InMemoryScd2Store(spark)
    val q = StreamingScd2.attach(input.toDF(), store, confidenceUs = 50L)
    val all = (1 to 8).map(i =>
      Change(7L, i.toLong, i * 100L, if (i == 1) RowInsert else RowUpdate, i.toDouble, "{}"))
    try {
      var frozenSoFar = Set.empty[(Long, Int, Long, Long, Option[Long], Boolean, Double)]
      all.grouped(2).foreach { b =>
        input.addData(b); q.processAllAvailable()
        val now = table(store.frozenView())
        assert(frozenSoFar.subsetOf(now), "a frozen version changed or vanished")
        frozenSoFar = now
      }
      // everything with valid_to ≤ 800−50 is frozen: versions 1..6
      assert(frozenSoFar.map(_._2) == (1 to 6).toSet)
      // and the full table equals the batch recompute of the whole log
      assert(table(store.read()) == table(CdcOps.scd2HistoryFromLog(asLog(all))))
      // active state held only the correctable tail: anchor + window
      assert(store.activeWrites.count() <= 3)
    } finally q.stop()
  }
}
