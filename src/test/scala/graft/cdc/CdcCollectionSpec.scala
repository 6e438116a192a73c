package graft.cdc

import graft.SparkSpec

/** Collection-cell fold semantics (UnpreparedUpdateOperationHandler
  * reference behavior): putAll / removeAll / whole-cell overwrite. */
class CdcCollectionSpec extends SparkSpec {

  import spark.implicits._

  private def log(rows: Seq[(Long, Long, Long, Option[Map[Int, Double]], Option[Seq[Int]], Boolean)]) =
    rows.toDF("user_id", "time_us", "event_id",
      "attrs", "cdc_deleted_elements_attrs", "cdc_deleted_attrs")

  test("put / remove / overwrite fold to the reference final state") {
    val rows = Seq[(Long, Long, Long, Option[Map[Int, Double]], Option[Seq[Int]], Boolean)](
      // pk 1: put{1,2} → remove[2,absent 5] → put{3} → OVERWRITE{4} → put{1} → remove[4]
      (1L, 10L, 1L, Some(Map(1 -> 1.0, 2 -> 2.0)), None, false),
      (1L, 20L, 2L, None, Some(Seq(2, 5)), false),
      (1L, 30L, 3L, Some(Map(3 -> 3.0)), None, false),
      (1L, 40L, 4L, Some(Map(4 -> 4.0)), None, true),
      (1L, 50L, 5L, Some(Map(1 -> 9.0)), None, false),
      (1L, 60L, 6L, None, Some(Seq(4)), false),
      // pk 2: later put of the same key wins
      (2L, 10L, 7L, Some(Map(0 -> 5.0)), None, false),
      (2L, 20L, 8L, Some(Map(0 -> 6.0)), None, false),
      // pk 3: a single overwrite IS the state
      (3L, 10L, 9L, Some(Map(2 -> 1.5)), None, true),
      // pk 4: put then remove → no surviving entries
      (4L, 10L, 10L, Some(Map(1 -> 1.0)), None, false),
      (4L, 20L, 11L, None, Some(Seq(1)), false))
    val out = CdcOps.collectionApplyFromLog(log(rows))
      .as[(Long, Int, Double)].collect().toSeq
    assert(out == Seq((1L, 1, 9.0), (2L, 0, 6.0), (3L, 2, 1.5)))
  }

  test("remove of an element put in the same epoch before the overwrite does not resurrect") {
    val rows = Seq[(Long, Long, Long, Option[Map[Int, Double]], Option[Seq[Int]], Boolean)](
      (7L, 10L, 1L, Some(Map(1 -> 1.0)), None, false),   // pre-epoch put
      (7L, 20L, 2L, Some(Map(2 -> 2.0)), None, true),    // overwrite
      (7L, 30L, 3L, None, Some(Seq(1)), false))          // remove key never put post-epoch
    val out = CdcOps.collectionApplyFromLog(log(rows))
      .as[(Long, Int, Double)].collect().toSeq
    assert(out == Seq((7L, 2, 2.0)))
  }

  test("the synthetic events mapping produces a non-trivial folded state") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 5L, "view", 1.0, "{}"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 6L, "purchase", 2.0, "{}"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 7L, "error", 3.0, "{}"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:04"), 8L, "click", 4.0, "{}"))
      .toDF("user_id", "ts", "event_id", "event_type", "value", "props")
    val cdcLog = CdcLogAdapter.fromEventsWithCollections(events)
    assert(cdcLog.columns.toSeq.takeRight(3) ==
      Seq("attrs", "cdc_deleted_elements_attrs", "cdc_deleted_attrs"))
    val out = CdcOps.collectionApplyFromLog(cdcLog)
      .as[(Long, Int, Double)].collect().toSeq
    // event 7 (error → overwrite, n=2): {0→3.0, 2→4.0};
    // event 8 (click → put, n=3): {1→4.0, 3→5.0, 5→6.0}
    assert(out == Seq((1L, 0, 3.0), (1L, 1, 4.0), (1L, 2, 4.0), (1L, 3, 5.0), (1L, 5, 6.0)))
  }

  // ---- list cells (timeuuid element keys) ----------------------------

  private def listLog(rows: Seq[(Long, Long, Long, Option[Map[Long, Double]], Option[Seq[Long]], Boolean)]) =
    rows.toDF("user_id", "time_us", "event_id",
      "items", "cdc_deleted_elements_items", "cdc_deleted_items")

  test("list fold: append / element-delete / overwrite, key-order materialization") {
    val rows = Seq[(Long, Long, Long, Option[Map[Long, Double]], Option[Seq[Long]], Boolean)](
      // pk 1: append a,b → delete a → append c → list is [b, c] in key order
      (1L, 10L, 1L, Some(Map(100L -> 1.0, 101L -> 2.0)), None, false),
      (1L, 20L, 2L, None, Some(Seq(100L)), false),
      (1L, 30L, 3L, Some(Map(102L -> 3.0)), None, false),
      // pk 2: SET l[100] = 9.0 re-assigns an existing timeuuid in place
      (2L, 10L, 4L, Some(Map(100L -> 1.0, 101L -> 2.0)), None, false),
      (2L, 20L, 5L, Some(Map(100L -> 9.0)), None, false),
      // pk 3: overwrite replaces everything (pre-epoch entries dead)
      (3L, 10L, 6L, Some(Map(100L -> 1.0)), None, false),
      (3L, 20L, 7L, Some(Map(200L -> 5.0, 201L -> 6.0)), None, true),
      // pk 4: delete every element → empty list → no rows
      (4L, 10L, 8L, Some(Map(100L -> 1.0)), None, false),
      (4L, 20L, 9L, None, Some(Seq(100L, 999L)), false))
    val out = CdcOps.collectionApplyListFromLog(listLog(rows))
      .as[(Long, Int, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 1, 2.0), (1L, 2, 3.0),
      (2L, 1, 9.0), (2L, 2, 2.0),
      (3L, 1, 5.0), (3L, 2, 6.0)))
  }

  test("the synthetic list mapping yields monotone keys and a deterministic fold") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 5L, "view", 1.0, "{}"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 6L, "click", 2.0, "{}"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 7L, "purchase", 3.0, "{}"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:04"), 8L, "view", 4.0, "{}"))
      .toDF("user_id", "ts", "event_id", "event_type", "value", "props")
    val cdcLog = CdcLogAdapter.fromEventsWithList(events)
    assert(cdcLog.columns.toSeq.takeRight(3) ==
      Seq("items", "cdc_deleted_elements_items", "cdc_deleted_items"))
    val out = CdcOps.collectionApplyListFromLog(cdcLog)
      .as[(Long, Int, Double)].collect().toSeq
    // rn1 e5 view n=3: keys 4,5,6 → 1.0,2.0,3.0
    // rn2 e6 click n=1: key 8 → 2.0
    // rn3 e7 purchase: deletes (3-1)*4+7%3=9 (miss), (3-2)*4+8%3=6 (hit)
    // rn4 e8 view n=3: keys 16,17,18 → 4.0,5.0,6.0
    // surviving keys 4,5,8,16,17,18
    assert(out == Seq((1L, 1, 1.0), (1L, 2, 2.0), (1L, 3, 2.0),
      (1L, 4, 4.0), (1L, 5, 5.0), (1L, 6, 6.0)))
  }

  // ---- UDT cells (field-index element keys) --------------------------

  private def udtLog(rows: Seq[(Long, Long, Long, (Option[Double], Option[Long], Option[String]), Option[Seq[Int]], Boolean)]) =
    rows.map { case (u, t, e, (a, b, c), d, o) => (u, t, e, a, b, c, d, o) }
      .toDF("user_id", "time_us", "event_id", "f0", "f1", "f2", "del", "ow")
      .selectExpr("user_id", "time_us", "event_id",
        "named_struct('f0', f0, 'f1', f1, 'f2', f2) AS udt",
        "del AS cdc_deleted_elements_udt", "ow AS cdc_deleted_udt")

  test("udt fold: per-field set / delete / untouched / whole-cell overwrite") {
    val rows = Seq[(Long, Long, Long, (Option[Double], Option[Long], Option[String]), Option[Seq[Int]], Boolean)](
      // pk 1: set all → null f1 NOT deleted leaves it; null f1 deleted clears it
      (1L, 10L, 1L, (Some(1.0), Some(10L), Some("a")), None, false),
      (1L, 20L, 2L, (Some(2.0), None, None), None, false),          // f1,f2 untouched
      (1L, 30L, 3L, (None, None, Some("b")), Some(Seq(1)), false),  // delete f1, set f2
      // pk 2: overwrite resets fields not named by the overwrite row
      (2L, 10L, 4L, (Some(1.0), Some(10L), Some("x")), None, false),
      (2L, 20L, 5L, (None, Some(20L), None), None, true),
      // pk 3: last delete wins over earlier set
      (3L, 10L, 6L, (Some(3.0), None, None), None, false),
      (3L, 20L, 7L, (None, None, None), Some(Seq(0)), false))
    val out = CdcOps.collectionApplyUdtFromLog(udtLog(rows))
      .as[(Long, Option[Double], Option[Long], Option[String])].collect().toSeq
    assert(out == Seq(
      (1L, Some(2.0), None, Some("b")),
      (2L, None, Some(20L), None),
      (3L, None, None, None)))
  }

  test("the synthetic udt mapping exercises set, delete and overwrite branches") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 6L, "view", 1.0, "{}"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 7L, "click", 2.0, "{}"))
      .toDF("user_id", "ts", "event_id", "event_type", "value", "props")
    // e6: f0 null+deleted ((6+0)%6==0), f1 set 42, f2 set "u6"
    // e7: f0 set 2.5, f1 set 49, f2 null undeleted ((7+2)%3==0, %6!=0)
    val out = CdcOps.collectionApplyUdtFromLog(CdcLogAdapter.fromEventsWithUdt(events))
      .as[(Long, Option[Double], Option[Long], Option[String])].collect().toSeq
    assert(out == Seq((1L, Some(2.5), Some(49L), Some("u6"))))
  }
}
