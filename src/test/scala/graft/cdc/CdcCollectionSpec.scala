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
}
