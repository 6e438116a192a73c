package graft.streaming

import graft.SparkSpec
import graft.cdc.CdcOps
import graft.streaming.CdcCollectionConsumer.{CollChange, CollSnapshot}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Streaming collection replication — semantics must equal the batch
  * epoch fold (CdcOps.collectionApplyFromLog). */
class CdcCollectionConsumerSpec extends SparkSpec {

  private def run(batches: Seq[Seq[CollChange]]): Seq[CollSnapshot] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CollChange]
    val out = new ConcurrentLinkedQueue[CollSnapshot]()
    val q = CdcCollectionConsumer.consume(spark, input.toDS())
      .writeStream.outputMode("append")
      .queryName(s"coll_${System.nanoTime()}")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[CollSnapshot], _: Long) =>
        b.collect().foreach(out.add)
      }
      .start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    out.asScala.toSeq
  }

  test("put / remove / overwrite fold exactly like the batch operator") {
    val changes = Seq(
      CollChange(1L, 10L, 1L, Map(1 -> 1.0, 2 -> 2.0), Nil, overwrite = false),
      CollChange(1L, 20L, 2L, Map.empty, Seq(2, 5), overwrite = false),
      CollChange(1L, 30L, 3L, Map(3 -> 3.0), Nil, overwrite = false),
      CollChange(1L, 40L, 4L, Map(4 -> 4.0), Nil, overwrite = true),
      CollChange(1L, 50L, 5L, Map(1 -> 9.0), Nil, overwrite = false),
      CollChange(1L, 60L, 6L, Map.empty, Seq(4), overwrite = false))
    val snaps = run(Seq(changes))
    assert(snaps.size == 6)
    // per-change snapshots walk the reference fold
    assert(snaps.find(_.eventId == 3).get.entries == Map(1 -> 1.0, 3 -> 3.0))
    assert(snaps.find(_.eventId == 4).get.entries == Map(4 -> 4.0)) // overwrite reset
    assert(snaps.find(_.eventId == 6).get.entries == Map(1 -> 9.0))

    // cross-check: the batch fold over the same log yields the same
    // final state
    import spark.implicits._
    val log = changes.map(c => (c.userId, c.timeUs, c.eventId,
        if (c.del.nonEmpty) None else Some(c.put),
        if (c.del.nonEmpty) Some(c.del) else None,
        c.overwrite))
      .toDF("user_id", "time_us", "event_id",
        "attrs", "cdc_deleted_elements_attrs", "cdc_deleted_attrs")
    val batch = CdcOps.collectionApplyFromLog(log)
      .as[(Long, Int, Double)].collect().toMap2
    val streamingFinal = snaps.maxBy(_.eventId).entries
    assert(batch == streamingFinal.map { case (k, v) => (1L, k) -> v })
  }

  test("out-of-order arrival within a micro-batch is applied in ChangeId order") {
    val snaps = run(Seq(Seq(
      CollChange(2L, 30L, 3L, Map(1 -> 3.0), Nil, overwrite = false),
      CollChange(2L, 10L, 1L, Map(1 -> 1.0), Nil, overwrite = false),
      CollChange(2L, 20L, 2L, Map.empty, Seq(1), overwrite = false))))
    // 10:put{1→1} → 20:del[1] → 30:put{1→3}
    assert(snaps.map(_.eventId) == Seq(1L, 2L, 3L))
    assert(snaps.last.entries == Map(1 -> 3.0))
  }

  test("replays at or before the checkpoint are not re-applied") {
    val b1 = Seq(CollChange(3L, 10L, 1L, Map(1 -> 1.0), Nil, overwrite = false))
    val b2 = Seq(
      CollChange(3L, 10L, 1L, Map(1 -> 1.0), Nil, overwrite = false), // replay
      CollChange(3L, 20L, 2L, Map(2 -> 2.0), Nil, overwrite = false))
    val snaps = run(Seq(b1, b2))
    assert(snaps.map(_.eventId) == Seq(1L, 2L))
    assert(snaps.last.applied == 2L)
    assert(snaps.last.entries == Map(1 -> 1.0, 2 -> 2.0))
  }

  implicit private class ToMap2(self: Array[(Long, Int, Double)]) {
    def toMap2: Map[(Long, Int), Double] =
      self.map { case (u, k, v) => (u, k) -> v }.toMap
  }

  // ---- list twin -----------------------------------------------------

  private def runList(batches: Seq[Seq[CdcCollectionConsumer.ListChange]]): Seq[CdcCollectionConsumer.ListSnapshot] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcCollectionConsumer.ListChange]
    val out = new ConcurrentLinkedQueue[CdcCollectionConsumer.ListSnapshot]()
    val q = CdcCollectionConsumer.consumeList(spark, input.toDS())
      .writeStream.outputMode("append")
      .queryName(s"list_${System.nanoTime()}")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[CdcCollectionConsumer.ListSnapshot], _: Long) =>
        b.collect().foreach(out.add)
      }
      .start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    out.asScala.toSeq
  }

  test("list twin: append / element-delete / overwrite materialize in key order, equal to the batch fold") {
    import CdcCollectionConsumer.ListChange
    val changes = Seq(
      ListChange(1L, 10L, 1L, Map(100L -> 1.0, 101L -> 2.0), Nil, overwrite = false),
      ListChange(1L, 20L, 2L, Map.empty, Seq(100L), overwrite = false),
      ListChange(1L, 30L, 3L, Map(102L -> 3.0), Nil, overwrite = false),
      ListChange(1L, 40L, 4L, Map(200L -> 5.0), Nil, overwrite = true),
      ListChange(1L, 50L, 5L, Map(150L -> 4.0), Nil, overwrite = false))
    val snaps = runList(Seq(changes))
    assert(snaps.size == 5)
    assert(snaps.find(_.eventId == 3).get.items == Seq(2.0, 3.0))
    assert(snaps.find(_.eventId == 4).get.items == Seq(5.0))       // overwrite reset
    assert(snaps.find(_.eventId == 5).get.items == Seq(4.0, 5.0))  // 150 sorts before 200

    // cross-check: the batch fold over the same log yields the same
    // final materialized list
    import spark.implicits._
    val log = changes.map(c => (c.userId, c.timeUs, c.eventId,
        if (c.del.nonEmpty) None else Some(c.put),
        if (c.del.nonEmpty) Some(c.del) else None,
        c.overwrite))
      .toDF("user_id", "time_us", "event_id",
        "items", "cdc_deleted_elements_items", "cdc_deleted_items")
    val batch = CdcOps.collectionApplyListFromLog(log)
      .as[(Long, Int, Double)].collect().toSeq.map(_._3)
    assert(batch == snaps.maxBy(_.eventId).items)
  }

  // ---- UDT twin ------------------------------------------------------

  private def runUdt(batches: Seq[Seq[CdcCollectionConsumer.UdtChange]]): Seq[CdcCollectionConsumer.UdtSnapshot] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcCollectionConsumer.UdtChange]
    val out = new ConcurrentLinkedQueue[CdcCollectionConsumer.UdtSnapshot]()
    val q = CdcCollectionConsumer.consumeUdt(spark, input.toDS())
      .writeStream.outputMode("append")
      .queryName(s"udt_${System.nanoTime()}")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[CdcCollectionConsumer.UdtSnapshot], _: Long) =>
        b.collect().foreach(out.add)
      }
      .start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    out.asScala.toSeq
  }

  test("udt twin: per-field set / delete / untouched / overwrite, equal to the batch fold") {
    import CdcCollectionConsumer.UdtChange
    val changes = Seq(
      UdtChange(1L, 10L, 1L, Some(1.0), Some(10L), Some("a"), Nil, overwrite = false),
      UdtChange(1L, 20L, 2L, Some(2.0), None, None, Nil, overwrite = false),      // f1,f2 untouched
      UdtChange(1L, 30L, 3L, None, None, Some("b"), Seq(1), overwrite = false),   // delete f1
      UdtChange(1L, 40L, 4L, None, Some(20L), None, Nil, overwrite = true),       // overwrite
      UdtChange(1L, 50L, 5L, Some(7.0), None, None, Nil, overwrite = false))
    val snaps = runUdt(Seq(changes))
    assert(snaps.size == 5)
    assert(snaps.find(_.eventId == 2).get == CdcCollectionConsumer.UdtSnapshot(
      1L, 20L, 2L, 2L, Some(2.0), Some(10L), Some("a")))
    assert(snaps.find(_.eventId == 3).get.f1.isEmpty)
    assert(snaps.find(_.eventId == 4).get == CdcCollectionConsumer.UdtSnapshot(
      1L, 40L, 4L, 4L, None, Some(20L), None))
    val fin = snaps.maxBy(_.eventId)
    assert((fin.f0, fin.f1, fin.f2) == (Some(7.0), Some(20L), None))

    // cross-check vs the batch field-index fold
    import spark.implicits._
    val log = changes.map(c => (c.userId, c.timeUs, c.eventId,
        c.f0, c.f1, c.f2,
        if (c.delIdx.nonEmpty) Some(c.delIdx) else None, c.overwrite))
      .toDF("user_id", "time_us", "event_id", "f0", "f1", "f2", "del", "ow")
      .selectExpr("user_id", "time_us", "event_id",
        "named_struct('f0', f0, 'f1', f1, 'f2', f2) AS udt",
        "del AS cdc_deleted_elements_udt", "ow AS cdc_deleted_udt")
    val batch = CdcOps.collectionApplyUdtFromLog(log)
      .as[(Long, Option[Double], Option[Long], Option[String])].collect().toSeq
    assert(batch == Seq((1L, fin.f0, fin.f1, fin.f2)))
  }
}
