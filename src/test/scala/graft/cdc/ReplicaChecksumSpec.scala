package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** cdc_replica_checksum contract (SURVEY §2a #14m): the checksum is a
  * genuine divergence detector — the library's two INDEPENDENT
  * materialization paths (full LWW replay; incremental snapshot +
  * slice merge) checksum identically range for range, a single
  * tampered row flips exactly its own range's digest, and the digest
  * is order/partitioning-invariant. */
class ReplicaChecksumSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def log() = graft.cdc.CdcLogAdapter.fromEvents(
    graft.Tables.events(spark, dir))

  private def sums(d: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
    d.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("full replay and incremental merge checksum identically; tampering flips one range") {
    val replay = CdcOps.checksumFrame(CdcOps.replicateLwwFromLog(log()))
    // the incremental path: T0 snapshot + slice, merged — reuse
    // snapshotMergeFromLog's live view, which carries the same
    // (user_id, last_event_id, value) surface
    val merged = CdcOps.snapshotMergeFromLog(log(), CdcOps.SnapshotCutoffUs)
      .select(col("user_id"), col("last_event_id"), col("value"))
    val incr = CdcOps.checksumFrame(merged)
    val a = sums(replay)
    val b = sums(incr)
    assert(a.nonEmpty && a == b, s"paths diverge: ${a.size} vs ${b.size} ranges")

    // tamper with exactly one row -> exactly one range flips, row
    // counts unchanged
    val state = CdcOps.replicateLwwFromLog(log())
    val someUser = state.select(col("user_id")).head().getLong(0)
    val tampered = state.withColumn("value",
      when(col("user_id") === someUser, col("value") + 0.01).otherwise(col("value")))
    val t = sums(CdcOps.checksumFrame(tampered))
    val flipped = a.keySet.filter(k => a(k) != t(k))
    assert(flipped == Set(someUser / CdcOps.ChecksumRangeUsers), flipped.toString)
    flipped.foreach { k => assert(a(k)._1 == t(k)._1, "row count must not change") }
  }

  test("digest is partitioning-invariant (commutative mod-sum)") {
    val state = CdcOps.replicateLwwFromLog(log()).localCheckpoint()
    val base = sums(CdcOps.checksumFrame(state))
    val shuffled = sums(CdcOps.checksumFrame(
      state.repartition(7, col("last_event_id"))))
    assert(base == shuffled)
  }
}
