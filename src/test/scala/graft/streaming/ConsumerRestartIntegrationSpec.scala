package graft.streaming

import graft.SparkSpec
import graft.cdc.CdcOps
import graft.streaming.CdcStreamConsumer.{Change, Delivered}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** CRASH/RESTART INTEGRATION of the full consumer stack (round-8
  * verdict directive #3): GraftCdcConsumer (withGenerations +
  * FileStateStore) feeding StreamingSnapshotMerge, killed mid-stream
  * and resumed FROM THE EXTERNAL STORE ALONE (a fresh checkpoint dir
  * — the cross-process resume role of the reference's Redis example:
  * examples RedisStateStore.java + Master.java:40-102 lifecycle +
  * the Worker consume loop). The composed effectively-once claim:
  * after crash, source-level replay, and resume, every change reaches
  * the sink EXACTLY once, the generation barrier holds across the
  * restart, and the continuously-maintained snapshot equals the batch
  * replicateLww of the whole log. Each piece has its own spec; this
  * is the composition none of them covered. */
class ConsumerRestartIntegrationSpec extends SparkSpec {

  /** Base event time: 2023-11-14T22:13:20Z in µs. */
  private val T0 = 1700000000000000L
  private def ms(n: Long): Long = T0 + n * 1000L

  test("crash, source replay, resume from the file store: exactly-once into a snapshot ≡ batch replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val storePath = java.nio.file.Files.createTempDirectory("graft_it_store")
      .resolve("progress.bin")
    val snapIn = MemoryStream[SnapMergeChange]
    val snapStore = new StreamingSnapshotMerge.InMemorySnapshotStore(spark)
    val snapQ = StreamingSnapshotMerge.attach(snapIn.toDF(), snapStore,
      confidenceUs = 1000000000000L)
    val delivered = new ConcurrentLinkedQueue[Delivered]()
    val retasked = new ConcurrentLinkedQueue[Int]()

    val gens = Seq(
      CdcGeneration(0, ms(0), Some(ms(100)), Seq(1L, 2L)),
      CdcGeneration(1, ms(100), None, Seq(1L, 2L)))

    // the distributed sink: forward every delivered change into the
    // snapshot maintainer's stream (nudge stream 9 excluded)
    def forward(d: Delivered): Unit = {
      delivered.add(d)
      if (d.streamId != 9L)
        snapIn.addData(SnapMergeChange(d.streamId, d.eventId, d.timeUs,
          d.operation, d.value, "{}"))
    }

    def consumer(in: MemoryStream[Change], ckpt: String) =
      GraftCdcConsumer.builder(spark)
        .withSource(in.toDS())
        .withConsumer(forward)
        .withGenerations(gens)
        .withGenerationSwitchListener(g => retasked.add(g.generationId))
        .withStateStore(new FileStateStore(storePath))
        .withCheckpointLocation(ckpt)
        .withQueryTimeWindowSizeMs(100)
        .withQueryName(s"spec_it_${System.nanoTime()}")
        .build()

    // gen-0 traffic: inserts on streams 1 and 2, then an update on 1
    val b1 = Seq(
      Change(1, ms(10), 1, 2, 1.0),
      Change(2, ms(20), 2, 2, 2.0),
      Change(1, ms(30), 3, 1, 1.5))
    // gen-1 traffic after the restart: delete stream 1, update stream 2
    val b2 = Seq(
      Change(1, ms(150000), 4, 3, 0.0),
      Change(2, ms(150010), 5, 1, 2.5))

    // ---- phase 1: consume gen 0, then CRASH ------------------------
    val in1 = MemoryStream[Change]
    val c1 = consumer(in1,
      java.nio.file.Files.createTempDirectory("graft_it_ckpt1").toString)
    c1.start()
    in1.addData(b1); c1.processAllAvailable()
    in1.addData(Seq(Change(9, ms(100000), 99, 2, 0.0))) // watermark nudge
    c1.processAllAvailable()
    c1.stop() // crash after the store recorded b1's high-water marks
    snapQ.processAllAvailable()
    assert(c1.generationSwitches == Seq(0))
    // the mid-crash snapshot already carries the gen-0 state
    assert(StreamingSnapshotMerge.liveView(snapStore.read()).count() == 2)

    // ---- phase 2: resume from the EXTERNAL store alone -------------
    // Fresh checkpoint dir (new cluster / new process): Spark replays
    // the source from scratch — b1 arrives AGAIN inside a fresh
    // watermark — and only the FileStateStore's persisted per-stream
    // marks (reopened from disk) stand between the sink and double
    // delivery.
    val in2 = MemoryStream[Change]
    val c2 = consumer(in2,
      java.nio.file.Files.createTempDirectory("graft_it_ckpt2").toString)
    c2.start()
    in2.addData(b1) // at-least-once source replay of the crashed run
    in2.addData(b2)
    c2.processAllAvailable()
    in2.addData(Seq(Change(9, ms(300000), 100, 2, 0.0))) // nudge
    c2.processAllAvailable()
    in2.addData(Seq(Change(9, ms(400000), 101, 2, 0.0))) // flush edge
    c2.processAllAvailable()
    c2.stop()
    snapQ.processAllAvailable()
    snapQ.stop()

    // ---- the composed claims ---------------------------------------
    // exactly-once: every data change delivered once across the crash
    val dataChanges = delivered.asScala.filter(_.streamId != 9L).toSeq
    assert(dataChanges.map(d => (d.streamId, d.timeUs, d.eventId)).sorted ==
      (b1 ++ b2).map(c => (c.streamId, c.timeUs, c.eventId)).sorted,
      s"replay leaked or lost a change: $dataChanges")
    // per-stream ChangeId order held across the restart
    dataChanges.groupBy(_.streamId).foreach { case (sid, ds) =>
      val times = ds.sortBy(d => (d.timeUs, d.eventId)).map(_.timeUs)
      assert(ds.map(_.timeUs) == times, s"stream $sid delivered out of order: $ds")
    }
    // generation lifecycle: gen 0 tasked on both runs (init), gen 1
    // only after its first change — and the barrier held (no gen-1
    // change delivered before the last gen-0 change)
    assert(c2.generationSwitches == Seq(0, 1))
    assert(retasked.asScala.toSeq == Seq(0, 0, 1))
    val genSeq = dataChanges.map(d => if (d.timeUs < ms(100)) 0 else 1)
    assert(genSeq == genSeq.sorted, s"delivery crossed the generation barrier: $dataChanges")

    // snapshot ≡ batch replicateLww of the WHOLE log
    val fullLog = (b1 ++ b2)
      .map(c => SnapMergeChange(c.streamId, c.eventId, c.timeUs, c.operation, c.value, "{}"))
      .toDF()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("last_event_id"),
        r.getAs[Long]("last_write_us"), r.getAs[Double]("value"))).toSet
    val got = rows(StreamingSnapshotMerge.liveView(snapStore.read()))
    val want = rows(CdcOps.replicateLwwFromLog(fullLog))
    assert(got == want, s"snapshot diverged from batch replay:\n got  $got\n want $want")
    // the deleted stream survives as a tombstone, not a live row
    assert(!got.exists(_._1 == 1L))
    assert(snapStore.read().filter("user_id = 1 AND deleted").count() == 1)
  }
}
