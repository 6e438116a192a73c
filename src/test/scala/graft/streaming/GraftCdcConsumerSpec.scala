package graft.streaming

import graft.SparkSpec
import graft.cdc.ExponentialRetryBackoffWithJitter
import graft.streaming.CdcStreamConsumer.{Change, Delivered}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Spec for [[GraftCdcConsumer]] — the user-facing builder API
  * (reference: scylla-cdc-lib CDCConsumer.builder()). */
class GraftCdcConsumerSpec extends SparkSpec {

  test("builder validates its arguments like the reference") {
    val b = GraftCdcConsumer.builder(spark)
    intercept[IllegalArgumentException](b.withQueryTimeWindowSizeMs(0))
    intercept[IllegalArgumentException](b.withConfidenceWindowSizeMs(-5))
    intercept[IllegalArgumentException](b.withWorkersCount(0))
    intercept[IllegalArgumentException](b.build()) // no source
  }

  test("end-to-end: ordered per-stream delivery to the consumer callback") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val received = new ConcurrentLinkedQueue[Delivered]()

    val c = GraftCdcConsumer.builder(spark)
      .withSource(input.toDS())
      .withConsumer(d => received.add(d))
      .withQueryTimeWindowSizeMs(100)
      .withConfidenceWindowSizeMs(1000)
      .withWorkerRetryBackoff(new ExponentialRetryBackoffWithJitter(1, 10, 0.5))
      .withQueryName(s"spec_${System.nanoTime()}")
      .build()
    try {
      c.start()
      input.addData(Seq(
        Change(1, 300, 3, 2, 0.0), Change(1, 100, 1, 2, 0.0),
        Change(2, 50, 7, 1, 0.0), Change(1, 200, 2, 1, 0.0)))
      c.processAllAvailable()
      input.addData(Seq(Change(1, 100, 1, 2, 0.0), Change(1, 400, 4, 3, 0.0))) // replay + new
      c.processAllAvailable()
    } finally c.stop()

    val s1 = received.asScala.filter(_.streamId == 1).toSeq.sortBy(_.seqNo)
    assert(s1.map(_.timeUs) == Seq(100L, 200L, 300L, 400L)) // ordered, replay dropped
    assert(s1.map(_.seqNo) == Seq(1L, 2L, 3L, 4L))
    assert(received.asScala.count(_.streamId == 2) == 1)
  }

  test("checkpointed restart resumes without redelivery (TaskStateBackend semantics)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val received = new ConcurrentLinkedQueue[Delivered]()

    def consumer(input: MemoryStream[Change]) = GraftCdcConsumer.builder(spark)
      .withSource(input.toDS())
      .withConsumer(d => received.add(d))
      .withCheckpointLocation(ckpt)
      .withQueryName(s"spec_ckpt_${System.nanoTime()}")
      .build()

    val in1 = MemoryStream[Change]
    val c1 = consumer(in1)
    c1.start()
    in1.addData(Seq(Change(5, 10, 1, 2, 0.0), Change(5, 20, 2, 1, 0.0)))
    c1.processAllAvailable()
    c1.stop()

    // new query, same checkpoint: the memory source replays from its
    // committed offset, state holds lastConsumed=(20,2)
    val in2 = MemoryStream[Change]
    in2.addData(Seq(Change(5, 10, 1, 2, 0.0), Change(5, 20, 2, 1, 0.0))) // replayed history
    val c2 = consumer(in2)
    c2.start()
    in2.addData(Seq(Change(5, 30, 3, 1, 0.0)))
    c2.processAllAvailable()
    c2.stop()

    val s5 = received.asScala.filter(_.streamId == 5).toSeq.sortBy(_.seqNo)
    assert(s5.map(_.timeUs) == Seq(10L, 20L, 30L)) // no duplicates across restart
    assert(s5.map(_.seqNo) == Seq(1L, 2L, 3L))     // progress carried over
  }

  test("transient consumer failure is retried with backoff (ErrorInject semantics)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val received = new ConcurrentLinkedQueue[Delivered]()
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)

    val c = GraftCdcConsumer.builder(spark)
      .withSource(input.toDS())
      .withConsumer { d =>
        // fail the first delivery attempt once (OnceChangeErrorInject)
        if (failures.compareAndSet(0, 1)) throw new RuntimeException("injected")
        received.add(d)
      }
      .withWorkerRetryBackoff(new ExponentialRetryBackoffWithJitter(1, 5, 0.5))
      .withQueryName(s"spec_retry_${System.nanoTime()}")
      .build()
    try {
      c.start()
      input.addData(Seq(Change(3, 10, 1, 2, 0.0), Change(3, 20, 2, 1, 0.0)))
      c.processAllAvailable()
    } finally c.stop()

    assert(failures.get() == 1) // the injected error fired
    val s3 = received.asScala.filter(_.streamId == 3).toSeq.sortBy(_.timeUs)
    // at-least-once on retry, like the reference's window re-read
    assert(s3.map(_.timeUs).distinct == Seq(10L, 20L))
  }

  test("stop is idempotent and close delegates to stop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val c = GraftCdcConsumer.builder(spark)
      .withSource(input.toDS())
      .withQueryName(s"spec_${System.nanoTime()}")
      .build()
    c.start()
    c.stop(); c.stop(); c.close()
  }
}
