package graft.streaming

import graft.cdc.{ExponentialRetryBackoffWithJitter, RetryBackoff}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import CdcStreamConsumer.{Change, Delivered}

/** User-facing consumer builder — the Spark-first analogue of the
  * reference's `CDCConsumer.builder()`
  * (scylla-cdc-lib .../lib/CDCConsumer.java:97-232).
  *
  * Mapping of the reference's knobs onto Spark Structured Streaming:
  *  - contact points / session        → the SparkSession + source Dataset
  *    (any `readStream` source: Kafka, files, rate, memory)
  *  - addTable                        → one consumer per change Dataset
  *  - withConsumer(RawChangeConsumer) → withConsumer(Delivered => Unit),
  *    invoked per change, per stream, in ChangeId order
  *  - withQueryTimeWindowSizeMs       → micro-batch trigger interval
  *    (the worker's bounded read window)
  *  - withConfidenceWindowSizeMs      → event-time watermark delay
  *    (don't trust changes newer than now − confidence; the reference
  *    holds back its window end the same way)
  *  - withWorkersCount                → shuffle partitions for the
  *    per-stream state exchange (executors at 100 TB)
  *  - withWorkerRetryBackoff          → per-micro-batch retry schedule
  *  - checkpointing (TaskStateBackend)→ withCheckpointLocation: Spark's
  *    state store persists the per-stream lastConsumedChangeId, resume
  *    is exactly the reference's saved-state restart
  */
final class GraftCdcConsumerBuilder private[streaming] (spark: SparkSession) {
  private var source: Dataset[Change] = _
  private var consumer: Delivered => Unit = _ => ()
  private var queryWindowMs: Long = 30000L // reference DEFAULT_QUERY_TIME_WINDOW_SIZE_MS
  private var confidenceMs: Long = 30000L  // reference DEFAULT_CONFIDENCE_WINDOW_SIZE_MS
  private var workersCount: Option[Int] = None
  private var backoff: RetryBackoff = new ExponentialRetryBackoffWithJitter(10, 30000, 0.25)
  private var checkpointLocation: Option[String] = None
  private var queryName: String = s"graft-cdc-${java.util.UUID.randomUUID().toString.take(8)}"

  def withSource(changes: Dataset[Change]): this.type = { source = changes; this }
  def withConsumer(c: Delivered => Unit): this.type = { consumer = c; this }
  def withQueryTimeWindowSizeMs(ms: Long): this.type = {
    require(ms > 0, "queryTimeWindowSizeMs must be positive"); queryWindowMs = ms; this
  }
  def withConfidenceWindowSizeMs(ms: Long): this.type = {
    require(ms > 0, "confidenceWindowSizeMs must be positive"); confidenceMs = ms; this
  }
  def withWorkersCount(n: Int): this.type = {
    require(n > 0, "workersCount must be positive"); workersCount = Some(n); this
  }
  def withWorkerRetryBackoff(b: RetryBackoff): this.type = { backoff = b; this }
  def withCheckpointLocation(path: String): this.type = { checkpointLocation = Some(path); this }
  def withQueryName(name: String): this.type = { queryName = name; this }

  def build(): GraftCdcConsumer = {
    require(source != null, "withSource is required")
    new GraftCdcConsumer(spark, source, consumer, queryWindowMs, confidenceMs,
      workersCount, backoff, checkpointLocation, queryName)
  }
}

/** A started consumer owns one StreamingQuery (the reference's
  * master+worker thread group). */
final class GraftCdcConsumer private[streaming] (
    spark: SparkSession,
    source: Dataset[Change],
    consumer: CdcStreamConsumer.Delivered => Unit,
    queryWindowMs: Long,
    confidenceMs: Long,
    workersCount: Option[Int],
    backoff: RetryBackoff,
    checkpointLocation: Option[String],
    queryName: String) extends AutoCloseable {

  private var query: StreamingQuery = _

  /** The delivery pipeline as a streaming Dataset (composable; start()
    * wires it to the callback sink). The event-time watermark IS the
    * confidence window: a change is delivered only once the watermark
    * (max event time − confidence) passes it, so reordered arrivals
    * within the window are merged back into ChangeId order — the
    * reference's "don't read the last confidenceWindow of the log"
    * bound (WorkerConfiguration.confidenceWindowSizeMs). */
  def delivered: Dataset[Delivered] = {
    // workersCount = ingestion parallelism, applied as an explicit
    // stream-keyed repartition scoped to THIS query's plan (a global
    // spark.sql.shuffle.partitions mutation would leak to every other
    // query on the session and break under interleaved consumers)
    val src = workersCount
      .map(n => source.repartition(n, source("streamId")))
      .getOrElse(source)
    CdcStreamConsumer.consumeConfident(spark, src, confidenceMs)
  }

  /** Starts delivery to the callback. Callback mode mirrors the
    * reference's single-JVM RawChangeConsumer — changes funnel to the
    * driver in order (collect), which is the semantics the reference
    * offers. For 100 TB pipelines, consume [[delivered]] directly with
    * a distributed sink instead; the callback path is the
    * compatibility surface, not the scale path.
    *
    * Failure semantics: a failing micro-batch is retried with the
    * configured backoff and REPLAYED to the callback from its first
    * change — at-least-once on failure, exactly like the reference
    * worker re-reading its window after an error. Only non-fatal
    * errors retry; interrupts (query.stop()) propagate immediately. */
  def start(): StreamingQuery = synchronized {
    require(query == null, "already started")
    val cb = consumer
    val bo = backoff
    var writer = delivered.writeStream
      .queryName(queryName)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(queryWindowMs))
      .foreachBatch { (batch: Dataset[Delivered], _: Long) =>
        // per-micro-batch retry with the configured backoff schedule
        // (reference: Worker loop + ExponentialRetryBackoffWithJitter)
        var attempt = 0
        var done = false
        while (!done) {
          try {
            batch.orderBy(col("streamId"), col("seqNo"))
              .collect().foreach(cb)
            done = true
          } catch {
            case e: Throwable if scala.util.control.NonFatal(e) && attempt < 5 =>
              Thread.sleep(bo.getRetryBackoffTimeMs(attempt).toLong)
              attempt += 1
          }
        }
      }
    checkpointLocation.foreach(p => writer = writer.option("checkpointLocation", p))
    query = writer.start()
    query
  }

  def processAllAvailable(): Unit = query.processAllAvailable()

  def stop(): Unit = synchronized {
    if (query != null) { query.stop(); query = null }
  }

  override def close(): Unit = stop()
}

object GraftCdcConsumer {
  def builder(spark: SparkSession): GraftCdcConsumerBuilder =
    new GraftCdcConsumerBuilder(spark)
}
