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
  *  - addTable / addTables            → addSource(name, changes): several
  *    change Datasets under ONE consumer lifecycle, each its own
  *    StreamingQuery checkpointing independently (the reference runs
  *    one task group per table under one master)
  *  - withConsumer(RawChangeConsumer) → withConsumer(Delivered => Unit),
  *    invoked per change, per stream, in ChangeId order (driver-side
  *    compatibility path) — or withPartitionConsumer for the
  *    executor-side scale path
  *  - withQueryTimeWindowSizeMs       → micro-batch trigger interval
  *    (the worker's bounded read window)
  *  - withConfidenceWindowSizeMs      → event-time watermark delay
  *    (don't trust changes newer than now − confidence; the reference
  *    holds back its window end the same way)
  *  - withWorkersCount                → SOURCE-side ingestion
  *    parallelism (stream-keyed repartition ahead of the stateful
  *    operator). The state exchange itself is sized by
  *    `spark.sql.shuffle.partitions` on the session that starts the
  *    query — set that for per-stream state parallelism; this knob
  *    only shapes how the raw source fans out to readers.
  *  - withWorkerRetryBackoff          → per-micro-batch retry schedule;
  *    withMaxRetryAttempts caps it (the reference retries forever —
  *    the default here too)
  *  - checkpointing (TaskStateBackend)→ withCheckpointLocation: Spark's
  *    state store persists the per-stream lastConsumedChangeId, resume
  *    is exactly the reference's saved-state restart. withStateStore
  *    ADDITIONALLY externalizes per-stream progress to a pluggable
  *    [[CdcStateStore]] after every delivered batch (the reference's
  *    CDCStateStore / Redis example), enabling lag inspection,
  *    cross-cluster resume via [[CdcStreamConsumer.consumeFrom]], and
  *    replay dedupe at the driver callback (effectively-once instead
  *    of at-least-once when a crashed micro-batch replays).
  */
final class GraftCdcConsumerBuilder private[streaming] (spark: SparkSession) {
  private var sources: Vector[(String, Dataset[Change])] = Vector.empty
  private var consumer: Delivered => Unit = _ => ()
  private var consumerSet = false
  private var partitionConsumer: Option[Iterator[Delivered] => Unit] = None
  private var queryWindowMs: Long = 30000L // reference DEFAULT_QUERY_TIME_WINDOW_SIZE_MS
  private var confidenceMs: Long = 30000L  // reference DEFAULT_CONFIDENCE_WINDOW_SIZE_MS
  private var workersCount: Option[Int] = None
  private var backoff: RetryBackoff = new ExponentialRetryBackoffWithJitter(10, 30000, 0.25)
  private var maxRetryAttempts: Int = Int.MaxValue // reference: retry indefinitely
  private var checkpointLocation: Option[String] = None
  private var stateStore: Option[CdcStateStore] = None
  private var queryName: String = s"graft-cdc-${java.util.UUID.randomUUID().toString.take(8)}"

  def withSource(changes: Dataset[Change]): this.type = addSource("default", changes)

  /** Consume another change Dataset under this consumer's lifecycle
    * (reference CDCConsumer.addTables): each named source runs as its
    * own StreamingQuery with independent checkpointing at
    * `<checkpointLocation>/<name>`. */
  def addSource(name: String, changes: Dataset[Change]): this.type = {
    require(!sources.exists(_._1 == name), s"duplicate source name: $name")
    sources :+= (name, changes); this
  }
  def withConsumer(c: Delivered => Unit): this.type = { consumer = c; consumerSet = true; this }

  /** Executor-side delivery (the 100 TB path): the function runs ONCE
    * PER PARTITION ON THE EXECUTORS, each partition carrying complete
    * streams in (streamId, seqNo) order — no driver round-trip.
    * Mutually exclusive with the driver-side withConsumer callback. */
  def withPartitionConsumer(c: Iterator[Delivered] => Unit): this.type = {
    partitionConsumer = Some(c); this
  }
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

  /** Cap micro-batch delivery retries (default: unbounded, like the
    * reference worker's backoff loop). After the cap the streaming
    * query fails — divergence from the reference only when set. */
  def withMaxRetryAttempts(n: Int): this.type = {
    require(n > 0, "maxRetryAttempts must be positive"); maxRetryAttempts = n; this
  }
  def withCheckpointLocation(path: String): this.type = { checkpointLocation = Some(path); this }
  def withStateStore(store: CdcStateStore): this.type = { stateStore = Some(store); this }
  def withQueryName(name: String): this.type = { queryName = name; this }

  def build(): GraftCdcConsumer = {
    require(sources.nonEmpty, "withSource/addSource is required")
    require(partitionConsumer.isEmpty || !consumerSet,
      "withConsumer and withPartitionConsumer are mutually exclusive — " +
        "the driver callback would be silently ignored")
    new GraftCdcConsumer(spark, sources, consumer, partitionConsumer, queryWindowMs,
      confidenceMs, workersCount, backoff, maxRetryAttempts, checkpointLocation,
      stateStore, queryName)
  }
}

/** A started consumer owns one StreamingQuery PER SOURCE (the
  * reference's master + per-table worker groups). */
final class GraftCdcConsumer private[streaming] (
    spark: SparkSession,
    sources: Vector[(String, Dataset[Change])],
    consumer: CdcStreamConsumer.Delivered => Unit,
    partitionConsumer: Option[Iterator[Delivered] => Unit],
    queryWindowMs: Long,
    confidenceMs: Long,
    workersCount: Option[Int],
    backoff: RetryBackoff,
    maxRetryAttempts: Int,
    checkpointLocation: Option[String],
    stateStore: Option[CdcStateStore],
    queryName: String) extends AutoCloseable {

  private var running: Vector[StreamingQuery] = Vector.empty

  /** The delivery pipeline of the FIRST source as a streaming Dataset
    * (composable; start() wires every source to the sink). The
    * event-time watermark IS the confidence window: a change is
    * delivered only once the watermark (max event time − confidence)
    * passes it, so reordered arrivals within the window are merged
    * back into ChangeId order — the reference's "don't read the last
    * confidenceWindow of the log" bound
    * (WorkerConfiguration.confidenceWindowSizeMs). */
  def delivered: Dataset[Delivered] = deliveredFor(sources.head._2)

  /** [[delivered]] for a named source. */
  def delivered(name: String): Dataset[Delivered] =
    deliveredFor(sources.find(_._1 == name)
      .getOrElse(throw new IllegalArgumentException(s"no source named $name"))._2)

  private def deliveredFor(source: Dataset[Change]): Dataset[Delivered] = {
    // workersCount = SOURCE-side ingestion parallelism, applied as an
    // explicit stream-keyed repartition scoped to THIS query's plan (a
    // global spark.sql.shuffle.partitions mutation would leak to every
    // other query on the session). The stateful exchange downstream is
    // sized by the session's shuffle partitions, not by this knob.
    val src = workersCount
      .map(n => source.repartition(n, source("streamId")))
      .getOrElse(source)
    CdcStreamConsumer.consumeConfident(spark, src, confidenceMs)
  }

  /** Deliver one micro-batch with the configured retry schedule
    * (reference: Worker loop + ExponentialRetryBackoffWithJitter).
    * Only non-fatal errors retry; interrupts (query.stop())
    * propagate immediately. */
  private def deliverWithRetry(batch: Dataset[Delivered]): Unit = {
    val cb = consumer
    val pc = partitionConsumer
    var attempt = 0
    var done = false
    while (!done) {
      try {
        pc match {
          case Some(sink) =>
            // executor-side: complete streams per partition, ordered —
            // per-stream order holds because the hash repartition puts a
            // stream's rows in one partition and the sort orders them
            batch.repartition(col("streamId"))
              .sortWithinPartitions(col("streamId"), col("seqNo"))
              .foreachPartition((it: Iterator[Delivered]) => sink(it))
          case None =>
            // driver-side compatibility path (reference single-JVM
            // RawChangeConsumer): ordered collect + callback. With an
            // external state store attached, rows at or below the
            // store's per-stream high-water mark are skipped — a
            // micro-batch REPLAYED after a crash (its delivery
            // succeeded but the streaming commit didn't) is not
            // re-delivered: effectively-once to the callback instead
            // of at-least-once. The mark is the CHANGE ID
            // (timeUs, eventId), never seqNo: seqNo is minted by the
            // streaming state store and restarts at 1 under a fresh
            // checkpoint dir, so a new query resuming against a
            // populated external store would silently drop every
            // change whose restarted seqNo is below the stored one.
            val rows = batch.orderBy(col("streamId"), col("seqNo")).collect()
            val fresh = stateStore match {
              case Some(s) => rows.filter(d => s.get(d.streamId).forall(p =>
                d.timeUs > p.lastTimeUs ||
                  (d.timeUs == p.lastTimeUs && d.eventId > p.lastEventId)))
              case None => rows
            }
            fresh.foreach(cb)
        }
        stateStore.foreach(s => CdcCheckpoints.record(batch, s))
        done = true
      } catch {
        case e: Throwable if scala.util.control.NonFatal(e) && attempt < maxRetryAttempts =>
          Thread.sleep(backoff.getRetryBackoffTimeMs(attempt).toLong)
          attempt += 1
      }
    }
  }

  /** Starts delivery of every source; returns the primary (first)
    * query. Driver-callback mode mirrors the reference's single-JVM
    * RawChangeConsumer — the scale path is withPartitionConsumer or
    * consuming [[delivered]] directly with a distributed sink.
    *
    * Failure semantics: a failing micro-batch is retried with the
    * configured backoff and REPLAYED to the sink from its first
    * change — at-least-once to the callback, exactly like the
    * reference worker re-reading its window after an error. */
  def start(): StreamingQuery = synchronized {
    require(running.isEmpty, "already started")
    running = sources.map { case (name, source) =>
      var writer = deliveredFor(source).writeStream
        .queryName(if (sources.size == 1) queryName else s"$queryName-$name")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(queryWindowMs))
        .foreachBatch((batch: Dataset[Delivered], _: Long) => deliverWithRetry(batch))
      checkpointLocation.foreach { p =>
        writer = writer.option("checkpointLocation",
          if (sources.size == 1) p else s"$p/$name")
      }
      writer.start()
    }
    running.head
  }

  /** All running queries (one per source). */
  def queries: Seq[StreamingQuery] = running

  def processAllAvailable(): Unit = running.foreach(_.processAllAvailable())

  def stop(): Unit = synchronized {
    running.foreach(_.stop())
    running = Vector.empty
  }

  override def close(): Unit = stop()
}

object GraftCdcConsumer {
  def builder(spark: SparkSession): GraftCdcConsumerBuilder =
    new GraftCdcConsumerBuilder(spark)
}
