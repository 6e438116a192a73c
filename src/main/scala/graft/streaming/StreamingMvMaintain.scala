package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** STREAMING twin of [[graft.cdc.CdcOps.mvMaintainFromLog]] (SURVEY
  * §5 sketch, made concrete): continuously maintain the aggregate MV
  * `bucket → (COUNT(*), SUM(value))` over the live LWW table from the
  * CDC stream, with per-batch cost O(batch + touched keys + |MV|) —
  * never a log replay.
  *
  * Composition is the whole design: the KEY state is exactly
  * [[StreamingSnapshotMerge]]'s snapshot (reduce → idempotent
  * out-of-order-safe merge), and the MV delta per batch is the batch
  * operator's algebra — for every key the batch TOUCHED, retract its
  * pre-merge contribution and insert its post-merge contribution.
  * Because the contribution is read from the MERGED state (not the
  * batch row), a stale or replayed change whose merge is a no-op
  * produces a zero delta: the MV inherits the snapshot's idempotency
  * and late-arrival safety instead of re-deriving them.
  *
  * Arithmetic is the batch operator's exact integer cents, so the
  * maintained MV is bit-equal to a full recompute at every batch
  * boundary (spec-asserted against [[graft.cdc.CdcOps
  * .mvMaintainFromLog]] and a local replay). */
object StreamingMvMaintain {

  val mvSchema: StructType = StructType(Seq(
    StructField("bucket", LongType),
    StructField("n_rows", LongType),
    StructField("cents", LongType)))

  def emptyMv(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], mvSchema)

  /** A live snapshot row's MV contribution: (bucket, +1, +cents). */
  private def contributions(liveState: DataFrame, sign: Int): DataFrame =
    liveState
      .withColumn("c", (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .select(expr(graft.cdc.CdcOps.floorDivSql("c", graft.cdc.CdcOps.MvBucketCents)).as("bucket"),
        lit(sign.toLong).as("d_n"), (col("c") * sign).as("d_cents"))

  /** Apply one batch's worth of deltas: retract the touched keys'
    * contributions from the PRE-merge state, insert them from the
    * POST-merge state, fold into the MV, drop emptied buckets. */
  def applyBatch(mv: DataFrame, preState: DataFrame, postState: DataFrame,
      touched: DataFrame): DataFrame = {
    def live(s: DataFrame): DataFrame =
      s.filter(!col("deleted")).join(touched, Seq("user_id"), "left_semi")
    val delta = contributions(live(preState), -1)
      .unionByName(contributions(live(postState), 1))
      .groupBy(col("bucket"))
      .agg(sum(col("d_n")).as("d_n"), sum(col("d_cents")).as("d_cents"))
    mv.join(delta, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n_rows"),
        (coalesce(col("cents"), lit(0L)) + coalesce(col("d_cents"), lit(0L))).as("cents"))
      .filter(col("n_rows") > 0)
  }

  /** Driver-held MV for specs/smoke runs (production swaps into a
    * transactional table bucketed on `bucket`). */
  final class InMemoryMvStore(spark: SparkSession) {
    @volatile private var current: DataFrame = emptyMv(spark)
    def read(): DataFrame = current
    /** The MV as a consumer reads it: (bucket, n_rows, sum_value). */
    def readView(): DataFrame = current
      .select(col("bucket"), col("n_rows"),
        (col("cents").cast("double") / 100.0).as("sum_value"))
      .orderBy(col("bucket"))
    def swap(next: DataFrame): Unit = { current = next }
  }

  /** Attach the maintainer to a streaming CDC-log DataFrame
    * (conforming columns: user_id, event_id, time_us, cdc_operation,
    * value, props). Each micro-batch: reduce → merge key state → MV
    * deltas from pre/post state at the touched keys → swap both. */
  def attach(changes: DataFrame, keyStore: StreamingSnapshotMerge.InMemorySnapshotStore,
      mvStore: InMemoryMvStore): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        val reduced = StreamingSnapshotMerge.reduceSlice(df).localCheckpoint()
        val pre = keyStore.read()
        val post = StreamingSnapshotMerge.mergeReduced(pre, reduced).localCheckpoint()
        val touched = reduced.select(col("user_id"))
        mvStore.swap(applyBatch(mvStore.read(), pre, post, touched).localCheckpoint())
        keyStore.swap(post)
      }
      .start()
}
