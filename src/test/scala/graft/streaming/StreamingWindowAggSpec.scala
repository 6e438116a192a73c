package graft.streaming

import graft.SparkSpec
import graft.streaming.CdcStreamConsumer.Change
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Spec for [[StreamingWindowAgg]]: watermarked tumbling windows close
  * only after the watermark passes (the confidence-window bound), and
  * the per-window counts match the batch windowScan arithmetic. */
class StreamingWindowAggSpec extends SparkSpec {

  test("windows emit after watermark passes and aggregate per stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val name = s"wagg_${System.nanoTime()}"
    val windowMs = 1000L
    val query = StreamingWindowAgg
      .windowedCounts(spark, input.toDS(), windowMs, confidenceMs = 100)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // window [0,1000): 3 changes on stream 1, 1 on stream 2
      input.addData(Seq(
        Change(1, 100000, 1, 2, 0.0), Change(1, 500000, 2, 1, 0.0),
        Change(1, 900000, 3, 3, 0.0), Change(2, 400000, 4, 2, 0.0)))
      query.processAllAvailable()
      // advance event time far past window end + watermark → closes window 0
      input.addData(Seq(Change(1, 5000000, 9, 2, 0.0)))
      query.processAllAvailable()
      input.addData(Seq(Change(1, 9000000, 10, 2, 0.0)))
      query.processAllAvailable()

      val rows = spark.table(name).collect()
        .map(r => (r.getAs[Long]("streamId"), r.getAs[Long]("n_changes"),
          r.getAs[Long]("n_inserts"), r.getAs[Long]("n_updates"), r.getAs[Long]("n_deletes")))
      assert(rows.contains((1L, 3L, 1L, 1L, 1L))) // stream 1, window 0
      assert(rows.contains((2L, 1L, 1L, 0L, 0L))) // stream 2, window 0
    } finally query.stop()
  }
}
