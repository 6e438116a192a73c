package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** [[StreamingDedup]] must collapse content duplicates to their first
  * sighting across micro-batches while the watermark keeps them in
  * state, and keep distinct content flowing untouched. */
class StreamingDedupSpec extends SparkSpec {

  private def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)

  test("cross-batch duplicates inside the watermark collapse to first sighting") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val sink = s"dedup_sink_${System.nanoTime()}"
    val q = StreamingDedup.dedup(
        input.toDF().toDF("doc_id", "text", "ts"), "ts", "10 seconds")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      input.addData((1L, "alpha body", ts(0)), (2L, "beta body", ts(1)))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate of doc 1 plus fresh content
      input.addData((3L, "alpha body", ts(2)), (4L, "gamma body", ts(3)))
      q.processAllAvailable()
      // batch 3: a same-batch duplicate pair
      input.addData((5L, "delta body", ts(4)), (6L, "delta body", ts(5)))
      q.processAllAvailable()
      val got = spark.table(sink)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L, 4L, 5L))
    } finally q.stop()
  }
}
