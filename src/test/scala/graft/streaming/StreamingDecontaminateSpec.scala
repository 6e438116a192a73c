package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** [[StreamingDecontaminate]] must emit a hit per (doc, benchmark doc,
  * shared 4-gram) as docs arrive, stay silent for clean docs, and keep
  * working across micro-batches (stateless stream-static join). */
class StreamingDecontaminateSpec extends SparkSpec {

  test("stream docs sharing a 4-gram with the static benchmark are flagged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val benchmark = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (200L, "one two three four")).toDF("bench_id", "text")
    val input = MemoryStream[(Long, String)]
    val sink = s"decon_sink_${System.nanoTime()}"
    val q = StreamingDecontaminate.hits(
        input.toDF().toDF("doc_id", "text"), benchmark)
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      input.addData(
        (1L, "prefix alpha beta gamma delta suffix"), // hits bench 100
        (2L, "totally unrelated words here now"))     // clean
      q.processAllAvailable()
      input.addData(
        (3L, "zero one two three four five"))         // hits bench 200
      q.processAllAvailable()
      val got = spark.table(sink)
        .select("doc_id", "bench_id", "shingle").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == Set(
        (1L, 100L, "alpha beta gamma delta"),
        (3L, 200L, "one two three four")))
    } finally q.stop()
  }
}
