package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingCorpus.IncomingDoc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Specs for [[StreamingCorpus]]: the streaming ingest twins must make
  * the same keep/flag decisions as their batch counterparts. */
class StreamingCorpusSpec extends SparkSpec {

  test("dedupExact emits only the first copy of each digest, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IncomingDoc]
    val name = s"sdedup_${System.nanoTime()}"
    val query = StreamingCorpus.dedupExact(input.toDS(), confidenceMs = 60000)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(Seq(
        IncomingDoc(1, "alpha beta", 1000),
        IncomingDoc(2, "alpha beta", 2000),   // dup of 1, same batch
        IncomingDoc(3, "gamma delta", 3000)))
      query.processAllAvailable()
      input.addData(Seq(
        IncomingDoc(4, "alpha beta", 4000),   // dup of 1, later batch
        IncomingDoc(5, "epsilon", 5000)))
      query.processAllAvailable()
      val kept = spark.table(name).collect().map(_.getAs[Long]("doc_id")).toSet
      assert(kept == Set(1L, 3L, 5L))
    } finally query.stop()
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val benchmark = Seq(
      (100L, "the quick brown fox jumps"),
      (200L, "pack my box with five dozen jugs")).toDF("doc_id", "text")
    val input = MemoryStream[IncomingDoc]
    val name = s"sdecon_${System.nanoTime()}"
    val query = StreamingCorpus
      .decontaminate(input.toDS(), benchmark, shingleWords = 3, confidenceMs = 60000)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(Seq(
        IncomingDoc(1, "i saw the quick brown fox yesterday", 1000), // shares "the quick brown"
        IncomingDoc(2, "completely unrelated text here now", 2000),
        IncomingDoc(3, "with five dozen jugs of wine", 3000),        // shares "with five dozen"
        IncomingDoc(4, "too short", 4000)))                          // under shingle size
      query.processAllAvailable()
      val flagged = spark.table(name).collect().map(_.getAs[Long]("doc_id")).toSet
      assert(flagged == Set(1L, 3L))
    } finally query.stop()
  }

  test("contaminationHits emits one row per shared 4-gram, across batches, stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val benchmark = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (200L, "one two three four")).toDF("bench_id", "text")
    val input = MemoryStream[(Long, String)]
    val name = s"shits_${System.nanoTime()}"
    val query = StreamingCorpus.contaminationHits(
        input.toDF().toDF("doc_id", "text"), benchmark)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(
        (1L, "prefix alpha beta gamma delta suffix"), // hits bench 100
        (2L, "totally unrelated words here now"))     // clean
      query.processAllAvailable()
      input.addData(
        (3L, "zero one two three four five"))         // hits bench 200
      query.processAllAvailable()
      val got = spark.table(name)
        .select("doc_id", "bench_id", "shingle").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == Set(
        (1L, 100L, "alpha beta gamma delta"),
        (3L, 200L, "one two three four")))
    } finally query.stop()
  }
}
