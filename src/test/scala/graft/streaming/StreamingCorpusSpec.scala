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

  test("admitScored admits exactly the docs the batch scorer would keep — stateless, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // A persisted model trained elsewhere: ref-ish vocabulary weighted
    // high, crawl-ish low (scale-9 decimals, as writeModel produces).
    def d(s: String) = new java.math.BigDecimal(s)
    val model = Seq(
      "refa" -> d("0.993000000"), "refb" -> d("0.991000000"),
      "rawa" -> d("0.020000000"), "rawb" -> d("0.025000000"))
    val input = MemoryStream[IncomingDoc]
    val name = s"sclf_${System.nanoTime()}"
    val query = StreamingCorpus.admitScored(input.toDS(), model, threshold = 0.5)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(Seq(
        IncomingDoc(1, "refa refb common", 1000),   // (0.993+0.991+0.5)/3 ≈ 0.828 → admit
        IncomingDoc(2, "rawa rawb common", 2000),   // ≈ 0.182 → drop
        IncomingDoc(3, "unseen tokens only", 3000)))// all-unknown → exactly 0.5 → admit
      query.processAllAvailable()
      input.addData(Seq(
        IncomingDoc(4, "rawa rawa rawa", 4000),     // 0.02 → drop
        IncomingDoc(5, "refa", 5000)))              // 0.993 → admit
      query.processAllAvailable()
      val admitted = spark.table(name).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
      assert(admitted.keySet == Set(1L, 3L, 5L), s"got $admitted")
      assert(admitted(3L) == 0.5, "all-unknown docs sit exactly on the prior")
      assert(admitted(1L) == 0.828 && admitted(5L) == 0.993)
    } finally query.stop()
  }

  test("admitUrls passes only the first fetch of each canonical URL, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingCorpus.IncomingUrl]
    val name = s"surls_${System.nanoTime()}"
    val query = StreamingCorpus.admitUrls(input.toDS(), confidenceMs = 60000)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(Seq(
        StreamingCorpus.IncomingUrl(1, "https://example.com/a?id=1", 1000),
        // same page under every decoration, same batch → dropped
        StreamingCorpus.IncomingUrl(2, "HTTPS://WWW.Example.COM:443/a/?id=1&utm_source=x", 2000),
        StreamingCorpus.IncomingUrl(3, "https://example.com/b", 3000)))
      query.processAllAvailable()
      input.addData(Seq(
        // canonical dup of 1 in a LATER batch → state drops it
        StreamingCorpus.IncomingUrl(4, "https://example.com/a?utm_b=y&id=1", 4000),
        // genuinely new page (different kept param) → admitted
        StreamingCorpus.IncomingUrl(5, "https://example.com/a?id=2", 5000)))
      query.processAllAvailable()
      val rows = spark.table(name).collect()
      assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 3L, 5L))
      // the admitted rows carry the canonical form, not the raw fetch
      val canon = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("canonical_url")).toMap
      assert(canon(1L) == "https://example.com/a?id=1")
      assert(canon(5L) == "https://example.com/a?id=2")
    } finally query.stop()
  }

  test("admitIncremental: MemoryStream verdicts match the batch stored-index admission") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col

    // the SAME split dedup_incremental uses at sf0.001: standing corpus
    // = doc_id % 5 != 0, incoming batch = doc_id % 5 == 0
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
    val m = graft.pipeline.Dedup.IncrementalMod
    val corpus = docs.filter(col("doc_id") % m =!= 0).select("doc_id", "text")
    val batch = docs.filter(col("doc_id") % m === 0).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))

    // standing index straight from the signature frames (parquet
    // round-trip is DedupIndexSpec's business)
    val sigs = graft.pipeline.DedupIndex.signatures(corpus).localCheckpoint()
    val index = graft.pipeline.DedupIndex.Standing(
      sigs.select("doc_id", "digest"), sigs.select("doc_id", "sig"))

    val expected = graft.pipeline.DedupIndex
      .admit(docs.filter(col("doc_id") % m === 0).select("doc_id", "text"), index)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap

    val input = MemoryStream[IncomingDoc]
    val name = s"sadmit_${System.nanoTime()}"
    val query = StreamingCorpus.admitIncremental(input.toDS(), index, confidenceMs = 60000)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // arrival order = doc_id order (the batch rule's arrival order),
      // split across two micro-batches so the digest state carries over
      // event times start well above epoch 0: a doc AT the initial
      // watermark (0) would be dropped as late before the stateful op
      val (first, second) = batch.sortBy(_._1).splitAt(batch.length / 2)
      input.addData(first.map { case (id, t) => IncomingDoc(id, t, (id + 1) * 1000000) })
      query.processAllAvailable()
      input.addData(second.map { case (id, t) => IncomingDoc(id, t, (id + 1) * 1000000) })
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table(name).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap

    assert(got.keySet == expected.keySet, "streamed verdict set differs")
    got.foreach { case (id, reason) =>
      expected(id) match {
        // within-window near pairs between two STREAM docs are the
        // batch backfill's call by design — the stream keeps them
        case "near_batch" => assert(reason == "kept", s"doc $id: $reason")
        case exp          => assert(reason == exp, s"doc $id: got $reason, want $exp")
      }
    }
    // fixture must actually exercise every in-scope verdict class
    assert(Set("exact_corpus", "near_corpus", "kept").subsetOf(expected.values.toSet)
      || expected.values.toSet.contains("near_corpus"), expected.values.toSet.toString)
  }

  test("admitIncremental: exact_batch via digest state, watermark-bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = Seq.fill(5)("the quick brown fox jumps over the lazy dog").mkString(" ")
    val sigs = graft.pipeline.DedupIndex.signatures(
      Seq((1L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text"))
      .localCheckpoint()
    val index = graft.pipeline.DedupIndex.Standing(
      sigs.select("doc_id", "digest"), sigs.select("doc_id", "sig"))
    val input = MemoryStream[IncomingDoc]
    val name = s"sadmit2_${System.nanoTime()}"
    val query = StreamingCorpus.admitIncremental(input.toDS(), index, confidenceMs = 60000)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(Seq(IncomingDoc(10, text, 1000)))
      query.processAllAvailable()
      // later micro-batch, same digest: the stream's own state flags it
      input.addData(Seq(IncomingDoc(11, text, 2000)))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table(name).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
    assert(got == Map(10L -> "kept", 11L -> "exact_batch"))
  }

  test("admitIncremental: no stream-static join side carries a mandatory broadcast hint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sigs = graft.pipeline.DedupIndex.signatures(
      Seq((1L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text"))
    val index = graft.pipeline.DedupIndex.Standing(
      sigs.select("doc_id", "digest"), sigs.select("doc_id", "sig"))
    val input = MemoryStream[IncomingDoc]
    val out = StreamingCorpus.admitIncremental(input.toDS(), index, confidenceMs = 60000)
    // the standing index grows O(corpus): a forced broadcast hint here
    // is the TB-broadcast-per-query-start posture SURVEY §5 forbids —
    // AQE/stats must own the join strategy
    val hints = out.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, s"mandatory join hints found in plan: $hints")
  }

  test("admitMaintained: a later micro-batch near-hits an earlier batch's survivor via the persisted index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files.createTempDirectory("graft_admit_maint").toString
    val seed = Seq.fill(5)("the quick brown fox jumps over the lazy dog").mkString(" ")
    val fresh = Seq.fill(5)("pack my box with five dozen liquor jugs today").mkString(" ")
    graft.pipeline.DedupIndex.write(Seq((1L, seed)).toDF("doc_id", "text"), path)

    val buf = scala.collection.mutable.Map[Long, String]()
    val input = MemoryStream[IncomingDoc]
    val query = StreamingCorpus.admitMaintained(input.toDS(), path, (v, _) =>
      v.collect().foreach(r =>
        buf.synchronized { buf(r.getAs[Long]("doc_id")) = r.getAs[String]("reason") }))
    try {
      // batch 1: a fresh survivor + an exact dup of the seeded corpus
      input.addData(Seq(IncomingDoc(10, fresh, 1000), IncomingDoc(11, seed, 2000)))
      query.processAllAvailable()
      // batch 2: near-dup and exact dup of batch 1's SURVIVOR — both
      // must hit through the parquet index alone (no state store)
      input.addData(Seq(
        IncomingDoc(20, fresh + " extra", 3000),
        IncomingDoc(21, fresh, 4000),
        IncomingDoc(22, Seq.fill(5)("sphinx of black quartz judge my vow forever").mkString(" "), 5000)))
      query.processAllAvailable()
    } finally query.stop()
    assert(buf.toMap == Map(
      10L -> "kept", 11L -> "exact_corpus",
      20L -> "near_corpus", 21L -> "exact_corpus", 22L -> "kept"))
    // and the index grew by exactly the survivors
    val stored = spark.read.parquet(path).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stored == Set(1L, 10L, 22L))
  }

  test("admitVectors: streaming semantic admission matches a batch probe of the stored ANN index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // standing index over the real embeddings table
    val emb = graft.Tables.spread(graft.Tables.embeddings(spark, "/root/testdata/sf0.001"))
    val path = java.nio.file.Files.createTempDirectory("graft_vec_admit").toString
    graft.pipeline.AnnIndex.write(emb, path)
    val idx = graft.pipeline.AnnIndex.load(spark, path)

    // probes: a near-copy of a stored vector (id 900001 ≈ stored 42)
    // and that copy rotated far away (id 900002); fresh ids so the
    // batch cross-check can't self-match
    val base = emb.filter(col("vec_id") === 42).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    // round both probes through float so the stream (raw doubles) and
    // the batch query frame (float column) see identical values
    val near = base.map(x => (x * 1.001).toFloat.toDouble)
    val far = base.reverse.zipWithIndex
      .map { case (x, i) => (if (i % 2 == 0) -x else x).toFloat.toDouble }
    val queries = Seq((900001L, near.toSeq), (900002L, far.toSeq))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("float")).as("embedding"))

    // batch ground truth from the SAME index: min ADC distance per query
    val batch = graft.pipeline.AnnIndex.search(queries, idx, topK = 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("approx_dist2")).toMap
    assert(batch.keySet == Set(900001L, 900002L))
    assert(batch(900001L) < batch(900002L), s"fixture not separable: $batch")
    val delta = (batch(900001L) + batch(900002L)) / 2.0

    val input = MemoryStream[StreamingCorpus.IncomingVec]
    val name = s"svecadmit_${System.nanoTime()}"
    val query = StreamingCorpus
      .admitVectors(input.toDS(), idx, maxDist2 = delta)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(Seq(
        StreamingCorpus.IncomingVec(900001L, near.toSeq, 1000),
        StreamingCorpus.IncomingVec(900002L, far.toSeq, 2000)))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table(name).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("min_dist2"), r.getAs[Boolean]("keep")))).toMap
    // the streamed min distance is the batch top-1 distance, verdicts split at δ
    assert(got(900001L) == ((batch(900001L), false)), s"near: ${got(900001L)}")
    assert(got(900002L) == ((batch(900002L), true)), s"far: ${got(900002L)}")
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

  test("trendingTokens finalizes per-window counts; trendingTopK ranks closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IncomingDoc]
    val name = s"strend_${System.nanoTime()}"
    val WinMs = 10000L
    // watermark = max event − confidence; window [0,10s) closes once an
    // event ≥ 11s arrives (confidence 1s)
    val query = StreamingCorpus.trendingTokens(input.toDS(), WinMs, confidenceMs = 1000)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(Seq(
        IncomingDoc(1, "spark spark flink", 1000000),
        IncomingDoc(2, "spark beam", 2000000),
        IncomingDoc(3, "flink", 9000000)))
      query.processAllAvailable()
      // window [0,10s) not closed yet: nothing finalized in append mode
      assert(spark.table(name).isEmpty)
      input.addData(Seq(IncomingDoc(4, "late window sentinel", 12000000)))
      query.processAllAvailable()
      val finalized = spark.table(name)
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
      // exactly the first window's counts, nothing from the open one
      assert(finalized.map(_._1).toSet == Set(0L))
      assert(finalized.map(t => (t._2, t._3)).toSet ==
        Set(("spark", 3L), ("flink", 2L), ("beam", 1L)))

      val top2 = StreamingCorpus.trendingTopK(spark.table(name), 2)
        .collect().map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
      assert(top2.toSeq == Seq(("spark", 3L, 1), ("flink", 2L, 2)))
    } finally query.stop()
  }
}
