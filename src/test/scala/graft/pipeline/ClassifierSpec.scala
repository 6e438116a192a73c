package graft.pipeline

import graft.SparkSpec

/** Behavioral spec for [[Classifier]] — the driver's oracle pins the
  * arithmetic on the (signal-free) synthetic corpus; this spec drives
  * a corpus with a REAL provenance signal and proves the learned
  * model actually separates it: ref-exclusive vocabulary trains to
  * w ≈ 1, raw-exclusive to w ≈ 0, shared to w ≈ ½, scores split the
  * classes across the ½ threshold, and DSIR selection recovers every
  * reference document. */
class ClassifierSpec extends SparkSpec {

  // 40 reference docs (src0 ∈ RefSources) built from {refa refb common},
  // 160 raw docs (src9 ∉ RefSources) from {rawa rawb common}: class-
  // exclusive vocabulary at high df (smoothing negligible) plus one
  // shared token that must train to the uninformative midpoint.
  private val NRef = 40
  private val NRaw = 160
  private val NEmpty = 2 // zero-token docs must keep their rows (score 0)
  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("clfspec").toString
    import spark.implicits._
    val docs =
      (0L until NRef.toLong).map(i => (i, "refa refb common", "src0")) ++
        (1000L until (1000L + NRaw)).map(i => (i, "rawa rawb common", "src9")) ++
        Seq((2000L, "", "src9"), (2001L, "   ", "src9"))
    docs.toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("train: exclusive vocabulary polarizes, shared vocabulary stays at ½") {
    val w = Classifier.train(spark, dir).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Double]("weight")).toMap
    assert(w("refa") > 0.9 && w("refb") > 0.9,
      s"ref-exclusive tokens must train near 1, got $w")
    assert(w("rawa") < 0.1 && w("rawb") < 0.1,
      s"raw-exclusive tokens must train near 0, got $w")
    assert(math.abs(w("common") - 0.5) < 0.01,
      s"a token present in every doc must sit at the balanced midpoint, got ${w("common")}")
    // |w − ½| ranks the model: both exclusive pairs ahead of `common`
    val order = Classifier.train(spark, dir).collect().map(_.getAs[String]("token"))
    assert(order.last == "common", s"least discriminative token must rank last: ${order.toSeq}")
  }

  test("score: classes separate across the ½ threshold; predictions match provenance") {
    val rows = Classifier.score(spark, dir).collect()
    assert(rows.length == NRef + NRaw + NEmpty,
      "zero-token docs must keep their rows — an explode drops them, the doc-meta join must not")
    rows.foreach { r =>
      val isRef = r.getAs[Boolean]("is_ref")
      val score = r.getAs[Double]("score")
      if (r.getAs[Long]("n_tokens") == 0L)
        assert(score == 0.0, s"empty doc must score 0, got $score")
      else assert(if (isRef) score > 0.5 else score < 0.5,
        s"doc ${r.getAs[Long]("doc_id")} (is_ref=$isRef) scored $score")
      assert(r.getAs[Boolean]("predicted_ref") == isRef)
      assert(r.getAs[Long]("n_known") == r.getAs[Long]("n_tokens"),
        "the whole 5-token vocabulary fits the model — no unknown tokens here")
    }
  }

  test("sweep: confusion rows are complete and perfect at the midpoint") {
    val rows = Classifier.classifierSweep(spark, dir).collect()
    assert(rows.map(_.getAs[Double]("threshold")).toSeq == Classifier.ScoreSweep)
    rows.foreach { r =>
      val total = Seq("tp", "fp", "fn", "tn").map(r.getAs[Long]).sum
      assert(total == NRef + NRaw + NEmpty, s"confusion must partition the corpus: $r")
    }
    val mid = rows.find(_.getAs[Double]("threshold") == 0.5).get
    assert(mid.getAs[Long]("tp") == NRef && mid.getAs[Long]("tn") == NRaw + NEmpty &&
      mid.getAs[Long]("fp") == 0L && mid.getAs[Long]("fn") == 0L,
      s"perfectly separable corpus must score a perfect midpoint confusion: $mid")
    assert(mid.getAs[Double]("precision") == 1.0 && mid.getAs[Double]("recall") == 1.0)
  }

  test("by-source report: keep rates split cleanly along the class boundary") {
    val rows = Classifier.classifierBySource(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_keep"),
          r.getAs[Double]("keep_rate"), r.getAs[Double]("mean_score"))).toMap
    assert(rows.keySet == Set("src0", "src9"))
    val (refDocs, refKeep, refRate, refMean) = rows("src0")
    val (rawDocs, rawKeep, rawRate, rawMean) = rows("src9")
    assert(refDocs == NRef && refKeep == NRef && refRate == 1.0)
    assert(rawDocs == NRaw + NEmpty && rawKeep == 0L && rawRate == 0.0)
    assert(refMean > 0.5 && rawMean < 0.5)
  }

  test("deployed model: write → load → scoreExpr is bit-equal to the inline scorer") {
    import org.apache.spark.sql.functions._
    val modelPath = java.nio.file.Files.createTempDirectory("clfmodel").toString + "/model"
    Classifier.writeModel(spark, dir, modelPath)
    val model = Classifier.loadModel(spark, modelPath)
    assert(model.size == 5, s"the spec vocabulary is 5 tokens, got ${model.size}")
    val deployed = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), Classifier.scoreExpr(model, col("text")).as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val inline = Classifier.score(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(deployed == inline,
      "the map-literal scorer must reproduce the broadcast-join scorer exactly")
  }

  test("drift: reference-vocabulary churn between halves surfaces at the top, stable tokens near 0") {
    import spark.implicits._
    // early half (doc_id < 100): reference vocabulary 'oldref';
    // late half: the reference slice switched to 'newref' — the churn
    // a retrain trigger must surface. 'common'/'rawx' are stable.
    val tmp = java.nio.file.Files.createTempDirectory("clfdrift").toString
    val rows =
      (0L until 50L).map(i => (i, "oldref common", "src0")) ++
        (50L until 100L).map(i => (i, "rawx common", "src9")) ++
        (100L until 150L).map(i => (i, "newref common", "src0")) ++
        (150L until 200L).map(i => (i, "rawx common", "src9"))
    rows.toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val drift = Classifier.classifierDrift(spark, tmp).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Double]("shift"))
    assert(drift.take(2).map(_._1).toSet == Set("oldref", "newref"),
      s"the churned reference vocabulary must lead the report: ${drift.toSeq}")
    val byToken = drift.toMap
    assert(byToken("oldref") < -0.4 && byToken("newref") > 0.4,
      s"old vocab falls to the absent-half prior, new vocab rises from it: $byToken")
    assert(math.abs(byToken("common")) < 0.05 && math.abs(byToken("rawx")) < 0.05,
      s"stable vocabulary must sit near zero shift: $byToken")
  }

  test("dsir: selection recovers every reference doc, target-tilted buckets rank high") {
    val sel = Classifier.dsirSelect(spark, dir).collect()
    assert(sel.length == Classifier.DsirBudget)
    val selectedIds = sel.map(_.getAs[Long]("doc_id")).toSet
    assert((0L until NRef.toLong).forall(selectedIds),
      "every reference doc must make the importance top-k")
    val (refImp, rawImp) = sel.partition(_.getAs[Boolean]("is_ref")) match {
      case (a, b) => (a.map(_.getAs[Double]("importance")),
        b.map(_.getAs[Double]("importance")))
    }
    assert(refImp.min > rawImp.max,
      "reference docs must strictly out-rank raw docs on importance")
  }
}
