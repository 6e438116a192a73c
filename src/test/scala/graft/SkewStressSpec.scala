package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew stress tier (round-8 verdict directive #5): SURVEY §5 claims
  * a set of operators are skew-safe by construction — key choice
  * (per-stream hot traffic spread over many USERS), range
  * partitioning (DistributedRanks instead of hot-key rank windows),
  * df-caps (a viral shingle bounded before pairing), and AQE as the
  * runtime backstop. This suite replays those skew scenarios and
  * turns the posture prose into measured assertions:
  *  - a 10×-hot stream / hot event_type leaves max-task-input/median
  *    BOUNDED on the operator's dominant exchange (task-metrics
  *    listener over the real execution);
  *  - the same data through the WRONG plan (a lone-hot-key window)
  *    measurably pins one task — proving the measurement has teeth;
  *  - AQE skew-split ACTIVATES on the residual-hot-key join shape the
  *    operators would fall back to.
  * Thresholds are wide (balanced ≤ 4 vs pinned ≥ 6, measured ≈ 1-3 vs
  * ≈ 16-30 at 32 partitions) so VM noise can't flap them. */
class SkewStressSpec extends SparkSpec {

  /** Per-task shuffle-read bytes, grouped by stage. */
  private final class TaskInputListener extends SparkListener {
    val byStage = scala.collection.concurrent.TrieMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null)
        byStage.getOrElseUpdate(t.stageId,
          scala.collection.mutable.ArrayBuffer.empty[Long]) += m.shuffleReadMetrics.totalBytesRead
    }
  }

  /** Run `action`, return max/median per-task shuffle-read of the
    * heaviest exchange stage with ≥ 8 tasks. */
  private def maxOverMedian(action: => Unit): Double = {
    val l = new TaskInputListener
    spark.sparkContext.addSparkListener(l)
    try { action } finally {
      // listener delivery is async and the bus has no public flush:
      // poll until the observed task counts go quiet for FOUR
      // consecutive 200 ms samples (a loaded VM's listener bus can lag
      // well past one), bounded by a generous 30 s deadline so a wedged
      // bus fails the stage-count assertion below instead of hanging
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var last = -1
      var same = 0
      while (same < 4 && System.nanoTime() < deadline) {
        val now = l.byStage.values.map(_.size).sum
        if (now == last) same += 1 else { same = 0; last = now }
        Thread.sleep(200)
      }
      spark.sparkContext.removeSparkListener(l)
    }
    val candidates = l.byStage.values.filter(ts => ts.size >= 8 && ts.sum > 0)
    assert(candidates.nonEmpty, "no multi-task exchange stage observed")
    val heaviest = candidates.maxBy(_.sum).sorted
    val median = math.max(heaviest(heaviest.size / 2).toDouble, 1.0)
    heaviest.last / median
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Skewed lake: one stream (user ≡ 0 mod 64) carries 50% of the log
    * — spread over 1000 distinct users, the reference's hot-vnode
    * scenario; one event_type ("view") carries 50% of rows. */
  private lazy val skewDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    val n = 400000L
    spark.range(n).select(
      col("id").as("event_id"),
      timestamp_micros(lit(800000000000000L) + col("id") * 400000L).as("ts"),
      when(col("id") % 2 === 0, (col("id") / 2 % 1000) * 64)
        .otherwise((col("id") % 63 + 1) + (col("id") % 997) * 64).as("user_id"),
      when(col("id") % 2 === 0, lit("view"))
        .otherwise(element_at(array(lit("click"), lit("purchase"), lit("login"),
          lit("logout")), (col("id") % 4 + 1).cast("int"))).as("event_type"),
      (col("id") % 1000).cast("double").as("value"),
      lit("""{"k":1}""").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // viral-shingle corpus: every doc shares one 4-word boilerplate
    // shingle (f = 1000 → f² = 1M pairs if uncapped) + unique content
    spark.range(5000).select(
      col("id").as("doc_id"), lit("web").as("source"), lit("en").as("lang"),
      concat(lit("the quick brown fox "),
        array_join(transform(sequence(lit(0), lit(40)),
          i => concat(lit("w"), ((col("id") * 131 + i * 17) % 99991).cast("string"))), " "))
        .as("text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // coalescing OFF for the balance measurements: AQE's
  // parallelismFirst coalesce folds these small test shuffles to
  // local[4]'s parallelism, which hides the per-partition histogram
  // the tests measure — the claim under test is the KEY CHOICE's
  // balance at a fixed partition count, not AQE's coalescer
  private val balancedConfs = Seq(
    "spark.sql.shuffle.partitions" -> "32",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

  test("replicate_lww: a 50%-hot stream balances across the user-keyed exchange") {
    withConfs(balancedConfs: _*) {
      val r = maxOverMedian {
        graft.cdc.CdcOps.replicateLww(spark, skewDir)
          .write.format("noop").mode("overwrite").save()
      }
      info(s"replicate_lww max/median = $r")
      assert(r <= 4.0, s"replicate_lww max/median task input $r — hot stream pinned a task")
    }
  }

  test("q_sessionize: a 50%-hot stream balances across the user-keyed session window") {
    withConfs(balancedConfs: _*) {
      val r = maxOverMedian {
        graft.analytics.Queries.qSessionize(spark, skewDir)
          .write.format("noop").mode("overwrite").save()
      }
      info(s"q_sessionize max/median = $r")
      assert(r <= 4.0, s"q_sessionize max/median task input $r — hot stream pinned a task")
    }
  }

  test("q_percentiles: a 50%-hot event_type balances across the range-partitioned ranks") {
    withConfs(balancedConfs: _*) {
      val r = maxOverMedian {
        graft.analytics.Queries.qPercentiles(spark, skewDir)
          .write.format("noop").mode("overwrite").save()
      }
      info(s"q_percentiles max/median = $r")
      assert(r <= 4.0, s"q_percentiles max/median task input $r — hot type pinned a task")
    }
  }

  test("dedup_ngram_jaccard: a viral shingle stays bounded through the df-capped index") {
    withConfs(balancedConfs: _*) {
      val r = maxOverMedian {
        graft.pipeline.Dedup.ngramJaccard(spark, skewDir)
          .write.format("noop").mode("overwrite").save()
      }
      info(s"ngram_jaccard max/median = $r")
      assert(r <= 6.0, s"ngram_jaccard max/median task input $r — viral shingle pinned a task")
    }
  }

  test("teeth: the same hot-type data through a lone-hot-key window DOES pin a task") {
    withConfs(balancedConfs: _*) {
      import org.apache.spark.sql.expressions.Window
      val r = maxOverMedian {
        Tables.events(spark, skewDir)
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("event_type"))
              .orderBy(col("value"), col("event_id"))))
          .filter(col("rn") === 1)
          .write.format("noop").mode("overwrite").save()
      }
      info(s"hot-key window max/median = $r")
      assert(r >= 6.0, s"expected the anti-pattern to pin a task, max/median was $r")
    }
  }

  test("AQE skew-split activates on the residual hot-key join shape") {
    withConfs(
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "200k",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100k") {
      val pad = "x" * 100
      val left = spark.range(300000).select(
        when(col("id") % 2 === 0, 0L).otherwise(col("id") % 10000 + 1).as("k"),
        concat(lit(pad), col("id")).as("payload"))
      val right = spark.range(10000).select(col("id").as("k"),
        (col("id") * 3).as("dim"))
      // keep the payload column ALIVE through the join (sum of its
      // length) — otherwise Catalyst prunes it at the scan and the
      // "skewed" side shuffles 8-byte keys that AQE just coalesces
      val joined = left.join(right, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("dim")).as("s"),
          sum(length(col("payload"))).as("p"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"AQE skew-split did not activate:\n$plan")
    }
  }
}
