package graft
/** Isolated per-query timing (3 runs each) — the judge-style
  * re-measurement for separating plan cost from in-suite artifacts:
  * `sbt "runMain graft.BenchOne <query> [query ...]"`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // drop leftover localCheckpoint blocks between runs (same
        // reason as Bench: retained blocks from checkpointing
        // operators squeeze the heap until GC churn dominates timing)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
