package graft
/** Isolated per-query timing — the judge-style re-measurement for
  * separating plan cost from in-suite artifacts:
  * `sbt "runMain graft.BenchOne <query> [query ...]"`.
  *
  * Env knobs (both optional):
  *  - SPARK_GRAFT_BENCHONE_PASSES — runs per query (default 3;
  *    `tools/bench_diff.py --confirm` uses 5)
  *  - SPARK_GRAFT_BENCHONE_OUT — also write a BENCH_LATEST-shaped
  *    JSON artifact (`{"queries": {name: {"min":…, "passes":[…]}}}`)
  *    so tooling reads timings without scraping sbt logs. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.get("SPARK_GRAFT_BENCHONE_PASSES").map(_.toInt).getOrElse(3)
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    // bench-only probe entries (dedup_index_probe, ann index probes)
    // search standing indices Bench pre-builds untimed — same here
    val all = SparkEntry.queries ++ SparkEntry.benchQueries
    if (args.exists(SparkEntry.benchQueries.contains)) SparkEntry.benchPrepare(spark, sfDir)
    val timings = args.map { name =>
      val ts = (1 to passes).map { i =>
        val t0 = System.nanoTime()
        all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$name run$i: $dt%.2f s")
        // drop leftover localCheckpoint blocks between runs (same
        // reason as Bench: retained blocks from checkpointing
        // operators squeeze the heap until GC churn dominates timing)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        dt
      }
      name -> ts
    }
    sys.env.get("SPARK_GRAFT_BENCHONE_OUT").foreach { out =>
      def f(d: Double): String =
        BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
      val qs = timings.map { case (n, ts) =>
        s"""    "$n": {"min": ${f(ts.min)}, "passes": [${ts.map(f).mkString(", ")}]}"""
      }.mkString(",\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
        s"""{\n  "sf": "$sfDir",\n  "n_passes": $passes,\n  "queries": {\n$qs\n  }\n}\n""")
      println(s"[benchone] wrote $out")
    }
    spark.stop()
  }
}
