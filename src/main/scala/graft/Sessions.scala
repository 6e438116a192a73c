package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's recommended configuration —
  * the same knobs a 1000-executor deployment would set, scaled to the
  * local test harness:
  *
  *  - AQE on (default in Spark 4) with skew-join handling: runtime
  *    re-planning splits skewed shuffle partitions (hot CDC streams,
  *    hot dedup buckets) without manual salting
  *  - partition coalescing: post-shuffle partitions sized by data, so
  *    small stages don't schedule thousands of empty tasks
  *  - shuffle partitions sized to the cluster (cores here; a cluster
  *    sets ~2-3× total executor cores)
  *  - UTC session timezone: timestamp arithmetic is reproducible
  *    across drivers and the DuckDB oracle
  */
object Sessions {

  def builder(cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      // graft's SQL functions + the RangeJoinRewrite optimizer rule —
      // the same line a cluster deployment puts in spark-defaults
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // let the planner pick shuffled-hash join when its size
      // conditions hold instead of always sorting both sides
      // (optimization guide §3.1/§9 — the same setting a production
      // deployment carries: SHJ skips two sorts whenever a build-side
      // partition fits in memory, and falls back to SMJ otherwise;
      // AQE's skew-join splitting applies to both). Measured on the
      // r13 optimization round's join-heavy subset: 0.956× total,
      // 9 of 12 entries faster, none outside noise slower. The AQE
      // threshold additionally lets runtime stats rewrite an SMJ to
      // SHJ when every post-shuffle partition is under 64 MB.
      // SPARK_GRAFT_PREFER_SMJ=1 flips the default back for A/B probes
      // (the r14 sf1 spill check) — the shipped default is unchanged.
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.get("SPARK_GRAFT_PREFER_SMJ").contains("1").toString)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); the vectorized reader
      // needs this to read it (as a long). Set once here — a table
      // loader mutating session config would surprise other readers.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Session for the driver-run mains (Verify/Bench); cores from
    * SPARK_GRAFT_CPUS, defaulting to every core on the box — the
    * harness is the stand-in for a cluster, so underscheduling it
    * understates throughput ~linearly. */
  def local(): SparkSession = {
    val cores = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    builder(cores).getOrCreate()
  }
}
