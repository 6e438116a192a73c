package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All operators take the table DataFrames as inputs; nothing in the
  * library hardcodes a scale factor. At cluster scale the same loaders
  * point at a 100 TB lake — parquet scans get column pruning +
  * predicate pushdown from Catalyst for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` normalized to a µs-precision TIMESTAMP regardless of
    * how the generator wrote it — generations of the test lake have
    * used parquet TIMESTAMP(NANOS) (read as a nanos long via
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * [[Sessions.builder]]), TIMESTAMP_NTZ(µs), and plain TIMESTAMP.
    * Dispatch on the read schema so every downstream operator sees one
    * canonical type; with the UTC session timezone the NTZ→TZ cast is
    * shift-free and matches the DuckDB oracle's `epoch_us`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Round-robin rebalance to the cluster's parallelism — used by the
    * CPU-bound pipeline operators (signatures, scoring) whose per-row
    * cost dwarfs a small shuffle. A narrow scan (one row group, one
    * skewed split) otherwise pins the whole map stage to one core; at
    * lake scale the same call is a cheap insurance rebalance before
    * compute-heavy stages. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
