package graft

import org.apache.spark.sql.functions._

/** Proof-of-layout for the SURVEY §5 bucketing claim: two tables
  * bucketed on the join key join with ZERO exchange — the layout that
  * makes the 100 TB snapshot-merge/replicate joins shuffle-free on
  * the snapshot side. (Parquet bucketed tables via the session
  * catalog; no Hive needed.) */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("co-bucketed join on the bucket key plans no exchange") {
    // external-table paths (option("path")): the static warehouse dir
    // never comes into play
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the shuffle-join path so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      Tables.lineitem(spark, dir)
        .write.mode("overwrite").option("path", s"$wh/li")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.orders(spark, dir)
        .write.mode("overwrite").option("path", s"$wh/o")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must be exchange-free; only the final
      // aggregation may shuffle
      assert(plan.contains("SortMergeJoin"), plan)
      val totalExchanges = plan.linesIterator.count(_.contains("Exchange"))
      assert(totalExchanges <= 1, s"expected only the aggregate exchange:\n$plan")

      // and the result matches the plain (shuffled) join
      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
