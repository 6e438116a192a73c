package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[DistributedRanks.withGroupRanks]] must equal the naive
  * group-partitioned window EXACTLY — it exists so five operators
  * could drop their hot-key windows without changing a single output
  * row. Checked against skewed group histograms, heavy sort-key
  * ties, descending sort expressions, and a partition count larger
  * than some groups. */
class DistributedRanksSpec extends SparkSpec {

  private def naive(df: org.apache.spark.sql.DataFrame,
      group: String, sort: Seq[org.apache.spark.sql.Column]) = {
    val w = Window.partitionBy(col(group)).orderBy(sort: _*)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(group))))
  }

  private def assertSame(df: org.apache.spark.sql.DataFrame,
      group: String, sort: Seq[org.apache.spark.sql.Column], key: Seq[String]): Unit = {
    val got = DistributedRanks.withGroupRanks(df, group, sort)
      .select((key.map(col) :+ col("rn").cast("long") :+ col("n")): _*)
      .collect().map(_.toSeq).toSet
    val want = naive(df, group, sort)
      .select((key.map(col) :+ col("rn") :+ col("n")): _*)
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("matches the naive window on a skewed group histogram") {
    import spark.implicits._
    // one group carries 80% of rows — the histogram that motivates it
    val df = (1 to 500).map { i =>
      val g = if (i % 5 == 0) s"g${i % 3 + 1}" else "hot"
      (g, (i * 7919) % 97, i.toLong)
    }.toDF("grp", "v", "id")
    assertSame(df, "grp", Seq(col("v"), col("id")), Seq("grp", "id"))
  }

  test("matches under heavy sort-key ties (unique tiebreaker last)") {
    import spark.implicits._
    // only 3 distinct v values — ties span range-partition boundaries
    val df = (1 to 300).map(i => ("g" + (i % 2), i % 3, i.toLong)).toDF("grp", "v", "id")
    assertSame(df, "grp", Seq(col("v"), col("id")), Seq("grp", "id"))
  }

  test("matches with descending sort expressions") {
    import spark.implicits._
    val df = (1 to 200).map(i => ("s" + (i % 4), (i * 31) % 50, i.toLong)).toDF("grp", "v", "id")
    assertSame(df, "grp", Seq(col("v").desc, col("id")), Seq("grp", "id"))
  }

  test("matches when groups are smaller than the partition count") {
    import spark.implicits._
    val df = (1 to 10).map(i => ("g" + i, i, i.toLong)).toDF("grp", "v", "id")
    assertSame(df, "grp", Seq(col("v"), col("id")), Seq("grp", "id"))
  }

  test("prefix sum matches the naive running-sum window under skew") {
    import spark.implicits._
    val df = (1 to 400).map { i =>
      val g = if (i % 4 == 0) "g" + (i % 3) else "hot"
      (g, i.toLong, ((i * 37) % 90 + 1).toLong)
    }.toDF("grp", "id", "v")
    val wNaive = Window.partitionBy(col("grp")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("run", sum(col("v")).over(wNaive))
      .select("id", "run").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = DistributedRanks.withGroupPrefixSum(df, "grp", Seq(col("id")), col("v"), "run")
      .select("id", "run").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("keeps a NULL group as its own partition, like the naive window") {
    import spark.implicits._
    val df = (1 to 200).map { i =>
      val g = if (i % 3 == 0) null else "g" + (i % 2)
      (g, (i * 13) % 7, i.toLong)
    }.toDF("grp", "v", "id")
    assertSame(df, "grp", Seq(col("v"), col("id")), Seq("id"))
    // every input row survives — the null-group rows must not be
    // dropped by the offsets join
    assert(DistributedRanks.withGroupRanks(df, "grp", Seq(col("id"))).count() == 200)
  }
}
