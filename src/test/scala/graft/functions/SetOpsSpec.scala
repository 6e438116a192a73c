package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SetOps]] natives must agree exactly with the interpreted
  * Catalyst built-ins they replace. */
class SetOpsSpec extends SparkSpec {

  test("eqCount matches zip_with position compare on random equal-length arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)(
      (Seq.fill(16)(rnd.nextInt(10).toLong), Seq.fill(16)(rnd.nextInt(10).toLong)))
    val df = rows.toDF("a", "b")
      .withColumn("native", SetOps.eqCount(col("a"), col("b")))
      .withColumn("builtin",
        size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), v => v)).cast("long"))
    assert(df.filter(col("native") =!= col("builtin")).count() == 0)
    val direct = rows.map { case (a, b) => a.zip(b).count { case (x, y) => x == y }.toLong }
    assert(df.select("native").collect().map(_.getLong(0)).toSeq == direct)
  }

  test("eqCount yields NULL on length mismatch, not a prefix count") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L)))
      .toDF("a", "b").select(SetOps.eqCount(col("a"), col("b")).as("c"))
    assert(df.collect().head.isNullAt(0))
  }

  test("sortedIntersectCount matches array_intersect size on random sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted,
      Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted))
    val df = rows.toDF("a", "b")
      .withColumn("native", SetOps.sortedIntersectCount(col("a"), col("b")))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(df.filter(col("native") =!= col("builtin")).count() == 0)
    val direct = rows.map { case (a, b) => a.toSet.intersect(b.toSet).size.toLong }
    assert(df.select("native").collect().map(_.getLong(0)).toSeq == direct)
  }

  test("null inputs propagate null") {
    import spark.implicits._
    val df = Seq((Option.empty[Seq[Long]], Option(Seq(1L))))
      .toDF("a", "b")
      .select(SetOps.eqCount(col("a"), col("b")).as("e"),
        SetOps.sortedIntersectCount(col("a"), col("b")).as("i"))
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
