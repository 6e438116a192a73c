package graft.plans

import graft.GraftExtensions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[RangeJoinRewrite]] must change ONLY the plan, never the result:
  * every test compares the rewritten join against the same query with
  * the rule disabled (the nested-loop reference plan) and against a
  * driver-side brute force. */
class RangeJoinRewriteSpec extends AnyFunSuite {

  private lazy val spark = {
    // getOrCreate would reuse another suite's extension-less session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .appName("RangeJoinRewriteSpec")
      .getOrCreate()
  }

  private def withWidth[A](w: Long)(body: => A): A = {
    spark.conf.set(RangeJoinRewrite.WidthConf, w.toString)
    try body finally spark.conf.unset(RangeJoinRewrite.WidthConf)
  }

  private def points: DataFrame = {
    import spark.implicits._
    // negatives included: bucket floor-division must round toward -∞
    Seq(-250L, -100L, -1L, 0L, 1L, 99L, 100L, 101L, 250L, 999L, 1000L)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("pid", "t")
  }

  private def intervals: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, -300L, -200L),            // all-negative interval
      (1L, -50L, 50L),               // crosses zero
      (2L, 90L, 110L),               // crosses a bucket boundary (W=100)
      (3L, 100L, 100L),              // single point on the boundary
      (4L, 500L, 400L),              // empty (lo > hi) — matches nothing
      (5L, 0L, 1000L),               // wide: many buckets
      (6L, Long.MaxValue - 5, Long.MaxValue - 1)) // far from the data
      .toDF("iid", "lo", "hi")
  }

  private def expected(strict: Boolean): Set[(Long, Long)] = {
    val ps = points.collect().map(r => (r.getLong(0), r.getLong(1)))
    val is = intervals.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    (for {
      (pid, t) <- ps
      (iid, lo, hi) <- is
      if (if (strict) t > lo && t < hi else t >= lo && t <= hi)
    } yield (pid, iid)).toSet
  }

  private def collectPairs(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def planOf(df: DataFrame): String = df.queryExecution.sparkPlan.toString

  private def optimizedHasGenerate(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }.nonEmpty

  test("inclusive range join rewrites to an equi-join with identical results") {
    withWidth(100L) {
      val joined = points.join(intervals,
        col("t") >= col("lo") && col("t") <= col("hi"))
      assert(optimizedHasGenerate(joined), "rewrite did not fire")
      assert(!planOf(joined).contains("BroadcastNestedLoopJoin"), planOf(joined))
      assert(collectPairs(joined) == expected(strict = false))
    }
  }

  test("disabled rule keeps the nested-loop plan and the same results") {
    val joined = points.join(intervals,
      col("t") >= col("lo") && col("t") <= col("hi"))
    assert(!optimizedHasGenerate(joined))
    assert(planOf(joined).contains("BroadcastNestedLoopJoin"))
    assert(collectPairs(joined) == expected(strict = false))
  }

  test("strict bounds and reversed operand order rewrite and agree") {
    withWidth(100L) {
      // lo < t AND hi > t — both conjuncts written interval-side first
      val joined = points.join(intervals,
        col("lo") < col("t") && col("hi") > col("t"))
      assert(optimizedHasGenerate(joined))
      assert(collectPairs(joined) == expected(strict = true))
    }
  }

  test("point side on the right rewrites symmetrically") {
    withWidth(100L) {
      val joined = intervals.join(points,
        col("t") >= col("lo") && col("t") <= col("hi"))
      assert(optimizedHasGenerate(joined))
      assert(!planOf(joined).contains("BroadcastNestedLoopJoin"))
      assert(collectPairs(joined) == expected(strict = false))
    }
  }

  test("NULL endpoints and NULL points drop exactly as the naive join drops them") {
    import spark.implicits._
    val ps = Seq((0L, Some(50L)), (1L, None), (2L, Some(-250L)))
      .toDF("pid", "t")
    val is = Seq((0L, Some(-300L), Some(-200L)), (1L, None, Some(100L)), (2L, Some(0L), None))
      .toDF("iid", "lo", "hi")
    val cond = col("t") >= col("lo") && col("t") <= col("hi")
    val naive = ps.join(is, cond).select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    withWidth(100L) {
      val joined = ps.join(is, cond)
      assert(optimizedHasGenerate(joined))
      assert(collectPairs(joined) == naive)
      assert(naive == Set((2L, 0L)))
    }
  }

  test("a cross-side equi conjunct suppresses the rewrite") {
    withWidth(100L) {
      val joined = points.join(intervals,
        col("pid") === col("iid") &&
          col("t") >= col("lo") && col("t") <= col("hi"))
      assert(!optimizedHasGenerate(joined), "must defer to the existing hash join key")
      assert(collectPairs(joined) ==
        expected(strict = false).filter { case (p, i) => p == i })
    }
  }

  test("extra non-equi conjuncts ride along as refinement") {
    withWidth(100L) {
      val joined = points.join(intervals,
        col("t") >= col("lo") && col("t") <= col("hi") && col("pid") =!= col("iid"))
      assert(optimizedHasGenerate(joined))
      assert(collectPairs(joined) ==
        expected(strict = false).filter { case (p, i) => p != i })
    }
  }

  test("seeded fuzz: random points/intervals agree with brute force at several widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    // cluster values near multiples of the widths so bucket boundaries
    // are hit constantly
    def v(): Long = rnd.nextInt(21) * 50L - 500L + rnd.nextInt(3) - 1
    val ps = Seq.tabulate(200)(i => (i.toLong, v())).toDF("pid", "t")
    val is = Seq.tabulate(60) { i =>
      val a = v(); val b = v()
      (i.toLong, a, b) // unordered on purpose: some intervals empty
    }.toDF("iid", "lo", "hi")
    val naive = ps.join(is, col("t") >= col("lo") && col("t") <= col("hi"))
    assert(!optimizedHasGenerate(naive))
    val want = naive.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 7L, 50L, 1000L, 100000L)) {
      withWidth(w) {
        val joined = ps.join(is, col("t") >= col("lo") && col("t") <= col("hi"))
        assert(optimizedHasGenerate(joined), s"width $w")
        assert(collectPairs(joined) == want, s"width $w")
      }
    }
  }

  test("plain-SQL BETWEEN gets the rewrite") {
    withWidth(100L) {
      points.createOrReplaceTempView("pts")
      intervals.createOrReplaceTempView("ivs")
      val joined = spark.sql(
        "SELECT pid, iid FROM pts JOIN ivs ON t BETWEEN lo AND hi")
      assert(optimizedHasGenerate(joined))
      assert(collectPairs(joined) == expected(strict = false))
    }
  }
}
