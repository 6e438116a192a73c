package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** qPercentilesApprox is the declared 100 TB quantile path; its
  * contract is a RANK error bound, not value equality — each reported
  * quantile must sit within n / accuracy positions of the true target
  * rank in its group. Measured against the exact operator's input at
  * sf0.1 (the driver's bench scale). */
class PercentilesApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.1"

  test("every approx quantile is within the documented rank error at sf0.1") {
    val approx = Queries.qPercentilesApprox(spark, dir).collect()
    assert(approx.nonEmpty)

    // exact sorted values per group, locally
    val byGroup = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (g, rows) => g -> rows.map(_._2).sorted }

    var worst = 0.0
    approx.foreach { row =>
      val g = row.getAs[String]("event_type")
      val values = byGroup(g)
      val n = values.length
      assert(row.getAs[Long]("n_rows") == n.toLong)
      val tol = n.toDouble / Queries.ApproxPercentileAccuracy + 1
      Queries.Percentiles.foreach { case (num, den, name) =>
        val v = row.getAs[Double](name)
        val targetRank = (num.toLong * n + (den - 1)) / den
        // rank range the reported value occupies (1-based, ties span)
        val lo = values.indexWhere(_ >= v) + 1
        val hi = values.lastIndexWhere(_ <= v) + 1
        assert(lo > 0 && hi > 0, s"$g.$name reported $v which is not in the data range")
        val err = if (targetRank < lo) (lo - targetRank).toDouble
          else if (targetRank > hi) (targetRank - hi).toDouble else 0.0
        worst = math.max(worst, err / n)
        assert(err <= tol, s"$g.$name rank error $err exceeds n/accuracy tolerance $tol")
      }
    }
    // the bound is real, not vacuous: at accuracy 1000 the worst
    // observed relative rank error stays within 0.1% + 1 row
    assert(worst <= 1.0 / Queries.ApproxPercentileAccuracy + 1e-3)
  }
}
