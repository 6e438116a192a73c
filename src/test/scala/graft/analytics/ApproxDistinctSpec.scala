package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** qApproxDistinct is the declared 100 TB count-distinct path; its
  * contract is a relative error bound around the exact count, not
  * value equality (the HLL++ sketch is engine-specific, hence the
  * rows-gated driver entry). Measured against exact count_distinct at
  * sf0.1 (the driver's bench scale). */
class ApproxDistinctSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.1"

  test("every HLL++ estimate is within 3·rsd of the exact distinct count at sf0.1") {
    val approx = Queries.qApproxDistinct(spark, dir)
    val exact = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val joined = approx.join(exact, Seq("event_type")).collect()
    assert(joined.nonEmpty)
    joined.foreach { row =>
      val est = row.getAs[Long]("approx_users").toDouble
      val ex = row.getAs[Long]("exact_users").toDouble
      val relErr = math.abs(est - ex) / ex
      assert(relErr <= 3 * Queries.ApproxDistinctRsd,
        s"${row.getAs[String]("event_type")}: estimate $est vs exact $ex " +
          s"(rel err $relErr > ${3 * Queries.ApproxDistinctRsd})")
    }
  }
}
