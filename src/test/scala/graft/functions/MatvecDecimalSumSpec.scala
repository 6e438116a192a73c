package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Equivalence pin for the r14 matvec collapse: the
  * [[MatvecDecimalSum]] aggregate must reproduce the unrolled
  * posexplode → (s·x) cast DECIMAL(27,12) → groupBy(pos) sum →
  * cast double chain BIT-FOR-BIT, including the half-up quantization
  * at scale 12 and the exactness of cross-row decimal summation. */
class MatvecDecimalSumSpec extends SparkSpec {

  test("aggregate ≡ posexplode + decimal-sum groupBy, bit for bit") {
    import spark.implicits._
    // deterministic values that exercise rounding at the 12th place:
    // irrational-ish doubles whose products carry >12 decimal digits
    val rows = (1 to 200).map { i =>
      val s = math.sqrt(i.toDouble) * (if (i % 3 == 0) -1 else 1)
      val v = (1 to 16).map(j => math.cbrt(i * 31 + j) / 7.0)
      (s, v)
    }
    val df = rows.toDF("s", "v").repartition(7) // several partial buffers merge
    val viaExplode = df
      .select(col("s"), posexplode_outer(col("v")).as(Seq("pos", "x")))
      .select(col("pos"), (col("s") * col("x")).cast("decimal(27,12)").as("sx"))
      .groupBy(col("pos"))
      .agg(sum(col("sx")).cast("double").as("m0"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val viaAgg = df
      .agg(MatvecDecimalSum.matvecSum(col("s"), col("v")).as("u"))
      .select(posexplode(col("u")).as(Seq("pos", "m0")))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(viaAgg.keySet == viaExplode.keySet)
    viaAgg.foreach { case (p, m) =>
      // exact double equality — the whole point of the contract
      assert(java.lang.Double.doubleToLongBits(m) ==
        java.lang.Double.doubleToLongBits(viaExplode(p)), s"pos $p: $m vs ${viaExplode(p)}")
    }
  }

  test("ragged arrays and null rows: missing positions don't accumulate, null s skips") {
    import spark.implicits._
    val df = Seq[(Option[Double], Seq[Double])](
      (Some(2.0), Seq(1.0, 2.0, 3.0)),
      (Some(3.0), Seq(10.0)), // ragged: positions 1-2 absent
      (None, Seq(100.0, 100.0, 100.0))) // null s: no contribution
      .toDF("s", "v")
    val got = df.select(col("s").cast("double").as("s"), col("v"))
      .agg(MatvecDecimalSum.matvecSum(col("s"), col("v")).as("u"))
      .select(posexplode(col("u")).as(Seq("pos", "m")))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got == Map(0 -> 32.0, 1 -> 4.0, 2 -> 6.0))
  }
}
