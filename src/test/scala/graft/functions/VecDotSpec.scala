package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkSpec {

  import spark.implicits._

  test("matches the interpreted zip_with+aggregate fold bit-for-bit") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)(
      (Array.fill(64)(rnd.nextDouble() - 0.5), Array.fill(64)(rnd.nextDouble() - 0.5)))
    val df = rows.toDF("a", "b")
      .withColumn("native", VecDot.dot(col("a"), col("b")))
      .withColumn("hof", aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x))
    assert(df.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("null input yields null; self-dot is the squared norm") {
    val df = Seq((Some(Array(3.0, 4.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    val r = df.select(
      VecDot.dot(col("a"), col("a")),
      VecDot.dot(col("a"), col("b"))).head()
    assert(r.getDouble(0) == 25.0)
    assert(r.isNullAt(1))
  }

  test("unequal lengths yield null (matching oracle NULL propagation), codegen and interpreted") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(10.0, 20.0))).toDF("a", "b")
    // codegen path
    assert(df.select(VecDot.dot(col("a"), col("b"))).head().isNullAt(0))
    // interpreted path (nullSafeEval)
    val expr = VecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 2.0, 3.0)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(10.0, 20.0)))
    assert(expr.eval(null) == null)
    assert(expr.nullable)
  }

  test("VecNearestCell agrees with a VecDot-based argmax over seeded random data") {
    // the fused kernel must pick exactly the cell a per-centroid
    // VecDot cosine scan would pick (same tie rule: first max wins),
    // and report the same cosine bit-for-bit
    val rnd = new scala.util.Random(77)
    val dim = 16
    val cents = Array.fill(8)(Array.fill(dim)(rnd.nextDouble() - 0.5))
    val rows = Seq.fill(200)((rnd.nextLong().abs, Array.fill(dim)(rnd.nextDouble() - 0.5)))
    val got = rows.toDF("id", "v")
      .select(col("id"), VecNearestCell.nearest(col("v"), cents).as("best"))
      .collect().map(r => r.getLong(0) ->
        ((r.getStruct(1).getInt(0), r.getStruct(1).getDouble(1)))).toMap
    def dotL(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    rows.foreach { case (id, v) =>
      val sn = math.sqrt(dotL(v, v))
      val cos = cents.map(c => dotL(v, c) / (sn * math.sqrt(dotL(c, c))))
      var best = 0
      for (c <- 1 until cos.length)
        if (java.lang.Double.compare(cos(c), cos(best)) > 0) best = c
      assert(got(id) == ((best, cos(best))), s"row $id")
    }
  }

  test("VecNearestCell: dimension mismatch yields null (VecDot convention), codegen and interpreted") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq(
      (1L, Array(3.0, 4.0)),        // valid: nearest is centroid 1
      (2L, Array(1.0, 2.0, 3.0)))   // bad length: must surface as NULL
      .toDF("id", "v")
      .select(col("id"), VecNearestCell.nearest(col("v"), cents).as("best"))
      .orderBy("id")
    val rows = df.collect()
    assert(!rows(0).isNullAt(1) && rows(0).getStruct(1).getInt(0) == 1)
    assert(rows(1).isNullAt(1), "truncated dot leaked through on length mismatch")
    // interpreted path
    val expr = VecNearestCell(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 2.0, 3.0)), cents)
    assert(expr.eval(null) == null)
    assert(expr.nullable)
  }
}
