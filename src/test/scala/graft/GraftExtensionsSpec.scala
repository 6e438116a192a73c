package graft

import graft.functions.{Hashes, ShingleHash}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Spec for [[GraftExtensions]]: the SQL surface of the native
  * expression must match the Column API. */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = {
    // getOrCreate would silently reuse another suite's session and skip
    // withExtensions — force construction of an extension-bearing one
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .appName("GraftExtensionsSpec")
      .getOrCreate()
  }

  test("shingle_hash is callable from SQL and matches the Column API") {
    import spark.implicits._
    Seq(("hello world hello", 1L)).toDF("text", "id").createOrReplaceTempView("t")
    val sqlRes = spark.sql("SELECT shingle_hash(text, 5) AS h FROM t")
      .collect().head.getSeq[Long](0)
    val colRes = Seq("hello world hello").toDF("text")
      .select(ShingleHash.shingleHashes(org.apache.spark.sql.functions.col("text"), 5).as("h"))
      .collect().head.getSeq[Long](0)
    assert(sqlRes == colRes)
    assert(sqlRes.nonEmpty && sqlRes.forall(h => h >= 0 && h < Hashes.M))
  }

  test("arity and literal validation") {
    intercept[Exception](spark.sql("SELECT shingle_hash('abc')").collect())
    intercept[Exception](spark.sql("SELECT vec_dot(array(1.0d))").collect())
  }

  test("vec_dot is callable from SQL and matches the interpreted fold") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(10.0d, 20.0d, 30.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r == 140.0)
  }

  test("char_entropy is callable from SQL and matches the expression") {
    val r = spark.sql("SELECT char_entropy('abab') AS h").collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    intercept[Exception](spark.sql("SELECT char_entropy('a', 'b')").collect())
  }
}
