package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/scheduler AND the parquet-read + noop-write
    // paths so the first measured query doesn't absorb session startup
    // (map iteration order is arbitrary — whatever runs first would
    // otherwise carry ~2 s of one-time init)
    spark.range(1000000).selectExpr("sum(id)").collect()
    // first-touch EVERY table: a cold page-cache read of the largest
    // parquet charged 4-7 s to whichever query happened to scan it
    // first (measured: cdc_replicate_lww 8.3 s in-suite vs 1.2 s warm)
    Tables.names.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      // noop sink: forces full materialization of every output column —
      // a bare count() would let Catalyst prune the computed columns
      // and under-report map-only queries.
      // Two timed repetitions, report the MIN: a single GC/JIT pause in
      // a one-sample bench fabricates an order-of-magnitude outlier
      // (an 18.6 s entry in a driver run re-measured at 0.9-1.7 s in
      // isolation); min-of-2 bounds the damage one pause can do while
      // still charging every query its real plan+shuffle cost.
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
        }
        (System.nanoTime() - t0) / 1e9
      }
      val (a, b) = (once(), once())
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures are recorded as -1 markers; they must not skew the total
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
