package graft

import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` for named queries (or every query) to
  * `<outDir>/<name>.txt` — the plan evidence the optimization rounds
  * commit under plans/. Plans only; nothing executes.
  * Run: `sbt "runMain graft.PlanDump <outDir> [query ...]"`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/plans")
    val only = args.drop(1).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.builder(4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    (SparkEntry.queries ++ SparkEntry.benchQueries).toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        // bench-only probe entries need their standing indices on disk
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/$name.txt"), plan)
          println(s"[plandump] $name")
        } catch { case e: Throwable =>
          println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
