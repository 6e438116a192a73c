package graft

import org.apache.spark.sql.SparkSession

/** Prints a compact physical-plan audit for every SparkEntry query:
  * scan pruning (ReadSchema / PushedFilters), join strategies, and
  * exchange count — the properties that decide whether a plan survives
  * a 100× scale-up. Run: `sbt "runMain graft.PlanAudit [sfDir]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.builder(4)
      // static audit: AQE's AdaptiveSparkPlan wrapper hides codegen
      // annotations until execution
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val lines = plan.linesIterator.toSeq
      def count(p: String) = lines.count(_.contains(p))
      // whole-stage codegen shows as "*(n)" operator prefixes
      val codegenOps = lines.count(_.matches(".*\\*\\(\\d+\\) .*"))
      val interpretedOps = lines.count(l => l.matches("\\s*[+:][+-]? [A-Z].*") && !l.contains("Scan"))
      val scans = lines.filter(_.contains("FileScan")).map { l =>
        val rs = "ReadSchema: (\\S+)".r.findFirstMatchIn(l).map(_.group(1)).getOrElse("?")
        val pf = "PushedFilters: (\\[[^\\]]*\\])".r.findFirstMatchIn(l).map(_.group(1)).getOrElse("[]")
        s"    scan cols=${rs.count(_ == ':')} pushed=$pf"
      }
      println(s"== $name")
      println(s"    exchanges=${count("Exchange")} " +
        s"broadcastJoins=${count("BroadcastHashJoin")} " +
        s"smj=${count("SortMergeJoin")} nlj=${count("BroadcastNestedLoopJoin")} " +
        s"codegenOps=$codegenOps interpretedOps=$interpretedOps")
      scans.foreach(println)
    }
    spark.stop()
  }
}
