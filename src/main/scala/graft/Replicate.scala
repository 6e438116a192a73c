package graft

/** End-to-end replicator CLI — the analogue of running the reference's
  * scylla-cdc-replicator Main (source cluster → destination cluster).
  *
  * Usage: `sbt "runMain graft.Replicate <sfDir> <outDir> [--mode M]"`
  * with the reference's three modes (Main.java:111, Mode enum
  * Main.java:128-145; `pre_image`/`post_image` spellings accepted):
  *  - `delta` (default): events parquet → CDC log → fully materialized
  *    destination table (all operation types interpreted) + the
  *    collection column state;
  *  - `preimage`: PRE_IMAGE rows paired with their operations and
  *    checked against the materialized pre-state — the consistency
  *    audit written to `preimage_report`;
  *  - `postimage`: POST_IMAGE full-row applies — the destination
  *    state as `postimage_table`.
  * At 100 TB the same lines run on a cluster with the parquet paths
  * pointed at the lake. */
object Replicate {

  /** Mode.fromString analogue (Main.java:128-145): same accepted
    * spellings, same failure on anything else. */
  def parseMode(args: Seq[String]): String = args match {
    case Seq() => "delta"
    case Seq("--mode" | "-m", m) => m.toLowerCase.replace("_", "") match {
      case ok @ ("delta" | "preimage" | "postimage") => ok
      case other => throw new IllegalStateException(s"Unknown mode: $other")
    }
    case other => throw new IllegalArgumentException(s"unrecognized arguments: $other")
  }

  /** One replication run; returns the written output paths. */
  def run(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      out: String, mode: String): Seq[String] = {
    val events = Tables.events(spark, sfDir)
    val log = cdc.CdcLogAdapter.fromEvents(events)
    mode match {
      case "delta" =>
        cdc.CdcOps.replicateFullFromLog(log)
          .write.mode("overwrite").parquet(s"$out/destination_table")
        cdc.CdcOps.collectionApplyFromLog(cdc.CdcLogAdapter.fromEventsWithCollections(events))
          .write.mode("overwrite").parquet(s"$out/destination_collections")
        Seq(s"$out/destination_table", s"$out/destination_collections")
      case "preimage" =>
        cdc.CdcOps.preimageCheckFromLog(log)
          .write.mode("overwrite").parquet(s"$out/preimage_report")
        Seq(s"$out/preimage_report")
      case "postimage" =>
        cdc.CdcOps.postimageApplyFromLog(log)
          .write.mode("overwrite").parquet(s"$out/postimage_table")
        Seq(s"$out/postimage_table")
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Replicate <sfDir> <outDir> [--mode delta|preimage|postimage]")
    val Array(sfDir, out) = args.take(2)
    val mode = parseMode(args.drop(2).toSeq)
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val written = run(spark, sfDir, out, mode)
    println(s"replicated ($mode): ${written.mkString(", ")}")
    spark.stop()
  }
}

/** Printer CLI — the analogue of scylla-cdc-printer's Main: renders
  * the first N changes of the log in the reference's block format.
  *
  * Usage: `sbt "runMain graft.PrintChanges <sfDir> [n]"`. */
object PrintChanges {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PrintChanges <sfDir> [n]")
    val sfDir = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val log = cdc.CdcLogAdapter.fromEvents(Tables.events(spark, sfDir))
      .orderBy("time_us", "event_id").limit(n)
    val schema = cdc.ChangeSchemas.ofAdaptedLog(log.schema)
    cdc.RawChanges.iterate(log)
      .foreach(c => println(cdc.ChangePrinter.format(c, schema)))
    spark.stop()
  }
}
