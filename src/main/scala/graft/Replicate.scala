package graft

/** End-to-end replicator CLI — the analogue of running the reference's
  * scylla-cdc-replicator Main (source cluster → destination cluster):
  * events parquet → CDC log → fully materialized destination table
  * (all operation types interpreted) + the collection column state.
  *
  * Usage: `sbt "runMain graft.Replicate <sfDir> <outDir>"`.
  * At 100 TB the same two lines run on a cluster with the parquet
  * paths pointed at the lake. */
object Replicate {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Replicate <sfDir> <outDir>")
    val Array(sfDir, out) = args.take(2)
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val events = Tables.events(spark, sfDir)
    cdc.CdcOps.replicateFullFromLog(cdc.CdcLogAdapter.fromEvents(events))
      .write.mode("overwrite").parquet(s"$out/destination_table")
    cdc.CdcOps.collectionApplyFromLog(cdc.CdcLogAdapter.fromEventsWithCollections(events))
      .write.mode("overwrite").parquet(s"$out/destination_collections")
    println(s"replicated: $out/destination_table, $out/destination_collections")
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
