package graft.examples

import graft.{Sessions, Tables}
import graft.cdc.{CdcLogAdapter, ChangePrinter, ChangeSchemas, RawChanges}
import org.apache.spark.sql.functions._

/** Runnable analogue of the reference's printer example
  * (scylla-cdc-printer Main.java): read a CDC-log relation, walk the
  * first changes in ChangeId order, print each one.
  *
  * `sbt "runMain graft.examples.PrinterExample [sfDir] [n]"` */
object PrinterExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val n = args.lift(1).map(a => a.toIntOption.filter(_ > 0).getOrElse {
      System.err.println(s"usage: PrinterExample [sfDir] [n>0] — got '$a'")
      sys.exit(2)
    }).getOrElse(10)
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")

    val log = CdcLogAdapter.fromEvents(Tables.events(spark, sfDir))
    val schema = ChangeSchemas.ofAdaptedLog(log.schema)
    RawChanges.iterate(
        log.orderBy(col("cdc_stream_id"), col("time_us"), col("event_id")).limit(n))
      .foreach(c => println(ChangePrinter.format(c, schema)))
    spark.stop()
  }
}
