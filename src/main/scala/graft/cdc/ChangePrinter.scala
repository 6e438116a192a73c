package graft.cdc

/** Human-readable rendering of a change — the scylla-cdc-printer
  * module's output surface (scylla-cdc-printer .../printer/Main.java
  * printChange): operation, ChangeId (stream + time), batch info, and
  * every base-table cell with its deleted flag. */
object ChangePrinter {

  /** Format one change like the reference printer's block output. */
  def format(change: RawChange, schema: ChangeSchemas.ChangeSchema): String = {
    val sb = new StringBuilder
    val (stream, timeUs, seq) = change.getId
    sb.append(s"+- change ${change.getOperationType}\n")
    sb.append(s"| stream:    $stream\n")
    sb.append(s"| time:      $timeUs us\n")
    sb.append(s"| batch seq: $seq  end-of-batch: ${change.isEndOfBatch}\n")
    change.getTTL.foreach(t => sb.append(s"| ttl:       $t s\n"))
    schema.baseTableColumns.foreach { c =>
      // DURATION/DATE cells render through their value classes — the
      // raw Spark layouts (a months/days/nanos struct Row; a
      // java.sql.Date) would print Row-ish noise instead of the
      // reference's `1y2mo3ns` / zero-padded `y-MM-dd` forms
      // (printer Main.java delegates to CqlDuration/CqlDate.toString)
      val v =
        if (change.isNull(c.columnName)) "null"
        else c.cqlDataType.cqlType match {
          case CqlTypes.Duration => change.getField(c.columnName).getDuration.toString
          case CqlTypes.Date => change.getField(c.columnName).getDate.toString
          case _ => change.getAsObject(c.columnName).toString
        }
      val del = c.deletedColumn.exists(_ => change.isDeleted(c.columnName))
      // cell line carries the CQL type like the reference printer
      // (Main.java prints the driver type next to each cell)
      sb.append(f"| ${c.columnName}%-12s [${c.kind}%s ${c.cqlDataType}%s]: $v%s${if (del) "  (DELETED)" else ""}%s\n")
    }
    sb.append("`--").toString
  }
}
