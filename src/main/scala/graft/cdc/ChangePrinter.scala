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
    sb.append(f"┌─ change ${change.getOperationType}%s\n")
    sb.append(f"│ stream:    $stream%d\n")
    sb.append(f"│ time:      $timeUs%d µs\n")
    sb.append(f"│ batch seq: $seq%d  end-of-batch: ${change.isEndOfBatch}%s\n")
    change.getTTL.foreach(t => sb.append(f"│ ttl:       $t%d s\n"))
    schema.baseTableColumns.foreach { c =>
      val v = if (change.isNull(c.columnName)) "null" else change.getAsObject(c.columnName).toString
      val del = c.deletedColumn.exists(_ => change.isDeleted(c.columnName))
      val kind = c.kind.toString
      sb.append(f"│ ${c.columnName}%-12s [$kind%s]: $v%s${if (del) "  (DELETED)" else ""}%s\n")
    }
    sb.append("└─").toString
  }
}
