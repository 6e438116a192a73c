package graft.cdc

import org.apache.spark.sql.types.{DataType, StructType}

/** Schema introspection for a CDC-log relation — the reference's
  * `ChangeSchema` surface (scylla-cdc-base
  * .../model/worker/ChangeSchema.java:284-380): classify every column
  * as CDC metadata / partition key / clustering key / regular, expose
  * ColumnDefinition-style lookups, and pair each base-table column
  * with its `cdc$deleted_X` companion.
  *
  * Where the reference derives this from Scylla's table metadata, we
  * derive it from the Spark StructType of the log relation plus the
  * primary-key declaration — the information a lakehouse catalog
  * carries for a CDC-shaped table.
  */
object ChangeSchemas {

  sealed trait ColumnKind
  case object CdcMetadata extends ColumnKind
  case object PartitionKey extends ColumnKind
  case object ClusteringKey extends ColumnKind
  case object Regular extends ColumnKind

  /** ColumnDefinition analogue (ChangeSchema.java:327-380). */
  final case class ColumnDefinition(
      columnName: String,
      index: Int,
      sparkType: DataType,
      kind: ColumnKind,
      /** name of the cdc_deleted_X companion column, when present */
      deletedColumn: Option[String]) {

    /** The CQL view of this column's type (ChangeSchema.DataType) —
      * drives the replicator's atomic vs collection-cell split:
      * non-atomic columns follow [[CdcOps.collectionApplyFromLog]],
      * atomic ones the scalar LWW path. */
    def cqlDataType: CqlTypes.CqlDataType = CqlTypes.fromSparkType(sparkType)

    /** Whether updates can be partial (non-frozen collection/UDT) —
      * the reference's `!isAtomic` gate in
      * UnpreparedUpdateOperationHandler.java:55. */
    def isAtomic: Boolean = cqlDataType.isAtomic
  }

  final case class ChangeSchema(columns: Seq[ColumnDefinition]) {
    private val byName = columns.map(c => c.columnName -> c).toMap

    /** getColumnDefinition; throws on unknown name like the reference. */
    def columnDefinition(name: String): ColumnDefinition =
      byName.getOrElse(name, throw new NoSuchElementException(name))

    def cdcColumns: Seq[ColumnDefinition] = columns.filter(_.kind == CdcMetadata)
    def partitionKeys: Seq[ColumnDefinition] = columns.filter(_.kind == PartitionKey)
    def clusteringKeys: Seq[ColumnDefinition] = columns.filter(_.kind == ClusteringKey)
    def regularColumns: Seq[ColumnDefinition] = columns.filter(_.kind == Regular)
    /** All base-table columns (everything that isn't cdc$ metadata). */
    def baseTableColumns: Seq[ColumnDefinition] = columns.filterNot(_.kind == CdcMetadata)
  }

  val CdcPrefix = "cdc_"
  val DeletedPrefix = "cdc_deleted_"

  /** Build the schema from a log relation's StructType + declared
    * primary key. `cdc_deleted_X` columns attach to X rather than
    * appearing as standalone definitions (RawChange.java:151-182). */
  def fromStruct(schema: StructType,
      partitionKeys: Seq[String], clusteringKeys: Seq[String]): ChangeSchema = {
    val deleted = schema.fieldNames.filter(_.startsWith(DeletedPrefix))
      .map(n => n.stripPrefix(DeletedPrefix) -> n).toMap
    val defs = schema.fields.zipWithIndex.collect {
      case (f, i) if !f.name.startsWith(DeletedPrefix) =>
        val kind =
          if (f.name.startsWith(CdcPrefix) || f.name == "time_us") CdcMetadata
          else if (partitionKeys.contains(f.name)) PartitionKey
          else if (clusteringKeys.contains(f.name)) ClusteringKey
          else Regular
        ColumnDefinition(f.name, i, f.dataType, kind, deleted.get(f.name))
    }
    ChangeSchema(defs.toIndexedSeq)
  }

  /** The schema of [[CdcLogAdapter.fromEvents]] output with the
    * synthetic base table's key (user_id; event_id). */
  def ofAdaptedLog(schema: StructType): ChangeSchema =
    fromStruct(schema, partitionKeys = Seq("user_id"), clusteringKeys = Seq("event_id"))

  /** Diff of two change schemas across an ALTER TABLE boundary — the
    * classification the consumer needs to keep running through
    * add/drop/re-add (scylla-cdc-lib AlterTableIT family; re-add with
    * a different type surfaces as `retyped`). */
  final case class SchemaDiff(
      added: Seq[ColumnDefinition],
      removed: Seq[ColumnDefinition],
      retyped: Seq[(ColumnDefinition, ColumnDefinition)]) {
    def isCompatible: Boolean = retyped.isEmpty
  }

  def diff(before: ChangeSchema, after: ChangeSchema): SchemaDiff = {
    val beforeByName = before.columns.map(c => c.columnName -> c).toMap
    val afterByName = after.columns.map(c => c.columnName -> c).toMap
    SchemaDiff(
      added = after.columns.filterNot(c => beforeByName.contains(c.columnName)),
      removed = before.columns.filterNot(c => afterByName.contains(c.columnName)),
      retyped = before.columns.flatMap(b =>
        afterByName.get(b.columnName).filter(_.sparkType != b.sparkType).map(b -> _)))
  }
}
