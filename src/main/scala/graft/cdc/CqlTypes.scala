package graft.cdc

import org.apache.spark.sql.types._

/** The CQL type model — the reference's `ChangeSchema.CqlType` /
  * `DataType` / `UdtType` (scylla-cdc-base
  * .../model/worker/ChangeSchema.java:13-275) re-expressed for Spark:
  * the same native/collection split, frozen-ness, type arguments and
  * UDT field maps, PLUS a bidirectional mapping to Spark SQL types so
  * a CQL-typed CDC table can be laid out in a lakehouse and read back
  * without losing the semantics that drive the replicator (a
  * non-atomic column takes the collection-cell path of
  * [[CdcOps.collectionApplyFromLog]]; an atomic one the scalar LWW
  * path).
  */
object CqlTypes {

  /** CQL type tag; ordinal order matters — everything before LIST is
    * native (ChangeSchema.java CqlType + isNative). */
  sealed abstract class CqlType(val ordinal: Int) {
    def isNative: Boolean = ordinal < List.ordinal
    def name: String = toString
  }
  case object Ascii extends CqlType(0) { override def toString = "ASCII" }
  case object Bigint extends CqlType(1) { override def toString = "BIGINT" }
  case object Blob extends CqlType(2) { override def toString = "BLOB" }
  case object Boolean extends CqlType(3) { override def toString = "BOOLEAN" }
  case object Counter extends CqlType(4) { override def toString = "COUNTER" }
  case object Decimal extends CqlType(5) { override def toString = "DECIMAL" }
  case object Double extends CqlType(6) { override def toString = "DOUBLE" }
  case object Float extends CqlType(7) { override def toString = "FLOAT" }
  case object Int extends CqlType(8) { override def toString = "INT" }
  case object Text extends CqlType(9) { override def toString = "TEXT" }
  case object Timestamp extends CqlType(10) { override def toString = "TIMESTAMP" }
  case object Uuid extends CqlType(11) { override def toString = "UUID" }
  case object Varchar extends CqlType(12) { override def toString = "VARCHAR" }
  case object Varint extends CqlType(13) { override def toString = "VARINT" }
  case object Timeuuid extends CqlType(14) { override def toString = "TIMEUUID" }
  case object Inet extends CqlType(15) { override def toString = "INET" }
  case object Date extends CqlType(16) { override def toString = "DATE" }
  case object Time extends CqlType(17) { override def toString = "TIME" }
  case object Smallint extends CqlType(18) { override def toString = "SMALLINT" }
  case object Tinyint extends CqlType(19) { override def toString = "TINYINT" }
  case object Duration extends CqlType(20) { override def toString = "DURATION" }
  case object List extends CqlType(21) { override def toString = "LIST" }
  case object Map extends CqlType(22) { override def toString = "MAP" }
  case object Set extends CqlType(23) { override def toString = "SET" }
  case object Udt extends CqlType(24) { override def toString = "UDT" }
  case object Tuple extends CqlType(25) { override def toString = "TUPLE" }

  /** CQL DURATION value — the (months, days, nanoseconds) triple
    * (worker/cql/CqlDuration.java:8-77). Calendar and clock components
    * never merge (a month has no fixed nanosecond length), which is
    * why this is a real value class and not a single scalar.
    * Rendering matches the reference exactly: one sign prefix when any
    * component is negative, then y/mo/d/h/m/s/ms/us/ns with each unit
    * emitted only while it fits the remainder (appendUnit semantics —
    * `CqlDuration(14, 2, 3)` renders `1y2mo2d3ns`). */
  final case class CqlDuration(months: Long, days: Long, nanoseconds: Long) {
    override def toString: String = {
      val sb = new StringBuilder
      if (months < 0 || days < 0 || nanoseconds < 0) sb.append('-')
      def appendUnit(count: Long, unitFactor: Long, unitName: String): Long =
        if (count == 0 || count < unitFactor) count
        else { sb.append(count / unitFactor).append(unitName); count % unitFactor }
      appendUnit(appendUnit(math.abs(months), 12, "y"), 1, "mo")
      appendUnit(math.abs(days), 1, "d")
      val afterH = appendUnit(math.abs(nanoseconds), 3600000000000L, "h")
      val afterM = appendUnit(afterH, 60000000000L, "m")
      val afterS = appendUnit(afterM, 1000000000L, "s")
      val afterMs = appendUnit(afterS, 1000000L, "ms")
      appendUnit(appendUnit(afterMs, 1000L, "us"), 1L, "ns")
      sb.toString
    }
  }

  /** CQL DATE value — a plain (year, month, day) triple
    * (worker/cql/CqlDate.java:8-57): no timezone, no epoch bound
    * (pre-epoch and pre-Gregorian dates are legal CQL DATEs), which is
    * why it is not a java.sql.Date. Renders `y-MM-dd` with the
    * reference's two-digit padding of month/day only. */
  final case class CqlDate(year: Int, month: Int, day: Int) {
    private def pad(s: String) = if (s.length < 2) "0" + s else s
    override def toString: String =
      s"$year-${pad(month.toString)}-${pad(day.toString)}"
  }

  /** UDT shape: ordered field name → type, plus its qualified name
    * (ChangeSchema.UdtType). */
  final case class UdtType(fields: Seq[(String, CqlDataType)], keyspace: String, name: String)

  /** A full CQL data type (ChangeSchema.DataType): tag + frozen-ness +
    * type arguments (LIST/SET/MAP/TUPLE) or UDT shape. */
  final case class CqlDataType(
      cqlType: CqlType,
      typeArguments: Seq[CqlDataType] = Nil,
      udtType: Option[UdtType] = None,
      frozen: Boolean = false) {

    private def needsArgs = cqlType match {
      case List | Map | Set | Tuple => true
      case _ => false
    }
    require(typeArguments.nonEmpty == needsArgs,
      s"unexpected type arguments for $cqlType")
    require(udtType.isDefined == (cqlType == Udt),
      s"unexpected UdtType for $cqlType")

    def isNative: Boolean = cqlType.isNative
    def isFrozen: Boolean = frozen

    /** Atomic = updated only as a whole; non-atomic columns get the
      * cdc$deleted_elements treatment in the log (ChangeSchema.java
      * isAtomic; docs "Advanced column types"). */
    def isAtomic: Boolean = isNative || isFrozen

    /** Reference rendering, e.g. `FROZEN<MAP<INT, TEXT>>`. */
    override def toString: String = {
      val body = new StringBuilder(cqlType.name)
      if (typeArguments.nonEmpty)
        body.append(typeArguments.mkString("<", ", ", ">"))
      udtType.foreach { u =>
        body.append('(').append(u.keyspace).append('.').append(u.name).append(')')
        body.append(u.fields.map { case (n, t) => s"$n $t" }.mkString("{", ", ", "}"))
      }
      if (frozen) s"FROZEN<$body>" else body.toString
    }
  }

  def native(t: CqlType): CqlDataType = {
    require(t.isNative, s"$t is not a native type"); CqlDataType(t)
  }
  def list(v: CqlDataType, frozen: Boolean = false): CqlDataType =
    CqlDataType(List, Seq(v), None, frozen)
  def set(v: CqlDataType, frozen: Boolean = false): CqlDataType =
    CqlDataType(Set, Seq(v), None, frozen)
  def map(k: CqlDataType, v: CqlDataType, frozen: Boolean = false): CqlDataType =
    CqlDataType(Map, Seq(k, v), None, frozen)
  def tuple(args: Seq[CqlDataType]): CqlDataType =
    CqlDataType(Tuple, args, None, frozen = true) // tuples are always frozen
  def udt(keyspace: String, name: String, fields: Seq[(String, CqlDataType)],
      frozen: Boolean = false): CqlDataType =
    CqlDataType(Udt, Nil, Some(UdtType(fields, keyspace, name)), frozen)

  /** CQL → Spark lakehouse layout. Types Spark lacks natively land on
    * the faithful-by-convention representation the CDC community uses
    * for parquet: uuid/timeuuid/inet as STRING, varint as
    * DECIMAL(38,0), duration as the (months, days, nanos) struct,
    * time as nanos-of-day LONG, counter as LONG, sets as arrays,
    * UDTs/tuples as structs. */
  def toSparkType(t: CqlDataType): DataType = t.cqlType match {
    case Ascii | Text | Varchar => StringType
    case Bigint | Counter => LongType
    case Blob => BinaryType
    case Boolean => BooleanType
    case Decimal => DecimalType(38, 18)
    case Double => DoubleType
    case Float => FloatType
    case Int => IntegerType
    case Timestamp => TimestampType
    case Uuid | Timeuuid | Inet => StringType
    case Varint => DecimalType(38, 0)
    case Date => DateType
    case Time => LongType
    case Smallint => ShortType
    case Tinyint => ByteType
    case Duration => StructType(Seq(
      StructField("months", IntegerType), StructField("days", IntegerType),
      StructField("nanoseconds", LongType)))
    case List | Set => ArrayType(toSparkType(t.typeArguments.head))
    case Map => MapType(toSparkType(t.typeArguments.head), toSparkType(t.typeArguments(1)))
    case Tuple => StructType(t.typeArguments.zipWithIndex.map { case (a, i) =>
      StructField(s"_${i + 1}", toSparkType(a))
    })
    case Udt => StructType(t.udtType.get.fields.map { case (n, ft) =>
      StructField(n, toSparkType(ft))
    })
  }

  /** Spark → best-effort CQL classification (the inverse direction a
    * lakehouse catalog needs when the CDC table was created from a
    * Spark schema). Collections map to their non-frozen CQL forms —
    * the CDC-relevant default; structs to frozen tuples (field names
    * aren't UDT-qualified in Spark). */
  def fromSparkType(d: DataType): CqlDataType = d match {
    case StringType => native(Text)
    case LongType => native(Bigint)
    case IntegerType => native(Int)
    case ShortType => native(Smallint)
    case ByteType => native(Tinyint)
    case DoubleType => native(Double)
    case FloatType => native(Float)
    case BooleanType => native(Boolean)
    case BinaryType => native(Blob)
    case _: DecimalType => native(Decimal)
    case TimestampType | TimestampNTZType => native(Timestamp)
    case DateType => native(Date)
    case ArrayType(e, _) => list(fromSparkType(e))
    case MapType(k, v, _) => map(fromSparkType(k), fromSparkType(v))
    // the documented duration layout (see toSparkType) round-trips back
    // to DURATION — field names + types are the convention's signature
    case StructType(Array(
        StructField("months", IntegerType, _, _),
        StructField("days", IntegerType, _, _),
        StructField("nanoseconds", LongType, _, _))) => native(Duration)
    case StructType(fields) => tuple(fields.toSeq.map(f => fromSparkType(f.dataType)))
    case other => throw new IllegalArgumentException(s"no CQL analogue for $other")
  }

  /** Typed cell value — the reference's `Field`
    * (worker/cql/Field.java): a value + its CQL data type, with
    * cast-style accessors so consumer code written against the
    * reference ports mechanically. */
  final case class Field(value: Any, dataType: CqlDataType) {
    def getAsObject: Any = value
    def isNull: Boolean = value == null
    def getString: String = value.asInstanceOf[String]
    def getLong: java.lang.Long = value.asInstanceOf[java.lang.Long]
    def getInt: java.lang.Integer = value.asInstanceOf[java.lang.Integer]
    def getShort: java.lang.Short = value.asInstanceOf[java.lang.Short]
    def getByte: java.lang.Byte = value.asInstanceOf[java.lang.Byte]
    def getDouble: java.lang.Double = value.asInstanceOf[java.lang.Double]
    def getFloat: java.lang.Float = value.asInstanceOf[java.lang.Float]
    def getBoolean: java.lang.Boolean = value.asInstanceOf[java.lang.Boolean]
    def getDecimal: java.math.BigDecimal = value match {
      case b: java.math.BigDecimal => b
      case b: scala.math.BigDecimal => b.bigDecimal
      case other => other.asInstanceOf[java.math.BigDecimal]
    }
    def getBytes: Array[Byte] = value.asInstanceOf[Array[Byte]]
    def getTimestamp: java.sql.Timestamp = value.asInstanceOf[java.sql.Timestamp]

    /** DURATION cell as the reference value class
      * (worker/cql/Field.java getDuration). Accepts the value class
      * itself or the Spark lakehouse layout — the
      * (months, days, nanoseconds) struct Row from [[toSparkType]]. */
    def getDuration: CqlDuration = value match {
      case d: CqlDuration => d
      case r: org.apache.spark.sql.Row =>
        CqlDuration(r.getAs[Number]("months").longValue(),
          r.getAs[Number]("days").longValue(),
          r.getAs[Number]("nanoseconds").longValue())
      case other => throw new IllegalStateException(s"not a duration: $other")
    }

    /** DATE cell as the reference value class (worker/cql/Field.java
      * getDate). Accepts the value class or Spark's DateType values. */
    def getDate: CqlDate = value match {
      case d: CqlDate => d
      case d: java.sql.Date =>
        val ld = d.toLocalDate
        CqlDate(ld.getYear, ld.getMonthValue, ld.getDayOfMonth)
      case d: java.time.LocalDate => CqlDate(d.getYear, d.getMonthValue, d.getDayOfMonth)
      case other => throw new IllegalStateException(s"not a date: $other")
    }

    private def elemType(i: Int): CqlDataType = dataType.cqlType match {
      case Udt => throw new IllegalStateException("use getUDT for UDT fields")
      case _ => dataType.typeArguments(i)
    }
    /** LIST/SET elements as typed fields. */
    def getList: Seq[Field] =
      value.asInstanceOf[Seq[Any]].map(Field(_, elemType(0)))
    def getSet: Seq[Field] = getList
    /** MAP entries as typed field pairs. */
    def getMap: Seq[(Field, Field)] =
      value.asInstanceOf[scala.collection.Map[Any, Any]].toSeq
        .map { case (k, v) => (Field(k, elemType(0)), Field(v, elemType(1))) }
    /** UDT fields by name (reference getUDT: Map[String, Field]). */
    def getUDT: Seq[(String, Field)] = {
      val u = dataType.udtType.getOrElse(
        throw new IllegalStateException(s"not a UDT: $dataType"))
      val row = value.asInstanceOf[org.apache.spark.sql.Row]
      u.fields.zipWithIndex.map { case ((n, ft), i) => n -> Field(row.get(i), ft) }
    }
    def getTuple: Seq[Field] = {
      val row = value.asInstanceOf[org.apache.spark.sql.Row]
      dataType.typeArguments.zipWithIndex.map { case (t, i) => Field(row.get(i), t) }
    }
  }
}
