package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** The matvec aggregate: per input row `(s, v)` accumulate
  * `u[i] += round_12(s · v[i])` into a per-position DECIMAL-exact
  * buffer; emit ONE `array<double>` row whose element i is the exact
  * scale-12 sum cast to double.
  *
  * This is the element-wise-identical collapse of the unrolled shape
  *
  * {{{
  *   select(col("s"), posexplode(col("v")).as(Seq("pos", "x")))
  *     .select(col("pos"), (col("s") * col("x")).cast("decimal(27,12)").as("sx"))
  *     .groupBy(col("pos")).agg(sum(col("sx")))   // then .cast("double")
  * }}}
  *
  * but with no n·d-row explosion, no per-element hash-aggregate probe,
  * and an exchange that carries ONE serialized buffer per map
  * partition instead of d rows per partition (optimization guide §2.3,
  * aggregate before you shuffle / shuffle fewer bytes).
  *
  * Exactness contract (the PCA family's oracle-hash argument):
  *  - the per-term quantization reproduces Spark's
  *    `Cast(double → DECIMAL(27,12))` exactly:
  *    `BigDecimal.valueOf(d).setScale(12, HALF_UP)` — valueOf goes
  *    through the canonical `Double.toString` shortest representation,
  *    which is precisely Catalyst's `Decimal(d: Double)` path — and
  *    NaN/Infinity contribute nothing, Catalyst's null-on-non-finite;
  *  - per-position sums are unbounded java BigDecimal adds at scale 12
  *    — exact and associative, so any partition order and any
  *    partial/merge tree yields the identical decimal, exactly like
  *    the DECIMAL sum it replaces;
  *  - the emitted double is `BigDecimal.doubleValue` of that exact
  *    decimal — the same correctly-rounded conversion as
  *    `Decimal.toDouble` in the `.cast("double")` it replaces.
  *
  * Null/ragged semantics (matching the explode shape on well-formed
  * corpora): a null `s` or null `v` row contributes nothing; a null
  * element contributes nothing to its position; arrays may be ragged —
  * the buffer grows to the longest seen, missing tail positions simply
  * don't accumulate. (The one divergence from the explode shape is
  * pathological input it has never seen: a position whose every `s·x`
  * is null/non-finite emits 0 here but a NULL group there — the
  * embeddings tables carry fixed-dim non-null vectors, which the
  * standing oracle parity already proves.) */
case class MatvecDecimalSum(sExpr: Expression, vExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[JBigDecimal]] {

  override def children: Seq[Expression] = Seq(sExpr, vExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "matvec_decimal_sum"

  override def createAggregationBuffer(): ArrayBuffer[JBigDecimal] =
    ArrayBuffer.empty[JBigDecimal]

  private val zero12 = JBigDecimal.ZERO.setScale(12)

  private def grow(buf: ArrayBuffer[JBigDecimal], n: Int): Unit =
    while (buf.length < n) buf += zero12

  override def update(buf: ArrayBuffer[JBigDecimal],
      input: InternalRow): ArrayBuffer[JBigDecimal] = {
    val s = sExpr.eval(input)
    val v = vExpr.eval(input)
    if (s != null && v != null) {
      val sd = s.asInstanceOf[Double]
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      grow(buf, n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val sx = sd * arr.getDouble(i)
          // Cast(double → decimal) is null on NaN/Infinity: skip
          if (!java.lang.Double.isNaN(sx) && !java.lang.Double.isInfinite(sx))
            buf(i) = buf(i).add(
              JBigDecimal.valueOf(sx).setScale(12, RoundingMode.HALF_UP))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: ArrayBuffer[JBigDecimal],
      other: ArrayBuffer[JBigDecimal]): ArrayBuffer[JBigDecimal] = {
    grow(buf, other.length)
    var i = 0
    while (i < other.length) { buf(i) = buf(i).add(other(i)); i += 1 }
    buf
  }

  override def eval(buf: ArrayBuffer[JBigDecimal]): Any =
    new GenericArrayData(buf.map(_.doubleValue()).toArray)

  override def serialize(buf: ArrayBuffer[JBigDecimal]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { bd =>
      out.writeInt(bd.scale)
      val u = bd.unscaledValue.toByteArray
      out.writeInt(u.length)
      out.write(u)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[JBigDecimal] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[JBigDecimal](n)
    var i = 0
    while (i < n) {
      val scale = in.readInt()
      val len = in.readInt()
      val u = new Array[Byte](len)
      in.readFully(u)
      buf += new JBigDecimal(new java.math.BigInteger(u), scale)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MatvecDecimalSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MatvecDecimalSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MatvecDecimalSum =
    copy(sExpr = newChildren(0), vExpr = newChildren(1))
}

object MatvecDecimalSum {
  /** Column wrapper: `matvecSum(s, v)` aggregates to one
    * `array<double>` row (see class doc for the exactness contract). */
  def matvecSum(s: Column, v: Column): Column =
    GraftColumnBridge.column(
      MatvecDecimalSum(
        GraftColumnBridge.expression(s),
        GraftColumnBridge.expression(v)).toAggregateExpression())
}
