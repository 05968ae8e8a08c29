package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable frequent-items (heavy-hitter) sketches (Apache DataSketches
  * Frequencies, the Misra–Gries / space-saving family) — the frequency
  * member of the sketch set next to HLL/theta (distinct), count-min
  * (point frequency), and KLL (quantiles). A fixed-size map tracks the
  * heaviest items with a guaranteed error bound ≤ n/(k/2 ... load factor);
  * `NO_FALSE_NEGATIVES` returns EVERY item whose true count exceeds the
  * sketch's maximum error — "which terms/domains/users dominate this
  * 100 TB stream" in one aggregation pass over a few-KB state, mergeable
  * across slices and days with the same guarantee.
  *
  * The purge arithmetic is deterministic but merge-ORDER-dependent in
  * which sub-threshold items it retains, so contract queries surface the
  * guarantee (every exact heavy hitter present, estimates within
  * `getMaximumError`), not the raw retained map.
  */
object Freq {

  private val serde = new ArrayOfStringsSerDe

  private[functions] def heapify(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  private[functions] def toBytes(sk: ItemsSketch[String]): Array[Byte] =
    sk.toByteArray(serde)

  /** One-pass frequent-items sketch over a string column; `maxMapSize`
    * (power of two) bounds the state and the error (≤ 3.5·n/maxMapSize). */
  def freqSketchAgg(v: Column, maxMapSize: Int = 1024): Column =
    ColumnBridge.column(
      FreqSketchAgg(ColumnBridge.expression(v), maxMapSize).toAggregateExpression())

  /** Union serialized frequent-items sketches (same guarantees). */
  def freqMergeAgg(sk: Column, maxMapSize: Int = 1024): Column =
    ColumnBridge.column(
      FreqMergeAgg(ColumnBridge.expression(sk), maxMapSize).toAggregateExpression())

  /** `NO_FALSE_NEGATIVES` frequent items of a serialized sketch:
    * `array<struct<item, est, lb, ub>>`, heaviest first — contains every
    * item whose true count > the sketch's maximum error. */
  def freqItems(sk: Column): Column =
    ColumnBridge.column(FreqItems(ColumnBridge.expression(sk)))

  /** The sketch's maximum estimation error (0 = exact mode). */
  def freqMaxError(sk: Column): Column =
    ColumnBridge.column(FreqMaxError(ColumnBridge.expression(sk)))

  /** Total stream length the sketch has seen (exact through merges). */
  def freqN(sk: Column): Column =
    ColumnBridge.column(FreqN(ColumnBridge.expression(sk)))
}

/** `freq_sketch_agg(value[, maxMapSize])`. */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"freq_sketch_agg: maxMapSize must be a power of two >= 8, got $maxMapSize")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects a string column, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other)
    buf
  }

  override def eval(buf: ItemsSketch[String]): Any = Freq.toBytes(buf)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] = Freq.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] = Freq.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = c(0))
}

/** `freq_merge_agg(sketch[, maxMapSize])`. */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"freq_merge_agg: maxMapSize must be a power of two >= 8, got $maxMapSize")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects serialized sketch bytes, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.merge(Freq.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other)
    buf
  }

  override def eval(buf: ItemsSketch[String]): Any = Freq.toBytes(buf)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] = Freq.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] = Freq.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqMergeAgg =
    copy(child = c(0))
}

/** `freq_items(sketch)`: NO_FALSE_NEGATIVES heavy hitters, heaviest first. */
case class FreqItems(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("lb", LongType, nullable = false),
      StructField("ub", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects serialized sketch bytes, got ${t.catalogString}")
  }
  override def nullSafeEval(sketch: Any): Any = {
    val rows = Freq.heapify(sketch.asInstanceOf[Array[Byte]])
      .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    new GenericArrayData(rows.map(r =>
      InternalRow(UTF8String.fromString(r.getItem), r.getEstimate, r.getLowerBound,
        r.getUpperBound)).toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): FreqItems = copy(child = c)
}

/** `freq_max_error(sketch)`: maximum estimation error (0 = exact). */
case class FreqMaxError(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_max_error"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects serialized sketch bytes, got ${t.catalogString}")
  }
  override def nullSafeEval(sketch: Any): Any =
    Freq.heapify(sketch.asInstanceOf[Array[Byte]]).getMaximumError
  override protected def withNewChildInternal(c: Expression): FreqMaxError = copy(child = c)
}

/** `freq_n(sketch)`: exact stream length through merges. */
case class FreqN(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_n"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects serialized sketch bytes, got ${t.catalogString}")
  }
  override def nullSafeEval(sketch: Any): Any =
    Freq.heapify(sketch.asInstanceOf[Array[Byte]]).getStreamLength
  override protected def withNewChildInternal(c: Expression): FreqN = copy(child = c)
}
