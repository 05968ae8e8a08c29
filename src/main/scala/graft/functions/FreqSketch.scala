package graft.functions

import java.nio.ByteBuffer

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
  * heaviest items with a guaranteed error bound (≤ 3.5·n/maxMapSize);
  * `NO_FALSE_NEGATIVES` returns EVERY item whose true count exceeds the
  * sketch's maximum error — "which terms/domains/users dominate this
  * 100 TB stream" in one aggregation pass over a few-KB state, mergeable
  * across slices and days with the same guarantee.
  *
  * On-wire format: `[8-byte extraWeight][8-byte extraOffset][DataSketches
  * ItemsSketch bytes]` (big-endian longs). The envelope exists because the
  * library's own serialization treats "no retained items" as "empty",
  * silently DROPPING the stream length and the accumulated error offset —
  * and a purge legitimately empties the map when counts are near-uniform
  * (observed on 2 of 20 real verify-SF sources at maxMapSize=8: the last
  * update triggers a purge whose median subtraction removes every entry).
  * A partial aggregate serialized in that state would under-report `n` and,
  * worse, report error 0 while the true undercount bound is large. The
  * envelope folds the lost `(streamLength, maxError)` into two longs that
  * merges accumulate and the extractors re-apply: `freq_n` stays exact,
  * `freq_max_error` stays a true bound, and the NO_FALSE_NEGATIVES
  * guarantee survives (an item absent from the map has true count ≤
  * sketch offset + extra offset = the reported max error).
  *
  * The purge arithmetic is deterministic but merge-ORDER-dependent in
  * which sub-threshold items it retains, so contract queries surface the
  * guarantee (every exact heavy hitter present, estimates within the
  * reported bounds), not the raw retained map.
  */
object Freq {

  private val serde = new ArrayOfStringsSerDe

  /** Deserialized envelope: the live sketch plus the stream weight and
    * error offset salvaged from any empty-map partials merged in. */
  private[functions] final class State(
      val sk: ItemsSketch[String],
      var extraWeight: Long,
      var extraOffset: Long)

  private[functions] def emptyState(maxMapSize: Int): State =
    new State(new ItemsSketch[String](maxMapSize), 0L, 0L)

  private[functions] def fromBytes(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val w = bb.getLong
    val o = bb.getLong
    val sk = ItemsSketch.getInstance(
      Memory.wrap(bytes, 16, bytes.length - 16, java.nio.ByteOrder.nativeOrder()), serde)
    new State(sk, w, o)
  }

  private[functions] def toBytes(st: State): Array[Byte] = {
    // Fold an empty-map-with-weight sketch into the envelope BEFORE the
    // library drops it: its bytes would come back as a zero-weight empty.
    // The fold mutates the state (not locals), so serializing the same
    // buffer twice is idempotent.
    if (st.sk.getNumActiveItems == 0 && st.sk.getStreamLength > 0) {
      st.extraWeight += st.sk.getStreamLength
      st.extraOffset += st.sk.getMaximumError
      st.sk.reset()
    }
    val skb = st.sk.toByteArray(serde)
    ByteBuffer.allocate(16 + skb.length)
      .putLong(st.extraWeight).putLong(st.extraOffset).put(skb).array()
  }

  private[functions] def mergeInto(buf: State, other: State): State = {
    buf.sk.merge(other.sk)
    buf.extraWeight += other.extraWeight
    buf.extraOffset += other.extraOffset
    buf
  }

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
  extends TypedImperativeAggregate[Freq.State] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"freq_sketch_agg: maxMapSize must be a power of two >= 8, got $maxMapSize")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_sketch_agg"

  // Strings plus the types whose INTERNAL value prints exactly as the
  // semantic value (integrals, boolean): items sketch via that canonical
  // string, so an int key column Just Works. Everything else fails loudly
  // — serialized-sketch bytes especially (an implicit binary→string cast
  // would silently build a garbage sketch when freq_merge_agg was meant),
  // and date/timestamp/decimal print their internal representation, so
  // the caller must cast to string explicitly to pick the item identity.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType =>
      TypeCheckFailure(s"$prettyName: got serialized bytes — use freq_merge_agg to merge sketches")
    case StringType | LongType | IntegerType | ShortType | ByteType | BooleanType =>
      TypeCheckSuccess
    case t => TypeCheckFailure(
      s"$prettyName: expects string / integral / boolean, got ${t.catalogString} — cast to string")
  }

  override def createAggregationBuffer(): Freq.State = Freq.emptyState(maxMapSize)

  override def update(buf: Freq.State, input: InternalRow): Freq.State = {
    val v = child.eval(input)
    if (v != null) buf.sk.update(v.toString)
    buf
  }

  override def merge(buf: Freq.State, other: Freq.State): Freq.State =
    Freq.mergeInto(buf, other)

  override def eval(buf: Freq.State): Any = Freq.toBytes(buf)

  override def serialize(buf: Freq.State): Array[Byte] = Freq.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Freq.State = Freq.fromBytes(bytes)

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
  extends TypedImperativeAggregate[Freq.State] {

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

  override def createAggregationBuffer(): Freq.State = Freq.emptyState(maxMapSize)

  override def update(buf: Freq.State, input: InternalRow): Freq.State = {
    val v = child.eval(input)
    if (v != null) Freq.mergeInto(buf, Freq.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Freq.State, other: Freq.State): Freq.State =
    Freq.mergeInto(buf, other)

  override def eval(buf: Freq.State): Any = Freq.toBytes(buf)

  override def serialize(buf: Freq.State): Array[Byte] = Freq.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Freq.State = Freq.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqMergeAgg =
    copy(child = c(0))
}

/** `freq_items(sketch)`: NO_FALSE_NEGATIVES heavy hitters, heaviest first.
  * Upper bounds are widened by the envelope's salvaged error offset so
  * containment (`lb ≤ true count ≤ ub`) survives empty-map partials.
  * Nullability is inherited from the child (UnaryExpression default): a
  * null sketch — e.g. from an outer join — yields null, and declaring
  * otherwise would let the optimizer elide the null check. */
case class FreqItems(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("lb", LongType, nullable = false),
      StructField("ub", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "freq_items"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects serialized sketch bytes, got ${t.catalogString}")
  }
  override def nullSafeEval(sketch: Any): Any = {
    val st = Freq.fromBytes(sketch.asInstanceOf[Array[Byte]])
    val rows = st.sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    new GenericArrayData(rows.map(r =>
      InternalRow(UTF8String.fromString(r.getItem), r.getEstimate, r.getLowerBound,
        r.getUpperBound + st.extraOffset)).toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): FreqItems = copy(child = c)
}

/** `freq_max_error(sketch)`: maximum estimation error (0 = exact). */
case class FreqMaxError(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "freq_max_error"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects serialized sketch bytes, got ${t.catalogString}")
  }
  override def nullSafeEval(sketch: Any): Any = {
    val st = Freq.fromBytes(sketch.asInstanceOf[Array[Byte]])
    st.sk.getMaximumError + st.extraOffset
  }
  override protected def withNewChildInternal(c: Expression): FreqMaxError = copy(child = c)
}

/** `freq_n(sketch)`: exact stream length through merges. */
case class FreqN(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "freq_n"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects serialized sketch bytes, got ${t.catalogString}")
  }
  override def nullSafeEval(sketch: Any): Any = {
    val st = Freq.fromBytes(sketch.asInstanceOf[Array[Byte]])
    st.sk.getStreamLength + st.extraWeight
  }
  override protected def withNewChildInternal(c: Expression): FreqN = copy(child = c)
}
