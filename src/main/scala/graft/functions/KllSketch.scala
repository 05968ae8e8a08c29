package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable streaming quantile sketches (Apache DataSketches KLL) — the
  * quantile third of the sketch family next to HLL (distinct) and count-min
  * (frequency): THE distributed percentile pattern at 100 TB. An exact
  * global quantile needs a rank over the full corpus; a KLL sketch is a few
  * KB, built in one pass with partial/final merge like any aggregate,
  * persistable at rest, and re-aggregatable (per-source sketches union to
  * the corpus sketch with NO raw-data rescan) with a proven normalized rank
  * error (~1.65% at 99% confidence for the default k=200).
  *
  * KLL compaction is randomized, so estimates from a compacted sketch are
  * not run-to-run stable — contract queries must surface bound CHECKS
  * (booleans with a generous rank margin) and exact twins, never raw
  * estimates, as hash-verified columns. `getN` (the stream length) IS
  * deterministic and proves lossless merge.
  *
  * Aggregation state is the sketch object itself ([[TypedImperativeAggregate]],
  * the same contract as Spark's own `hll_sketch_agg`): per-row updates stay
  * on-heap, serialization happens only at shuffle boundaries.
  */
object Kll {

  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** One-pass KLL sketch over a double column → serialized sketch bytes. */
  def kllSketchAgg(v: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(v), k).toAggregateExpression())

  /** Union serialized sketches → one serialized sketch (re-aggregation). */
  def kllMergeAgg(sk: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllMergeAgg(ColumnBridge.expression(sk), k).toAggregateExpression())

  /** Quantile estimate at normalized rank `q` (INCLUSIVE criterion); null
    * for an empty sketch. The result is a retained data value. */
  def kllQuantile(sk: Column, q: Column): Column =
    ColumnBridge.column(
      KllQuantile(ColumnBridge.expression(sk), ColumnBridge.expression(q)))

  /** Exact number of values the sketch (and everything merged into it)
    * has seen — deterministic, proves lossless merge. */
  def kllN(sk: Column): Column =
    ColumnBridge.column(KllN(ColumnBridge.expression(sk)))
}

/** `kll_sketch_agg(value[, k])`: KLL sketch of a double column. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with org.apache.spark.sql.graftshim.CastsInputsToDouble {

  require(k >= 8 && k <= 65535, s"kll_sketch_agg: k must be in [8, 65535], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = Kll.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = c(0))
}

/** `kll_merge_agg(sketch[, k])`: union of serialized KLL sketches. */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"kll_merge_agg: k must be in [8, 65535], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects serialized sketch bytes, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(Kll.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = Kll.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = c(0))
}

/** `kll_quantile(sketch, q)`: quantile estimate at normalized rank `q`.
  * Eval-only ([[CodegenFallback]]) — runs on post-aggregate rows (one per
  * group), never on the per-row hot path. */
// `kll_quantile(sk, 0.5)` in SQL parses the rank as DECIMAL(1,1); the
// implicit-cast mixin coerces it (and integer ranks) to double.
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback
  with org.apache.spark.sql.graftshim.CastsInputsToBinaryDouble {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(sketch: Any, q: Any): Any = {
    val sk = Kll.heapify(sketch.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null else sk.getQuantile(q.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantile =
    copy(left = l, right = r)
}

/** `kll_n(sketch)`: exact count of values seen (deterministic). Nullability
  * inherits from the child (null sketch → null, e.g. after an outer join). */
case class KllN(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "kll_n"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects serialized sketch bytes, got ${t.catalogString}")
  }

  override def nullSafeEval(sketch: Any): Any =
    Kll.heapify(sketch.asInstanceOf[Array[Byte]]).getN

  override protected def withNewChildInternal(c: Expression): KllN = copy(child = c)
}
