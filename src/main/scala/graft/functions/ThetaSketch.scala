package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Theta sketches (Apache DataSketches) — distinct-count sketches
  * that support SET OPERATIONS: union, intersection, and difference
  * estimates over persisted per-slice sketches. This is the capability HLL
  * fundamentally lacks (HLL unions only), and the one cross-corpus
  * curation questions need: estimated shingle/document overlap between two
  * crawls, between a training corpus and a benchmark set (contamination
  * screening), or between snapshot generations — WITHOUT ever joining the
  * raw sets. Per-slice sketches are built in one aggregation pass, rest in
  * a few KB each, and any pairwise/bulk set algebra runs on the sketches
  * alone — at 100 TB the raw-set join this replaces is itself a massive
  * shuffle.
  *
  * Theta retention is hash-threshold based, so a compacted sketch's
  * retained set can depend on partition merge order — like KLL, contract
  * queries surface exact twins + bound booleans (the sketch's own
  * `getLowerBound/getUpperBound`), never raw estimates. Below the nominal
  * entry count the sketch is in exact mode and the bounds collapse to the
  * exact answer.
  */
object Theta {

  private[functions] def heapify(bytes: Array[Byte]): Sketch =
    Sketches.heapifySketch(Memory.wrap(bytes))

  /** One-pass theta sketch over a string/long column → compact sketch
    * bytes. `k` = nominal entries (power of two; exact below it). */
  def thetaSketchAgg(v: Column, k: Int = 4096): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(v), k).toAggregateExpression())

  /** Union serialized sketches → one compact sketch (re-aggregation). */
  def thetaUnionAgg(sk: Column, k: Int = 4096): Column =
    ColumnBridge.column(
      ThetaUnionAgg(ColumnBridge.expression(sk), k).toAggregateExpression())

  /** Intersection of two serialized sketches → compact sketch bytes. */
  def thetaIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(
      ThetaIntersect(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Set difference A \ B of two serialized sketches → compact bytes. */
  def thetaANotB(a: Column, b: Column): Column =
    ColumnBridge.column(
      ThetaANotB(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Distinct-count estimate of a serialized sketch. */
  def thetaEstimate(sk: Column): Column =
    ColumnBridge.column(ThetaEstimate(ColumnBridge.expression(sk)))

  /** Lower / upper confidence bound at `nStd` ∈ {1,2,3} standard errors. */
  def thetaLb(sk: Column, nStd: Int): Column =
    ColumnBridge.column(ThetaBound(ColumnBridge.expression(sk), nStd, upper = false))
  def thetaUb(sk: Column, nStd: Int): Column =
    ColumnBridge.column(ThetaBound(ColumnBridge.expression(sk), nStd, upper = true))

  /** True once the sketch has started sampling (estimation mode) — the
    * loud-failure guard for contracts that rely on exact-mode collapse. */
  def thetaIsEstimation(sk: Column): Column =
    ColumnBridge.column(ThetaIsEstimation(ColumnBridge.expression(sk)))
}

/** `theta_sketch_agg(value[, k])`: theta sketch of a string/bigint column. */
case class ThetaSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(k >= 16 && Integer.bitCount(k) == 1,
    s"theta_sketch_agg: k must be a power of two >= 16, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_agg"

  // Strings hash as UTF-8 bytes, every INTEGRAL type as its long value
  // (an int key column Just Works with the same hash identity as bigint —
  // an ImplicitCastInputTypes TypeCollection can't express this: listing
  // string first coerces ints to text, listing long first coerces text to
  // long). Doubles still fail loudly; a silent double→long or
  // double→string coercion would quietly change hash identity.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType | ShortType | ByteType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects string or integral, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(k).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      // update(byte[]) hashes exactly what update(String) would (the
      // library UTF-8-encodes the string first), and UTF8String is
      // already UTF-8 — skipping the UTF-16 String round-trip on the
      // per-shingle hot path.
      case s: UTF8String => buf.update(s.getBytes)
      case n: java.lang.Number => buf.update(n.longValue())
      case other => buf.update(other.toString)
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setNominalEntries(k).buildUnion()
    u.union(Theta.heapify(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = c(0))
}

/** `theta_union_agg(sketch[, k])`: union of serialized theta sketches. */
case class ThetaUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(k >= 16 && Integer.bitCount(k) == 1,
    s"theta_union_agg: k must be a power of two >= 16, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects serialized sketch bytes, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(k).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Theta.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setNominalEntries(k).buildUnion()
    u.union(Theta.heapify(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = c(0))
}

private[functions] trait ThetaBinaryOp extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckSuccess
    case (l, r) =>
      TypeCheckFailure(s"$prettyName: expects two serialized sketches, got ${l.catalogString}, ${r.catalogString}")
  }
}

/** `theta_intersect(a, b)`: intersection sketch of two serialized sketches. */
case class ThetaIntersect(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "theta_intersect"
  override def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildIntersection()
      .intersect(Theta.heapify(a.asInstanceOf[Array[Byte]]),
        Theta.heapify(b.asInstanceOf[Array[Byte]]))
      .toByteArray
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersect =
    copy(left = l, right = r)
}

/** `theta_a_not_b(a, b)`: difference sketch A \ B. */
case class ThetaANotB(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "theta_a_not_b"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder().buildANotB()
    op.setA(Theta.heapify(a.asInstanceOf[Array[Byte]]))
    op.notB(Theta.heapify(b.asInstanceOf[Array[Byte]]))
    op.getResult(true).toByteArray
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaANotB =
    copy(left = l, right = r)
}

/** `theta_estimate(sketch)`: distinct-count estimate. Nullability inherits
  * from the child (null sketch → null estimate, e.g. after an outer join). */
case class ThetaEstimate(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects serialized sketch bytes, got ${t.catalogString}")
  }
  override def nullSafeEval(sketch: Any): Any =
    Theta.heapify(sketch.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate = copy(child = c)
}

/** `theta_is_estimation(sketch)`: whether the sketch is past its nominal
  * entry count and estimating. Contracts that depend on exact-mode
  * determinism surface this pinned-false, so a data-scale change breaks
  * verification loudly instead of flaking on probabilistic bounds. */
case class ThetaIsEstimation(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "theta_is_estimation"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects serialized sketch bytes, got ${t.catalogString}")
  }
  override def nullSafeEval(sketch: Any): Any =
    Theta.heapify(sketch.asInstanceOf[Array[Byte]]).isEstimationMode
  override protected def withNewChildInternal(c: Expression): ThetaIsEstimation = copy(child = c)
}

/** `theta_lb/theta_ub(sketch, nStd)`: confidence bound at nStd std errors. */
case class ThetaBound(child: Expression, nStd: Int, upper: Boolean)
  extends UnaryExpression with CodegenFallback {
  require(nStd >= 1 && nStd <= 3, s"theta bound: nStd must be 1..3, got $nStd")
  override def dataType: DataType = DoubleType
  override def prettyName: String = if (upper) "theta_ub" else "theta_lb"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects serialized sketch bytes, got ${t.catalogString}")
  }
  override def nullSafeEval(sketch: Any): Any = {
    val sk = Theta.heapify(sketch.asInstanceOf[Array[Byte]])
    if (upper) sk.getUpperBound(nStd) else sk.getLowerBound(nStd)
  }
  override protected def withNewChildInternal(c: Expression): ThetaBound = copy(child = c)
}
