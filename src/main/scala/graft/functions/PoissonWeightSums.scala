package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** All R Poisson-bootstrap replicate weights of a row, summed per group in
  * ONE aggregation buffer — the raw-loop replacement for the
  * explode(sequence(0, R−1)) → per-(group, j) hash-aggregate shape (the
  * [[graft.operators.Pca]] CovMomentsAgg lesson: a 64× generate fans every
  * row through 64 virtual-row copies, 64 group-hash probes and a
  * per-element expression chain, which measures several times the actual
  * arithmetic; here the same 64 integer hash chains run in a tight while
  * loop over a long[R] buffer — zero row amplification, R-long buffers
  * merge map-side).
  *
  * The integer chain is BIT-IDENTICAL to the Column spelling in
  * [[graft.operators.Bootstrap]] (keyHash → replicateUniform →
  * poissonWeight): the input must already be the reduced key hash
  * h ∈ [0, P) (produced by `Bootstrap.keyHash` — reduction-before-multiply
  * is that function's contract); x = (h + j·1000003) mod P stays
  * < P + 64·10⁶, x² < (10⁹+7)² ≈ 10¹⁸ < 2⁶³, and (x² mod P)·A + x <
  * P·A + P ≈ 2.66·10¹⁸ < 2⁶³ — every intermediate exact in Long, and all
  * operands non-negative so `%` equals pmod. The cutoffs ship as literal
  * state (the codebook-in-expression pattern), sourced from
  * `Bootstrap.PoissonCutoffs` so the two engines' draws share one
  * constant. */
case class PoissonWeightSums(
    hashExpr: Expression,
    replicates: Int,
    cutoffs: Array[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(replicates >= 1, s"poisson_weight_sums: replicates must be >= 1, got $replicates")

  private val P = PortableHash.P
  private val A = PortableHash.A

  override def children: Seq[Expression] = Seq(hashExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "poisson_weight_sums"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = hashExpr.dataType match {
    case LongType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName: expects a bigint key hash, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](replicates)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = hashExpr.eval(input)
    if (hv != null) {
      val h = hv.asInstanceOf[Long]
      var j = 0
      while (j < replicates) {
        val x = (h + j * 1000003L) % P
        val u = ((x * x % P) * A + x) % P
        var w = 0
        var c = 0
        while (c < cutoffs.length) { if (u >= cutoffs(c)) w += 1; c += 1 }
        buf(j) += w
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < replicates) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * replicates)
    var j = 0
    while (j < replicates) { bb.putLong(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](replicates)
    var j = 0
    while (j < replicates) { buf(j) = bb.getLong; j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): PoissonWeightSums =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PoissonWeightSums =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): PoissonWeightSums =
    copy(hashExpr = c(0))
}

object PoissonWeightSums {
  /** Column entry point: `poissonWeightSums(keyHash, R, cutoffs)` →
    * `array<bigint>` of the R per-replicate weight sums of the group. */
  def poissonWeightSums(hash: Column, replicates: Int, cutoffs: Seq[Long]): Column =
    ColumnBridge.column(
      PoissonWeightSums(ColumnBridge.expression(hash), replicates, cutoffs.toArray)
        .toAggregateExpression())

  /** Column entry point for the value-weighted form:
    * `poissonWeightedSums(keyHash, cents, R, cutoffs)` →
    * `array<struct<vw decimal(18,2), wt bigint>>` — per replicate, the
    * exact Σ value·weight (carried as integer cents) and Σ weight. */
  def poissonWeightedSums(
      hash: Column, cents: Column, replicates: Int, cutoffs: Seq[Long]): Column =
    ColumnBridge.column(
      PoissonWeightedSums(ColumnBridge.expression(hash), ColumnBridge.expression(cents),
        replicates, cutoffs.toArray)
        .toAggregateExpression())
}

/** The value-weighted sibling of [[PoissonWeightSums]]: per group, ALL R
  * per-replicate (Σ value·weight, Σ weight) pairs in one buffer — the
  * raw-loop replacement for the explode(sequence) shape in STREAMING
  * bootstrap state, where the R-way row fan-out costs twice over (the
  * generate itself, then R× rows through the stateful-aggregation
  * exchange and state store; measured 12 s vs ~2 s for the sibling
  * streaming monitors at sf0.1). The value arrives as EXACT integer
  * cents (the DECIMAL(18,2) money convention × 100 — an exact integer by
  * construction); products and sums accumulate in checked Long
  * arithmetic (Math.addExact — Σ|cents|·9 < 2⁶³ means ~10¹⁶ currency
  * units per group, far beyond any real window; a violation fails
  * LOUDLY, never wraps), and eval rescales to DECIMAL(18,2), so the
  * emitted sums are bit-identical to `sum(v·w)` over the explode. */
case class PoissonWeightedSums(
    hashExpr: Expression,
    centsExpr: Expression,
    replicates: Int,
    cutoffs: Array[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(replicates >= 1, s"poisson_weighted_sums: replicates must be >= 1, got $replicates")

  private val P = PortableHash.P
  private val A = PortableHash.A

  override def children: Seq[Expression] = Seq(hashExpr, centsExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "poisson_weighted_sums"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("vw", DecimalType(18, 2), nullable = false),
      StructField("wt", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (hashExpr.dataType, centsExpr.dataType) match {
      case (LongType, LongType) => TypeCheckSuccess
      case (h, c) => TypeCheckFailure(
        s"$prettyName: expects (bigint key hash, bigint cents), got " +
          s"${h.catalogString}, ${c.catalogString}")
    }

  // layout: [0, R) value·weight cents, [R, 2R) weights
  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * replicates)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = hashExpr.eval(input)
    val cv = centsExpr.eval(input)
    if (hv != null && cv != null) {
      val h = hv.asInstanceOf[Long]
      val cents = cv.asInstanceOf[Long]
      var j = 0
      while (j < replicates) {
        val x = (h + j * 1000003L) % P
        val u = ((x * x % P) * A + x) % P
        var w = 0
        var c = 0
        while (c < cutoffs.length) { if (u >= cutoffs(c)) w += 1; c += 1 }
        if (w > 0) {
          buf(j) = Math.addExact(buf(j), Math.multiplyExact(cents, w.toLong))
          buf(replicates + j) += w
        }
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 2 * replicates) { buf(j) = Math.addExact(buf(j), other(j)); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(Array.tabulate[Any](replicates) { j =>
      InternalRow(org.apache.spark.sql.types.Decimal(
        java.math.BigDecimal.valueOf(buf(j), 2), 18, 2), buf(replicates + j))
    })

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * replicates)
    var j = 0
    while (j < 2 * replicates) { bb.putLong(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](2 * replicates)
    var j = 0
    while (j < 2 * replicates) { buf(j) = bb.getLong; j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): PoissonWeightedSums =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PoissonWeightedSums =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): PoissonWeightedSums =
    copy(hashExpr = c(0), centsExpr = c(1))
}
