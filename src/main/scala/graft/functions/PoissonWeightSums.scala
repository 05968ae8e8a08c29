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

  private val P = 1000000007L
  private val A = 2654435761L

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
}
