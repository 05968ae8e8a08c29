package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native kernels for product quantization ([[graft.operators.Pq]]).
  *
  * Both carry their (tiny: m × ksub × dsub doubles) codebook/LUT state as
  * constructor parameters — the driver-trained model ships to executors
  * inside the serialized expression tree, the expression-level analog of a
  * broadcast model table. They are eval-mode (CodegenFallback) by intent:
  * inlining the codebook as m×ksub literal struct nodes makes Janino
  * compile a quadratic-size class per (m, ksub) setting, while here the
  * per-row work is already one tight primitive loop and the fallback's
  * per-row dispatch is amortized over m·ksub·dsub arithmetic ops.
  */

/** Encode one embedding to its PQ form: per subspace j, argmin over the
  * codebook's `ksub` centroids (exact squared-L2, ties to the lowest
  * index), emitting struct(code: array<int>, recon_nrm: double) where
  * `recon_nrm` is the L2 norm of the reconstruction (‖concat of chosen
  * centroids‖) — precomputed at rest so cosine ADC never touches floats. */
case class PqEncode(child: Expression, centroids: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  private val m = centroids.length
  private val dsub = centroids(0)(0).length

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = StructType(Seq(
    StructField("code", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("recon_nrm", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    ArrayTypeChecks.numericArray(child.dataType, prettyName, "embedding")

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    require(arr.numElements() == m * dsub,
      s"$prettyName: expected ${m * dsub}-dim embedding, got ${arr.numElements()}")
    val x = new Array[Double](m * dsub)
    var i = 0
    if (isFloat) while (i < x.length) { x(i) = arr.getFloat(i); i += 1 }
    else while (i < x.length) { x(i) = arr.getDouble(i); i += 1 }

    val code = new Array[Int](m)
    var nrmSq = 0.0
    var j = 0
    while (j < m) {
      val cents = centroids(j)
      val off = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var t = 0
        while (t < dsub) { val e = x(off + t) - cent(t); d += e * e; t += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      code(j) = best
      val chosen = cents(best)
      var t = 0
      while (t < dsub) { nrmSq += chosen(t) * chosen(t); t += 1 }
      j += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(code.map(Int.box)), math.sqrt(nrmSq)))
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** ADC scoring generator: for each query in the driver-built LUT set, the
  * estimated cosine of this corpus vector — Σⱼ LUT[j][codeⱼ] divided by
  * ‖q‖·‖recon‖. Emits (query_id, cosine) per query; the corpus side reads
  * only (code, recon_nrm). `luts(q) = (query_id, ‖q‖, m × ksub table)`. */
case class PqAdcScores(
    code: Expression,
    reconNrm: Expression,
    luts: Array[(Long, Double, Array[Array[Double]])])
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(code, reconNrm)
  override def prettyName: String = "pq_adc_scores"

  override def elementSchema: StructType = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = (code.dataType, reconNrm.dataType) match {
    case (ArrayType(IntegerType, _), DoubleType) => TypeCheckSuccess
    case (c, r) => TypeCheckFailure(
      s"$prettyName: inputs must be (array<int>, double), got (${c.catalogString}, ${r.catalogString})")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val codeV = code.eval(input)
    val nrmV = reconNrm.eval(input)
    if (codeV == null || nrmV == null) return Iterator.empty
    val codes = codeV.asInstanceOf[ArrayData].toIntArray()
    val rNrm = nrmV.asInstanceOf[Double]
    val out = new Array[InternalRow](luts.length)
    var q = 0
    while (q < luts.length) {
      val (qid, qNrm, lut) = luts(q)
      var s = 0.0
      var j = 0
      while (j < codes.length) { s += lut(j)(codes(j)); j += 1 }
      val denom = qNrm * rNrm
      val cos = if (denom == 0.0) 0.0 else s / denom
      out(q) = new GenericInternalRow(Array[Any](qid, cos))
      q += 1
    }
    out
  }

  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqAdcScores =
    copy(code = newChildren(0), reconNrm = newChildren(1))
}

object PqExpressions {
  def pqEncode(embedding: Column, centroids: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(embedding), centroids))

  def pqAdcScores(
      code: Column, reconNrm: Column,
      luts: Array[(Long, Double, Array[Array[Double]])]): Column =
    ColumnBridge.column(PqAdcScores(
      ColumnBridge.expression(code), ColumnBridge.expression(reconNrm), luts))
}
