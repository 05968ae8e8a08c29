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

/** IVF-PQ encode: residual coding (FAISS `IVFPQ`) — quantize
  * x − centroid(cell) with the PQ codebooks and emit
  * struct(code: array<int>, recon_nrm: double) where `recon_nrm` is the
  * norm of the FULL reconstruction centroid + pq_recon(residual). One
  * eval pass per row; both codebooks ride in the serialized expression. */
case class IvfPqEncode(
    embedding: Expression,
    cellId: Expression,
    ivfCents: Array[Array[Double]],
    pqCents: Array[Array[Array[Double]]])
    extends Expression with CodegenFallback {

  private val m = pqCents.length
  private val dsub = pqCents(0)(0).length

  override def children: Seq[Expression] = Seq(embedding, cellId)
  override def prettyName: String = "ivfpq_encode"
  override def nullable: Boolean = embedding.nullable || cellId.nullable
  override def dataType: DataType = StructType(Seq(
    StructField("code", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("recon_nrm", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    val e = ArrayTypeChecks.numericArray(embedding.dataType, prettyName, "embedding")
    if (e != TypeCheckSuccess) e
    else if (cellId.dataType == IntegerType || cellId.dataType == LongType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName: cell_id must be int or bigint, got ${cellId.dataType.catalogString}")
  }

  private lazy val isFloat: Boolean =
    embedding.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val arrV = embedding.eval(input)
    val cellV = cellId.eval(input)
    if (arrV == null || cellV == null) return null
    val arr = arrV.asInstanceOf[ArrayData]
    val cell = cellV match { case i: Int => i; case l: Long => l.toInt }
    require(cell >= 0 && cell < ivfCents.length,
      s"$prettyName: cell_id $cell outside [0, ${ivfCents.length})")
    val cent = ivfCents(cell)
    require(arr.numElements() == m * dsub && cent.length == m * dsub,
      s"$prettyName: expected ${m * dsub}-dim embedding, got ${arr.numElements()}")

    // residual in one pass, then per-subspace argmin and FULL recon norm
    val r = new Array[Double](m * dsub)
    var i = 0
    if (isFloat) while (i < r.length) { r(i) = arr.getFloat(i) - cent(i); i += 1 }
    else while (i < r.length) { r(i) = arr.getDouble(i) - cent(i); i += 1 }

    val code = new Array[Int](m)
    var nrmSq = 0.0
    var j = 0
    while (j < m) {
      val cents = pqCents(j)
      val off = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cc = cents(c)
        var d = 0.0
        var t = 0
        while (t < dsub) { val e = r(off + t) - cc(t); d += e * e; t += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      code(j) = best
      val chosen = cents(best)
      var t = 0
      while (t < dsub) {
        val v = cent(off + t) + chosen(t) // full reconstruction component
        nrmSq += v * v
        t += 1
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(code.map(Int.box)), math.sqrt(nrmSq)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IvfPqEncode =
    copy(embedding = newChildren(0), cellId = newChildren(1))
}

/** IVF-PQ ADC scoring generator: per query, emits (query_id, cosine) for
  * corpus rows whose cell is in that query's probe set. Score =
  * (q·centroid(cell) + Σⱼ LUT[j][codeⱼ]) / (‖q‖·‖recon‖) — the
  * q·centroid term is one per-query-per-cell driver lookup, the residual
  * term is m table lookups; corpus floats are never read.
  * `perQuery(q) = (query_id, ‖q‖, probe-cell bitmask array, q·centroid
  * per cell, m × ksub residual LUT)`. */
case class IvfPqAdcScores(
    cellId: Expression,
    code: Expression,
    reconNrm: Expression,
    perQuery: Array[(Long, Double, Array[Boolean], Array[Double], Array[Array[Double]])])
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(cellId, code, reconNrm)
  override def prettyName: String = "ivfpq_adc_scores"

  override def elementSchema: StructType = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (cellId.dataType, code.dataType, reconNrm.dataType) match {
      case (IntegerType | LongType, ArrayType(IntegerType, _), DoubleType) => TypeCheckSuccess
      case (ci, co, rn) => TypeCheckFailure(
        s"$prettyName: inputs must be (int|bigint, array<int>, double), got " +
          s"(${ci.catalogString}, ${co.catalogString}, ${rn.catalogString})")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val cellV = cellId.eval(input)
    val codeV = code.eval(input)
    val nrmV = reconNrm.eval(input)
    if (cellV == null || codeV == null || nrmV == null) return Iterator.empty
    val cell = cellV match { case i: Int => i; case l: Long => l.toInt }
    val codes = codeV.asInstanceOf[ArrayData].toIntArray()
    val rNrm = nrmV.asInstanceOf[Double]
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var q = 0
    while (q < perQuery.length) {
      val (qid, qNrm, probed, centDot, lut) = perQuery(q)
      if (cell < probed.length && probed(cell)) {
        var s = centDot(cell)
        var j = 0
        while (j < codes.length) { s += lut(j)(codes(j)); j += 1 }
        val denom = qNrm * rNrm
        val cos = if (denom == 0.0) 0.0 else s / denom
        out += new GenericInternalRow(Array[Any](qid, cos))
      }
      q += 1
    }
    out
  }

  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IvfPqAdcScores =
    copy(cellId = newChildren(0), code = newChildren(1), reconNrm = newChildren(2))
}

object PqExpressions {
  def pqEncode(embedding: Column, centroids: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(embedding), centroids))

  def pqAdcScores(
      code: Column, reconNrm: Column,
      luts: Array[(Long, Double, Array[Array[Double]])]): Column =
    ColumnBridge.column(PqAdcScores(
      ColumnBridge.expression(code), ColumnBridge.expression(reconNrm), luts))

  def ivfPqEncode(
      embedding: Column, cellId: Column,
      ivfCents: Array[Array[Double]], pqCents: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(IvfPqEncode(
      ColumnBridge.expression(embedding), ColumnBridge.expression(cellId), ivfCents, pqCents))

  def ivfPqAdcScores(
      cellId: Column, code: Column, reconNrm: Column,
      perQuery: Array[(Long, Double, Array[Boolean], Array[Double], Array[Array[Double]])]): Column =
    ColumnBridge.column(IvfPqAdcScores(
      ColumnBridge.expression(cellId), ColumnBridge.expression(code),
      ColumnBridge.expression(reconNrm), perQuery))
}
