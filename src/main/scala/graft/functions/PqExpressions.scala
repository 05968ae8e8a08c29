package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
  *
  * The EXCEPTION is [[PqLutScore]]: its LUT arrives as a COLUMN (from the
  * cell equi-join), not constructor state, so the literal-blowup concern
  * doesn't apply — and it sits on the batched-join hot path where a
  * self-mining run evaluates it per candidate PAIR (10⁷+ rows at the
  * contract SF, unbounded at 100 TB). A fallback there breaks
  * whole-stage codegen for the join's output projection and forces a row
  * materialization per pair carrying the m×ksub LUT array; the native
  * doGenCode keeps the pair stream pipelined, reading the LUT in place.
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

/** Query-side planning for BATCHED (join-based) IVF-PQ ADC search: per
  * query row, emits its `nProbe` best cells as
  * (cell_id, cent_dot, q_nrm, lut) rows — everything the scoring side
  * needs, computed MAP-SIDE on the query table. This is what makes the
  * query side a first-class TABLE instead of driver state: the 100 TB
  * query set never collects, it shuffles by probed cell into an equi-join
  * with the cell-partitioned codes.
  *
  * Probe ranking replays [[graft.operators.Pq.ivfPqSearch]]'s driver rule
  * bit-for-bit (cosine against each coarse centroid, zero-norm → 0.0,
  * ties to the lower cell id), so batch and driver paths return identical
  * rows for identical inputs. Deliberately emits NO LUT: the m × ksub LUT
  * is ~8 KB at the contract codebook (vs the 256 B embedding it derives
  * from), so materializing it before the cell exchange would ship nProbe
  * LUT copies per query through the shuffle — ~30× the bytes of the raw
  * query vector, exactly backwards for the compressed tier. Consumers
  * shuffle slim probes + the embedding and build the LUT POST-exchange
  * with [[PqQueryLut]], once per probe row (m·ksub·dsub flops, amortized
  * over the cell's candidates). */
case class IvfPqQueryProbes(
    embedding: Expression,
    ivfCents: Array[Array[Double]],
    pqCents: Array[Array[Array[Double]]],
    nProbe: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  private val m = pqCents.length
  private val dsub = pqCents(0)(0).length
  private val dims = m * dsub

  // per-cell centroid norms are model constants — computed once per
  // executor deserialization, not per row
  @transient private lazy val centNrm: Array[Double] =
    ivfCents.map(c => math.sqrt(c.map(v => v * v).sum))

  override def child: Expression = embedding
  override def prettyName: String = "ivfpq_query_probes"

  override def elementSchema: StructType = StructType(Seq(
    StructField("cell_id", IntegerType, nullable = false),
    StructField("cent_dot", DoubleType, nullable = false),
    StructField("q_nrm", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    ArrayTypeChecks.numericArray(embedding.dataType, prettyName, "embedding")

  private lazy val isFloat: Boolean =
    embedding.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arrV = embedding.eval(input)
    if (arrV == null) return Iterator.empty
    val arr = arrV.asInstanceOf[ArrayData]
    require(arr.numElements() == dims,
      s"$prettyName: expected $dims-dim query, got ${arr.numElements()}")
    val q = new Array[Double](dims)
    var i = 0
    if (isFloat) while (i < dims) { q(i) = arr.getFloat(i); i += 1 }
    else while (i < dims) { q(i) = arr.getDouble(i); i += 1 }

    var qNrmSq = 0.0
    i = 0
    while (i < dims) { qNrmSq += q(i) * q(i); i += 1 }
    val qNrm = math.sqrt(qNrmSq)

    val centDot = new Array[Double](ivfCents.length)
    var c = 0
    while (c < ivfCents.length) {
      val cent = ivfCents(c)
      var s = 0.0
      var t = 0
      while (t < dims) { s += q(t) * cent(t); t += 1 }
      centDot(c) = s
      c += 1
    }
    // same probe rule as the driver path: (-cosine, cell id)
    val probedCells = centDot.zipWithIndex
      .map { case (s, idx) => (if (centNrm(idx) == 0.0) 0.0 else s / centNrm(idx), idx) }
      .sortBy { case (sim, idx) => (-sim, idx) }
      .take(nProbe).map(_._2)

    probedCells.iterator.map { cell =>
      new GenericInternalRow(Array[Any](cell, centDot(cell), qNrm))
    }
  }

  override def nullable: Boolean = false
  override protected def withNewChildInternal(newChild: Expression): IvfPqQueryProbes =
    copy(embedding = newChild)
}

/** The query's flat m·ksub residual LUT (subspace-major: entry j·ksub + c
  * = q_subspace_j · codebook[j][c]) from its raw embedding — evaluated
  * AFTER the cell exchange, so only the 256 B embedding crosses the wire
  * and each probe row pays one m·ksub·dsub build amortized over its
  * cell's candidates (see [[IvfPqQueryProbes]]). Flat layout because the
  * scorer reads it per candidate PAIR: a nested array<array> costs an
  * ArrayData wrapper allocation per subspace per pair on that 10⁷+-row
  * path (measured ~2× on the self-mining join); flat is one
  * bounds-checked primitive read. CodegenFallback by intent — per-row
  * work is m·ksub·dsub flops, amortizing the dispatch (file doc). */
case class PqQueryLut(
    embedding: Expression,
    pqCents: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  private val m = pqCents.length
  private val dsub = pqCents(0)(0).length
  private val dims = m * dsub
  private val ksub = pqCents(0).length
  require(pqCents.forall(_.length == ksub),
    "pq_query_lut: the flat LUT layout requires a uniform ksub across subspaces")

  override def child: Expression = embedding
  override def prettyName: String = "pq_query_lut"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    ArrayTypeChecks.numericArray(embedding.dataType, prettyName, "embedding")

  private lazy val isFloat: Boolean =
    embedding.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(arrV: Any): Any = {
    val arr = arrV.asInstanceOf[ArrayData]
    require(arr.numElements() == dims,
      s"$prettyName: expected $dims-dim query, got ${arr.numElements()}")
    val q = new Array[Double](dims)
    var i = 0
    if (isFloat) while (i < dims) { q(i) = arr.getFloat(i); i += 1 }
    else while (i < dims) { q(i) = arr.getDouble(i); i += 1 }
    val flat = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var cc = 0
      while (cc < ksub) {
        val cent = pqCents(j)(cc)
        var s = 0.0
        var t = 0
        while (t < dsub) { s += q(j * dsub + t) * cent(t); t += 1 }
        flat(j * ksub + cc) = s
        cc += 1
      }
      j += 1
    }
    new GenericArrayData(flat)
  }

  override protected def withNewChildInternal(newChild: Expression): PqQueryLut =
    copy(embedding = newChild)
}

/** Scoring side of BATCHED ADC: cosine estimate from a corpus row's
  * (code, recon_nrm) and a query row's (lut, cent_dot, q_nrm) — the same
  * arithmetic as [[IvfPqAdcScores]], with the LUT arriving as a COLUMN
  * (from the cell equi-join) instead of serialized driver state. */
case class PqLutScore(
    code: Expression,
    lut: Expression,
    centDot: Expression,
    reconNrm: Expression,
    qNrm: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(code, lut, centDot, reconNrm, qNrm)
  override def prettyName: String = "pq_lut_score"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    (code.dataType, lut.dataType, centDot.dataType, reconNrm.dataType, qNrm.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _),
            DoubleType, DoubleType, DoubleType) => TypeCheckSuccess
      case (a, b, c, d, e) => TypeCheckFailure(
        s"$prettyName: inputs must be (array<int>, array<double> flat m*ksub LUT, double, double, double), " +
          s"got (${a.catalogString}, ${b.catalogString}, ${c.catalogString}, ${d.catalogString}, ${e.catalogString})")
    }

  override def eval(input: InternalRow): Any = {
    val codeV = code.eval(input)
    val lutV = lut.eval(input)
    val cdV = centDot.eval(input)
    val rnV = reconNrm.eval(input)
    val qnV = qNrm.eval(input)
    if (codeV == null || lutV == null || cdV == null || rnV == null || qnV == null) return null
    val codes = codeV.asInstanceOf[ArrayData].toIntArray()
    val luts = lutV.asInstanceOf[ArrayData]
    val stride = luts.numElements() / codes.length // uniform ksub (generator contract)
    var s = cdV.asInstanceOf[Double]
    var j = 0
    while (j < codes.length) { s += luts.getDouble(j * stride + codes(j)); j += 1 }
    val denom = qnV.asInstanceOf[Double] * rnV.asInstanceOf[Double]
    if (denom == 0.0) 0.0 else s / denom
  }

  // Same arithmetic, same order as eval (parity with the driver-planned
  // IvfPqAdcScores path is asserted in-plan by q_embed_knn_pq_batch).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val Seq(c, l, cd, rn, qn) = children.map(_.genCode(ctx))
    val codesV = ctx.freshName("codes")
    val lutsV = ctx.freshName("luts")
    val strideV = ctx.freshName("stride")
    val sV = ctx.freshName("s")
    val jV = ctx.freshName("j")
    val denomV = ctx.freshName("denom")
    val ad = classOf[ArrayData].getName
    ev.copy(code =
      code"""
        ${c.code}
        ${l.code}
        ${cd.code}
        ${rn.code}
        ${qn.code}
        boolean ${ev.isNull} = ${c.isNull} || ${l.isNull} || ${cd.isNull} ||
          ${rn.isNull} || ${qn.isNull};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          $ad $codesV = ${c.value};
          $ad $lutsV = ${l.value};
          int $strideV = $lutsV.numElements() / $codesV.numElements();
          double $sV = ${cd.value};
          for (int $jV = 0; $jV < $codesV.numElements(); $jV++) {
            $sV += $lutsV.getDouble($jV * $strideV + $codesV.getInt($jV));
          }
          double $denomV = ${qn.value} * ${rn.value};
          ${ev.value} = ($denomV == 0.0) ? 0.0 : $sV / $denomV;
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqLutScore =
    copy(code = newChildren(0), lut = newChildren(1), centDot = newChildren(2),
      reconNrm = newChildren(3), qNrm = newChildren(4))
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

  def ivfPqQueryProbes(
      embedding: Column,
      ivfCents: Array[Array[Double]], pqCents: Array[Array[Array[Double]]],
      nProbe: Int): Column =
    ColumnBridge.column(IvfPqQueryProbes(
      ColumnBridge.expression(embedding), ivfCents, pqCents, nProbe))

  def pqQueryLut(embedding: Column, pqCents: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqQueryLut(ColumnBridge.expression(embedding), pqCents))

  def pqLutScore(
      code: Column, lut: Column, centDot: Column,
      reconNrm: Column, qNrm: Column): Column =
    ColumnBridge.column(PqLutScore(
      ColumnBridge.expression(code), ColumnBridge.expression(lut),
      ColumnBridge.expression(centDot), ColumnBridge.expression(reconNrm),
      ColumnBridge.expression(qNrm)))
}
