package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Within-bucket scored-pair generator: the native kernel behind the
  * bucketed similarity operators (SemDeDup cells, LSH buckets).
  *
  * The naive formulation — self-join the bucketed table on the bucket id —
  * degenerates when the key domain is small (nLists cells for SemDeDup):
  * sort-merge join buffers each key group and replays it per probe row,
  * paying per-row join machinery on every candidate pair. Measured at
  * sf0.1 that join runs ~10× slower than the equivalent broadcast
  * nested-loop scoring the SAME number of pairs (3.0 s vs 0.3 s for ~2M).
  *
  * This generator replaces the join: one hash shuffle groups each bucket
  * into a bounded array (the SemDeDup design invariant — `nLists` grows
  * with the corpus so |cell| stays constant), then a lazy in-partition
  * loop scores all i<j pairs in primitive float math and emits ONLY pairs
  * at or above the cutoff. Nothing quadratic ever materializes: candidate
  * scoring is sequential arithmetic, the output is the (rare) survivors.
  *
  * Cutoff semantics: `cutoff` is applied to the RAW cosine as a loose
  * pre-filter (callers re-apply their exact rounded threshold downstream,
  * so borderline values stay bit-identical with non-bucketed twins — pass
  * e.g. `tau - 1e-6`). Ties/order: pairs emit with vec_a < vec_b.
  */
case class CosinePairs(child: Expression, cutoff: Double)
    extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "cosine_pairs"

  override def elementSchema: StructType = StructType(Seq(
    StructField("vec_a", LongType, nullable = false),
    StructField("vec_b", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
          StructField(_, LongType, _, _),
          StructField(_, ArrayType(FloatType | DoubleType, _), _, _),
          StructField(_, DoubleType, _, _))), _) =>
      TypeCheckSuccess
    case other =>
      TypeCheckFailure(s"$prettyName: input must be array<struct<id:bigint, " +
        s"vec:array<float|double>, norm:double>>, got ${other.catalogString}")
  }

  private lazy val vecIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
      .fields(1).dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Iterator.empty
    val members = arr.asInstanceOf[ArrayData]
    val n = members.numElements()
    if (n < 2) return Iterator.empty

    // Unpack the group ONCE into primitive arrays; the scoring loop below
    // then runs allocation-free.
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!members.isNullAt(i)) {
        val row = members.getStruct(i, 3)
        if (!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2)) {
          val v = row.getArray(1)
          val d = new Array[Double](v.numElements())
          var j = 0
          if (vecIsFloat) while (j < d.length) { d(j) = v.getFloat(j); j += 1 }
          else while (j < d.length) { d(j) = v.getDouble(j); j += 1 }
          ids(m) = row.getLong(0)
          vecs(m) = d
          norms(m) = row.getDouble(2)
          m += 1
        }
      }
      i += 1
    }
    val nm = m

    new Iterator[InternalRow] {
      private var a = 0
      private var b = 1
      private var nextRow: InternalRow = _
      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && a < nm - 1) {
          val va = vecs(a)
          val vb = vecs(b)
          val len = math.min(va.length, vb.length)
          var s = 0.0
          var j = 0
          while (j < len) { s += va(j) * vb(j); j += 1 }
          val denom = norms(a) * norms(b)
          val cos = if (denom == 0.0) 0.0 else s / denom
          if (cos >= cutoff) {
            val lo = math.min(ids(a), ids(b))
            val hi = math.max(ids(a), ids(b))
            nextRow = new GenericInternalRow(Array[Any](lo, hi, cos))
          }
          b += 1
          if (b >= nm) { a += 1; b = a + 1 }
        }
      }
      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow; advance(); r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CosinePairs =
    copy(child = newChild)
}

object PairGenerators {
  /** Generator column: all i<j pairs within `members` (array of
    * (id, vec, norm) structs) with raw cosine ≥ `cutoff`, emitted as
    * (vec_a, vec_b, cosine) with vec_a < vec_b. */
  def cosinePairs(members: Column, cutoff: Double): Column =
    ColumnBridge.column(CosinePairs(ColumnBridge.expression(members), cutoff))
}
