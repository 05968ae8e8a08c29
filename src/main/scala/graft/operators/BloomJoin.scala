package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join reduction — the reference's big join shapes
  * (`workflow.py:100-131` joins order_items to orders/products) made
  * shuffle-cheap at scale.
  *
  * Spark's optimizer can inject this automatically
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) but only under its
  * own heuristics; this is the same technique as an explicit library
  * operator, for when the pipeline author KNOWS the dim side is selective
  * (e.g. "only urgent orders", "only quarantined documents").
  *
  * Scale posture: the sketch is built in ONE distributed aggregation pass
  * over the dim side (per-partition partial filters, OR-merged treewise by
  * `DataFrameStatFunctions.bloomFilter`); its size is
  * O(expectedItems · log(1/fpp)) BITS — independent of the fact table — so
  * broadcasting it to every executor is bounded by construction, like the
  * IVF centroid table ([[IvfIndex]]). The fact side is then filtered BEFORE
  * its shuffle exchange, so the join moves only true matches plus an fpp
  * fraction of false positives instead of the whole fact table. At 100 TB
  * that is the difference between shuffling ~100 TB and shuffling the
  * matching slice. Bloom filters have no false negatives, so the final
  * exact join result is unchanged — which is exactly what the DuckDB
  * oracle (a plain join) checks.
  */
object BloomJoin {

  /** Build a bloom filter over `dim(dimKey)` and prefilter `fact` rows to
    * those whose `factKey` might be present. `expectedItems` sizes the
    * sketch — at deployment scale it comes from table statistics (NDV of
    * the dim key after its filters); oversizing only costs bits. */
  def semiReduce(
      fact: DataFrame,
      factKey: Column,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    fact.filter(mightContain(factKey, bf))
  }

  /** Column predicate `bloom.mightContainLong(key)` as a native codegen
    * expression (no UDF — stays inside whole-stage codegen and can sit
    * directly on top of the parquet scan). */
  def mightContain(key: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(key), bloom))
}

/** `bloom.mightContainLong(child)` with the built sketch attached as a
  * plan reference object (serialized once per executor with the task
  * closure, not once per row). Integer keys widen to long — same hashing
  * as `BloomFilter.putLong`. */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckSuccess
    case other =>
      TypeCheckFailure(s"$prettyName: key must be bigint or int, got ${other.catalogString}")
  }

  override def nullSafeEval(k: Any): Any = k match {
    case l: java.lang.Long    => bloom.mightContainLong(l)
    case i: java.lang.Integer => bloom.mightContainLong(i.longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong((long) $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
