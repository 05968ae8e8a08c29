package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Grouped top-k as ONE aggregation pass with a bounded per-group heap —
  * the scale-correct replacement for `row_number() OVER (PARTITION BY g
  * ORDER BY s DESC) <= k`:
  *
  *  - the window form sorts EVERY group's rows (shuffle carries all rows,
  *    then a per-partition sort);
  *  - this aggregate keeps a k-element min-heap per group, merges heaps
  *    map-side, and ships at most k entries per (group, map task) through
  *    the shuffle — the same partial/final contract as any other agg.
  *
  * Ordering is (score DESC, id ASC) with both fields in the heap, so ties
  * are deterministic across partitionings and engines. Returns
  * `array<struct<score double, id bigint>>` sorted best-first; explode to
  * get ranked rows.
  */
case class TopKBy(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBy.Heap] {

  require(k > 0, s"topk_by: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (scoreExpr.dataType, idExpr.dataType) match {
    case (DoubleType, LongType) => TypeCheckSuccess
    case (s, i) =>
      TypeCheckFailure(
        s"$prettyName: expects (double score, bigint id), got ${s.catalogString}, ${i.catalogString}")
  }

  override def createAggregationBuffer(): TopKBy.Heap = new TopKBy.Heap(k)

  override def update(buf: TopKBy.Heap, input: InternalRow): TopKBy.Heap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBy.Heap, other: TopKBy.Heap): TopKBy.Heap = {
    var j = 0
    while (j < other.size) { buf.offer(other.scores(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: TopKBy.Heap): Any = {
    // same total order as the heap (Double.compare): NaN sorts as the
    // largest score, exactly like Spark's window-sort DESC would rank it
    val idx = Array.range(0, buf.size).sortWith { (x, y) =>
      val c = java.lang.Double.compare(buf.scores(x), buf.scores(y))
      c > 0 || (c == 0 && buf.ids(x) < buf.ids(y))
    }
    new GenericArrayData(idx.map { j =>
      InternalRow(buf.scores(j), buf.ids(j))
    }.toArray[Any])
  }

  override def serialize(buf: TopKBy.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) { bb.putDouble(buf.scores(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBy.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKBy.Heap(k)
    var j = 0
    while (j < n) { h.offer(bb.getDouble, bb.getLong); j += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKBy = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKBy = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKBy =
    copy(scoreExpr = c(0), idExpr = c(1))
}

object TopKBy {

  /** Bounded binary min-heap keyed by "badness" — the WORST kept entry sits
    * at the root, so an incoming better entry replaces it in O(log k).
    * Entry x is worse than y iff x.score < y.score, or scores tie and
    * x.id > y.id (ties keep the smaller id). Flat primitive arrays: no
    * boxing, 16 bytes/entry, trivially serializable. */
  final class Heap(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    // Total order via Double.compare so NaN behaves like Spark's sort
    // (NaN = largest double, ranked first under DESC) instead of the IEEE
    // comparisons, under which a NaN entry would be unevictable and the
    // result arrival-order-dependent.
    private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c < 0 || (c == 0 && i1 > i2)
    }

    def offer(s0: Double, i: Long): Unit = {
      val s = if (s0 == 0.0) 0.0 else s0 // normalize -0.0 (Spark sorts it equal to 0.0)
      if (size < k) {
        var c = size
        scores(c) = s; ids(c) = i; size += 1
        while (c > 0 && worse(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
          swap(c, (c - 1) / 2); c = (c - 1) / 2
        }
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        var c = 0
        var done = false
        while (!done) {
          val l = 2 * c + 1
          val r = 2 * c + 2
          var w = c
          if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
          if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
          if (w == c) done = true
          else { swap(c, w); c = w }
        }
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }
  }

  /** Column-API entry point: `topKBy(score, id, k)` → sorted
    * `array<struct<score,id>>`. */
  def topKBy(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKBy(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
