package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Sequence packing for LLM pretraining — assign every document its
  * position in the concat-and-chunk token stream (documents concatenated in
  * id order, then cut into fixed `capacity`-token training sequences; the
  * standard GPT-style packing, vs. padding each doc to the context length).
  *
  * The core is a GLOBAL prefix sum of token counts. The naive Spark
  * formulation — `sum().over(Window.orderBy(id))` with no partition key —
  * funnels the whole table through ONE task, which is exactly the
  * scale-killer this engine avoids. Instead this runs the classic two-level
  * distributed scan:
  *
  *   1. bucket docs by `id div bucketWidth` (ids are assumed roughly dense;
  *      any monotone bucketing works) and prefix-sum WITHIN each bucket —
  *      a partitioned window, fully parallel;
  *   2. prefix-sum the per-bucket TOTALS — a single-partition window over
  *      `n_docs / bucketWidth` rows, tiny by construction (at 10¹⁰ docs and
  *      the default width that is ~2.4M summary rows; widen `bucketWidth`
  *      or add a third level if even that offends);
  *   3. broadcast the bucket offsets back and add.
  *
  * Everything downstream is integer arithmetic on the absolute start
  * offset, so the result is engine-portable and the DuckDB oracle can
  * replay it with a plain windowed cumsum.
  */
object SequencePack {

  /** Per-document packing assignment.
    *
    * Output: `(id, n_tokens, seq_id, seq_offset, n_seqs, straddles)` —
    * which training sequence the document starts in, at which token offset,
    * how many sequences it spans, and whether it crosses a boundary (the
    * fraction of straddling docs is the usual "attention contamination"
    * diagnostic for a packing run).
    */
  def packAssignments(
      docs: DataFrame,
      idCol: String,
      nTokens: Column,
      capacity: Int,
      bucketWidth: Int = 4096): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")

    val base = docs.select(
      col(idCol),
      nTokens.cast(LongType).as("n_tokens"),
      (col(idCol).cast(LongType) / bucketWidth).cast(LongType).as("__bucket"))

    // 1. within-bucket prefix (parallel across buckets)
    val wLocal = Window.partitionBy("__bucket").orderBy(idCol)
    val local = base.withColumn(
      "__local_start", sum("n_tokens").over(wLocal) - col("n_tokens"))

    // 2. bucket totals → running offsets (bucket-count-sized, not data-sized)
    val wBuckets = Window.orderBy("__bucket")
    val offsets = base.groupBy("__bucket")
      .agg(sum("n_tokens").as("__total"))
      .withColumn("__bucket_start", sum("__total").over(wBuckets) - col("__total"))
      .select(col("__bucket"), col("__bucket_start"))

    // 3. add back (offsets is bounded-small — broadcast, no re-shuffle of docs)
    val start = col("__bucket_start") + col("__local_start")
    local.join(broadcast(offsets), "__bucket")
      .select(
        col(idCol),
        col("n_tokens").cast(IntegerType).as("n_tokens"),
        expr(s"(__bucket_start + __local_start) div $capacity").as("seq_id"),
        pmod(start, lit(capacity.toLong)).cast(IntegerType).as("seq_offset"),
        (expr(s"(__bucket_start + __local_start + n_tokens - 1) div $capacity")
          - expr(s"(__bucket_start + __local_start) div $capacity") + 1)
          .cast(IntegerType).as("n_seqs"),
        (expr(s"(__bucket_start + __local_start + n_tokens - 1) div $capacity")
          =!= expr(s"(__bucket_start + __local_start) div $capacity")).as("straddles"))
  }
}
