package graft.operators

import org.apache.spark.sql.DataFrame

/** CPU-parallelism widening for expensive per-row projections over
  * narrow scans.
  *
  * The house idiom `df.repartition(defaultParallelism)` before a
  * compute-heavy projection (text scoring, shingle/MinHash signatures,
  * brute-force distance scans) exists so a single-file local scan does
  * not run the whole projection on one core. Measured this round
  * (tools/ProbeStreamCost, per-job decomposition): under AQE the idiom
  * SILENTLY FAILS — when the plan is materialized through
  * `localCheckpoint`/`toRdd`, the adaptive re-optimization leaves the
  * projection fused against the 1-partition scan side and one task runs
  * the entire per-row kernel (1.1–2.8 s single-task text-scoring jobs
  * inside the conformal monitors at sf0.1, while 32 cores idle).
  *
  * [[cpuWide]] makes the widening un-defeatable: materialize the RAW
  * rows through the round-robin exchange behind a `localCheckpoint`
  * barrier (a LogicalRDD — no optimizer rule reaches through it), so
  * every downstream projection runs over `defaultParallelism` real
  * partitions. The barrier materializes only scan+shuffle bytes (no
  * per-row compute below it), and Bench unpersists checkpoint blocks
  * after every query.
  *
  * Scale posture: the widening is GATED on the scan actually being
  * narrower than the core count, judged from file metadata
  * (`inputFiles`) without touching `.rdd` (whose AQE finalization is
  * itself the side effect being avoided). At 100 TB any table scan has
  * thousands of splits, the gate returns the frame untouched, and the
  * pipeline keeps the scan's natural parallelism with NO extra exchange
  * and NO corpus-sized checkpoint — strictly better than the old
  * unconditional repartition, which paid a full-corpus round-robin
  * shuffle at every scale. */
object Widen {

  /** `df` repartitioned to `defaultParallelism` behind a checkpoint
    * barrier iff its scan is narrower than the core count; `df`
    * unchanged otherwise. Row set and values are identical either way —
    * only the physical partitioning differs (callers must be
    * partitioning-agnostic, which every aggregation/join consumer is). */
  def cpuWide(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // streaming micro-batches run with AQE disabled (Spark does this
    // itself), so the plain repartition still widens there — and neither
    // inputFiles nor localCheckpoint is defined on a streaming frame.
    // Width = the session's shuffle width at plan-construction time (the
    // stream runners set GRAFT_STREAM_SHUFFLE before building the plan):
    // a micro-batch is trigger-sized, and 32-task stages on a few hundred
    // rows were measured as pure scheduling overhead per batch.
    if (df.isStreaming)
      df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
    // file-count gate: a multi-split scan is already wide (each split ≥
    // one task); only the narrow-scan shape (few local files) needs help
    else if (df.inputFiles.length >= p) df
    else df.repartition(p).localCheckpoint(false)
  }
}
