package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ranking — exact global (or per-group) `row_number`/`ntile`
  * without the single-task `Window.orderBy(...)` sort.
  *
  * The naive Spark spelling of a global rank — a window with an empty
  * partition spec — funnels the ENTIRE input through one WindowExec task
  * (Spark itself logs a warning on the plan). Fine for a dim-sized table;
  * a scale-killer on a fact. Same story for a per-group rank whose groups
  * are few and enormous (a pretraining corpus has a handful of giant
  * sources — one web crawl is most of the data).
  *
  * This is the classic two-level scheme instead (the same shape
  * [[SequencePack]] uses for its global prefix sum):
  *
  *   1. range-repartition on (groupCols ++ orderCols), so each group's rows
  *      are globally ordered ACROSS partitions and every partition holds a
  *      contiguous slice — fully parallel;
  *   2. local `row_number` per (partition, group) — a window keyed by the
  *      partition id, never a global one;
  *   3. per-(partition, group) counts aggregate to a tiny offset table
  *      (≤ numPartitions × |groups| rows — bounded by CONFIG and the group
  *      domain, not the row count), cumulative-summed and broadcast back.
  *
  * The rank depends only on the total order given by `orderCols` (callers
  * must make it total — include a unique tiebreaker), so the result is
  * deterministic regardless of where the range sampler places boundaries.
  */
object Ranking {

  private val Pid = "__pid"
  private val Lrn = "__lrn"
  private val Off = "__off"
  private val Cnt = "__cnt"

  /** Add an exact 1-based `out` row number per `groupCols` group in the
    * total order of `orderCols` (which MUST be total — include a unique
    * tiebreaker). `groupCols` empty = one global ordering. Optionally also
    * emit the group's total row count as `totalCol` (needed by ntile /
    * percent_rank / cume_dist without a second pass). */
  def rowNumber(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      out: String,
      totalCol: Option[String] = None,
      numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "rowNumber needs at least one order column")
    Seq(Pid, Lrn, Off, Cnt).foreach(c =>
      require(!df.columns.contains(c), s"input already has reserved column $c"))
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // Explicit numPartitions keeps AQE from re-coalescing the exchange, so
    // the partition id is stable across the two consumers below.
    val ranged = df
      .repartitionByRange(parts, (groupCols.map(col) ++ orderCols): _*)
      .withColumn(Pid, spark_partition_id())

    // Local rank: keyed by the range-partition id (+ group) — parallel by
    // construction, each task sorts only its own contiguous slice.
    val wLocal = Window
      .partitionBy((Pid +: groupCols).map(col): _*)
      .orderBy(orderCols: _*)
    val local = ranged.withColumn(Lrn, row_number().over(wLocal).cast("long"))

    // Offsets: partition-count-bounded summary, never row-bounded. The
    // empty-spec window here runs over ≤ parts rows per group.
    val counts = ranged
      .groupBy((Pid +: groupCols).map(col): _*)
      .agg(count(lit(1)).as(Cnt))
    val wOff = (if (groupCols.isEmpty) Window.orderBy(col(Pid))
                else Window.partitionBy(groupCols.map(col): _*).orderBy(col(Pid)))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.withColumn(Off, coalesce(sum(col(Cnt)).over(wOff), lit(0L)))

    val withTotal = totalCol match {
      case None => offsets
      case Some(t) =>
        require(!df.columns.contains(t), s"input already has column $t")
        val totals =
          if (groupCols.isEmpty) counts.agg(sum(col(Cnt)).as(t))
          else counts.groupBy(groupCols.map(col): _*).agg(sum(col(Cnt)).as(t))
        if (groupCols.isEmpty) offsets.crossJoin(broadcast(totals))
        else offsets.join(broadcast(totals), groupCols)
    }

    val joinKeys = Pid +: groupCols
    val slim = withTotal.select((joinKeys :+ Off).map(col) ++ totalCol.map(col): _*)
    local
      .join(broadcast(slim), joinKeys)
      .withColumn(out, col(Off) + col(Lrn))
      .drop(Pid, Lrn, Off)
  }

  /** Exact SQL `ntile(buckets)` per group in the total order of
    * `orderCols`, assigned from the distributed rank by the ntile size
    * formula (first n mod k buckets get ⌈n/k⌉ rows, the rest ⌊n/k⌋) —
    * bit-identical to the window function, no single-task sort. This is the
    * rank-space equivalent of broadcasting per-group cutoff thresholds and
    * assigning map-side (how CCNet applies its perplexity cutoffs): the
    * bucket boundary IS the (order-key, tiebreaker) pair at rank n·i/k. */
  def ntileAssign(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      buckets: Int,
      out: String): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val r = rowNumber(df, groupCols, orderCols, "__rn", totalCol = Some("__n"))
    val k = buckets.toLong
    r.withColumn(out, expr(
        s"""CASE WHEN __rn <= ((__n div $k) + 1) * (__n % $k)
           |     THEN (__rn - 1) div ((__n div $k) + 1) + 1
           |     ELSE (__n % $k)
           |          + (__rn - ((__n div $k) + 1) * (__n % $k) - 1) div (__n div $k)
           |          + 1
           |END""".stripMargin).cast("long"))
      .drop("__rn", "__n")
  }
}
