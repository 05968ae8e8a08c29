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
  *   2. sort WITHIN partitions and read each row's partition-local ordinal
  *      off `monotonically_increasing_id` (its layout is exactly
  *      `partition_id << 33 | row-index-in-partition`) — no WindowExec
  *      over the data at all, and no second full-table exchange;
  *   3. per-(partition, group) counts + first-ordinal aggregate to a tiny
  *      offset table (≤ numPartitions × |groups| rows — bounded by CONFIG
  *      and the group domain, not the row count), cumulative-summed and
  *      broadcast back; rank = group offset + (ordinal − group's first
  *      ordinal in the partition) + 1.
  *
  * The rank depends only on the total order given by `orderCols` (callers
  * must make it total — include a unique tiebreaker), so the result is
  * deterministic regardless of where the range sampler places boundaries:
  * the in-partition sort is deterministic, hence so are the ordinals both
  * consumers (the row side and the counts side) recompute.
  */
object Ranking {

  private val Pid = "__pid"
  private val Off = "__off"
  private val Cnt = "__cnt"
  private val Reserved = Seq(Pid, Off, Cnt, "__mono", "__gstart")

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
    (Reserved :+ out).foreach(c =>
      require(!df.columns.contains(c), s"input already has reserved/output column $c"))
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // Explicit numPartitions keeps AQE from re-coalescing the exchange, so
    // the partition id is stable across the two consumers below.
    // MATERIALIZED (lazy localCheckpoint, the Dedup/BpeTrain convention):
    // the ordinal pass and the counts pass are two consumers of this one
    // exchange, and exchange reuse does not reliably deduplicate it —
    // measured on the perplexity-bucketing plan, the ENTIRE upstream
    // (scans, shuffles, joins) ran once per consumer. Materializing the
    // post-exchange slice guarantees single execution structurally and
    // pins the partition layout, making the two consumers' pids identical
    // by construction rather than by re-materialization agreement.
    val ranged = df.repartitionByRange(parts, (groupCols.map(col) ++ orderCols): _*)
      .localCheckpoint(false)

    // Partition-local ordinal, ONE full-table pass past the exchange: sort
    // within the partition and read monotonically_increasing_id, whose
    // layout is (partition_id << 33) | row-index. No WindowExec over the
    // data, no second exchange. (The nondeterministic-flagged id keeps the
    // projection pinned above the sort; the sort itself is deterministic,
    // so re-materializations agree.)
    // group-leading sort: each group's rows sit CONTIGUOUS in the
    // partition (matching the range keys), so ordinal arithmetic within a
    // group never crosses another group's rows
    val local = ranged
      .sortWithinPartitions((groupCols.map(col) ++ orderCols): _*)
      .withColumn("__mono", monotonically_increasing_id())
      .withColumn(Pid, shiftrightunsigned(col("__mono"), 33).cast("int"))

    // Offsets: partition-count-bounded summary, never row-bounded — per
    // (partition, group) row counts, aggregated straight off the exchange
    // (order-free: no sort on this consumer). Within the tiny table,
    // a group's START inside its partition is the counts of the groups
    // sorting before it there (the data sort is group-leading, same
    // ascending order), and its cross-partition offset is its counts in
    // earlier partitions. All windows here run over ≤ parts × |groups|
    // summary rows.
    val counts = ranged
      .withColumn(Pid, spark_partition_id())
      .groupBy((Pid +: groupCols).map(col): _*)
      .agg(count(lit(1)).as(Cnt))
    val wOffBase = if (groupCols.isEmpty) Window.orderBy(col(Pid))
                   else Window.partitionBy(groupCols.map(col): _*).orderBy(col(Pid))
    val wOff = wOffBase.rowsBetween(Window.unboundedPreceding, -1)
    val offsets0 = counts.withColumn(Off, coalesce(sum(col(Cnt)).over(wOff), lit(0L)))
    val offsets =
      if (groupCols.isEmpty) offsets0.withColumn("__gstart", lit(0L))
      else {
        val wStart = Window.partitionBy(col(Pid)).orderBy(groupCols.map(col): _*)
          .rowsBetween(Window.unboundedPreceding, -1)
        offsets0.withColumn("__gstart", coalesce(sum(col(Cnt)).over(wStart), lit(0L)))
      }

    val withTotal = totalCol match {
      case None => offsets
      case Some(t) =>
        require(!df.columns.contains(t), s"input already has column $t")
        // same tiny window, unbounded frame — one WindowExec computes the
        // offsets AND the group totals; no separate aggregate branch
        val wAll = wOffBase
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        offsets.withColumn(t, sum(col(Cnt)).over(wAll))
    }

    val joinKeys = Pid +: groupCols
    val slim = withTotal
      .select((joinKeys :+ Off :+ "__gstart").map(col) ++ totalCol.map(col): _*)
    local
      .join(broadcast(slim), joinKeys)
      .withColumn(out,
        col(Off) + (col("__mono").bitwiseAND(lit((1L << 33) - 1)) - col("__gstart")) + lit(1L))
      .drop(Pid, Off, "__mono", "__gstart")
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
    Seq("__rn", "__n", out).foreach(c =>
      require(!df.columns.contains(c), s"input already has reserved/output column $c"))
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
