package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Write-path layout clustering for data skipping.
  *
  * At 100 TB the cheapest query is the one that never reads the file: lakes
  * skip whole files/row-groups via footer min/max statistics, but those
  * stats only prune when the write layout CLUSTERS each predicate column.
  * Sorting by one column gives perfect pruning on it and none on any other;
  * interleaving the bits of two dimensions (a Morton/Z-order curve) gives
  * good pruning on BOTH — every file covers a small rectangle of the
  * (x, y) domain instead of a thin full-width stripe.
  *
  * Everything here is plain codegen bitwise/column work: the interleave is
  * 32 unrolled shift-mask-or terms (no lambdas, no UDFs), the per-column
  * scale bounds join as one broadcast scalar row, and the cluster write is
  * `repartitionByRange` on the derived key — the same shuffle a sorted
  * write already pays.
  */
object Layout {

  /** Bit-interleave two 16-bit-scaled non-negative columns into a 32-bit
    * Morton key: bit `i` of `a` lands at position `2i`, bit `i` of `b` at
    * `2i+1`. Pure unrolled bitwise expression — stays inside whole-stage
    * codegen. */
  def interleave16(a: Column, b: Column): Column = {
    val al = a.cast(LongType)
    val bl = b.cast(LongType)
    (0 until 16).map { i =>
      shiftleft(shiftrightunsigned(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftrightunsigned(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Append a Z-order key over two numeric columns: each is min/max scaled
    * to [0, 65535] (bounds computed in ONE aggregate that joins back as a
    * broadcast scalar — no driver collect), then bit-interleaved. Constant
    * columns scale to 0. */
  def zorderKey(df: DataFrame, c1: String, c2: String, outCol: String = "zorder_key"): DataFrame = {
    val bounds = df.agg(
      min(col(c1)).cast(DoubleType).as("__min1"), max(col(c1)).cast(DoubleType).as("__max1"),
      min(col(c2)).cast(DoubleType).as("__min2"), max(col(c2)).cast(DoubleType).as("__max2"))
    def scale(c: Column, mn: Column, mx: Column): Column =
      when(mx === mn, lit(0L)).otherwise(
        round((c.cast(DoubleType) - mn) / (mx - mn) * lit(65535.0)).cast(LongType))
    df.crossJoin(broadcast(bounds))
      .withColumn(outCol, interleave16(
        scale(col(c1), col("__min1"), col("__max1")),
        scale(col(c2), col("__min2"), col("__max2"))))
      .drop("__min1", "__max1", "__min2", "__max2")
  }

  /** Range-cluster `df` into `numFiles` output files ordered along the
    * Z-curve of (`c1`, `c2`) and write parquet: each file's footer min/max
    * then covers a compact rectangle in BOTH dimensions, so a reader's
    * two-sided box predicate skips all but the touched rectangles. */
  def writeClustered(df: DataFrame, path: String, numFiles: Int, c1: String, c2: String): Unit =
    zorderKey(df, c1, c2)
      .repartitionByRange(numFiles, col("zorder_key"))
      .sortWithinPartitions(col("zorder_key"))
      .drop("zorder_key")
      .write.mode("overwrite").parquet(path)

  final case class CompactStats(
      rows: Long, filesBefore: Int, filesAfter: Int,
      bytesBefore: Long, bytesAfter: Long)

  /** Small-file compaction — the table-maintenance job every streaming /
    * micro-batch ingest pipeline needs: each `mode("append")` micro-batch
    * leaves width-many small files, and a year of that turns every scan
    * into a file-listing + task-scheduling storm (the classic lake
    * "small-files problem"). Rewrite the directory as
    * ⌈bytes / targetBytes⌉ files and swap atomically.
    *
    * Scale posture: the output file count is planned from FILE METADATA
    * (one driver listing — the same class of work as the catalog's), the
    * rewrite is `coalesce`, NOT `repartition` — compaction is IO-bound
    * and merging partitions needs no exchange, so the job is one
    * shuffle-free pass — and the swap is stage-dir-then-rename. The swap
    * is two renames, so in THIS local-FS harness a reader sees old or new
    * but a crash between the moves can leave the live path briefly absent
    * (data intact under the staging name); a table format makes the same
    * swap a single atomic metadata commit, which is what a production
    * deployment would use. Stale staging dirs from a previously crashed
    * run are deleted before staging. Partitioned tables compact per
    * partition dir with the same plan.
    *
    * NOTE: `coalesce` merges arbitrary input files, so compacting a
    * CLUSTERED table (sorted / Z-ordered, [[writeClustered]]) with this
    * widens every output file's min/max bounds and destroys data skipping
    * — use [[compactDirClustered]] there. */
  def compactDir(
      spark: org.apache.spark.sql.SparkSession,
      path: String, targetBytes: Long): CompactStats =
    compactImpl(spark, path, targetBytes, None)

  /** Cluster-preserving compaction: like [[compactDir]] but the rewrite
    * range-partitions and sorts on `orderCols` (re-derived by `deriveKey`
    * when the cluster key is computed, e.g. a Z-order key the clustered
    * write dropped), so the compacted files' min/max bounds stay DISJOINT
    * and footer-stats skipping survives the compaction. Costs one range
    * exchange where [[compactDir]] is shuffle-free — the price of keeping
    * the layout; a compaction schedule pays it only on clustered tables. */
  def compactDirClustered(
      spark: org.apache.spark.sql.SparkSession,
      path: String, targetBytes: Long,
      orderCols: Seq[String],
      deriveKey: DataFrame => DataFrame = identity): CompactStats = {
    require(orderCols.nonEmpty, "compactDirClustered: need at least one order column")
    compactImpl(spark, path, targetBytes, Some((orderCols, deriveKey)))
  }

  private def compactImpl(
      spark: org.apache.spark.sql.SparkSession,
      path: String, targetBytes: Long,
      clustered: Option[(Seq[String], DataFrame => DataFrame)]): CompactStats = {
    require(targetBytes > 0, s"compact: targetBytes=$targetBytes must be positive")
    val dir = new java.io.File(path)
    def parquetFiles(d: java.io.File): Array[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val before = parquetFiles(dir)
    require(before.nonEmpty, s"compact: no parquet files under $path")
    val bytesBefore = before.map(_.length()).sum
    val nOut = math.max(1, math.ceil(bytesBefore.toDouble / targetBytes).toInt)
    val stage = new java.io.File(dir.getParentFile, dir.getName + "__compact")
    val old = new java.io.File(dir.getParentFile, dir.getName + "__precompact")
    // a crashed prior run may have left either staging dir behind — the
    // renames below would otherwise throw FileAlreadyExistsException
    graft.sources.Staging.rmTree(stage)
    graft.sources.Staging.rmTree(old)
    val input = spark.read.parquet(path)
    val planned = clustered match {
      case None => input.coalesce(nOut)
      case Some((orderCols, deriveKey)) =>
        deriveKey(input)
          .repartitionByRange(nOut, orderCols.map(col): _*)
          .sortWithinPartitions(orderCols.map(col): _*)
          .select(input.columns.map(col).toSeq: _*) // drop derived key cols
    }
    planned.write.mode("overwrite").parquet(stage.toString)
    java.nio.file.Files.move(dir.toPath, old.toPath)
    java.nio.file.Files.move(stage.toPath, dir.toPath)
    graft.sources.Staging.rmTree(old)
    val after = parquetFiles(dir)
    CompactStats(
      rows = spark.read.parquet(path).count(),
      filesBefore = before.length, filesAfter = after.length,
      bytesBefore = bytesBefore, bytesAfter = after.map(_.length()).sum)
  }

  /** Compact a PARTITIONED table in place: every leaf partition dir with
    * more than one file is compacted independently (the partition value
    * lives in the dir name, not the files, so a leaf-scoped rewrite
    * preserves the layout), fragmentation-free leaves are untouched.
    * This is the shape the micro-batch sinks produce —
    * `overwritePartitions` / cell-partitioned index appends leave
    * width-many files per touched partition per trigger. Partitions
    * compact independently and CONCURRENTLY — leaf rewrites are submitted
    * as parallel Spark jobs (thousands of sequential tiny jobs would
    * serialize on scheduling latency at scale; the fair scheduler
    * interleaves them) — and an interrupted run leaves every partition
    * either old or new, never mixed. Returns (relative partition path →
    * stats) for the rewritten leaves, in stable path order. */
  def compactPartitionedDir(
      spark: org.apache.spark.sql.SparkSession,
      root: String, targetBytes: Long,
      maxConcurrent: Int = 8): Seq[(String, CompactStats)] = {
    val rootDir = new java.io.File(root)
    def parquetCount(d: java.io.File): Int =
      Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    def isStaging(d: java.io.File): Boolean =
      d.getName.endsWith("__compact") || d.getName.endsWith("__precompact")
    // a crashed prior run may have left per-leaf staging dirs behind: they
    // must never be listed as leaves (a concurrent future would compact
    // one while its sibling's compactImpl deletes it) nor left for readers
    // to parse as bogus partition values — purge them up front
    def purgeStaging(d: java.io.File): Unit =
      Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(_.isDirectory).foreach { c =>
          if (isStaging(c)) graft.sources.Staging.rmTree(c) else purgeStaging(c)
        }
    purgeStaging(rootDir)
    def leaves(d: java.io.File): Seq[java.io.File] =
      if (parquetCount(d) > 0) Seq(d)
      else Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(_.isDirectory).toSeq.flatMap(leaves)
    val todo = leaves(rootDir).filter(parquetCount(_) > 1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(maxConcurrent, todo.size max 1)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val futures = todo.map { leaf =>
        scala.concurrent.Future {
          val rel = rootDir.toPath.relativize(leaf.toPath).toString
          rel -> compactDir(spark, leaf.toString, targetBytes)
        }
      }
      futures.map(f =>
        scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
        .sortBy(_._1)
    } finally pool.shutdown()
  }
}
