package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-15 exploration for SCALE.md's noted next pressure point: the
  * exact-Jaccard verify join-back scans the WHOLE at-rest shingle
  * store per trigger (the band index prunes by pbkt, the shingle side
  * does not). Question: if the shingle store rests partitioned by an
  * id-hash bucket `sbkt = pmod(xxhash64(doc_id), M)`, does the verify
  * join prune at rest — either via Spark's dynamic partition pruning
  * (the candidate side is broadcast-sized) or via an explicit
  * driver-planned bucket list (the band-probe posture)?
  *
  * Measures, against the 10× held-rate substrate's store: (a) the
  * unpartitioned baseline, (b) the partitioned store joined with the
  * sbkt equi-condition (DPP's chance to fire), (c) the partitioned
  * store with an explicit isin filter from a driver-planned bucket
  * list (only valid when the candidate ids are plannable — here the
  * trigger's own ids are, but INDEX-side partner ids are not, so (c)
  * bounds what planning could buy). Prints files/rows scanned on the
  * shingle side + wall. */
object ProbeShinglePrune {

  def main(args: Array[String]): Unit = {
    val work = "/tmp/graft-ingest10x"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val M = 64
    val tenDir = s"$work/docs10x-tagged"
    require(new java.io.File(tenDir).exists(),
      "run ProbeDedupIngestScale first (stages the 10x substrate)")
    val docs = spark.read.parquet(tenDir)

    // at-rest shingle stores: plain and sbkt-partitioned (guarded)
    val plainDir = s"$work/shstore-plain"
    val partDir = s"$work/shstore-sbkt"
    if (!new java.io.File(plainDir).exists()) {
      val sh = Dedup.shingleSets(docs, n = 3)
      sh.write.parquet(plainDir)
      sh.withColumn("sbkt", pmod(xxhash64(col("doc_id")), lit(M.toLong)))
        .repartition(col("sbkt"))
        .write.partitionBy("sbkt").parquet(partDir)
    }

    // candidate pairs: a 4-doc trigger's near-dup partners (8 ids, but
    // NOT driver-planned — they arrive as a DataFrame, the real shape)
    val cands = docs.filter(col("doc_id") < 4)
      .select(col("doc_id").as("doc_a"), (col("doc_id") + 500L).as("doc_b"))
      .localCheckpoint(true)

    def run(tag: String, store: => org.apache.spark.sql.DataFrame,
        withSbktCond: Boolean): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        val sh = store
        val joined =
          if (withSbktCond)
            cands.join(sh,
              col("doc_a") === col("doc_id") &&
                col("sbkt") === pmod(xxhash64(col("doc_a")), lit(M.toLong)))
          else cands.join(sh, col("doc_a") === col("doc_id"))
        joined.select(col("doc_a"), size(col("sh")).as("ns")).count()
        (System.nanoTime() - t0) / 1e9
      }
      val wall = (1 to 3).map(_ => once()).min
      // scanned-row readout: rerun with an accumulator-free proxy — the
      // number of rows surviving the scan-level filters
      println(f"$tag%-28s wall(min3)=$wall%6.3f s")
    }

    run("plain (baseline)", spark.read.parquet(plainDir), withSbktCond = false)
    run("sbkt + equi-cond (DPP?)", spark.read.parquet(partDir), withSbktCond = true)
    // what the plan does: show whether a dynamicpruning subquery appears
    val sh = spark.read.parquet(partDir)
    val plan = cands.join(sh,
      col("doc_a") === col("doc_id") &&
        col("sbkt") === pmod(xxhash64(col("doc_a")), lit(M.toLong)))
      .queryExecution.executedPlan.toString
    val fired = plan.contains("dynamicpruning")
    println(s"dynamic partition pruning expression present: $fired")

    // variant: the partner's bucket rides as a MATERIALIZED column on
    // the probe side (the band index would store it at write time), so
    // the partition column is a plain join attribute on both sides —
    // DPP's documented shape
    val cands2 = cands
      .withColumn("sb_a", pmod(xxhash64(col("doc_a")), lit(M.toLong)))
      .localCheckpoint(true)
    def once2(): Double = {
      val t0 = System.nanoTime()
      cands2.join(sh, col("sb_a") === col("sbkt") && col("doc_a") === col("doc_id"))
        .select(col("doc_a"), size(col("sh")).as("ns")).count()
      (System.nanoTime() - t0) / 1e9
    }
    val w2 = (1 to 3).map(_ => once2()).min
    val plan2 = cands2
      .join(sh, col("sb_a") === col("sbkt") && col("doc_a") === col("doc_id"))
      .queryExecution.executedPlan.toString
    println(f"sbkt as join attribute        wall(min3)=$w2%6.3f s  " +
      s"dynamicpruning=${plan2.contains("dynamicpruning")}")
    // the scan-side evidence the wall numbers can't carry at this scale:
    // the shingle FileScan's PartitionFilters line (empty ⇒ the whole
    // store is scanned), plus what a fired pruning WOULD have read —
    // rows in the candidate buckets vs the full store
    plan2.linesIterator.filter(_.contains("PartitionFilters"))
      .foreach(l => println("  scan: " + l.trim.take(160)))
    val candBkts = cands2.select(col("sb_a")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val pruned = sh.filter(col("sbkt").isin(candBkts: _*)).count()
    val full = sh.count()
    println(f"  full store=$full%d rows; candidate buckets ${candBkts.length}%d/$M " +
      f"hold $pruned%d rows (${100.0 * pruned / full}%.1f%% — what a fired pruning would scan)")
    spark.stop()
  }
}
