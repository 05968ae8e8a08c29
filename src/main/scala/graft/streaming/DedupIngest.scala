package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.schema.Schemas
import graft.sources.{Staging, Tables}

/** Continuous near-dup ingestion — the streaming face of
  * [[graft.operators.Dedup.minHashIncrementalPairs]]: documents arrive as
  * a replayed file stream and every micro-batch runs the per-batch index
  * path — probe the PERSISTED band index with the batch's banding rows
  * (equi-join on (band, bucket)), verify candidates with exact Jaccard,
  * emit the batch's near-dup pairs, then APPEND the batch's banding rows
  * and shingles to the index. The accepted corpus is never rescanned;
  * per-batch cost is |batch| × bands probe rows — the shape a 100 TB
  * ingest pipeline runs continuously.
  *
  * Every unordered pair is examined exactly once (when its LATER document
  * arrives: earlier-batch partners via the index probe, same-batch
  * partners via the in-batch self-join), and banding is per-document — so
  * the UNION of all batches' pairs equals the whole-corpus operator's
  * pair set exactly, whatever the batch split. `q_dedup_ingest_stream`
  * asserts that equality (ids AND verified jaccard values) in-plan.
  */
object DedupIngest {

  private val StreamShuffleWidth = sys.env.getOrElse("GRAFT_STREAM_SHUFFLE", "4")

  /** Replay the documents table as `nBatches` doc_id-striped parquet files
    * (memoized per data dir; Staging's shutdown hook deletes them). */
  private def stagedDocs(spark: SparkSession, dir: String, nBatches: Int): java.io.File =
    Staging.dir("docs-ingest", dir) { d =>
      val docs = Tables.documents(spark, dir)
      (0 until nBatches).foreach { i =>
        val stage = new java.io.File(d, s"__stage$i")
        docs.filter(pmod(col("doc_id"), lit(nBatches)) === i)
          .coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
        val dest = new java.io.File(d, f"batch-$i%02d.parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath)
        dest.setLastModified(1700000000000L + i * 600000L)
        Staging.rmTree(stage)
      }
    }

  private def readOrEmpty(
      spark: SparkSession, dir: java.io.File,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (dir.exists()) spark.read.schema(schema).parquet(dir.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Run the ingest stream to completion and return ONE materialized row:
    * `(n_docs, pairs_nonempty, match_full)` where `match_full` is the
    * streamed-pairs ≡ whole-corpus-operator equality (both directions,
    * jaccard values included). The result is collected (1 row, bounded)
    * before the run's scratch dirs are deleted — the stream's index and
    * pair sinks are per-run MUTABLE state and must not outlive it
    * (Staging is input-only).
    *
    * `assertFull = false` (the bench-mode form, see
    * `SparkEntry.benchOverrides`) times the ingest stream alone: the
    * whole-corpus recompute is the verification harness, not the operator —
    * a continuous pipeline never rescans its accepted corpus. */
  def runStreamDedupIngest(
      spark: SparkSession, dir: String,
      nBatches: Int = 3, assertFull: Boolean = true): DataFrame = {
    val staged = stagedDocs(spark, dir, nBatches)
    val out = java.nio.file.Files.createTempDirectory("graft-ingest").toFile
    val bandDir = new java.io.File(out, "bands")
    val shDir = new java.io.File(out, "shingles")
    val pairDir = new java.io.File(out, "pairs")

    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", StreamShuffleWidth)
    try {
      val q = spark.readStream.schema(Schemas.documents)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged.toString)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val s = batch.sparkSession
          val newSh = Dedup.shingleSets(batch, n = 3)
          val newBands = Dedup.bandRows(newSh)
          val pairs = Dedup.minHashIncrementalPairs(
            newSh,
            readOrEmpty(s, bandDir, newBands.schema),
            readOrEmpty(s, shDir, newSh.schema))
          pairs.write.mode("append").parquet(pairDir.toString)
          // append AFTER probing: the batch must not see itself in the index
          newBands.write.mode("append").parquet(bandDir.toString)
          newSh.write.mode("append").parquet(shDir.toString)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()

      val streamedSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_a", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("doc_b", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("jaccard", org.apache.spark.sql.types.DoubleType)))
      val streamed = readOrEmpty(spark, pairDir, streamedSchema)
        .select(col("doc_a"), col("doc_b"), col("jaccard").as("j_s"))
        .withColumn("in_s", lit(1L))
      val row =
        if (assertFull) {
          val full = Dedup.minHashPairsFromShingles(
            Dedup.shingleSets(Tables.documents(spark, dir), n = 3))
            .select(col("doc_a"), col("doc_b"), col("jaccard").as("j_f"))
            .withColumn("in_f", lit(1L))
          streamed.join(full, Seq("doc_a", "doc_b"), "full")
            .agg(
              coalesce(sum(col("in_s")), lit(0L)).as("n_pairs"),
              (coalesce(sum(
                when(col("in_s").isNull || col("in_f").isNull
                  || col("j_s") =!= col("j_f"), 1L).otherwise(0L)), lit(0L)) === 0L)
                .as("match_ok"))
            .head()
        } else {
          // bench form: the streamed pair set alone (already materialized
          // by the foreachBatch sinks above — this is a bounded 1-row agg)
          streamed.agg(
            coalesce(sum(col("in_s")), lit(0L)).as("n_pairs"),
            lit(true).as("match_ok")).head()
        }
      val nDocs = Tables.documents(spark, dir).count()
      import spark.implicits._
      Seq((nDocs, row.getLong(0) > 0L, row.getBoolean(1)))
        .toDF("n_docs", "pairs_nonempty", "match_full")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", saved)
      Staging.rmTree(out)
    }
  }
}
