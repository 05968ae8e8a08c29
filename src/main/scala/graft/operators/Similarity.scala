package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[bruteForceKnn]] — exact cosine top-k of a bounded *query* set against
  *    the full candidate corpus. The query side is broadcast; candidates
  *    stream through in one pass, so cost is |Q|·|C| with |Q| small. This is
  *    the correctness baseline and is DuckDB-oracle-checkable.
  *  - [[lshKnn]] — random-hyperplane LSH: sign-pattern buckets prune the
  *    candidate set, exact cosine re-ranks inside the probed buckets. The
  *    scale path: at 100 TB the bucket join replaces the |Q|·|C| product.
  *
  * Hyperplanes are derived deterministically from `xxhash64`, so results are
  * reproducible with no RNG state and identical across executors.
  */
object Similarity {

  /** Exact top-k neighbors by cosine for each query vector.
    * Ranking uses the similarity rounded to 6 decimals with the neighbor id
    * as tie-break, which makes the result order-stable across engines
    * (float last-bit noise cannot reorder). */
  def bruteForceKnn(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      l2Norm(col("embedding")).as("q_nrm"))
    val c = candidates
      .repartition(candidates.sparkSession.sparkContext.defaultParallelism)
      .select(
        col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        l2Norm(col("embedding")).as("c_nrm"))
    val scored = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        round(dotProduct(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Sign pattern of the vector against `planes` deterministic random
    * hyperplanes, packed into one long — an LSH bucket key. Plane p's j-th
    * component is `xxhash64(p*dims+j)` scaled to [-1,1); no RNG state.
    * `firstPlane` offsets the plane family so banded (OR-amplified) schemes
    * can draw independent planes per band. */
  def hyperplaneSignature(embedding: Column, planes: Int, dims: Int, firstPlane: Int = 0): Column =
    (0 until planes).map { p =>
      val plane = array((0 until dims).map { j =>
        (xxhash64(lit((firstPlane + p) * dims + j)).cast("double") / lit(Long.MaxValue.toDouble))
      }: _*)
      when(dotProduct(embedding, plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** Banded hyperplane buckets for OR-amplified LSH: `bands` independent
    * signatures of `rowsPerBand` planes each. Sharing ANY band bucket makes
    * a candidate pair; recall at cosine c is 1-(1-p^r)^B with
    * p = 1 - arccos(c)/π. */
  def hyperplaneBands(embedding: Column, bands: Int, rowsPerBand: Int, dims: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        hyperplaneSignature(embedding, rowsPerBand, dims, firstPlane = b * rowsPerBand).as("bucket"))
    }: _*)

  /** ANN top-k: bucket-join on the hyperplane signature, exact cosine
    * re-rank within the shared bucket. Recall is tuned by `planes` (fewer
    * planes → bigger buckets → higher recall, more re-rank work). */
  def lshKnn(queries: DataFrame, candidates: DataFrame, k: Int, planes: Int = 8): DataFrame = {
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      l2Norm(col("embedding")).as("q_nrm"),
      hyperplaneSignature(col("embedding"), planes, dims = 64).as("bucket"))
    val c = candidates
      .repartition(candidates.sparkSession.sparkContext.defaultParallelism)
      .select(
        col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        l2Norm(col("embedding")).as("c_nrm"),
        hyperplaneSignature(col("embedding"), planes, dims = 64).as("bucket"))
    val scored = q
      .join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        round(dotProduct(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }
}
