package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions._

/** IVF (inverted-file) approximate nearest neighbor search — the classic
  * coarse-quantizer design: k-means partitions the corpus into `nLists`
  * cells; a query only scores vectors in its `nProbe` closest cells.
  *
  * Scale shape: the index build is one MLlib k-means fit (seeded →
  * deterministic) + one assignment pass; centroids (nLists × dim floats)
  * are tiny and broadcast. Search is a broadcast join of queries×probed
  * cells against the cell-partitioned corpus — at 100 TB the corpus would
  * be *written partitioned by cell_id*, so a probe reads only
  * nProbe/nLists of the data (partition pruning does the fan-out cut).
  */
object IvfIndex {

  final case class Index(assigned: DataFrame, centroids: Array[(Int, Array[Double])])

  /** Build: fit seeded k-means on the embeddings, assign each vector to its
    * cell. */
  def build(spark: SparkSession, embeddings: DataFrame, nLists: Int, seed: Long = 42L): Index = {
    val withVec = embeddings
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("features", array_to_vector(col("embedding")))
      .cache() // Lloyd iterations re-scan this frame
    val model = new KMeans()
      .setK(nLists).setSeed(seed).setMaxIter(10).setTol(1e-3).setFeaturesCol("features")
      .fit(withVec)
    val assigned = model.transform(withVec)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell_id"))
    withVec.unpersist()
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    Index(assigned, centroids)
  }

  /** Search: route each query to its `nProbe` nearest centroids, score only
    * vectors in those cells, take cosine top-k. */
  def search(spark: SparkSession, index: Index, queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    import spark.implicits._
    // centroid table is tiny → literal/broadcast
    val cents = index.centroids.toSeq
      .map { case (id, arr) => (id, arr.map(_.toFloat)) }
      .toDF("cell_id", "centroid")

    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      l2Norm(col("embedding")).as("q_nrm"))

    // rank centroids per query by distance proxy (cosine), keep nProbe
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim").desc, col("cell_id").asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("cent_sim", dotProduct(col("q_emb"), col("centroid")))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("cell_id"))

    val corpus = index.assigned.select(
      col("cell_id"), col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      l2Norm(col("embedding")).as("c_nrm"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    probes
      .join(corpus, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        round(dotProduct(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }
}
