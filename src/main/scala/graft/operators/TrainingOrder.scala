package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-order layout — what a pretraining pipeline does AFTER curation:
  * decide the order examples reach the trainer in and which shard they land
  * on, deterministically, at corpus scale. Both ops are rank-shaped and ride
  * [[Ranking.rowNumber]] (range-repartition + partition-offset ordinals), so
  * neither ever funnels the corpus through a single-task window.
  */
object TrainingOrder {

  /** Curriculum ordering with source-balanced interleave: rank documents
    * WITHIN each source by a difficulty score (ascending = easy-first, the
    * standard curriculum), then interleave sources round-robin so every
    * training window sees the full source mixture instead of "all web,
    * then all code". Emitted `position = (rank−1)·|sources| + source_idx`
    * is a deterministic total order (dense when sources are equal-sized;
    * still strictly interleaving otherwise). The source index is a rank
    * over the DISTINCT source domain — value-domain-sized, broadcast back.
    */
  def curriculumInterleave(
      docs: DataFrame, sourceCol: String, score: Column, idCol: String): DataFrame = {
    val ranked = Ranking.rowNumber(
      docs.select(col(idCol), col(sourceCol), score.as("__score")),
      Seq(sourceCol), Seq(col("__score"), col(idCol)), "__rk")
    val srcIdx = Ranking.rowNumber(
      docs.select(col(sourceCol)).distinct(),
      Nil, Seq(col(sourceCol)), "__sidx", totalCol = Some("__nsrc"))
    ranked
      .join(broadcast(srcIdx), Seq(sourceCol))
      .withColumn("position", (col("__rk") - 1) * col("__nsrc") + col("__sidx") - 1)
      .select(col(idCol), col(sourceCol), col("position"))
  }

  /** Deterministic sharded shuffle: scatter documents into `nShards`
    * training shards and order each shard by a scrambled key — the layout
    * step that fixes a reproducible global training order AND its file
    * placement (shard = file, position = offset) without any RNG state.
    * The scrambler is [[graft.functions.PortableHash.shardKey]] — the
    * overflow-proof Knuth multiplicative hash `(id mod p)·A mod p`
    * (p = 3037000493, products stay under 2⁶³) — engine-portable integer
    * math, so an external system can recompute any example's location
    * from its id alone. */
  def shardShuffle(docs: DataFrame, idCol: String, nShards: Int = 16): DataFrame = {
    require(nShards > 0, s"shardShuffle: nShards must be positive, got $nShards")
    val key = graft.functions.PortableHash.shardKey(col(idCol))
    val sharded = docs
      .select(col(idCol))
      .withColumn("__key", key)
      .withColumn("shard", (col("__key") % nShards).cast("long"))
    Ranking.rowNumber(sharded, Seq("shard"), Seq(col("__key"), col(idCol)), "pos")
      .select(col(idCol), col("shard"), col("pos"))
  }
}
