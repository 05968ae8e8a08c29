package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._

/** Product quantization (Jégou et al. 2011, "Product quantization for
  * nearest neighbor search" — the FAISS `PQm` building block): split each
  * d-dim vector into `m` subvectors of d/m dims, k-means each subspace to
  * `ksub` centroids, and store per vector only the `m` centroid indices.
  *
  * Scale shape: a 64-dim float vector (256 B) compresses to m=8 single-byte
  * codes (8 B) — 32× — which is what makes exhaustive candidate scoring
  * feasible at 100 TB: the corpus-resident search structure is codes, not
  * floats. Search is ADC (asymmetric distance computation): the QUERY stays
  * full-precision; each subspace's dot products against all `ksub`
  * centroids are computed ONCE per query into a lookup table, after which
  * scoring a corpus vector is `m` table lookups — no float math touches
  * corpus rows at all. Training is the same bounded-driver-sample
  * discipline as [[IvfIndex]] (k-means needs O(ksub) examples per
  * subspace, independent of corpus size); encoding is one distributed
  * codegen pass against centroid literals.
  *
  * Reference scope: the reference engine has no ANN surface; this extends
  * the §7.4 similarity stack (brute-force / LSH / IVF) with the
  * compressed-domain tier every production vector store ships.
  */
object Pq {

  /** `centroids(j)(c)` = subspace j's centroid c (d/m doubles);
    * `normSq(j)(c)` = its squared L2 norm (reconstruction-norm lookups). */
  final case class Codebook(
      m: Int,
      dsub: Int,
      centroids: Array[Array[Array[Double]]],
      normSq: Array[Array[Double]])

  /** Train per-subspace k-means codebooks on a deterministic bounded
    * hash-sample (≤ `trainCap` vectors collected to the driver — the
    * published PQ training recipe; cost independent of corpus size). */
  def train(
      spark: SparkSession,
      embeddings: DataFrame,
      dims: Int,
      m: Int = 8,
      ksub: Int = 16,
      seed: Long = 42L,
      trainCap: Int = 16384,
      maxIter: Int = 10,
      tol: Double = 1e-4): Codebook = {
    require(m >= 1 && dims % m == 0, s"Pq.train: m=$m must divide dims=$dims")
    val dsub = dims / m
    val base = embeddings.select(col("vec_id"), col("embedding"))
    val total = base.count()
    val picked =
      if (total <= trainCap) base
      else {
        val mod = 1000003L
        val base_ = (trainCap.toLong * mod) / total
        val thresh = math.max(1L, base_ + math.max(1L, base_ / 20))
        base.filter(pmod(xxhash64(col("vec_id")), lit(mod)) < lit(thresh))
      }
    val sample: Array[Array[Double]] = picked
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).iterator.map(_.toDouble).toArray)
    sample.foreach(v => require(v.length == dims,
      s"Pq.train: expected $dims-dim embeddings, got ${v.length}"))

    val cents = Array.tabulate(m) { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      // per-subspace seed keeps subquantizers independent but deterministic
      IvfIndex.lloyd(sub, ksub, seed + j, maxIter, tol)
    }
    Codebook(m, dsub, cents, cents.map(_.map(c => c.map(v => v * v).sum)))
  }

  /** Encode: one distributed pass through the native [[graft.functions.PqEncode]]
    * kernel (the codebook ships inside the serialized expression — the
    * expression-level analog of a broadcast model). Output per vector:
    * `code` (m small ints — the at-rest representation) and `recon_nrm`
    * (‖reconstruction‖, precomputed alongside the code so cosine ADC never
    * touches corpus floats). */
  def encode(embeddings: DataFrame, cb: Codebook): DataFrame =
    embeddings
      .select(col("vec_id"),
        graft.functions.PqExpressions.pqEncode(col("embedding"), cb.centroids).as("pq"))
      .select(col("vec_id"), col("pq.code").as("code"), col("pq.recon_nrm").as("recon_nrm"))

  /** ADC search: for each (bounded) query, build the m × ksub lookup table
    * of subspace dot products ONCE on the driver, inline all queries' LUTs
    * as literals, and score every encoded corpus vector with m table
    * lookups — the corpus side of the plan reads only (vec_id, code,
    * recon_nrm). Estimated cosine = Σⱼ LUT[j][codeⱼ] / (‖q‖·‖recon‖);
    * top-k per query via the bounded-heap aggregate. The driver-side
    * query collect is the same bounded-|Q| contract as
    * [[Similarity.bruteForceKnn]]'s broadcast side. */
  def adcSearch(
      encoded: DataFrame,
      cb: Codebook,
      queries: DataFrame,
      k: Int): DataFrame = {
    val qRows = queries.select(col("vec_id"), col("embedding")).collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).iterator.map(_.toDouble).toArray)
    }
    require(qRows.nonEmpty, "Pq.adcSearch: empty query set")
    qRows.foreach { case (_, q) => require(q.length == cb.m * cb.dsub,
      s"Pq.adcSearch: expected ${cb.m * cb.dsub}-dim queries, got ${q.length}") }

    val luts = qRows.map { case (qid, q) =>
      val qNrm = math.sqrt(q.map(v => v * v).sum)
      val lut: Array[Array[Double]] = Array.tabulate(cb.m) { j =>
        Array.tabulate(cb.centroids(j).length) { c =>
          val cent = cb.centroids(j)(c)
          var s = 0.0
          var t = 0
          while (t < cb.dsub) { s += q(j * cb.dsub + t) * cent(t); t += 1 }
          s
        }
      }
      (qid, qNrm, lut)
    }

    Similarity.rankTopK(
      encoded
        .select(col("vec_id").as("neighbor_id"),
          graft.functions.PqExpressions
            .pqAdcScores(col("code"), col("recon_nrm"), luts).as(Seq("query_id", "cosine")))
        .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
        .filter(col("query_id") =!= col("neighbor_id")),
      k)
  }
}
