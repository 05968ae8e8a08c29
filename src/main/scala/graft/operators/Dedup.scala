package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions._

/** Deduplication for large text corpora — the training-data-pipeline side of
  * the engine. Exact dedup is a hash groupBy; near-dup goes through
  * MinHash+LSH banding so candidate generation is a bucket join, never an
  * O(n²) cross join. At 100 TB the only all-pairs work ever done is inside
  * an LSH bucket (or an explicit blocking key), both of which are bounded.
  */
object Dedup {

  /** Exact duplicate groups by content hash: canonical id = min(doc_id),
    * membership count. `sha2` (not `hash`) so collisions are cryptographically
    * negligible and the fingerprint is portable. */
  def exactGroups(documents: DataFrame): DataFrame =
    documents
      .groupBy(sha2(col("text"), 256).as("text_sha"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_count"))
      .select(col("doc_id"), col("text_sha"), col("dup_count"))

  /** Exact dedup keeping the first writer per PK — the `ON CONFLICT DO
    * NOTHING` load analog (SURVEY §2.1 S5). */
  def dropDuplicatesByKey(df: DataFrame, pk: Seq[String]): DataFrame =
    df.dropDuplicates(pk)

  /** MinHash + LSH near-duplicate pairs.
    *
    * shingle(n words) → k-entry MinHash signature → `bands`×`rowsPerBand`
    * banding → explode band buckets → self-join on bucket (candidates) →
    * verify with *exact* shingle-set Jaccard ≥ `threshold`.
    *
    * Only candidate pairs (same band bucket) are verified, so the join is
    * linear in bucket occupancy, not quadratic in corpus size. Signature k =
    * bands*rowsPerBand; with (8,4) the S-curve crosses ~0.5^(1/4)≈0.84.
    */
  def minHashNearDuplicates(
      documents: DataFrame,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val k = bands * rowsPerBand
    val sketched = documents
      .select(col("doc_id"), distinctShingles(col("text"), shingleSize).as("shingles"))
      .withColumn("sig", minHashSignature(col("shingles"), k))
      .withColumn("band", explode(lshBandHashes(col("sig"), bands, rowsPerBand)))
      .select(col("doc_id"), col("shingles"), col("band.band"), col("band.bucket"))

    val a = sketched.alias("a")
    val b = sketched.alias("b")
    val candidates = a
      .join(b,
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.shingles").as("sh_a"), col("b.shingles").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")

    candidates
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash near-duplicates: 64-bit fingerprints, candidates via 4×16-bit
    * band buckets (any identical quarter ⇒ candidate, guaranteeing recall of
    * every pair with Hamming distance ≤ 3), verified by exact Hamming ≤
    * `maxHamming`. */
  def simHashNearDuplicates(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = documents
      .select(col("doc_id"), simHash64(tokens(col("text"))).as("simhash"))
    val banded = fp.withColumn(
      "band",
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bucket"))
      }: _*)))
      .select(col("doc_id"), col("simhash"), col("band.band"), col("band.bucket"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming64(col("a.simhash"), col("b.simhash")).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Exact token-set Jaccard similarity for all pairs inside a blocking key
    * (here: `source`). The blocked self-join is the classic record-linkage
    * shape: the quadratic term is bounded per block. Oracle-friendly (plain
    * set algebra, no hashing). */
  def blockedJaccardPairs(documents: DataFrame, threshold: Double): DataFrame = {
    val tok = documents.select(
      col("doc_id"), col("source"), distinctTokens(col("text")).as("toks"))
    val a = tok.alias("a")
    val b = tok.alias("b")
    a.join(b, col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        round(jaccard(col("a.toks"), col("b.toks")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Embedding near-duplicates: cosine ≥ `threshold` pairs, candidates from
    * banded random-hyperplane LSH (OR-amplification across `bands`
    * signatures of `rowsPerBand` planes — see
    * [[Similarity.hyperplaneBands]]), verified by exact cosine. */
  def embeddingNearDuplicates(
      embeddings: DataFrame,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      threshold: Double = 0.4): DataFrame = {
    val sig = embeddings
      .select(col("vec_id"), col("embedding"),
        explode(Similarity.hyperplaneBands(col("embedding"), bands, rowsPerBand, dims = 64)).as("bb"))
      .select(col("vec_id"), col("embedding"), col("bb.band"), col("bb.bucket"))
    val a = sig.alias("a")
    val b = sig.alias("b")
    a.join(b,
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.embedding").as("emb_a"), col("b.embedding").as("emb_b"))
      .dropDuplicates("vec_a", "vec_b")
      .select(
        col("vec_a"), col("vec_b"),
        round(cosineSimilarity(col("emb_a"), col("emb_b")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** |A∩B| / |A∪B| over array columns — exact, order-free. */
  def jaccard(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  def distinctShingles(text: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    array_distinct(wordShingles(tokens(text), n))
}
