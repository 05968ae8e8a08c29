package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed PCA — top principal component of an embedding column via
  * one covariance-moment pass + a constant-size power iteration.
  *
  * The split mirrors how vector infrastructure actually scales (FAISS
  * trains its coarse quantizers the same way; cf. [[IvfIndex]]'s
  * driver-trained centroid literals): the O(n·d²) Gram/covariance moments
  * are the DATA-proportional work and run as ONE distributed pass —
  * per-row upper-triangle products flowing straight into a map-side
  * partial aggregate (the shuffle carries ≤ d(d+1)/2 rows per task, never
  * n·d²) — while the d×d eigensolve is CONSTANT-size (d² doubles,
  * bounded by construction) and runs driver-side, exactly like the
  * repo's other bounded-domain folds ([[Robust.quantileEdges]],
  * [[BpeTrain]]'s merge argmax).
  *
  * Bit-portability discipline (the [[Robust]] conventions):
  *   - per-dimension means: exact DECIMAL(38,12) sums → ONE double
  *     division → round 6dp, broadcast back as literals;
  *   - covariance moments: per-row centered products in double
  *     (float→double widening is exact), each CAST once to
  *     DECIMAL(38,12), summed exactly (order-free), ONE double cast out.
  *     The matrix is left UN-normalized — the eigenvector and the
  *     explained-variance RATIO are invariant to the 1/n scaling, so no
  *     engine ever divides the moments;
  *   - power iteration: fixed v₀ = 1/√d (exactly representable for d a
  *     power of 4), a fixed round count (no data-dependent convergence
  *     test), and every fold — matvec over j, norm over i, Rayleigh
  *     quotient, trace, the sign-fixing component sum — runs ascending,
  *     left-to-right, so the DuckDB oracle replays the identical IEEE
  *     chain via ordered list_reduce.
  *
  * Sign is fixed by the ascending component sum (flip iff Σᵢ vᵢ < 0) —
  * an eigenvector's sign is arbitrary, and this rule is order-stable in
  * both engines. Output: one row per dimension (i, loading, var_ratio)
  * where var_ratio = Rayleigh(λ₁)/trace — the fraction of total variance
  * the top component explains.
  */
object Pca {

  /** Top principal component of `vecCol` (ArrayType(FloatType), length
    * `dim`): rows with a null vector, wrong length, or null elements are
    * excluded up front (and by the oracle). `rounds` power-iteration
    * steps, fixed. */
  def topComponent(df: DataFrame, vecCol: Column, dim: Int, rounds: Int = 10): DataFrame = {
    require(dim > 0 && rounds > 0, s"Pca.topComponent: dim=$dim rounds=$rounds")
    val spark = df.sparkSession
    import spark.implicits._
    val dec = DecimalType(38, 12)

    val rows = df.select(vecCol.as("v"))
      .filter(col("v").isNotNull && size(col("v")) === dim &&
        !exists(col("v"), x => x.isNull))

    // Pass 1 — exact-decimal per-dimension sums → rounded literal means.
    // Collect is d rows, bounded by construction.
    val meanRows = rows
      .select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(sum(col("x").cast(dec)).as("s"), count(lit(1)).as("n"))
      .select(col("i"), round(col("s").cast(DoubleType) / col("n"), 6).as("m"))
      .collect()
    require(meanRows.nonEmpty, "Pca.topComponent: no valid vectors")
    val means = Array.ofDim[Double](dim)
    meanRows.foreach(r => means(r.getAs[Int]("i")) = r.getAs[Double]("m"))

    // Pass 2 — centered upper-triangle products, decimal-exact partial
    // aggregation. The centered array materializes ONCE per row; the
    // explode feeds a hash aggregate whose shuffle is ≤ d(d+1)/2 rows
    // per task regardless of n.
    val mLit = array(means.map(lit): _*)
    val centered = rows.select(
      zip_with(col("v"), mLit, (x, m) => x.cast(DoubleType) - m).as("c"))
    val pairs = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        struct(i.as("i"), j.as("j"),
          (element_at(col("c"), i + 1) * element_at(col("c"), j + 1))
            .cast(dec).as("p")))))
    val covRows = centered
      .select(explode(pairs).as("pr"))
      .select(col("pr.i").as("i"), col("pr.j").as("j"), col("pr.p").as("p"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("p")).cast(DoubleType).as("c"))
      .collect() // ≤ d(d+1)/2 rows, bounded by construction

    val mat = Array.ofDim[Double](dim, dim)
    covRows.foreach { r =>
      val (i, j, c) = (r.getAs[Int]("i"), r.getAs[Int]("j"), r.getAs[Double]("c"))
      mat(i)(j) = c; mat(j)(i) = c
    }

    // Constant-size power iteration, every fold ascending left-to-right.
    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var s = 0.0; var j = 0
        while (j < dim) { s += mat(i)(j) * v(j); j += 1 }; s
      }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to rounds) {
      val w = matvec(v)
      var ss = 0.0; var i = 0
      while (i < dim) { ss += w(i) * w(i); i += 1 }
      val nrm = math.sqrt(ss)
      v = w.map(_ / nrm)
    }
    val t = matvec(v)
    var lam = 0.0; var tr = 0.0; var csum = 0.0
    var i = 0
    while (i < dim) { lam += v(i) * t(i); tr += mat(i)(i); csum += v(i); i += 1 }
    val sg = if (csum < 0.0) -1.0 else 1.0
    val ratio = lam / tr

    val out = (0 until dim).map(k =>
      (k, BigDecimal(sg * v(k)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(ratio).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    spark.createDataFrame(out).toDF("i", "loading", "var_ratio")
      .orderBy(col("i"))
  }
}
