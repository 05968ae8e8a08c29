package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType, LongType, StructField, StructType}

/** Embedding-SPACE drift gate — the vector companion to the scalar drift
  * family ([[Robust.ksStatistic]] / [[Robust.psiDrift]]): a scalar gate
  * on one feature cannot see a distribution shift in a 64-dim embedding
  * cloud (each marginal can stay put while the joint moves), and the
  * production question — "did today's crawl embed differently than the
  * reference corpus?" — is asked of the vectors themselves. The statistic
  * is the squared Fréchet distance under DIAGONAL covariance (the FID
  * recipe of Heusel et al. 2017 restricted to per-dimension variances —
  * the full-covariance matrix-sqrt term needs an SVD the oracle could not
  * replay bit-exactly, and the diagonal form is the standard large-d
  * approximation):
  *
  *   d² = Σ_i (μ_ref,i − μ_cur,i)² + σ²_ref,i + σ²_cur,i
  *        − 2·√(σ²_ref,i · σ²_cur,i)
  *
  * Exactness (the [[Pca]] discipline, proven by its oracle): per-dim
  * means come from exact DECIMAL(38,12) sums of the raw floats → ONE
  * double cast → 6-dp round; per-dim population variances from exact
  * decimal sums of the double-centered squares against those ROUNDED
  * means → one cast → 6-dp round; the final fold runs ascending-i over
  * the d rounded pairs, a fixed double chain both engines replay
  * bit-identically.
  *
  * Scale shape: two passes over the pruned (split, vector) projection —
  * each a posexplode into a per-(side, dim) keyed aggregate with map-side
  * partials, so the shuffle carries ≤ 2·d rows per task regardless of
  * corpus size; the 2·d summary collects driver-side (bounded by the
  * model dimension, the [[Pca]] means contract) and the d-term fold is
  * driver arithmetic. An empty (or all-invalid) side yields an EMPTY
  * result — a drift gate must fail loudly on a missing profile, never
  * read "distance 0" off absence (the [[Robust.psiDrift]] contract).
  * Invalid vectors (null, wrong length, null elements) are excluded up
  * front, as in [[Pca.topComponent]].
  */
object EmbeddingDrift {

  def frechetDrift(
      df: DataFrame, vecCol: Column, splitCol: Column,
      refGroup: String, curGroup: String, dim: Int): DataFrame = {
    require(dim > 0, s"frechetDrift: dim=$dim")
    val spark = df.sparkSession
    val dec = DecimalType(38, 12)
    val outSchema = StructType(Seq(
      StructField("n_ref", LongType, nullable = false),
      StructField("n_cur", LongType, nullable = false),
      StructField("frechet2", DoubleType, nullable = false)))

    val rows = df
      .filter(splitCol.isin(refGroup, curGroup))
      .select((splitCol === refGroup).as("is_ref"), vecCol.as("v"))
      .filter(col("v").isNotNull && size(col("v")) === dim &&
        !exists(col("v"), x => x.isNull))

    // pass 1 — per-(side, dim) exact decimal sums → rounded means;
    // collect is ≤ 2·d rows, bounded by the model dimension
    val meanRows = rows
      .select(col("is_ref"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("is_ref"), col("i"))
      .agg(sum(col("x").cast(dec)).as("s"), count(lit(1)).as("n"))
      .select(col("is_ref"), col("i"),
        round(col("s").cast(DoubleType) / col("n"), 6).as("m"), col("n"))
      .collect()
    val sides = meanRows.map(_.getBoolean(0)).toSet
    if (sides != Set(true, false)) // a missing profile is absence, not zero drift
      return spark.createDataFrame(
        java.util.Collections.emptyList[Row](), outSchema)
    val means: Map[Boolean, Array[Double]] = meanRows.groupBy(_.getBoolean(0)).map {
      case (side, rs) =>
        val a = Array.ofDim[Double](dim)
        rs.foreach(r => a(r.getAs[Int]("i")) = r.getAs[Double]("m"))
        side -> a
    }
    val nBySide = meanRows.groupBy(_.getBoolean(0))
      .map { case (side, rs) => side -> rs.head.getAs[Long]("n") }

    // pass 2 — per-(side, dim) exact decimal sums of the double-centered
    // squares against the ROUNDED means (slim 2-row broadcast)
    val meansDf = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(true, means(true).toSeq), Row(false, means(false).toSeq)),
      StructType(Seq(
        StructField("is_ref", org.apache.spark.sql.types.BooleanType, nullable = false),
        StructField("__m", ArrayType(DoubleType, containsNull = false), nullable = false))))
    val varRows = rows.join(broadcast(meansDf), Seq("is_ref"))
      .select(col("is_ref"),
        posexplode(zip_with(col("v"), col("__m"),
          (x, m) => {
              // exact decimals: no double-product cast (see Clustering.distArray)
              val dx = x.cast(DecimalType(16, 12)) - m.cast(DecimalType(8, 6))
              dx * dx
            }))
          .as(Seq("i", "sq")))
      .groupBy(col("is_ref"), col("i"))
      .agg(sum(col("sq")).as("ss"), count(lit(1)).as("n"))
      .select(col("is_ref"), col("i"),
        round(col("ss").cast(DoubleType) / col("n"), 6).as("s2"))
      .collect()
    val vars: Map[Boolean, Array[Double]] = varRows.groupBy(_.getBoolean(0)).map {
      case (side, rs) =>
        val a = Array.ofDim[Double](dim)
        rs.foreach(r => a(r.getAs[Int]("i")) = r.getAs[Double]("s2"))
        side -> a
    }

    // ascending-i fold over d rounded (mean, var) pairs — the fixed
    // double chain the oracle replays term-for-term
    var fr = 0.0
    var i = 0
    while (i < dim) {
      val dm = means(true)(i) - means(false)(i)
      val sr = vars(true)(i)
      val sc = vars(false)(i)
      fr += dm * dm + sr + sc - 2.0 * math.sqrt(sr * sc)
      i += 1
    }
    // Spark's round(_, 6) semantics exactly (shortest-repr + HALF_UP) —
    // the proven pairing against DuckDB's round in every other oracle
    val rounded = java.math.BigDecimal.valueOf(fr)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(nBySide(true), nBySide(false), rounded)),
      outSchema)
  }

  /** Label-separability audit — the Fisher-style encoder health check
    * the drift gates don't make: [[frechetDrift]] asks "did the cloud
    * MOVE?"; this asks "are the label sub-clouds still SEPARABLE?" (an
    * encoder regression that collapses two classes onto each other keeps
    * the global cloud in place). Per label: the within-class scatter
    * (trace of the diagonal covariance, the same per-dim variance the
    * Fréchet gate uses), the nearest OTHER centroid and its squared
    * distance, and the Fisher-style ratio nearest_dist² / intra —
    * healthy classes keep the ratio well above 0; a collapse drives it
    * toward it.
    *
    * Exactness: the [[frechetDrift]] recipe verbatim — per-(label, dim)
    * exact DECIMAL(38,12) sums → rounded means → exact decimal sums of
    * the double-centered squares → rounded per-dim variances; all folds
    * (intra trace, centroid distances) run ascending-dim over those
    * rounded values, fixed double chains the oracle replays; the nearest
    * pick breaks ties on the smaller label. Labels ride as longs so the
    * tie order is engine-portable.
    *
    * Scale shape: the same two posexplode passes with map-side partials
    * (shuffle ≤ |labels|·d rows per task); driver summaries are
    * |labels|·d rows under the [[Robust.MaxSummaryRows]] ceiling; the
    * centroid-pair work is |labels|²·d driver arithmetic on the rounded
    * summary, never a data-sized join. Fewer than two labels → EMPTY
    * (separability of one class is undefined — fail loud, not 0). */
  def labelSeparability(
      df: DataFrame, vecCol: Column, labelCol: Column, dim: Int): DataFrame = {
    require(dim > 0, s"labelSeparability: dim=$dim")
    val spark = df.sparkSession
    val dec = DecimalType(38, 12)
    val outSchema = StructType(Seq(
      StructField("label", LongType, nullable = true),
      StructField("n", LongType, nullable = false),
      StructField("intra_var", DoubleType, nullable = false),
      StructField("nearest_label", LongType, nullable = true),
      StructField("nearest_dist2", DoubleType, nullable = false),
      StructField("fisher_ratio", DoubleType, nullable = true)))
    val rows = df
      .filter(labelCol.isNotNull)
      .select(labelCol.cast("long").as("__g"), vecCol.as("v"))
      .filter(col("v").isNotNull && size(col("v")) === dim &&
        !exists(col("v"), x => x.isNull))
    val meanRows = Robust.collectSummary(
      rows.select(col("__g"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("__g"), col("i"))
        .agg(sum(col("x").cast(dec)).as("s"), count(lit(1)).as("n"))
        .select(col("__g"), col("i"),
          round(col("s").cast(DoubleType) / col("n"), 6).as("m"), col("n")),
      "labelSeparability")
    val byG = meanRows.groupBy(_.getLong(0))
    val labels = byG.keys.toSeq.sorted
    if (labels.size < 2)
      return spark.createDataFrame(java.util.Collections.emptyList[Row](), outSchema)
    def toArr(rs: Array[Row], field: String): Array[Double] = {
      val a = Array.ofDim[Double](dim)
      rs.foreach(r => a(r.getAs[Int]("i")) = r.getAs[Double](field))
      a
    }
    val means = byG.map { case (g, rs) => g -> toArr(rs, "m") }
    val nByG = byG.map { case (g, rs) => g -> rs.head.getAs[Long]("n") }
    val meansDf = spark.createDataFrame(
      java.util.Arrays.asList(labels.map(g => Row(g, means(g).toSeq)): _*),
      StructType(Seq(
        StructField("__g", LongType, nullable = false),
        StructField("__m", ArrayType(DoubleType, containsNull = false), nullable = false))))
    val varRows = Robust.collectSummary(
      rows.join(broadcast(meansDf), Seq("__g"))
        .select(col("__g"),
          posexplode(zip_with(col("v"), col("__m"),
            (x, m) => {
              // exact decimals: no double-product cast (see Clustering.distArray)
              val dx = x.cast(DecimalType(16, 12)) - m.cast(DecimalType(8, 6))
              dx * dx
            }))
            .as(Seq("i", "sq")))
        .groupBy(col("__g"), col("i"))
        .agg(sum(col("sq")).as("ss"), count(lit(1)).as("n"))
        .select(col("__g"), col("i"),
          round(col("ss").cast(DoubleType) / col("n"), 6).as("s2")),
      "labelSeparability")
    val vars = varRows.groupBy(_.getLong(0)).map { case (g, rs) => g -> toArr(rs, "s2") }
    def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val out = labels.map { g =>
      var intra = 0.0
      var i = 0
      while (i < dim) { intra += vars(g)(i); i += 1 }
      var bestG = -1L
      var bestD = Double.MaxValue
      for (h <- labels if h != g) {
        var d2 = 0.0
        var j = 0
        while (j < dim) {
          val dm = means(g)(j) - means(h)(j)
          d2 += dm * dm
          j += 1
        }
        if (d2 < bestD) { bestD = d2; bestG = h } // labels ascend: ties keep the smaller
      }
      Row(g, nByG(g), round6(intra), bestG, round6(bestD),
        if (intra > 0) round6(bestD / intra) else null)
    }
    spark.createDataFrame(java.util.Arrays.asList(out: _*), outSchema)
      .orderBy(col("label"))
  }

  /** Per-`byCol`-segment Fréchet drift — "WHICH slice of the corpus
    * embedded differently?" (the question the global gate's alarm always
    * raises next; completes the grouped-gate convention every scalar gate
    * in [[Robust]] follows). Exactly [[frechetDrift]] with the group
    * riding the (side, dim) aggregation keys: the same two posexplode
    * passes with map-side partials (shuffle ≤ |groups|·2·d rows per
    * task), driver summaries grow to |groups|·2·d rows and so run under
    * the [[Robust.MaxSummaryRows]] ceiling with the bounded-transfer
    * `limit(ceiling+1)` discipline. A group present on only ONE side is
    * DROPPED (the [[Robust.ksStatisticBy]] missing-side contract: a gate
    * must not read absence as zero drift — per-group absence drops the
    * group where global absence empties the result). NULL group keys are
    * excluded up front. Output: (byCol, n_ref, n_cur, frechet2) ordered
    * by group. */
  def frechetDriftBy(
      df: DataFrame, vecCol: Column, splitCol: Column,
      refGroup: String, curGroup: String, dim: Int, byCol: String): DataFrame = {
    require(dim > 0, s"frechetDriftBy: dim=$dim")
    val spark = df.sparkSession
    val dec = DecimalType(38, 12)
    val gType = df.select(col(byCol)).schema.head.dataType
    val outSchema = StructType(Seq(
      StructField(byCol, gType, nullable = true),
      StructField("n_ref", LongType, nullable = false),
      StructField("n_cur", LongType, nullable = false),
      StructField("frechet2", DoubleType, nullable = false)))

    val rows = df
      .filter(splitCol.isin(refGroup, curGroup) && col(byCol).isNotNull)
      .select(col(byCol).as("__g"), (splitCol === refGroup).as("is_ref"), vecCol.as("v"))
      .filter(col("v").isNotNull && size(col("v")) === dim &&
        !exists(col("v"), x => x.isNull))

    // pass 1 — per-(group, side, dim) exact decimal sums → rounded means;
    // the collect is |groups|·2·d rows: ceiling-guarded, transfer-bounded
    val meanRows = Robust.collectSummary(
      rows
        .select(col("__g"), col("is_ref"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("__g"), col("is_ref"), col("i"))
        .agg(sum(col("x").cast(dec)).as("s"), count(lit(1)).as("n"))
        .select(col("__g"), col("is_ref"), col("i"),
          round(col("s").cast(DoubleType) / col("n"), 6).as("m"), col("n")),
      "frechetDriftBy")
    // keep only two-sided groups (the missing-side DROP contract)
    val bySide = meanRows.groupBy(r => (r.get(0), r.getBoolean(1)))
    val groups = meanRows.map(_.get(0)).distinct
      .filter(g => bySide.contains((g, true)) && bySide.contains((g, false)))
    if (groups.isEmpty)
      return spark.createDataFrame(java.util.Collections.emptyList[Row](), outSchema)
    def toArr(rs: Array[Row], field: String): Array[Double] = {
      val a = Array.ofDim[Double](dim)
      rs.foreach(r => a(r.getAs[Int]("i")) = r.getAs[Double](field))
      a
    }
    val means: Map[(Any, Boolean), Array[Double]] =
      bySide.map { case (k, rs) => k -> toArr(rs, "m") }
    val nByGs: Map[(Any, Boolean), Long] =
      bySide.map { case (k, rs) => k -> rs.head.getAs[Long]("n") }

    // pass 2 — centered squares against the ROUNDED means; the per-
    // (group, side) mean vectors broadcast as a slim |groups|·2-row table
    val meansDf = spark.createDataFrame(
      java.util.Arrays.asList(groups.flatMap(g => Seq(
        Row(g, true, means((g, true)).toSeq),
        Row(g, false, means((g, false)).toSeq))): _*),
      StructType(Seq(
        StructField("__g", gType, nullable = true),
        StructField("is_ref", org.apache.spark.sql.types.BooleanType, nullable = false),
        StructField("__m", ArrayType(DoubleType, containsNull = false), nullable = false))))
    val varRows = Robust.collectSummary(
      rows.join(broadcast(meansDf), Seq("__g", "is_ref"))
        .select(col("__g"), col("is_ref"),
          posexplode(zip_with(col("v"), col("__m"),
            (x, m) => {
              // exact decimals: no double-product cast (see Clustering.distArray)
              val dx = x.cast(DecimalType(16, 12)) - m.cast(DecimalType(8, 6))
              dx * dx
            }))
            .as(Seq("i", "sq")))
        .groupBy(col("__g"), col("is_ref"), col("i"))
        .agg(sum(col("sq")).as("ss"), count(lit(1)).as("n"))
        .select(col("__g"), col("is_ref"), col("i"),
          round(col("ss").cast(DoubleType) / col("n"), 6).as("s2")),
      "frechetDriftBy")
    val vars: Map[(Any, Boolean), Array[Double]] =
      varRows.groupBy(r => (r.get(0), r.getBoolean(1)))
        .map { case (k, rs) => k -> toArr(rs, "s2") }

    // per-group ascending-i fold — the same fixed double chain as the
    // global gate, replayed term-for-term by the grouped oracle
    val out = groups.map { g =>
      var fr = 0.0
      var i = 0
      while (i < dim) {
        val dm = means((g, true))(i) - means((g, false))(i)
        val sr = vars((g, true))(i)
        val sc = vars((g, false))(i)
        fr += dm * dm + sr + sc - 2.0 * math.sqrt(sr * sc)
        i += 1
      }
      Row(g, nByGs((g, true)), nByGs((g, false)),
        java.math.BigDecimal.valueOf(fr)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    }
    spark.createDataFrame(java.util.Arrays.asList(out: _*), outSchema)
      .orderBy(col(byCol))
  }
}
