package graft.operators

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}
import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
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
    // aggregation. The centered array materializes ONCE per row and feeds
    // [[CovMomentsAgg]], a raw-loop moment accumulator: the d(d+1)/2
    // scaled-integer sums live in the aggregation buffer (map-side
    // partial; the shuffle carries ONE buffer per task regardless of n).
    // A prior spelling exploded the d(d+1)/2 products as struct rows into
    // a hash aggregate — identical math, but the per-element expression
    // machinery (struct alloc, decimal cast, group hashing × n·d²/2)
    // measured ~10× the arithmetic; q_pca_top 6.3 → ~2.5 s at sf0.1.
    val mLit = array(means.map(lit): _*)
    val centered = rows.select(
      zip_with(col("v"), mLit, (x, m) => x.cast(DoubleType) - m).as("c"))
    val moments = centered
      .agg(ColumnBridge.column(
        CovMomentsAgg(ColumnBridge.expression(col("c")), dim).toAggregateExpression())
        .as("ms"))
      .head().getSeq[Double](0)

    val (loadings, ratio) = solveTop(moments, dim, rounds)
    val out = (0 until dim).map(k => (k, loadings(k), ratio))
    spark.createDataFrame(out).toDF("i", "loading", "var_ratio")
      .orderBy(col("i"))
  }

  /** Per-`byCol`-group top principal component — the class-/source-
    * conditional embedding-structure probe ("does segment X's embedding
    * cloud point the way the corpus does?"), completing the grouped
    * family (KS/PSI/Spearman + PCA). [[topComponent]]'s exact split with
    * the group riding every step: per-(group, dim) decimal mean sums
    * collect (d·|groups| rows, bounded); the rounded means go BACK as a
    * slim broadcast keyed on the group (the global variant inlines them
    * as literals — per-group literals don't exist); the O(n·d²) moment
    * pass runs ONE [[CovMomentsAgg]] buffer per group (map-side partial,
    * ≤ d(d+1)/2 cells per buffer); the constant-size eigensolves run
    * driver-side per group, bit-identically to the global chain. Output
    * one row per (group, dimension). */
  def topComponentBy(
      df: DataFrame, vecCol: Column, byCol: String, dim: Int,
      rounds: Int = 10): DataFrame = {
    require(dim > 0 && rounds > 0, s"Pca.topComponentBy: dim=$dim rounds=$rounds")
    val spark = df.sparkSession
    val rows = df.select(col(byCol).as("__g"), vecCol.as("v"))
      .filter(col("v").isNotNull && size(col("v")) === dim &&
        !exists(col("v"), x => x.isNull))
    val gField = rows.schema("__g")
    val meanRows = rows
      .select(col("__g"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("__g"), col("i"))
      .agg(sum(col("x").cast(DecimalType(38, 12))).as("s"), count(lit(1)).as("n"))
      .select(col("__g"), col("i"),
        round(col("s").cast(DoubleType) / col("n"), 6).as("m"))
      .collect()
    require(meanRows.nonEmpty, "Pca.topComponentBy: no valid vectors")
    val meansByG: Map[Any, Array[Double]] = meanRows.groupBy(_.get(0)).map {
      case (g, rs) =>
        val a = Array.ofDim[Double](dim)
        rs.foreach(r => a(r.getAs[Int]("i")) = r.getAs[Double]("m"))
        g -> a
    }
    val meansDf = spark.createDataFrame(
      java.util.Arrays.asList(meansByG.toSeq.map { case (g, a) =>
        Row(g, a.toSeq) }: _*),
      StructType(Seq(gField.copy(name = "__g"),
        StructField("__m", ArrayType(DoubleType, containsNull = false)))))
    val centered = rows.join(broadcast(meansDf), Seq("__g"))
      .select(col("__g"),
        zip_with(col("v"), col("__m"), (x, m) => x.cast(DoubleType) - m).as("c"))
    val momentRows = centered.groupBy(col("__g"))
      .agg(ColumnBridge.column(
        CovMomentsAgg(ColumnBridge.expression(col("c")), dim).toAggregateExpression())
        .as("ms"))
      .collect()
    val out = momentRows.flatMap { r =>
      val (loadings, ratio) = solveTop(r.getSeq[Double](1), dim, rounds)
      (0 until dim).map(k => Row(r.get(0), k, loadings(k), ratio))
    }
    spark.createDataFrame(
      java.util.Arrays.asList(out: _*),
      StructType(Seq(gField.copy(name = byCol),
        StructField("i", IntegerType, nullable = false),
        StructField("loading", DoubleType, nullable = false),
        StructField("var_ratio", DoubleType, nullable = false))))
      .orderBy(byCol, "i")
  }

  /** Constant-size driver eigensolve shared by the global and grouped
    * variants: `rounds` power-iteration steps from v₀ = 1/√d, every fold
    * ascending left-to-right, sign fixed by the ascending component sum —
    * the exact IEEE chain the SQL oracles replay. Returns the 6-dp
    * rounded (signed loadings, explained-variance ratio). */
  private def solveTop(
      moments: Seq[Double], dim: Int, rounds: Int): (IndexedSeq[Double], Double) = {
    val mat = Array.ofDim[Double](dim, dim)
    var ki = 0; var kk = 0
    while (ki < dim) {
      var kj = ki
      while (kj < dim) {
        mat(ki)(kj) = moments(kk); mat(kj)(ki) = moments(kk)
        kj += 1; kk += 1
      }
      ki += 1
    }
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
    ((0 until dim).map(k =>
      BigDecimal(sg * v(k)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      BigDecimal(ratio).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}

/** Upper-triangle covariance-moment sums of a centered double array —
  * `dim·(dim+1)/2` EXACT decimal(·,12) accumulators in one aggregation
  * buffer, flattened row-major `(0,0)..(0,d−1),(1,1)..`. Each product is
  * rounded to 12 dp with the exact semantics of Spark's double→decimal
  * cast (`BigDecimal.valueOf`, i.e. the double's shortest decimal
  * representation, then HALF_UP — NOT the raw binary expansion), so the
  * result is bit-identical to `sum(cast(p as decimal(38,12)))` whenever
  * that expression is well-defined — i.e. |product| < 1e26 and a
  * non-overflowing sum (outside that, the cast/sum NULL out where this
  * aggregate keeps summing exactly; unreachable for centered embedding
  * products) — and the DuckDB oracle replay is unchanged. Accumulation is a scaled-integer
  * long per cell with a BigInteger spill on overflow: exact at any n,
  * allocation-free on the hot path. Evaluates to `array<double>` via the
  * same decimal→double cast Spark's `.cast(DoubleType)` performs. */
private[operators] case class CovMomentsAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovMomentsAgg.Buf] {

  import CovMomentsAgg.Buf

  private val cells = dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "cov_moments_agg"

  override def createAggregationBuffer(): Buf = Buf.empty(cells)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
      require(a.length == dim, s"$prettyName: expected length $dim, got ${a.length}")
      var i = 0; var k = 0
      while (i < dim) {
        val ci = a(i)
        var j = i
        while (j < dim) {
          val p = ci * a(j)
          val f = CovMomentsAgg.fastUnscaled12(p)
          if (f != Long.MinValue) buf.add(k, f)
          else {
            val u = JBigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP)
              .unscaledValue()
            if (u.bitLength <= 62) buf.add(k, u.longValue())
            else buf.addBig(k, u)
          }
          j += 1; k += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    var k = 0
    while (k < cells) {
      if (other.big(k) != null) buf.addBig(k, other.big(k))
      buf.add(k, other.low(k))
      k += 1
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val out = Array.ofDim[Double](cells)
    var k = 0
    while (k < cells) {
      out(k) = new JBigDecimal(buf.total(k), 12).doubleValue()
      k += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val parts = Array.tabulate(cells)(k => buf.total(k).toByteArray)
    val bb = ByteBuffer.allocate(4 + parts.map(_.length + 4).sum)
    bb.putInt(cells)
    parts.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    require(n == cells, s"$prettyName: buffer cell count $n != $cells")
    val buf = Buf.empty(cells)
    var k = 0
    while (k < n) {
      val len = bb.getInt
      val p = Array.ofDim[Byte](len)
      bb.get(p)
      buf.big(k) = new BigInteger(p)
      k += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CovMomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CovMomentsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CovMomentsAgg =
    copy(child = c.head)
}

private[operators] object CovMomentsAgg {

  private val Five12 = 244140625L // 5^12; 10^12 = 5^12 · 2^12

  /** Exact integer fast path for
    * `BigDecimal.valueOf(p).setScale(12, HALF_UP).unscaledValue
    * .longValue()` — the hot call of the moments pass (n·d²/2 times; the
    * string-formatting route measured ~450 ns/product, ~50× the
    * arithmetic). Returns `Long.MinValue` as the "use the slow path"
    * sentinel (never a valid result here: the fast path bails above
    * 2^61).
    *
    * Method: p = ±m·2^E exactly (normalized doubles), so
    * p·10^12 = ±(m·5^12)·2^(E+12) — a 128-bit fixed-point value M·2^−q
    * with M = m·5^12 < 2^81 (one `multiplyHigh`) and q = −(E+12). For
    * q ∈ [20, 63] the integer part fits 62 bits, the fraction sits in
    * the low word, and HALF_UP is one compare against 2^(q−1).
    *
    * Semantics guard: `valueOf` rounds the SHORTEST-REPR decimal D(p),
    * not the exact binary value. D(p) lies within half an ulp of p, and
    * one ulp is exactly 5^12 units of the fixed point — so when the
    * fraction is farther than 5^12 from the rounding boundary, every
    * value in [p − ulp/2, p + ulp/2] (D(p) included) rounds to the SAME
    * scale-12 integer and the fast result is bit-identical. Near the
    * boundary (probability ~5^12/2^q per product), zeros aside, the
    * caller falls back to the exact string path. Subnormals, infinities,
    * NaN, and |p| outside the q-window also fall back — behavior,
    * including `valueOf(NaN)` throwing, is unchanged.
    * Property-tested against the slow path across magnitude regimes and
    * constructed boundary values. */
  private[operators] def fastUnscaled12(p: Double): Long = {
    if (p == 0.0) return 0L // +0.0 and -0.0 both scale to unscaled 0
    val bits = java.lang.Double.doubleToRawLongBits(p)
    val exp = ((bits >>> 52) & 0x7ff).toInt
    if (exp == 0 || exp == 0x7ff) return Long.MinValue
    val q = -(exp - 1075 + 12)
    if (q < 20 || q > 63) return Long.MinValue
    val m = (bits & 0x000fffffffffffffL) | 0x0010000000000000L
    val mhi = Math.multiplyHigh(m, Five12)
    val mlo = m * Five12 // low 64 bits of the 128-bit product
    val rInt = (mhi << (64 - q)) | (mlo >>> q)
    val frac = mlo & ((1L << q) - 1L)
    val half = 1L << (q - 1)
    if (math.abs(frac - half) <= Five12) return Long.MinValue // boundary risk
    val u = rInt + (if (frac > half) 1L else 0L)
    if (p > 0) u else -u
  }

  /** Per-cell scaled-integer accumulator: a long fast path plus a lazy
    * BigInteger spill — `total = big + low`, exact at any count. */
  final class Buf(val low: Array[Long], val big: Array[BigInteger]) {
    def add(k: Int, l: Long): Unit = {
      val s = low(k) + l
      if (((low(k) ^ s) & (l ^ s)) < 0) { // signed overflow: spill, restart
        addBig(k, BigInteger.valueOf(low(k)))
        low(k) = l
      } else low(k) = s
    }
    def addBig(k: Int, b: BigInteger): Unit =
      big(k) = if (big(k) == null) b else big(k).add(b)
    def total(k: Int): BigInteger = {
      val l = BigInteger.valueOf(low(k))
      if (big(k) == null) l else big(k).add(l)
    }
  }
  object Buf {
    def empty(cells: Int): Buf =
      new Buf(Array.ofDim[Long](cells), Array.ofDim[BigInteger](cells))
  }
}
