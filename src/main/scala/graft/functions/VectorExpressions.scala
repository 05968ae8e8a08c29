package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Analysis-time input validation shared by the native array kernels: these
  * are registered as SQL functions, so a caller can hand them any type —
  * without a check the mismatch surfaces as a ClassCastException at
  * execution instead of a clear AnalysisException. */
private[functions] object ArrayTypeChecks {
  def numericArray(dt: DataType, fn: String, arg: String): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckSuccess
    case other =>
      TypeCheckFailure(s"$fn: $arg must be array<float> or array<double>, got ${other.catalogString}")
  }

  def longArray(dt: DataType, fn: String): TypeCheckResult = dt match {
    case ArrayType(LongType, _) => TypeCheckSuccess
    case other => TypeCheckFailure(s"$fn: input must be array<bigint>, got ${other.catalogString}")
  }
}

/** Native codegen'd array kernels for the similarity/dedup hot paths.
  *
  * The `zip_with`+`aggregate` higher-order-function formulation is correct
  * but interprets a lambda per element per row; on the pair-scoring inner
  * loops (LSH candidate verification scores 10⁵–10⁶ pairs × 64 dims) that
  * dominates wall-clock. These expressions generate a tight primitive loop
  * inside whole-stage codegen instead — no per-element boxing, no allocation.
  */

/** Dot product of two numeric arrays (float or double elements), summed
  * left-to-right in double — numerically identical to the HOF formulation
  * it replaces. */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = ArrayTypeChecks.numericArray(left.dataType, prettyName, "left")
    if (l != TypeCheckSuccess) l
    else ArrayTypeChecks.numericArray(right.dataType, prettyName, "right")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, i: String, e: Expression): String = elemType(e) match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, i, left)} * ${get(b, i, right)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)
}

/** |A ∩ B| for two SORTED arrays (string or long elements) via a two-pointer
  * merge — the set-intersection cardinality without materializing the
  * intersection (built-in `array_intersect` builds a hash set + result array
  * per row). Inputs must be sorted and deduplicated
  * (`array_sort(array_distinct(…))`); callers own that invariant. */
case class SortedIntersectSize(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckSuccess
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckSuccess
    case (l, r) =>
      TypeCheckFailure(
        s"$prettyName: both inputs must be array<bigint> or both array<string>, " +
          s"got ${l.catalogString} and ${r.catalogString}")
  }

  private lazy val longs: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var n = 0
    while (i < x.numElements() && j < y.numElements()) {
      val c =
        if (longs) java.lang.Long.compare(x.getLong(i), y.getLong(j))
        else x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val cmp =
        if (longs) s"Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $i = 0, $j = 0, $n = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $c = $cmp;
         |  if ($c == 0) { $n++; $i++; $j++; } else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectSize =
    copy(left = l, right = r)
}

/** MinHash signature from pre-hashed shingles: for permutation i of k,
  * `sig[i] = min_j (A[i] * h[j] + B[i])` over the 64-bit ring (odd `A[i]` ⇒
  * a bijection, the standard multiply-shift permutation family). One string
  * hash per shingle happens upstream; this kernel is k·n integer mult-adds
  * in a tight codegen'd loop — the shape that replaced a 64-aggregate
  * HashAggregate that fell out of codegen. Coefficients are derived from
  * SplitMix64(i), so signatures are deterministic with no RNG state. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    ArrayTypeChecks.longArray(child.dataType, prettyName)

  @transient private lazy val (coeffA, coeffB) = MinHashSig.coefficients(k)

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[ArrayData]
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      var m = Long.MaxValue
      var j = 0
      while (j < h.numElements()) {
        val v = coeffA(i) * h.getLong(j) + coeffB(i)
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val a = ctx.addReferenceObj("minhashA", coeffA, "long[]")
      val b = ctx.addReferenceObj("minhashB", coeffB, "long[]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
         |long[] $out = new long[$k];
         |for (int $i = 0; $i < $k; $i++) {
         |  long $m = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $c.numElements(); $j++) {
         |    long $v = $a[$i] * $c.getLong($j) + $b[$i];
         |    if ($v < $m) $m = $v;
         |  }
         |  $out[$i] = $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

object MinHashSig {
  /** SplitMix64-derived permutation coefficients; A forced odd. */
  def coefficients(k: Int): (Array[Long], Array[Long]) = {
    def splitmix64(seed: Long): Long = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = Array.tabulate(k)(i => splitmix64(2L * i) | 1L)
    val b = Array.tabulate(k)(i => splitmix64(2L * i + 1))
    (a, b)
  }
}

/** MinHash signature + LSH banding fused into ONE pass: outputs the
  * `bands`-element array of band bucket keys directly.
  *
  * Why fused: a separate `sig` column referenced by `bands × rowsPerBand`
  * `element_at` calls gets inlined by `CollapseProject`, re-running the full
  * signature loop once per reference (measured 64× recompute → multi-second
  * banding on a 5k-doc corpus). One expression, one evaluation. */
case class MinHashBandBuckets(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  private val k = bands * rowsPerBand

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_buckets"

  override def checkInputDataTypes(): TypeCheckResult =
    ArrayTypeChecks.longArray(child.dataType, prettyName)

  @transient private lazy val (coeffA, coeffB) = MinHashSig.coefficients(k)

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[ArrayData]
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 1125899906842597L * (b + 1)
      var r = 0
      while (r < rowsPerBand) {
        val i = b * rowsPerBand + r
        var m = Long.MaxValue
        var j = 0
        while (j < h.numElements()) {
          val v = coeffA(i) * h.getLong(j) + coeffB(i)
          if (v < m) m = v
          j += 1
        }
        acc = (acc ^ m) * 0x9e3779b97f4a7c15L
        acc ^= (acc >>> 32)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val a = ctx.addReferenceObj("mhbA", coeffA, "long[]")
      val bb = ctx.addReferenceObj("mhbB", coeffB, "long[]")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      val acc = ctx.freshName("acc")
      s"""
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $acc = 1125899906842597L * ($b + 1);
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    int $i = $b * $rowsPerBand + $r;
         |    long $m = Long.MAX_VALUE;
         |    for (int $j = 0; $j < $c.numElements(); $j++) {
         |      long $v = $a[$i] * $c.getLong($j) + $bb[$i];
         |      if ($v < $m) $m = $v;
         |    }
         |    $acc = ($acc ^ $m) * 0x9e3779b97f4a7c15L;
         |    $acc ^= ($acc >>> 32);
         |  }
         |  $out[$b] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashBandBuckets = copy(child = c)
}

/** Sorted distinct 64-bit word-`n`-gram shingle hashes, fused into ONE
  * pass: per-token XXH64, an order-sensitive chained combine over each
  * `n`-token window, then sort + in-place dedup. Replaces the 5-operator
  * HOF chain (`transform(sequence…concat_ws(slice))` → `array_distinct` →
  * `transform(xxhash64)` → `array_sort`), which interprets several lambdas
  * per token per row AND materializes every shingle as a string first —
  * measured ~4× slower per shingle pass on a 5k-doc corpus.
  *
  * Shingle identity: two windows collide iff their token sequences match
  * (chained `XXH64.hashLong` over per-token hashes is order-sensitive), the
  * same equivalence classes as the space-joined shingle STRINGS the DuckDB
  * oracles compute — tokens are space-free by construction, so the join is
  * injective. Cross-class collisions are ~|S|²/2⁻⁶⁴, the same budget every
  * hash-based set comparison here already accepts. Documents shorter than
  * `n` tokens yield ONE whole-document shingle (the `wordShingles`
  * convention). */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle_hashes: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckSuccess
    case other =>
      TypeCheckFailure(s"$prettyName: input must be array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = toks.getUTF8String(i)
      th(i) = if (s == null) ShingleHashes.Seed
      else org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, ShingleHashes.Seed)
      i += 1
    }
    val win = if (m < n) m else n
    val cnt = if (m < n) 1 else m - n + 1
    val tmp = new Array[Long](cnt)
    var w = 0
    while (w < cnt) {
      var h = ShingleHashes.Seed
      var k = 0
      while (k < win) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(th(w + k), h)
        k += 1
      }
      tmp(w) = h
      w += 1
    }
    java.util.Arrays.sort(tmp)
    var u = 0
    var j = 0
    while (j < cnt) {
      if (j == 0 || tmp(j) != tmp(j - 1)) { tmp(u) = tmp(j); u += 1 }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(java.util.Arrays.copyOf(tmp, u))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val m = ctx.freshName("m")
      val th = ctx.freshName("th")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val win = ctx.freshName("win")
      val cnt = ctx.freshName("cnt")
      val tmp = ctx.freshName("tmp")
      val w = ctx.freshName("w")
      val h = ctx.freshName("h")
      val k = ctx.freshName("k")
      val u = ctx.freshName("u")
      val j = ctx.freshName("j")
      val seed = s"${ShingleHashes.Seed}L"
      s"""
         |int $m = $c.numElements();
         |long[] $th = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
         |  $th[$i] = ($s == null) ? $seed : $xxh.hashUTF8String($s, $seed);
         |}
         |int $win = ($m < $n) ? $m : $n;
         |int $cnt = ($m < $n) ? 1 : $m - $n + 1;
         |long[] $tmp = new long[$cnt];
         |for (int $w = 0; $w < $cnt; $w++) {
         |  long $h = $seed;
         |  for (int $k = 0; $k < $win; $k++) {
         |    $h = $xxh.hashLong($th[$w + $k], $h);
         |  }
         |  $tmp[$w] = $h;
         |}
         |java.util.Arrays.sort($tmp);
         |int $u = 0;
         |for (int $j = 0; $j < $cnt; $j++) {
         |  if ($j == 0 || $tmp[$j] != $tmp[$j - 1]) { $tmp[$u] = $tmp[$j]; $u++; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($tmp, $u));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

object ShingleHashes {
  /** Same seed as Spark's `xxhash64(...)` default, for familiarity. */
  val Seed: Long = 42L
}

/** Winnowing fingerprints (Schleimer–Wilkerson–Aiken) of a token array,
  * fused into ONE native pass: positional `k`-gram chained hashes (same
  * chain as [[ShingleHashes]], but POSITIONAL — no sort/dedup before
  * windowing, substring structure is what's fingerprinted), then the
  * minimum of every window of `w` consecutive gram hashes, deduplicated
  * and sorted.
  *
  * Exists as a kernel because the array-HOF formulation
  * (`transform(sequence(…), i -> array_min(slice(grams, i, w)))`) is
  * catastrophically slow: Spark evaluates higher-order functions
  * interpreted with NO loop-invariant hoisting, so the whole gram chain
  * (which itself re-splits the text per position) re-derives per window —
  * measured 84+ s for sf0.1's 250k gram positions vs ~1 s for this pass.
  *
  * Windows shorter than `w` (docs with fewer than k+w−1 tokens) degrade
  * to one window over all grams, mirroring the whole-document convention
  * of [[ShingleHashes]]; callers wanting the strict winnowing guarantee
  * filter those out. */
case class WinnowHashes(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnow_hashes: k and w must be >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckSuccess
    case other =>
      TypeCheckFailure(s"$prettyName: input must be array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = toks.getUTF8String(i)
      th(i) = if (s == null) ShingleHashes.Seed
      else org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, ShingleHashes.Seed)
      i += 1
    }
    val gwin = if (m < k) m else k
    val gcnt = if (m < k) 1 else m - k + 1
    val gh = new Array[Long](gcnt)
    var g = 0
    while (g < gcnt) {
      var h = ShingleHashes.Seed
      var j = 0
      while (j < gwin) { h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(th(g + j), h); j += 1 }
      gh(g) = h
      g += 1
    }
    val wwin = if (gcnt < w) gcnt else w
    val wcnt = if (gcnt < w) 1 else gcnt - w + 1
    val fp = new Array[Long](wcnt)
    var p = 0
    while (p < wcnt) {
      var mn = gh(p)
      var j = 1
      while (j < wwin) { if (gh(p + j) < mn) mn = gh(p + j); j += 1 }
      fp(p) = mn
      p += 1
    }
    java.util.Arrays.sort(fp)
    var u = 0
    var q = 0
    while (q < wcnt) {
      if (q == 0 || fp(q) != fp(q - 1)) { fp(u) = fp(q); u += 1 }
      q += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(java.util.Arrays.copyOf(fp, u))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val m = ctx.freshName("m")
      val th = ctx.freshName("th")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val gwin = ctx.freshName("gwin")
      val gcnt = ctx.freshName("gcnt")
      val gh = ctx.freshName("gh")
      val g = ctx.freshName("g")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val wwin = ctx.freshName("wwin")
      val wcnt = ctx.freshName("wcnt")
      val fp = ctx.freshName("fp")
      val p = ctx.freshName("p")
      val mn = ctx.freshName("mn")
      val u = ctx.freshName("u")
      val q = ctx.freshName("q")
      val seed = s"${ShingleHashes.Seed}L"
      s"""
         |int $m = $c.numElements();
         |long[] $th = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
         |  $th[$i] = ($s == null) ? $seed : $xxh.hashUTF8String($s, $seed);
         |}
         |int $gwin = ($m < $k) ? $m : $k;
         |int $gcnt = ($m < $k) ? 1 : $m - $k + 1;
         |long[] $gh = new long[$gcnt];
         |for (int $g = 0; $g < $gcnt; $g++) {
         |  long $h = $seed;
         |  for (int $j = 0; $j < $gwin; $j++) { $h = $xxh.hashLong($th[$g + $j], $h); }
         |  $gh[$g] = $h;
         |}
         |int $wwin = ($gcnt < $w) ? $gcnt : $w;
         |int $wcnt = ($gcnt < $w) ? 1 : $gcnt - $w + 1;
         |long[] $fp = new long[$wcnt];
         |for (int $p = 0; $p < $wcnt; $p++) {
         |  long $mn = $gh[$p];
         |  for (int $j = 1; $j < $wwin; $j++) { if ($gh[$p + $j] < $mn) $mn = $gh[$p + $j]; }
         |  $fp[$p] = $mn;
         |}
         |java.util.Arrays.sort($fp);
         |int $u = 0;
         |for (int $q = 0; $q < $wcnt; $q++) {
         |  if ($q == 0 || $fp[$q] != $fp[$q - 1]) { $fp[$u] = $fp[$q]; $u++; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($fp, $u));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): WinnowHashes = copy(child = c)
}

/** 64-bit SimHash from pre-hashed tokens: per hash, vote ±1 on each bit;
  * fingerprint bit j is set iff the vote sum is positive. Bit-identical to
  * the 64-aggregate HOF formulation it replaces (same per-token hashes, same
  * vote rule), but one tight loop instead of 64 interpreted folds. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    ArrayTypeChecks.longArray(child.dataType, prettyName)

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < h.numElements()) {
      val v = h.getLong(i)
      var j = 0
      while (j < 64) {
        if (((v >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $v = $c.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($v >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $fp |= (1L << $j);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Exact-decimal per-centroid squared distances — the native kernel behind
  * `Clustering.distArray`. Produces the BIT-IDENTICAL
  * `array<struct<d2: decimal(35,24), cl: int>>` the HOF spelling produced:
  * per dim, `xq = CAST(CAST(x AS DOUBLE) AS DECIMAL(16,12))` (Spark's
  * float→decimal path: `java.math.BigDecimal.valueOf` = shortest-repr,
  * then HALF_UP at scale 12), `m` at DECIMAL(8,6) (6dp literals — exact),
  * `dx` at scale 12, `dx²` at scale 24, summed exactly.
  *
  * Why native: every quantity is an exact fixed-scale integer —
  * |unscaled(dx)| ≤ ~10¹⁶ fits a long, dx² fits 128 bits, and the 64-term
  * sum stays < 2¹²⁷ — so the whole inner loop runs in primitive long /
  * two-word arithmetic with ONE BigDecimal constructed per (row, cluster).
  * The HOF spelling (`zip_with` + `aggregate`, one lambda per element per
  * cluster per row) interpreted ~k·dim BigDecimal subtract/multiply/add
  * chains per row (DECIMAL(35,24) is past the compact-long precision 18,
  * so each op allocated java.math.BigDecimal objects) plus k intermediate
  * arrays; on the clustering family's assignment passes that was the
  * dominant per-row cost. Overflow posture matches the cast chain it
  * replaces: a float too large for DECIMAL(16,12) or a sum past
  * DECIMAL(35,24) raises (the ANSI cast would have), it never wraps.
  *
  * Null/shape semantics (the zip_with/aggregate contract): a null element
  * or a length ≠ the centroid dim yields null `d2` for every cluster
  * (callers filter both up front — cleanVectors / assignAll hygiene). */
case class DecDistArray(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("d2", DecimalType(35, 24), nullable = true),
      StructField("cl", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "dec_dist_array"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckSuccess
    case other =>
      TypeCheckFailure(s"$prettyName: input must be array<float>, got ${other.catalogString}")
  }

  @transient private lazy val k = cents.length
  @transient private lazy val dim = if (cents.isEmpty) 0 else cents.head.length
  // centroid coordinates as unscaled DECIMAL(8,6) longs, pre-shifted to
  // the dx scale 12 (m·10⁶) so the inner loop is one subtract
  @transient private lazy val mU12: Array[Array[Long]] = cents.map(_.map(m =>
    java.math.BigDecimal.valueOf(m).setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact() * 1000000L).toArray).toArray
  @transient private lazy val ten35 = java.math.BigInteger.TEN.pow(35)

  /** The kernel, public so the generated code can call it. */
  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    var degenerate = n != dim
    var i = 0
    while (!degenerate && i < n) { degenerate = input.isNullAt(i); i += 1 }
    val out = new Array[Any](k)
    if (degenerate) {
      var j = 0
      while (j < k) {
        out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](null, j))
        j += 1
      }
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    // per-dim cast, hoisted out of the per-cluster loop (the HOF spelling
    // re-cast x once per cluster): unscaled DECIMAL(16,12) longs
    val xu = new Array[Long](dim)
    i = 0
    while (i < dim) {
      val bd = java.math.BigDecimal.valueOf(input.getFloat(i).toDouble)
        .setScale(12, java.math.RoundingMode.HALF_UP)
      if (bd.precision() > 16) // |x| ≥ 10⁴ cannot fit (16,12); cast raises
        throw new ArithmeticException(
          s"$prettyName: ${input.getFloat(i)} does not fit DECIMAL(16,12)")
      xu(i) = bd.unscaledValue().longValueExact()
      i += 1
    }
    var j = 0
    while (j < k) {
      val m = mU12(j)
      var hi = 0L
      var lo = 0L
      i = 0
      while (i < dim) {
        val dx = xu(i) - m(i)
        val pLo = dx * dx
        val pHi = Math.multiplyHigh(dx, dx)
        val newLo = lo + pLo
        hi += pHi + (if (java.lang.Long.compareUnsigned(newLo, pLo) < 0) 1L else 0L)
        lo = newLo
        i += 1
      }
      val bytes = java.nio.ByteBuffer.allocate(16).putLong(hi).putLong(lo).array()
      val bi = new java.math.BigInteger(1, bytes)
      if (bi.compareTo(ten35) >= 0) // the (35,24) cast would have raised
        throw new ArithmeticException(s"$prettyName: d2 does not fit DECIMAL(35,24)")
      val d2 = Decimal(new java.math.BigDecimal(bi, 24), 35, 24)
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](d2, j))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // one virtual call per row into the compiled kernel — keeps the
      // whole-stage pipeline (no CodegenFallback node) without generating
      // 128-bit arithmetic in Java source
      val ref = ctx.addReferenceObj("decDist", this, classOf[DecDistArray].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(c: Expression): DecDistArray =
    copy(child = c)
}

object VectorExpressions {
  def decDistArray(v: Column, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(DecDistArray(
      ColumnBridge.expression(v), cents.map(_.toSeq).toSeq))

  def vectorDot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minHashSig(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), k))

  def minHashBandBuckets(hashes: Column, bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(MinHashBandBuckets(ColumnBridge.expression(hashes), bands, rowsPerBand))

  def simHash64Native(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))

  def shingleHashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), n))

  def winnowHashes(tokens: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowHashes(ColumnBridge.expression(tokens), k, w))
}
