package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.scalatest.funsuite.AnyFunSuite

/** The moments fast path must be BIT-IDENTICAL to the BigDecimal slow
  * path wherever it answers — the DuckDB oracle replays the slow-path
  * semantics, so any divergence is a correctness bug, not a perf bug. */
class PcaInternalsSpec extends AnyFunSuite {

  private def slow(p: Double): java.math.BigInteger =
    JBigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP).unscaledValue()

  test("fastUnscaled12 matches BigDecimal.valueOf..setScale(12, HALF_UP) wherever it answers") {
    val rnd = new scala.util.Random(42)
    var answered = 0L
    var total = 0L
    def check(p: Double): Unit = {
      total += 1
      val f = CovMomentsAgg.fastUnscaled12(p)
      if (f != Long.MinValue) {
        answered += 1
        assert(java.math.BigInteger.valueOf(f) == slow(p),
          s"mismatch at $p (bits=${java.lang.Double.doubleToRawLongBits(p)})")
      }
    }
    // products of random float pairs — the actual call-site distribution
    for (_ <- 1 to 200000) {
      val a = (rnd.nextFloat() * 2f - 1f).toDouble
      val b = (rnd.nextFloat() * 2f - 1f).toDouble
      check(a * b)
    }
    // magnitude sweep across binades, including out-of-window regimes
    // (subnormals, huge values) that must fall back, and both signs
    for (e <- -320 to 300; _ <- 1 to 5)
      check(rnd.nextDouble() * math.pow(2.0, e) * (if (rnd.nextBoolean()) 1 else -1))
    // constructed scale-12 rounding boundaries: (k + 1/2)·1e-12 and the
    // adjacent representable doubles — where shortest-repr rounding and
    // exact-binary rounding can disagree; the fast path must bail or agree
    for (_ <- 1 to 50000) {
      val k = rnd.nextLong() % 1000000000000L
      val v = (k + 0.5) * 1e-12
      check(v); check(Math.nextUp(v)); check(Math.nextDown(v))
    }
    check(0.0); check(-0.0)
    assert(CovMomentsAgg.fastUnscaled12(Double.NaN) == Long.MinValue)
    assert(CovMomentsAgg.fastUnscaled12(Double.PositiveInfinity) == Long.MinValue)
    assert(CovMomentsAgg.fastUnscaled12(Double.MinPositiveValue) == Long.MinValue)
    // the fast path must actually carry the hot distribution
    assert(answered > total / 2, s"fast path answered only $answered of $total")
  }
}
