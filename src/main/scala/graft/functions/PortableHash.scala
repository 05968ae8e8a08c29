package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE portable-hash convention, spelled once.
  *
  * Every deterministic sampling / splitting / sharding decision in this
  * library is an integer hash that BOTH engines (Spark and the DuckDB
  * oracle) must compute bit-identically — no engine hash functions, no
  * floats at a sampling boundary. Rounds 1-10 grew five near-identical
  * spellings of the Knuth multiplicative hash (`k · 2654435761 mod p`)
  * with DIFFERING overflow safety: the bootstrap family reduced the key
  * mod P before the multiply (exact for arbitrary BIGINT keys), while
  * the split/sampling family multiplied the raw key first — silent Long
  * wraparound in Spark and a thrown BIGINT overflow in DuckDB for keys
  * ≥ ⌊2⁶³/A⌋ ≈ 3.47·10⁹, a realistic corpus id at the 100 TB design
  * point. This module is the single home for all of them; the per-site
  * spelling is what drifted, so no caller may spell the constant again
  * (`grep -R '\* 2654435761' src/main` must hit only this file).
  *
  * Overflow argument, once: with P = 1 000 000 007 and A = 2 654 435 761,
  * pre-reducing the key gives pmod(k,P) < P, so the product is
  * < P·A ≈ 2.66·10¹⁸ < 2⁶³ ≈ 9.22·10¹⁸ for ANY Long key, including
  * negative ones (Spark's pmod is non-negative; the SQL twin spells the
  * same thing as `(k % P + P) % P`). The wide variants pre-reduce mod
  * ⌊√(2⁶³)⌋-sized primes (3 037 000 493 / 3 037 000 499), so their
  * products stay < 8.07·10¹⁸ < 2⁶³ as well. Property-tested against a
  * BigInt reference at keys bracketing the old overflow boundary
  * Long.MaxValue / A, both signs (OperatorsSpec, FunctionsSpec).
  */
object PortableHash {

  /** The sampling-uniform modulus: hashes land in [0, P). */
  val P = 1000000007L

  /** Knuth's multiplicative constant ⌊2³²·(√5−1)/2⌋. */
  val A = 2654435761L

  /** Wide modulus for shard scrambling ([[shardKey]]): prime just under
    * ⌊√(2⁶³)⌋ so the post-reduction product stays in BIGINT. */
  val ShardP = 3037000493L

  /** Wide pre-reduction modulus for the raw-mix spellings ([[mix64]]):
    * prime = ⌊√(2⁶³)⌋ + 6. Distinct from [[ShardP]] only for historical
    * oracle compatibility (both are overflow-safe). */
  val MixP = 3037000499L

  /** h = ((k mod P)·A) mod P ∈ [0, P) — the sampling uniform. Safe for
    * arbitrary BIGINT keys, both signs (see the header argument). */
  def keyHash(key: Column): Column =
    pmod(pmod(key, lit(P)) * lit(A), lit(P))

  /** SQL twin of [[keyHash]] for the DuckDB oracle — same spelling, same
    * op order, `(k % P + P) % P` standing in for pmod. */
  def keyHashSql(expr: String): String =
    s"((($expr) % $P + $P) % $P) * $A % $P"

  /** Per-replicate uniform u ∈ [0, P) from a [[keyHash]] `h` and a
    * replicate index `j`: one quadratic mixing round
    * u = ((x² mod P)·A + x) mod P over x = (h + j·1000003) mod P.
    * A purely linear (h + j)·A mod P draw is a low-discrepancy LATTICE
    * across rows that stratifies weights within a replicate and
    * collapses the replicate-to-replicate variance a bootstrap measures
    * (observed: CIs ~4× too narrow); the quadratic round breaks the
    * lattice while every intermediate stays < P² < 10¹⁸ on both
    * engines. See [[graft.operators.Bootstrap]] for the full story. */
  def replicateUniform(h: Column, j: Column): Column = {
    val p = lit(P)
    val x = pmod(h + j * lit(1000003L), p)
    pmod(pmod(x * x, p) * lit(A) + x, p)
  }

  /** SQL twin of the quadratic mixing round of [[replicateUniform]],
    * over an `x` expression already reduced to [0, P) (the oracle CTEs
    * compute x = (h + j·1000003) % P first — h, j ≥ 0 there). */
  def replicateUniformSqlX(xExpr: String): String =
    s"(((($xExpr) * ($xExpr)) % $P) * $A + ($xExpr)) % $P"

  /** Raw mix m = (k mod MixP)·A — NOT reduced further; callers apply
    * their own outer modulus (`% 97`, `% P`, `% 10¹⁶`, …). Product
    * < MixP·A ≈ 8.07·10¹⁸ < 2⁶³ for any Long key. */
  def mix64(key: Column): Column =
    pmod(key, lit(MixP)) * lit(A)

  /** SQL twin of [[mix64]] (oracle keys are non-negative, so plain `%`
    * matches pmod). */
  def mix64Sql(expr: String): String =
    s"(($expr) % $MixP) * $A"

  /** Shard scramble s = ((k mod ShardP)·A) mod ShardP ∈ [0, ShardP) —
    * the wide variant for training-order sharding where [0, P) would
    * collide too often on position ties. */
  def shardKey(key: Column): Column =
    pmod(key, lit(ShardP)) * lit(A) % lit(ShardP)

  /** SQL twin of [[shardKey]]. */
  def shardKeySql(expr: String): String =
    s"(($expr) % $ShardP) * $A % $ShardP"
}
