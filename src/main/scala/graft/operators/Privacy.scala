package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification-risk audits for release gating — k-anonymity
  * (Sweeney 2002), l-diversity (Machanavalli et al. 2007), and a
  * fixed-ladder generalization search. A record is k-anonymous when at
  * least k rows share its quasi-identifier (QI) combination; a QI class
  * is l-diverse when its sensitive attribute takes ≥ l distinct values.
  * These complement the regex-level PII scrubbing in
  * [[graft.clean.Cleaning]]: scrubbing removes direct identifiers, these
  * audits measure whether the REMAINING attribute combinations still
  * single people out.
  *
  * Scale shape: every audit is one hash-shuffle groupBy over the QI
  * columns with integer aggregates (map-side partial), then a re-agg of
  * the CLASS table (rows = distinct QI combinations, already far smaller
  * than the data). The generalization ladder re-aggregates the finest
  * class table instead of rescanning the corpus — floor-bucket
  * coarsening composes (floor(x/1000) = floor(floor(x/100)/10)), so one
  * corpus scan serves every level.
  */
object Privacy {

  /** The release gate's k-anonymity floor, shared by every privacy
    * operator AND its generated oracle SQL (the Blocks/WilsonZ
    * convention): changing the default here re-derives both sides, so
    * operator and oracle cannot silently desynchronize. */
  val DefaultK: Long = 5L

  /** Class-size profile over a QI: for each class size, how many classes
    * and rows sit at that size — the full k-anonymity histogram (the
    * release gate reads the smallest sizes; min class size = the
    * dataset's k). */
  def kAnonymityProfile(df: DataFrame, qi: Seq[Column]): DataFrame =
    df.groupBy(qi: _*).agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))
      .orderBy(col("class_size"))

  /** One-row l-diversity summary: classes whose sensitive attribute is
    * constant (l = 1) are attribute-disclosure leaks even when the class
    * is k-anonymous. */
  def lDiversitySummary(df: DataFrame, qi: Seq[Column], sensitive: Column): DataFrame =
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l"))
      .agg(
        count(lit(1)).as("n_classes"),
        min(col("l")).as("min_l"),
        sum(when(col("l") === 1, 1L).otherwise(0L)).as("classes_l1"),
        sum(when(col("l") === 1, col("class_size")).otherwise(0L)).as("rows_l1"))

  /** Differentially-private histogram release with suppression — the
    * end-to-end release composition: classes below the k-anonymity floor
    * are SUPPRESSED (never released, noisy or not), surviving counts get
    * Laplace(Δ/ε) noise (Δ = 1 for a count histogram — Dwork 2006). The
    * Laplace draw is the inverse-CDF over a portable-hash uniform (the
    * [[graft.operators.Bootstrap]] replicate discipline): deterministic
    * under the fixed seed so the DuckDB oracle replays it bit-for-bit —
    * a production release draws a fresh seed; determinism here is the
    * verification harness, the math is the same. One corpus-scale
    * groupBy; everything after is class-table arithmetic. */
  def dpRelease(customer: DataFrame, k: Long, eps: Double): DataFrame = {
    import graft.functions.PortableHash
    val invEps = 1.0 / eps
    // u ∈ (0,1): (h + 0.5)/P — the half-offset keeps ln's argument > 0
    val u = (PortableHash.keyHash(col("c_nationkey")).cast("double") + lit(0.5)) /
      lit(PortableHash.P.toDouble)
    val v = u - lit(0.5)
    val noise = lit(-invEps) *
      when(v >= 0, lit(1.0)).otherwise(lit(-1.0)) *
      log(lit(1.0) - lit(2.0) * abs(v))
    customer.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= k)
      .select(col("c_nationkey"),
        round(col("n").cast("double") + noise, 6).as("n_released"),
        lit(eps).as("epsilon"))
      .orderBy(col("c_nationkey"))
  }

  /** DuckDB oracle for [[dpRelease]] — the same inverse-CDF sequence with
    * literals generated from the same constants. */
  def dpReleaseSql(k: Long, eps: Double): String = {
    import graft.functions.PortableHash
    val invEps = (1.0 / eps).toString
    val u = s"((CAST(${PortableHash.keyHashSql("c_nationkey")} AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(${PortableHash.P.toDouble} AS DOUBLE))"
    val v = s"($u - CAST(0.5 AS DOUBLE))"
    val noise = s"(CAST(-$invEps AS DOUBLE) * " +
      s"(CASE WHEN $v >= 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) * " +
      s"ln(CAST(1.0 AS DOUBLE) - CAST(2.0 AS DOUBLE) * abs($v)))"
    s"""WITH cls AS (
       |  SELECT c_nationkey, count(*) AS n FROM customer GROUP BY 1)
       |SELECT c_nationkey,
       |       round(CAST(n AS DOUBLE) + $noise, 6) AS n_released,
       |       CAST($eps AS DOUBLE) AS epsilon
       |FROM cls WHERE n >= $k ORDER BY c_nationkey""".stripMargin
  }

  /** Fixed generalization ladder over (nation, segment, acctbal-bucket):
    * level 0 = finest buckets, each level coarsens, final level drops
    * columns. Reports per level: class count, min class size (the
    * level's k), and rows in classes below `k` (what suppression would
    * cost); `chosen` marks the FIRST level meeting k ≥ `k` — the minimal
    * generalization a release at that k needs. One corpus scan: levels
    * 1+ re-aggregate level 0's class table. */
  def generalizationLadder(customer: DataFrame, k: Long): DataFrame = {
    // Level 0 class table — the only corpus-scale aggregation. Checkpointed
    // (the shared-consumer convention, see Clustering.semDedup): four level
    // readouts consume it, and the class table is aggregation-bounded
    // (distinct QI combinations, not rows), so materializing it is cheap
    // and the corpus is scanned exactly once.
    val l0 = customer.groupBy(
      col("c_nationkey").as("nation"),
      col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / 100.0).cast("long").as("bal_bucket"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    def levelAgg(level: Int, classes: DataFrame): DataFrame =
      classes.agg(
        lit(level).as("level"),
        count(lit(1)).as("n_classes"),
        min(col("cnt")).as("min_k"),
        sum(when(col("cnt") < k, col("cnt")).otherwise(0L)).as("rows_at_risk"))
    val l1 = l0.groupBy(col("nation"), col("segment"),
      floor(col("bal_bucket").cast("double") / 10.0).cast("long").as("bb"))
      .agg(sum(col("cnt")).as("cnt"))
    val l2 = l0.groupBy(col("nation"), col("segment"))
      .agg(sum(col("cnt")).as("cnt"))
    val l3 = l0.groupBy(col("segment")).agg(sum(col("cnt")).as("cnt"))
    val levels = levelAgg(0, l0)
      .unionByName(levelAgg(1, l1))
      .unionByName(levelAgg(2, l2))
      .unionByName(levelAgg(3, l3))
    // chosen = first level whose min_k meets the target: no level before
    // it qualifies. Window over 4 rows — bounded by the ladder length.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("level"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    levels.withColumn("qualifies", col("min_k") >= k)
      .withColumn("chosen",
        col("qualifies") &&
          coalesce(max(when(col("qualifies"), 1).otherwise(0)).over(w), lit(0)) === 0)
      .drop("qualifies")
      .orderBy(col("level"))
  }
}
