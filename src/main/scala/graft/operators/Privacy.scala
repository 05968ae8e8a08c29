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

  /** The t-closeness release threshold (Li, Li & Venkatasubramanian
    * 2007 use 0.15–0.2 in their case studies), shared by the operator
    * and its generated oracle SQL. */
  val DefaultT: Double = 0.2

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007, "t-Closeness:
    * Privacy Beyond k-Anonymity and l-Diversity") — the ladder rung
    * above l-diversity: a QI class can be k-anonymous AND l-diverse yet
    * still leak when its sensitive-attribute DISTRIBUTION differs
    * sharply from the global one (the classic skewed-class attack). Per
    * class, the Earth Mover's Distance between the class's and the
    * corpus's sensitive distribution over the ORDERED integer domain —
    * for an ordered domain with unit ground distances,
    * EMD = (1/(v−1)) · Σ_i |Σ_{j≤i} (p_j − q_j)|, a prefix-sum fold.
    *
    * Exactness: the prefix sums run over INTEGER cross-products
    * (cnt_class·n_total − cnt_global·n_class — common denominator
    * n_class·n_total cleared), so everything up to the single final
    * division is exact long arithmetic and the DuckDB oracle replays
    * the table hash-exactly, the q_k_anonymity standard.
    *
    * Scale shape: ONE corpus-scale groupBy builds the (QI, value) count
    * table; classes, the global histogram, and the corpus totals are
    * re-aggregations of that bounded table (distinct QI × domain
    * values, model-sized), and the per-class prefix window runs over
    * the ≤ |domain| rows of one class — the generalizationLadder
    * posture. Sensitive attribute: floor(c_acctbal / 1000) — an
    * ordered 11-value integer domain on the shipped data. */
  def tCloseness(customer: DataFrame, t: Double = DefaultT): DataFrame =
    // the only corpus-scale aggregation; everything below re-aggregates
    // this bounded (25 nations × 5 segments × ~11 buckets) class table
    tClosenessFromCounts(
      customer.groupBy(
        col("c_nationkey").as("nation"),
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("sval"))
        .agg(count(lit(1)).as("cnt")),
      t)

  /** [[tCloseness]] from an already-aggregated (nation, segment, sval,
    * cnt) class-value table — the shared arithmetic face: the batch
    * audit feeds it the corpus groupBy, the streaming monitor feeds it
    * the accumulated complete-mode state, so streamed ≡ batch is the
    * SAME expression tree over equal integers. */
  def tClosenessFromCounts(counts: DataFrame, t: Double = DefaultT): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cv = counts.localCheckpoint(false)
    val classes = cv.groupBy(col("nation"), col("segment"))
      .agg(sum(col("cnt")).as("n_class"))
    val globals = cv.groupBy(col("sval")).agg(sum(col("cnt")).as("g"))
    val totals = globals.agg(sum(col("g")).as("n_total"),
      count(lit(1)).as("v"))
    // full class × domain grid (both sides bounded aggregates — the
    // house scalar-composition crossJoin pattern), absent values at 0
    val grid = classes
      .crossJoin(broadcast(globals))
      .crossJoin(broadcast(totals))
      .join(cv, Seq("nation", "segment", "sval"), "left")
      .select(col("nation"), col("segment"), col("sval"),
        col("n_class"), col("n_total"), col("v"),
        (coalesce(col("cnt"), lit(0L)) * col("n_total") -
          col("g") * col("n_class")).as("diff"))
    // per-class prefix over the ordered domain: ≤ |domain| rows per
    // class — bounded by the value vocabulary, never by data
    val wPrefix = Window.partitionBy(col("nation"), col("segment"))
      .orderBy(col("sval"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("prefix", sum(col("diff")).over(wPrefix))
      .groupBy(col("nation"), col("segment"), col("n_class"),
        col("n_total"), col("v"))
      .agg(sum(abs(col("prefix"))).as("emd_num"))
      .select(col("nation"), col("segment"), col("n_class").as("class_size"),
        // v = 1 ⇒ every class distribution trivially equals the global
        // (single-value domain): define t_dist = 0 rather than divide
        // by (v−1) = 0
        when(col("v") > 1L,
          round(col("emd_num").cast("double") /
            (col("n_class") * col("n_total") * (col("v") - lit(1L))).cast("double"),
            6)).otherwise(lit(0.0)).as("t_dist"))
      .withColumn("meets_t", col("t_dist") <= t)
      .orderBy(col("nation"), col("segment"))
  }

  /** DuckDB oracle for [[tCloseness]] — the same integer prefix-sum
    * chain with the threshold interpolated from [[DefaultT]]. */
  def tClosenessSql(t: Double = DefaultT, parityCol: Boolean = false): String =
    s"""WITH cv AS (
       |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
       |         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS sval,
       |         count(*) AS cnt
       |  FROM customer GROUP BY 1, 2, 3),
       |cls AS (SELECT nation, segment, CAST(sum(cnt) AS BIGINT) AS n_class
       |        FROM cv GROUP BY 1, 2),
       |glb AS (SELECT sval, CAST(sum(cnt) AS BIGINT) AS g FROM cv GROUP BY 1),
       |tot AS (SELECT CAST(sum(g) AS BIGINT) AS n_total,
       |               CAST(count(*) AS BIGINT) AS v FROM glb),
       |grid AS (
       |  SELECT cls.nation, cls.segment, glb.sval, cls.n_class,
       |         tot.n_total, tot.v,
       |         CAST(coalesce(cv.cnt, 0) * tot.n_total - glb.g * cls.n_class
       |              AS BIGINT) AS diff
       |  FROM cls CROSS JOIN glb CROSS JOIN tot
       |  LEFT JOIN cv ON cv.nation = cls.nation AND cv.segment = cls.segment
       |             AND cv.sval = glb.sval),
       |pre AS (
       |  SELECT nation, segment, n_class, n_total, v,
       |         CAST(sum(diff) OVER (PARTITION BY nation, segment
       |              ORDER BY sval ROWS BETWEEN UNBOUNDED PRECEDING
       |              AND CURRENT ROW) AS BIGINT) AS prefix
       |  FROM grid),
       |emd AS (
       |  SELECT nation, segment, n_class, n_total, v,
       |         CAST(sum(abs(prefix)) AS BIGINT) AS emd_num
       |  FROM pre GROUP BY 1, 2, 3, 4, 5)
       |SELECT nation, segment, n_class AS class_size,
       |       CASE WHEN v > 1 THEN round(CAST(emd_num AS DOUBLE) /
       |             CAST(n_class * n_total * (v - 1) AS DOUBLE), 6)
       |            ELSE CAST(0.0 AS DOUBLE) END AS t_dist,
       |       (CASE WHEN v > 1 THEN round(CAST(emd_num AS DOUBLE) /
       |              CAST(n_class * n_total * (v - 1) AS DOUBLE), 6)
       |             ELSE CAST(0.0 AS DOUBLE) END
       |          <= CAST($t AS DOUBLE)) AS meets_t${
            if (parityCol) ",\n       true AS parity_ok" else ""}
       |FROM emd ORDER BY nation, segment""".stripMargin

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

  /** The accountant's fixtures, shared with the generated oracle: the
    * total ε budget a release campaign may spend, and the δ at which
    * the zCDP bound is converted back to (ε, δ)-DP. */
  val DefaultEpsBudget: Double = 2.0
  val DefaultDeltaTarget: Double = 1e-6

  /** The release ledger the accountant runs over: one Laplace release
    * per (nation, segment) class histogram — the [[dpRelease]] family
    * at per-segment granularity — with a deterministic per-release ε in
    * INTEGER MICRO-UNITS (ε_micro = 100000 + 50000·((nation +
    * len(segment)) mod 4), i.e. ε ∈ {0.10, 0.15, 0.20, 0.25}): releases
    * of bigger/noisier classes spend different budget, and the varied ε
    * exercises HETEROGENEOUS composition. Laplace ⇒ every per-release
    * δ_i = 0. Ledger size = distinct (nation, segment) — release-log-
    * sized, never data-sized. */
  /** The ledger's per-release ε in integer micro-units — ONE Column
    * tree shared by the batch ledger and the streaming monitor, so the
    * two faces cannot drift. */
  def releaseEpsMicro(nation: Column, segment: Column): Column =
    (lit(100000L) + lit(50000L) * pmod(nation + length(segment), lit(4)))
      .cast("long")

  def dpAccountantLedger(customer: DataFrame): DataFrame =
    customer
      .select(col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"))
      .distinct()
      .select(col("nation"), col("segment"),
        releaseEpsMicro(col("nation"), col("segment")).as("eps_micro"))

  /** (ε, δ) composition accountant over a release ledger — the budget
    * meter a DP release campaign runs: after each release, how much ε
    * is spent under (a) BASIC composition (ε adds up — Dwork & Roth
    * 2014, Thm 3.16) and (b) zCDP composition (Bun & Steinke 2016): an
    * ε-DP mechanism is (ε²/2)-zCDP, zCDP adds up, and ρ-zCDP converts
    * back to (ρ + 2·√(ρ·ln(1/δ)), δ)-DP at the target δ. Basic is
    * tighter for few releases; the √k zCDP bound overtakes it past
    * k ≈ 2·ln(1/δ)/(1 − ε/2)² releases (≈ 33 at the ledger's mean
    * ε ≈ 0.175, δ = 1e-6) — the accountant reports both, spends the
    * MINIMUM (both bounds are valid simultaneously), and flags each
    * release against the budget. The planted over-budget behavior on
    * the shipped ledger: ~125 releases at ε ∈ [0.1, 0.25] cross the
    * 2.0 budget near release 12, so `within_budget` flips true→false
    * mid-table, and the zCDP column overtakes basic in the tail — both
    * regimes visible in one run.
    *
    * Exactness: ε in integer micro-units makes every prefix sum exact
    * BIGINT arithmetic (Σε and Σε² in micro²-units); the only float
    * work is the final conversion — one division, one √ (correctly
    * rounded IEEE in both engines), ln(1/δ) interpolated as a shared
    * literal — so the oracle replays hash-exactly, the Wilson/Laplace
    * precedent. Scale shape: the ledger is release-log-sized (bounded
    * by the release campaign, not the corpus), so the single-partition
    * ordered prefix window is bounded work — the waterfill posture. */
  def dpAccountant(ledger: DataFrame,
      epsBudget: Double = DefaultEpsBudget,
      deltaTarget: Double = DefaultDeltaTarget): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lnInvDelta = math.log(1.0 / deltaTarget)
    val w = Window.orderBy(col("nation"), col("segment"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rhoD = col("s2").cast("double") / 2.0e12 // Σ(ε_micro²)/2 in ε²-units
    val epsBasic = round(col("sb").cast("double") / 1.0e6, 6)
    val epsZcdp = round(rhoD + lit(2.0) * sqrt(rhoD * lit(lnInvDelta)), 6)
    val epsSpent = least(epsBasic, epsZcdp)
    ledger
      .withColumn("n_releases", count(lit(1)).over(w))
      .withColumn("sb", sum(col("eps_micro")).over(w))
      .withColumn("s2", sum(col("eps_micro") * col("eps_micro")).over(w))
      .select(
        col("nation"), col("segment"),
        round(col("eps_micro").cast("double") / 1.0e6, 6).as("eps"),
        col("n_releases"),
        epsBasic.as("eps_basic"),
        epsZcdp.as("eps_zcdp"),
        epsSpent.as("eps_spent"),
        (epsSpent <= lit(epsBudget)).as("within_budget"))
      .orderBy(col("nation"), col("segment"))
  }

  /** DuckDB oracle for [[dpAccountant]] over [[dpAccountantLedger]] —
    * the same integer prefix chain with ln(1/δ) and the budget
    * interpolated from the same constants. */
  def dpAccountantSql(epsBudget: Double = DefaultEpsBudget,
      deltaTarget: Double = DefaultDeltaTarget,
      parityCol: Boolean = false): String = {
    val l = math.log(1.0 / deltaTarget)
    val rhoD = "(CAST(s2 AS DOUBLE) / CAST(2000000000000.0 AS DOUBLE))"
    val epsBasic = "round(CAST(sb AS DOUBLE) / CAST(1000000.0 AS DOUBLE), 6)"
    val epsZcdp = s"round($rhoD + CAST(2.0 AS DOUBLE) * sqrt($rhoD * CAST($l AS DOUBLE)), 6)"
    s"""WITH led AS (
       |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
       |         CAST(100000 + 50000 * ((c_nationkey + length(c_mktsegment)) % 4) AS BIGINT)
       |           AS eps_micro
       |  FROM customer GROUP BY 1, 2),
       |pre AS (
       |  SELECT nation, segment, eps_micro,
       |         CAST(count(*) OVER w AS BIGINT) AS n_releases,
       |         CAST(sum(eps_micro) OVER w AS BIGINT) AS sb,
       |         CAST(sum(eps_micro * eps_micro) OVER w AS BIGINT) AS s2
       |  FROM led
       |  WINDOW w AS (ORDER BY nation, segment
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT nation, segment,
       |       round(CAST(eps_micro AS DOUBLE) / CAST(1000000.0 AS DOUBLE), 6) AS eps,
       |       n_releases,
       |       $epsBasic AS eps_basic,
       |       $epsZcdp AS eps_zcdp,
       |       least($epsBasic, $epsZcdp) AS eps_spent,
       |       (least($epsBasic, $epsZcdp) <= CAST($epsBudget AS DOUBLE)) AS within_budget${
            if (parityCol) ",\n       true AS parity_ok" else ""}
       |FROM pre ORDER BY nation, segment""".stripMargin
  }

  /** The heterogeneous accountant's δ budget: basic composition sums
    * per-release δ_i too, and a campaign of Gaussian releases can
    * exhaust the δ budget while ε is still cheap — the failure mode the
    * pure-ε ledger can't meter. Shared with the generated oracle. */
  val DefaultDeltaBudget: Double = 1e-5

  /** Per-release mechanism rule for the heterogeneous ledger — ONE
    * Column tree shared with the oracle generator: every third class
    * (by the same portable key the ε rule uses) releases via the
    * GAUSSIAN mechanism, the rest via Laplace. */
  def releaseIsGauss(nation: Column, segment: Column): Column =
    pmod(nation + length(segment), lit(3)) === 0

  /** Per-release δ in integer NANO-units (δ_i ∈ {2,3,4}·10⁻⁷ for
    * Gaussian releases, 0 for Laplace — Laplace is pure ε-DP): integer
    * units make Σδ an exact BIGINT prefix sum, the ε micro-unit
    * discipline applied to the second budget axis. */
  def releaseDeltaNano(nation: Column, segment: Column): Column =
    when(releaseIsGauss(nation, segment),
      lit(200L) + lit(100L) * pmod(nation, lit(3))).otherwise(lit(0L)).cast("long")

  /** Heterogeneous release ledger: each (nation, segment) class
    * releases once, via Laplace (ε_i, δ_i = 0, ρ_i = ε_i²/2 — Bun &
    * Steinke Prop 1.4) or Gaussian (declared certificate (ε_i, δ_i),
    * ρ_i from the mechanism's σ). The ledger carries 2ρ_i in integer
    * micro²-units (`rho2`): ε_micro² for Laplace, ε_micro²/2 for the
    * Gaussian rows (σ chosen so ρ = ε²/4 — Gaussian's concentrated
    * tail buys a smaller ρ at the same certificate; the multiples-of-
    * 50000 ε grid keeps the halving exact). A production ledger records
    * each release's declared triple the same way — integer accounting
    * grains, rounded conservatively at declaration time. */
  def dpAccountantHeteroLedger(customer: DataFrame): DataFrame =
    dpAccountantHeteroLedgerFromClasses(
      customer
        .select(col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"))
        .distinct())

  /** [[dpAccountantHeteroLedger]] from an already-distinct (nation,
    * segment) class table — the shared arithmetic face (the
    * [[tClosenessFromCounts]] convention): the batch audit feeds it the
    * corpus distinct, the streaming monitor feeds it the accumulated
    * complete-mode class set, so streamed ≡ batch is the SAME
    * expression tree over the same classes. */
  def dpAccountantHeteroLedgerFromClasses(classes: DataFrame): DataFrame = {
    val eps = releaseEpsMicro(col("nation"), col("segment"))
    classes.select(col("nation"), col("segment"),
      when(releaseIsGauss(col("nation"), col("segment")), "gaussian")
        .otherwise("laplace").as("mechanism"),
      eps.as("eps_micro"),
      releaseDeltaNano(col("nation"), col("segment")).as("delta_nano"),
      when(releaseIsGauss(col("nation"), col("segment")), eps * eps / 2L)
        .otherwise(eps * eps).cast("long").as("rho2"))
  }

  /** Per-release Poisson sampling rate in integer PPM (parts-per-
    * million) — q ∈ {1%, 5%, 10%, 25%} over the same portable class
    * key: a release computed on a subsample of the data spends LESS
    * budget, and the varied rate exercises the amplification lemma
    * across its range. Keyed on nation alone — DECOUPLED from the ε
    * rule's (nation + len(segment)) key, so the ledger covers the
    * (ε, q) cross product, not a diagonal. Integer PPM keeps the
    * ledger exact. */
  def releaseSampleRatePpm(nation: Column, segment: Column): Column = {
    val m = pmod(nation, lit(4))
    when(m === 0, 10000L).when(m === 1, 50000L)
      .when(m === 2, 100000L).otherwise(250000L).cast("long")
  }

  /** Subsampled release ledger: each (nation, segment) class releases a
    * Laplace(1/ε) histogram computed on a Poisson q-subsample, so the
    * release enjoys the AMPLIFIED guarantee ε′ = ln(1 + q·(e^ε − 1))
    * (amplification by subsampling — Li, Qardaji & Su 2012; Balle,
    * Barthe & Gaboardi 2018 Thm 8 for the Poisson form). ε′ is rounded
    * to INTEGER micro-units per release — one exp + one ln + one round
    * (the cross-engine libm-agreement precedent), the ONLY float step,
    * taken BEFORE composition — after which every prefix sum is exact
    * BIGINT again and the oracle replays hash-exactly. */
  def dpAccountantSubsampledLedger(customer: DataFrame): DataFrame = {
    val eps = releaseEpsMicro(col("nation"), col("segment"))
    val qPpm = releaseSampleRatePpm(col("nation"), col("segment"))
    val qD = qPpm.cast("double") / 1.0e6
    val eD = eps.cast("double") / 1.0e6
    val ampMicro =
      round(log(lit(1.0) + qD * (exp(eD) - lit(1.0))) * 1.0e6).cast("long")
    customer
      .select(col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"))
      .distinct()
      .select(col("nation"), col("segment"),
        eps.as("eps_micro"), qPpm.as("q_ppm"), ampMicro.as("eps_amp_micro"))
  }

  /** Amplification-by-subsampling accountant — the privacy ladder's
    * third composition rung (after [[dpAccountant]]'s pure-ε and
    * [[dpAccountantHetero]]'s mixed-mechanism ledgers): the campaign
    * composes the AMPLIFIED per-release guarantees, basic and zCDP
    * exactly as [[dpAccountant]] does (an ε′-DP release is (ε′²/2)-zCDP
    * — the amplified guarantee IS a pure-ε guarantee, so both
    * composition paths apply to it unchanged). Subsampling moves the
    * whole budget curve down — a q = 5% release of ε = 0.25 spends
    * ε′ ≈ 0.0141, 18× cheaper — which is exactly how production
    * pipelines afford release campaigns over user-level data. Same
    * exact-BIGINT prefix discipline, ledger-bounded window. */
  def dpAccountantSubsampled(ledger: DataFrame,
      epsBudget: Double = DefaultEpsBudget,
      deltaTarget: Double = DefaultDeltaTarget): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lnInvDelta = math.log(1.0 / deltaTarget)
    val w = Window.orderBy(col("nation"), col("segment"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rhoD = col("s2").cast("double") / 2.0e12
    val epsBasic = round(col("sb").cast("double") / 1.0e6, 6)
    val epsZcdp = round(rhoD + lit(2.0) * sqrt(rhoD * lit(lnInvDelta)), 6)
    val epsSpent = least(epsBasic, epsZcdp)
    ledger
      .withColumn("n_releases", count(lit(1)).over(w))
      .withColumn("sb", sum(col("eps_amp_micro")).over(w))
      .withColumn("s2", sum(col("eps_amp_micro") * col("eps_amp_micro")).over(w))
      .select(
        col("nation"), col("segment"),
        round(col("eps_micro").cast("double") / 1.0e6, 6).as("eps"),
        round(col("q_ppm").cast("double") / 1.0e6, 6).as("q"),
        round(col("eps_amp_micro").cast("double") / 1.0e6, 6).as("eps_amp"),
        col("n_releases"),
        epsBasic.as("eps_basic"),
        epsZcdp.as("eps_zcdp"),
        epsSpent.as("eps_spent"),
        (epsSpent <= lit(epsBudget)).as("within_budget"))
      .orderBy(col("nation"), col("segment"))
  }

  /** DuckDB oracle for [[dpAccountantSubsampled]] over
    * [[dpAccountantSubsampledLedger]] — the amplification expression
    * and the prefix chains generated from the same constants. */
  def dpAccountantSubsampledSql(epsBudget: Double = DefaultEpsBudget,
      deltaTarget: Double = DefaultDeltaTarget): String = {
    val l = math.log(1.0 / deltaTarget)
    val epsM = "CAST(100000 + 50000 * ((c_nationkey + length(c_mktsegment)) % 4) AS BIGINT)"
    val qPpm = ("CAST(CASE c_nationkey % 4 " +
      "WHEN 0 THEN 10000 WHEN 1 THEN 50000 WHEN 2 THEN 100000 " +
      "ELSE 250000 END AS BIGINT)")
    val amp = s"CAST(round(ln(CAST(1.0 AS DOUBLE) + " +
      s"(CAST($qPpm AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) * " +
      s"(exp(CAST($epsM AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) - CAST(1.0 AS DOUBLE))) " +
      s"* CAST(1000000.0 AS DOUBLE)) AS BIGINT)"
    val rhoD = "(CAST(s2 AS DOUBLE) / CAST(2000000000000.0 AS DOUBLE))"
    val epsBasic = "round(CAST(sb AS DOUBLE) / CAST(1000000.0 AS DOUBLE), 6)"
    val epsZcdp = s"round($rhoD + CAST(2.0 AS DOUBLE) * sqrt($rhoD * CAST($l AS DOUBLE)), 6)"
    s"""WITH led AS (
       |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
       |         $epsM AS eps_micro, $qPpm AS q_ppm, $amp AS eps_amp_micro
       |  FROM customer GROUP BY 1, 2),
       |pre AS (
       |  SELECT nation, segment, eps_micro, q_ppm, eps_amp_micro,
       |         CAST(count(*) OVER w AS BIGINT) AS n_releases,
       |         CAST(sum(eps_amp_micro) OVER w AS BIGINT) AS sb,
       |         CAST(sum(eps_amp_micro * eps_amp_micro) OVER w AS BIGINT) AS s2
       |  FROM led
       |  WINDOW w AS (ORDER BY nation, segment
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT nation, segment,
       |       round(CAST(eps_micro AS DOUBLE) / CAST(1000000.0 AS DOUBLE), 6) AS eps,
       |       round(CAST(q_ppm AS DOUBLE) / CAST(1000000.0 AS DOUBLE), 6) AS q,
       |       round(CAST(eps_amp_micro AS DOUBLE) / CAST(1000000.0 AS DOUBLE), 6) AS eps_amp,
       |       n_releases,
       |       $epsBasic AS eps_basic,
       |       $epsZcdp AS eps_zcdp,
       |       least($epsBasic, $epsZcdp) AS eps_spent,
       |       (least($epsBasic, $epsZcdp) <= CAST($epsBudget AS DOUBLE)) AS within_budget
       |FROM pre ORDER BY nation, segment""".stripMargin
  }

  /** Heterogeneous (ε, δ) composition accountant — [[dpAccountant]]
    * extended to the production case of mixed Laplace + Gaussian
    * releases: BASIC composition now sums BOTH axes ((Σε_i, Σδ_i)-DP —
    * Dwork & Roth Thm 3.16 composes the δs additively), so the basic
    * certificate is valid only while Σδ_i ≤ the δ budget — a Gaussian
    * campaign can exhaust δ while ε is still cheap, the regime the
    * pure-ε accountant cannot see. The zCDP path is UNCHANGED in shape
    * (ρ adds regardless of mechanism; Bun & Steinke Lemma 1.7) and its
    * conversion δ is the fixed target, so it stays valid when basic's
    * δ runs out — the accountant reports both certificates and flags
    * the release against the (ε, δ) budget pair if EITHER path is
    * within it. On the shipped ledger all three regimes are visible:
    * basic binds ε first (release ~12), zCDP overtakes basic in the
    * tail, and Σδ crosses the δ budget near the end of the table.
    *
    * Exactness: Σε (micro), Σδ (nano) and Σ2ρ (micro²) are exact
    * BIGINT prefix sums; the float work is three divisions, one √ and
    * shared literals — hash-exact replay, the [[dpAccountant]]
    * standard. Ledger-bounded single-partition window, the same
    * documented release-log-size argument. */
  def dpAccountantHetero(ledger: DataFrame,
      epsBudget: Double = DefaultEpsBudget,
      deltaBudget: Double = DefaultDeltaBudget,
      deltaTarget: Double = DefaultDeltaTarget): DataFrame = {
    require(deltaTarget <= deltaBudget,
      s"dpAccountantHetero: conversion target δ=$deltaTarget exceeds the δ budget $deltaBudget")
    import org.apache.spark.sql.expressions.Window
    val lnInvDelta = math.log(1.0 / deltaTarget)
    val w = Window.orderBy(col("nation"), col("segment"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rhoD = col("s2").cast("double") / 2.0e12 // Σ(2ρ·1e12)/2e12 = Σρ
    val epsBasic = round(col("sb").cast("double") / 1.0e6, 6)
    val deltaBasic = round(col("sd").cast("double") / 1.0e9, 9)
    val epsZcdp = round(rhoD + lit(2.0) * sqrt(rhoD * lit(lnInvDelta)), 6)
    val basicOk = epsBasic <= lit(epsBudget) && deltaBasic <= lit(deltaBudget)
    val zcdpOk = epsZcdp <= lit(epsBudget) // conversion δ ≤ δ budget by require
    ledger
      .withColumn("n_releases", count(lit(1)).over(w))
      .withColumn("sb", sum(col("eps_micro")).over(w))
      .withColumn("sd", sum(col("delta_nano")).over(w))
      .withColumn("s2", sum(col("rho2")).over(w))
      .select(
        col("nation"), col("segment"), col("mechanism"),
        round(col("eps_micro").cast("double") / 1.0e6, 6).as("eps"),
        round(col("delta_nano").cast("double") / 1.0e9, 9).as("delta"),
        col("n_releases"),
        epsBasic.as("eps_basic"),
        deltaBasic.as("delta_basic"),
        epsZcdp.as("eps_zcdp"),
        basicOk.as("basic_within"),
        zcdpOk.as("zcdp_within"),
        (basicOk || zcdpOk).as("within_budget"))
      .orderBy(col("nation"), col("segment"))
  }

  /** DuckDB oracle for [[dpAccountantHetero]] over
    * [[dpAccountantHeteroLedger]] — the same integer prefix chains with
    * every constant interpolated from the shared fixtures. */
  def dpAccountantHeteroSql(epsBudget: Double = DefaultEpsBudget,
      deltaBudget: Double = DefaultDeltaBudget,
      deltaTarget: Double = DefaultDeltaTarget,
      parityCol: Boolean = false): String = {
    val l = math.log(1.0 / deltaTarget)
    val rhoD = "(CAST(s2 AS DOUBLE) / CAST(2000000000000.0 AS DOUBLE))"
    val epsBasic = "round(CAST(sb AS DOUBLE) / CAST(1000000.0 AS DOUBLE), 6)"
    val deltaBasic = "round(CAST(sd AS DOUBLE) / CAST(1000000000.0 AS DOUBLE), 9)"
    val epsZcdp = s"round($rhoD + CAST(2.0 AS DOUBLE) * sqrt($rhoD * CAST($l AS DOUBLE)), 6)"
    val basicOk = s"($epsBasic <= CAST($epsBudget AS DOUBLE) AND $deltaBasic <= CAST($deltaBudget AS DOUBLE))"
    val zcdpOk = s"($epsZcdp <= CAST($epsBudget AS DOUBLE))"
    s"""WITH led AS (
       |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
       |         CASE WHEN (c_nationkey + length(c_mktsegment)) % 3 = 0
       |              THEN 'gaussian' ELSE 'laplace' END AS mechanism,
       |         CAST(100000 + 50000 * ((c_nationkey + length(c_mktsegment)) % 4) AS BIGINT)
       |           AS eps_micro,
       |         CAST(CASE WHEN (c_nationkey + length(c_mktsegment)) % 3 = 0
       |              THEN 200 + 100 * (c_nationkey % 3) ELSE 0 END AS BIGINT)
       |           AS delta_nano,
       |         CAST(CASE WHEN (c_nationkey + length(c_mktsegment)) % 3 = 0
       |              THEN (CAST(100000 + 50000 * ((c_nationkey + length(c_mktsegment)) % 4) AS BIGINT)
       |                    * CAST(100000 + 50000 * ((c_nationkey + length(c_mktsegment)) % 4) AS BIGINT)) // 2
       |              ELSE CAST(100000 + 50000 * ((c_nationkey + length(c_mktsegment)) % 4) AS BIGINT)
       |                   * CAST(100000 + 50000 * ((c_nationkey + length(c_mktsegment)) % 4) AS BIGINT)
       |              END AS BIGINT) AS rho2
       |  FROM customer GROUP BY 1, 2),
       |pre AS (
       |  SELECT nation, segment, mechanism, eps_micro, delta_nano,
       |         CAST(count(*) OVER w AS BIGINT) AS n_releases,
       |         CAST(sum(eps_micro) OVER w AS BIGINT) AS sb,
       |         CAST(sum(delta_nano) OVER w AS BIGINT) AS sd,
       |         CAST(sum(rho2) OVER w AS BIGINT) AS s2
       |  FROM led
       |  WINDOW w AS (ORDER BY nation, segment
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT nation, segment, mechanism,
       |       round(CAST(eps_micro AS DOUBLE) / CAST(1000000.0 AS DOUBLE), 6) AS eps,
       |       round(CAST(delta_nano AS DOUBLE) / CAST(1000000000.0 AS DOUBLE), 9) AS delta,
       |       n_releases,
       |       $epsBasic AS eps_basic,
       |       $deltaBasic AS delta_basic,
       |       $epsZcdp AS eps_zcdp,
       |       $basicOk AS basic_within,
       |       $zcdpOk AS zcdp_within,
       |       ($basicOk OR $zcdpOk) AS within_budget${
            if (parityCol) ",\n       true AS parity_ok" else ""}
       |FROM pre ORDER BY nation, segment""".stripMargin
  }

  // --------------------------------------------------------------------
  // RDP (moments) accountant for subsampled-Gaussian training runs — the
  // privacy ladder's fourth rung, and the one DP-SGD actually needs
  // (Abadi et al. 2016; Mironov 2017; Mironov, Talwar & Zhang 2019).

  /** The RDP accountant's Rényi-order grid. Integer orders make the
    * subsampled-Gaussian RDP bound a FINITE binomial sum (MTZ19, the
    * formula every production accountant implements for integer α);
    * capped at 16 so the largest exp() argument on the ledger's
    * parameter grid stays ≤ α(α−1)/(2σ²_min) + ln C(16,8) ≈ 197 — far
    * inside double range, so the unrolled sum needs no log-sum-exp
    * rearrangement and replays bitwise in both engines. */
  val RdpAlphas: Seq[Int] = Seq(2, 3, 4, 8, 16)

  /** Per-run Poisson sampling rate in integer PPM for the DP-SGD
    * ledger — q ∈ {0.1%, 0.5%, 1%, 2.5%}, the minibatch-over-corpus
    * regime (an order of magnitude below [[releaseSampleRatePpm]]'s
    * release-subsample grid, which is the point: DP-SGD's privacy
    * comes from very small q amplified over many steps). */
  def releaseSgdRatePpm(nation: Column): Column = {
    val m = pmod(nation, lit(4))
    when(m === 0, 1000L).when(m === 1, 5000L)
      .when(m === 2, 10000L).otherwise(25000L).cast("long")
  }

  /** Per-run Gaussian noise multiplier σ in integer MILLI-units —
    * σ ∈ {0.8, 1.0, 2.0, 4.0}, keyed on (nation + len(segment)) mod 4
    * (decoupled from the q rule's nation-only key, so the ledger covers
    * the (q, σ) cross product). The 0.8 floor is what caps the exp()
    * arguments (see [[RdpAlphas]]). */
  def releaseSigmaMilli(nation: Column, segment: Column): Column = {
    val m = pmod(nation + length(segment), lit(4))
    when(m === 0, 800L).when(m === 1, 1000L)
      .when(m === 2, 2000L).otherwise(4000L).cast("long")
  }

  /** Per-run step count T ∈ {100, …, 500} — each ledger row is one
    * TRAINING RUN of T identical subsampled-Gaussian steps; RDP
    * composes a run as T·ε_step(α) (Mironov 2017 Prop 1), an exact
    * BIGINT multiply once ε_step is in integer micro-units. */
  def releaseStepsCount(nation: Column, segment: Column): Column =
    (lit(100L) * (lit(1L) + pmod(nation + length(segment), lit(5)))).cast("long")

  /** Exact binomial coefficient (fits Long for the shipped grid:
    * max C(16,8) = 12 870). */
  private def binomial(n: Int, k: Int): Long =
    (1 to k).foldLeft(1L)((acc, i) => acc * (n - i + 1) / i)

  /** One-step subsampled-Gaussian RDP bound at integer order α (MTZ19;
    * the TF-Privacy / Opacus integer-order formula):
    * ε(α) = (1/(α−1))·ln Σ_{k=0}^{α} C(α,k)(1−q)^{α−k} q^k e^{(k²−k)/(2σ²)}.
    * Emitted as ONE arithmetic tree — powers expressed through exp/ln
    * (the only libm calls the cross-engine agreement precedent covers),
    * terms summed left-associated — mirrored verbatim by
    * [[rdpStepEpsSqlExpr]] so both engines run identical IEEE ops in
    * identical order. */
  private def rdpStepEps(alpha: Int, qD: Column, sD: Column): Column = {
    val ln1q = log(lit(1.0) - qD)
    val lnq = log(qD)
    val inv2s2 = lit(1.0) / (lit(2.0) * (sD * sD))
    val terms = (0 to alpha).map { k =>
      val arg = lit((alpha - k).toDouble) * ln1q + lit(k.toDouble) * lnq +
        lit((k.toLong * k - k).toDouble) * inv2s2
      lit(binomial(alpha, k).toDouble) * exp(arg)
    }
    log(terms.reduceLeft(_ + _)) / lit((alpha - 1).toDouble)
  }

  /** The DuckDB twin of [[rdpStepEps]] — generated from the same grid
    * constants with the same association order. */
  private def rdpStepEpsSqlExpr(alpha: Int, qD: String, sD: String): String = {
    val ln1q = s"ln(CAST(1.0 AS DOUBLE) - $qD)"
    val lnq = s"ln($qD)"
    val inv2s2 = s"(CAST(1.0 AS DOUBLE) / (CAST(2.0 AS DOUBLE) * ($sD * $sD)))"
    val terms = (0 to alpha).map { k =>
      val arg = s"((CAST(${(alpha - k).toDouble} AS DOUBLE) * $ln1q + " +
        s"CAST(${k.toDouble} AS DOUBLE) * $lnq) + " +
        s"CAST(${(k.toLong * k - k).toDouble} AS DOUBLE) * $inv2s2)"
      s"CAST(${binomial(alpha, k).toDouble} AS DOUBLE) * exp($arg)"
    }
    s"(ln(${terms.reduceLeft((a, b) => s"($a + $b)")}) / " +
      s"CAST(${(alpha - 1).toDouble} AS DOUBLE))"
  }

  /** DP-SGD run ledger: each (nation, segment) class is one training
    * run (q, σ, T) with the one-step RDP bound at every grid order
    * CEILED to integer micro-units (`e_a<α>`). Ceiling — not rounding —
    * keeps the stored bound a VALID RDP upper bound (the conservative
    * direction; a floor could understate spent budget), and it is the
    * only float step: after it, run totals (T·ε_step) and campaign
    * prefix sums are exact BIGINT, the house accountant discipline.
    * ε_step(α) ≥ 0 always (every e^{(k²−k)/(2σ²)} ≥ 1 makes the inner
    * sum ≥ the binomial theorem's 1), so ceil never goes negative. */
  def dpAccountantRdpLedgerFromClasses(classes: DataFrame): DataFrame = {
    val base = classes.select(col("nation"), col("segment"),
      releaseSgdRatePpm(col("nation")).as("q_ppm"),
      releaseSigmaMilli(col("nation"), col("segment")).as("sigma_milli"),
      releaseStepsCount(col("nation"), col("segment")).as("steps"))
    val qD = col("q_ppm").cast("double") / lit(1.0e6)
    val sD = col("sigma_milli").cast("double") / lit(1.0e3)
    base.select(col("nation") +: col("segment") +: col("q_ppm") +:
      col("sigma_milli") +: col("steps") +:
      RdpAlphas.map(a =>
        ceil(rdpStepEps(a, qD, sD) * lit(1.0e6)).cast("long").as(s"e_a$a")): _*)
  }

  def dpAccountantRdpLedger(customer: DataFrame): DataFrame =
    dpAccountantRdpLedgerFromClasses(
      customer
        .select(col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"))
        .distinct())

  /** RDP composition accountant over a DP-SGD run ledger — the rung the
    * first three cannot reach: per-release (ε, δ) certificates of a
    * subsampled-Gaussian STEP are so loose that basic/zCDP composition
    * over T·|runs| steps is vacuous, while RDP composes tightly: at
    * each Rényi order α the campaign's ε_RDP(α) is Σ_runs T·ε_step(α)
    * (linear composition, Mironov 2017 Prop 1 — here an exact BIGINT
    * prefix sum of micro-units), converted to (ε, δ_target)-DP via
    * ε = ε_RDP(α) + ln(1/δ)/(α−1) (Prop 3) and minimized over the
    * grid. `best_alpha` is the arg-min (smallest on ties) — it MOVES
    * down the ledger, large orders early (small conversion penalty)
    * toward the order with the flattest growth as spend accumulates,
    * the signature RDP-accountant behavior. Float work per output row:
    * one division + one literal add per order, then round(·, 6) —
    * order-free off exact integers, hash-exact replay. Ledger-bounded
    * single-partition window, the documented accountant argument. */
  def dpAccountantRdp(ledger: DataFrame,
      epsBudget: Double = DefaultEpsBudget,
      deltaTarget: Double = DefaultDeltaTarget): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("nation"), col("segment"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCums = RdpAlphas.foldLeft(
      ledger.withColumn("n_releases", count(lit(1)).over(w))) {
      (df, a) => df.withColumn(s"c_a$a",
        sum(col("steps") * col(s"e_a$a")).over(w))
    }
    val conv = RdpAlphas.map { a =>
      val pen = math.log(1.0 / deltaTarget) / (a - 1).toDouble
      round(col(s"c_a$a").cast("double") / lit(1.0e6) + lit(pen), 6)
        .as(s"eps_a$a")
    }
    val converted = withCums.select(col("nation") +: col("segment") +:
      round(col("q_ppm").cast("double") / 1.0e6, 6).as("q") +:
      round(col("sigma_milli").cast("double") / 1.0e3, 3).as("sigma") +:
      col("steps") +: col("n_releases") +: conv: _*)
    val spent = least(RdpAlphas.map(a => col(s"eps_a$a")): _*)
    val best = RdpAlphas.init.foldRight(
      lit(RdpAlphas.last): Column) { (a, rest) =>
      when(col(s"eps_a$a") === col("eps_spent"), lit(a)).otherwise(rest)
    }
    converted
      .withColumn("eps_spent", spent)
      .withColumn("best_alpha", best.cast("int"))
      .withColumn("within_budget", col("eps_spent") <= lit(epsBudget))
      .orderBy(col("nation"), col("segment"))
  }

  /** DuckDB oracle for [[dpAccountantRdp]] over
    * [[dpAccountantRdpLedger]] — ledger rules, the unrolled per-order
    * RDP sums, prefix chains and conversion all generated from the
    * same constants in the same association order. */
  def dpAccountantRdpSql(epsBudget: Double = DefaultEpsBudget,
      deltaTarget: Double = DefaultDeltaTarget,
      parityCol: Boolean = false): String = {
    val qPpm = ("CAST(CASE c_nationkey % 4 " +
      "WHEN 0 THEN 1000 WHEN 1 THEN 5000 WHEN 2 THEN 10000 " +
      "ELSE 25000 END AS BIGINT)")
    val sMil = ("CAST(CASE (c_nationkey + length(c_mktsegment)) % 4 " +
      "WHEN 0 THEN 800 WHEN 1 THEN 1000 WHEN 2 THEN 2000 " +
      "ELSE 4000 END AS BIGINT)")
    val steps =
      "CAST(100 * (1 + (c_nationkey + length(c_mktsegment)) % 5) AS BIGINT)"
    val qD = "(CAST(q_ppm AS DOUBLE) / CAST(1000000.0 AS DOUBLE))"
    val sD = "(CAST(sigma_milli AS DOUBLE) / CAST(1000.0 AS DOUBLE))"
    val eCols = RdpAlphas.map(a =>
      s"CAST(ceil(${rdpStepEpsSqlExpr(a, qD, sD)} * " +
        s"CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS e_a$a").mkString(",\n         ")
    val cumCols = RdpAlphas.map(a =>
      s"CAST(sum(steps * e_a$a) OVER w AS BIGINT) AS c_a$a").mkString(",\n         ")
    val convCols = RdpAlphas.map { a =>
      val pen = math.log(1.0 / deltaTarget) / (a - 1).toDouble
      s"round(CAST(c_a$a AS DOUBLE) / CAST(1000000.0 AS DOUBLE) + " +
        s"CAST($pen AS DOUBLE), 6) AS eps_a$a"
    }.mkString(",\n         ")
    val spent = s"least(${RdpAlphas.map(a => s"eps_a$a").mkString(", ")})"
    val best = "CASE " + RdpAlphas.init.map(a =>
      s"WHEN eps_a$a = eps_spent THEN $a ").mkString +
      s"ELSE ${RdpAlphas.last} END"
    s"""WITH cls AS (
       |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
       |         $qPpm AS q_ppm, $sMil AS sigma_milli, $steps AS steps
       |  FROM customer GROUP BY 1, 2, 3, 4, 5),
       |led AS (
       |  SELECT nation, segment, q_ppm, sigma_milli, steps,
       |         $eCols
       |  FROM cls),
       |pre AS (
       |  SELECT nation, segment, q_ppm, sigma_milli, steps,
       |         CAST(count(*) OVER w AS BIGINT) AS n_releases,
       |         $cumCols
       |  FROM led
       |  WINDOW w AS (ORDER BY nation, segment
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |conv AS (
       |  SELECT nation, segment,
       |         round(CAST(q_ppm AS DOUBLE) / CAST(1000000.0 AS DOUBLE), 6) AS q,
       |         round(CAST(sigma_milli AS DOUBLE) / CAST(1000.0 AS DOUBLE), 3) AS sigma,
       |         steps, n_releases,
       |         $convCols
       |  FROM pre),
       |fin AS (
       |  SELECT *, $spent AS eps_spent FROM conv)
       |SELECT nation, segment, q, sigma, steps, n_releases,
       |       ${RdpAlphas.map(a => s"eps_a$a").mkString(", ")},
       |       eps_spent,
       |       CAST($best AS INTEGER) AS best_alpha,
       |       (eps_spent <= CAST($epsBudget AS DOUBLE)) AS within_budget${
            if (parityCol) ",\n       true AS parity_ok" else ""}
       |FROM fin ORDER BY nation, segment""".stripMargin
  }
}
