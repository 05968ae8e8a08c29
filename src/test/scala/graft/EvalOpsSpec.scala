package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Preference, Privacy, Similarity}

/** Round-13 eval-ops families: Bradley–Terry preference ranking,
  * retrieval-evaluation metrics, and re-identification-risk audits. */
class EvalOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // --- Bradley–Terry --------------------------------------------------

  /** Synthetic docs where length strictly orders by a planted language
    * preference: zh > en > de everywhere they meet (es/fr get mid-table
    * lengths). One source, enough docs that every block has meetings. */
  private def plantedDocs = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    val lift = Map("de" -> 0L, "es" -> 200L, "fr" -> 250L, "en" -> 400L, "zh" -> 800L)
    val rows = for {
      i <- 0L until 60L
      (lang, li) <- langs.zipWithIndex
    } yield (i * 5 + li, "x", lang, "s0", lift(lang) + i % 3)
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("bradleyTerry ranks a planted strict preference correctly and normalizes") {
    val out = Preference.bradleyTerry(spark, plantedDocs).collect()
    assert(out.length == 5)
    val byItem = out.map(r => r.getAs[String]("item") ->
      (r.getAs[Long]("wins"), r.getAs[Long]("matches"),
        r.getAs[Double]("score"), r.getAs[Long]("rank"))).toMap
    // zh beats everyone it meets; de loses everything ⇒ rank order
    assert(byItem("zh")._4 == 1L, s"zh should rank 1: $byItem")
    assert(byItem("en")._4 == 2L)
    assert(byItem("de")._4 == 5L)
    // de never wins (lift gap 200 > intra-noise 2): zero wins, score → ~0
    assert(byItem("de")._1 == 0L && byItem("de")._3 < 0.01)
    // scores are a normalized simplex (6dp rounding tolerance)
    val sum = out.map(_.getAs[Double]("score")).sum
    assert(math.abs(sum - 1.0) < 5e-6, s"scores must sum to 1, got $sum")
    // each match produces exactly one win: Σ wins = Σ matches / 2
    assert(out.map(_.getAs[Long]("wins")).sum * 2 ==
      out.map(_.getAs[Long]("matches")).sum)
  }

  test("bradleyTerry fitted strengths reproduce empirical win rates (MM fixed point)") {
    // With only two langs actually meeting (others absent), the BT win
    // probability p_a/(p_a+p_b) must equal the empirical rate at the MM
    // fixed point. 3 langs present pairwise: check one pair's implied
    // probability against its empirical w/n within convergence slack.
    val rows = (0L until 200L).flatMap { i =>
      // en beats de 3 of 4 meetings; zh beats en 1 of 2; zh beats de 1 of 2
      Seq(
        (i * 10 + 0, "x", "de", "s0", if (i % 4 == 0) 100L else 10L),
        (i * 10 + 1, "x", "en", "s0", 50L),
        (i * 10 + 2, "x", "zh", "s0", if (i % 2 == 0) 60L else 40L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Preference.bradleyTerry(spark, rows).collect()
      .map(r => r.getAs[String]("item") -> r.getAs[Double]("score")).toMap
    val pEnDe = out("en") / (out("en") + out("de"))
    assert(pEnDe > 0.6 && pEnDe < 0.9, s"implied P(en>de) ≈ 0.75, got $pEnDe")
  }

  test("bradleyTerryByRegime fits regimes independently") {
    // Short regime: en longer; long regime: de longer — opposite ranks.
    val rows = (0L until 120L).flatMap { i =>
      Seq(
        (i * 4 + 0, "x", "de", "s0", 10L + i % 2),
        (i * 4 + 1, "x", "en", "s0", 100L + i % 2),
        (i * 4 + 2, "x", "de", "s1", 900L + i % 2),
        (i * 4 + 3, "x", "en", "s1", 500L + i % 2))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Preference.bradleyTerryByRegime(spark, rows).collect()
    val rank = out.map(r => (r.getAs[String]("regime"), r.getAs[String]("item")) ->
      r.getAs[Long]("rank")).toMap
    assert(rank(("short", "en")) < rank(("short", "de")))
    assert(rank(("long", "de")) < rank(("long", "en")))
  }

  test("fitDiagnostics: two-item fit reproduces the empirical rate (residual ~ 0)") {
    // with exactly two items the BT fixed point IS the empirical win
    // rate, so the model-expected wins match the observed ones up to
    // MM convergence slack
    val rows = (0L until 200L).flatMap { i =>
      Seq((i * 10 + 0, "x", "de", "s0", if (i % 4 == 0) 100L else 10L),
        (i * 10 + 1, "x", "en", "s0", 50L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Preference.fitDiagnostics(spark, rows).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("i") == "de" && r.getAs[String]("j") == "en")
    assert(math.abs(r.getAs[Double]("residual")) < 0.01,
      s"two-item residual should vanish at the fixed point: $r")
    assert(math.abs(r.getAs[Double]("expected_wins") - r.getAs[Long]("wins_i")) < 0.01)
  }

  test("dpoPairs: chosen is the lexically richer doc, ties and cross-cell pairs drop") {
    val docs = Seq(
      (0L, "a b c d e", "en", "s0", 9L),   // 5 unique
      (8L, "a a a b b", "en", "s0", 9L),   // 2 unique — if co-celled with 0: rejected
      (1L, "x y", "de", "s0", 3L),         // different lang: never pairs with en
      (2L, "p q r", "en", "s1", 5L))       // different source: never pairs with s0
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Preference.dpoPairs(docs).collect()
    // pairs only form within (source, blk, lang); whatever the hash
    // blocking, any emitted pair must respect the invariants:
    out.foreach { r =>
      assert(r.getAs[Int]("chosen_uq") > r.getAs[Int]("rejected_uq"))
      assert(r.getAs[Int]("gap") ==
        r.getAs[Int]("chosen_uq") - r.getAs[Int]("rejected_uq"))
    }
    // and if docs 0 and 8 share a block, the richer one is chosen
    out.find(r => Set(r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id")) == Set(0L, 8L))
      .foreach { r =>
        assert(r.getAs[Long]("chosen_id") == 0L && r.getAs[Int]("chosen_uq") == 5)
      }
    // cross-lang and cross-source pairs are structurally absent
    assert(!out.exists(r => Set(r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"))
      .intersect(Set(1L, 2L)).nonEmpty && Set(r.getAs[Long]("chosen_id"),
      r.getAs[Long]("rejected_id")).intersect(Set(0L, 8L)).nonEmpty))
  }

  test("tCloseness: planted skewed classes score EMD 0.5, the global-matching class scores 0") {
    // two sensitive buckets (acctbal 500 → 0, 2500 → 2); class 1 sits
    // entirely in the low bucket, class 2 entirely in the high one,
    // class 3 matches the global 50/50 split exactly
    val df = (
      (0 until 10).map(_ => (1, "A", 500.0)) ++
      (0 until 10).map(_ => (2, "A", 2500.0)) ++
      (0 until 5).flatMap(_ => Seq((3, "A", 500.0), (3, "A", 2500.0))))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val out = Privacy.tCloseness(df).collect()
      .map(r => r.getAs[Int]("nation") ->
        (r.getAs[Double]("t_dist"), r.getAs[Boolean]("meets_t"))).toMap
    // v = 2, so EMD = |p_low − q_low|: skewed classes |1 − 0.5| = 0.5,
    // the matching class exactly 0
    assert(out(1) == (0.5, false))
    assert(out(2) == (0.5, false))
    assert(out(3) == (0.0, true))
  }

  test("dpAccountant: exact basic/zCDP bounds, the tighter charged, planted over-budget flips the flag") {
    // planted ledger: 60 releases of ε = 0.5 each (eps_micro 500000),
    // nation 0..59, one segment — basic crosses the 2.0 budget at
    // release 5, and the √k zCDP bound overtakes basic past
    // k ≈ 2·ln(1/δ)/(1 − ε/2)² ≈ 49, so BOTH regimes appear in one
    // table
    val led = (0 until 60).map(n => (n, "A", 500000L))
      .toDF("nation", "segment", "eps_micro")
    val out = Privacy.dpAccountant(led).collect()
      .map(r => r.getAs[Long]("n_releases") -> r).toMap
    val lnInvDelta = math.log(1.0 / Privacy.DefaultDeltaTarget)
    def zcdp(k: Int): Double = {
      val rho = k * 0.125 // k · ε²/2 = k · 0.25/2
      // HALF_UP at 6dp — the same rounding Spark's round() applies
      BigDecimal(rho + 2.0 * math.sqrt(rho * lnInvDelta))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // exact basic prefix: k · 0.5
    assert(out(1L).getAs[Double]("eps_basic") == 0.5 &&
      out(4L).getAs[Double]("eps_basic") == 2.0 &&
      out(60L).getAs[Double]("eps_basic") == 30.0)
    // the flag flips exactly where the tighter bound crosses 2.0:
    // release 4 spends 2.0 (within), release 5 spends 2.5 (over)
    assert(out(4L).getAs[Boolean]("within_budget"))
    assert(!out(5L).getAs[Boolean]("within_budget"))
    // zCDP matches the closed form, is looser than basic early and
    // TIGHTER past the crossover; eps_spent = min
    (1 to 60).foreach { k =>
      val r = out(k.toLong)
      assert(r.getAs[Double]("eps_zcdp") == zcdp(k))
      assert(r.getAs[Double]("eps_spent") ==
        math.min(r.getAs[Double]("eps_basic"), r.getAs[Double]("eps_zcdp")))
    }
    assert(out(5L).getAs[Double]("eps_zcdp") > out(5L).getAs[Double]("eps_basic"))
    assert(out(60L).getAs[Double]("eps_zcdp") < out(60L).getAs[Double]("eps_basic"))
    // spend is monotone nondecreasing in the release count (both
    // bounds accumulate), so once over budget, always over
    (2 to 60).foreach { k =>
      assert(out(k.toLong).getAs[Double]("eps_spent") >=
        out(k.toLong - 1).getAs[Double]("eps_spent"))
    }
  }

  test("dpAccountantHetero: δ budget binds before ε on a Gaussian campaign; zCDP path stays valid; crossover moves with ρ") {
    import Privacy.{DefaultDeltaBudget, DefaultDeltaTarget}
    val lnInvDelta = math.log(1.0 / DefaultDeltaTarget)
    def r(x: Double, dp: Int): Double =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    // planted Gaussian campaign: 60 releases of ε = 0.01, δ = 2.5e-7,
    // 2ρ = ε²/2 in micro² (the ledger's gaussian rule). Σδ crosses the
    // 1e-5 δ budget at release 41 (40·250 = 10000 nano = the budget)
    // while Σε = 0.41 is far under the 2.0 ε budget — the regime the
    // pure-ε accountant cannot see. The zCDP certificate (conversion
    // δ = 1e-6, no Σδ) stays valid, so within_budget holds even after
    // basic's δ runs out.
    val gauss = (0 until 60).map(n =>
      (n, "A", "gaussian", 10000L, 250L, 10000L * 10000L / 2L))
      .toDF("nation", "segment", "mechanism", "eps_micro", "delta_nano", "rho2")
    val out = Privacy.dpAccountantHetero(gauss).collect()
      .map(x => x.getAs[Long]("n_releases") -> x).toMap
    (1 to 60).foreach { k =>
      val row = out(k.toLong)
      assert(row.getAs[Double]("eps_basic") == r(k * 0.01, 6))
      assert(row.getAs[Double]("delta_basic") == r(k * 250.0 / 1.0e9, 9))
      val rho = k * (10000.0 * 10000.0 / 2.0) / 2.0e12
      assert(row.getAs[Double]("eps_zcdp") ==
        r(rho + 2.0 * math.sqrt(rho * lnInvDelta), 6))
      assert(row.getAs[Boolean]("zcdp_within"))
      assert(row.getAs[Boolean]("basic_within") == (k * 250L <= 10000L))
      assert(row.getAs[Boolean]("within_budget")) // zCDP rescues the tail
    }
    assert(out(40L).getAs[Boolean]("basic_within") &&
      !out(41L).getAs[Boolean]("basic_within") &&
      out(41L).getAs[Double]("eps_basic") < 2.0) // δ bound, not ε
    // the zCDP-vs-basic crossover MOVES with the mechanism's ρ: at the
    // same ε = 0.5 grid, Gaussian rows carry ρ = ε²/4 vs Laplace's
    // ε²/2, so the √k bound overtakes basic roughly twice as early
    def crossover(rho2PerRelease: Long, mech: String): Int = {
      val led = (0 until 60).map(n => (n, "A", mech, 500000L, 0L, rho2PerRelease))
        .toDF("nation", "segment", "mechanism", "eps_micro", "delta_nano", "rho2")
      Privacy.dpAccountantHetero(led).collect()
        .filter(x => x.getAs[Double]("eps_zcdp") < x.getAs[Double]("eps_basic"))
        .map(_.getAs[Long]("n_releases")).min.toInt
    }
    val kLap = crossover(500000L * 500000L, "laplace")
    val kGauss = crossover(500000L * 500000L / 2L, "gaussian")
    assert(kGauss < kLap, s"crossover should move: gauss=$kGauss lap=$kLap")
    // δ target above the δ budget is an invalid configuration
    intercept[IllegalArgumentException] {
      Privacy.dpAccountantHetero(gauss, deltaBudget = 1e-7)
    }
  }

  test("dpAccountantSubsampled: exact amplification per release, monotone in q, composition matches dpAccountant on the amplified ledger") {
    // synthetic 4-class customer slice covering all four q arms
    val cust = Seq(
      (0, "AAAA"), (1, "AAAA"), (2, "AAAA"), (3, "AAAA"))
      .toDF("c_nationkey", "c_mktsegment")
    val led = Privacy.dpAccountantSubsampledLedger(cust)
      .collect().map(r => r.getAs[Int]("nation") ->
        (r.getAs[Long]("eps_micro"), r.getAs[Long]("q_ppm"),
          r.getAs[Long]("eps_amp_micro"))).toMap
    // per-release closed form, recomputed independently; amplification
    // strictly shrinks ε for q < 1
    led.foreach { case (_, (em, qp, am)) =>
      val expect = math.round(
        math.log(1.0 + (qp / 1.0e6) * (math.exp(em / 1.0e6) - 1.0)) * 1.0e6)
      assert(am == expect && am < em)
    }
    // q arms land as planted: nation % 4 cycles the PPM table (the q
    // key is DECOUPLED from the ε key, so the ledger covers the cross
    // product)
    assert(led(0)._2 == 10000L && led(1)._2 == 50000L &&
      led(2)._2 == 100000L && led(3)._2 == 250000L)
    // the q=5% ε=0.25 example from the docstring: ~18× cheaper
    val e25 = Privacy.dpAccountantSubsampledLedger(
      // ε arm (1+6)%4=3 → 0.25; q arm 1%4=1 → 5%
      Seq((1, "AAAAAA")).toDF("c_nationkey", "c_mktsegment"))
      .collect()(0)
    assert(e25.getAs[Long]("eps_micro") == 250000L &&
      e25.getAs[Long]("q_ppm") == 50000L &&
      e25.getAs[Long]("eps_amp_micro") == 14101L) // ln(1+0.05·(e^0.25−1))·1e6
    // composition of the amplified guarantees IS dpAccountant over a
    // ledger whose eps_micro is the amplified value — cross-checked
    // against the existing operator, column for column
    val full = Privacy.dpAccountantSubsampledLedger(cust).localCheckpoint(true)
    val sub = Privacy.dpAccountantSubsampled(full).collect()
      .map(r => (r.getAs[Long]("n_releases"), r.getAs[Double]("eps_basic"),
        r.getAs[Double]("eps_zcdp"), r.getAs[Boolean]("within_budget")))
    val ref = Privacy.dpAccountant(full.select(col("nation"), col("segment"),
      col("eps_amp_micro").as("eps_micro"))).collect()
      .map(r => (r.getAs[Long]("n_releases"), r.getAs[Double]("eps_basic"),
        r.getAs[Double]("eps_zcdp"), r.getAs[Boolean]("within_budget")))
    assert(sub.toSeq == ref.toSeq)
  }

  test("dpAccountantRdp: α=2 closed form, Gaussian-RDP dominance, α-monotone steps, best_alpha moves down a planted campaign") {
    import Privacy.RdpAlphas
    // 4-arm synthetic: segment lengths chosen so (nation + len) % 4 = 0
    // on every row — σ pinned at 0.8 while nation % 4 cycles q through
    // {0.1%, 0.5%, 1%, 2.5%} (the decoupled-key posture, isolating q)
    val cust = Seq(
      (0, "AAAAAAAA"), (1, "AAAAAAA"), (2, "AAAAAA"), (3, "AAAAA"))
      .toDF("c_nationkey", "c_mktsegment")
    val led = Privacy.dpAccountantRdpLedger(cust).collect()
      .map(r => r.getAs[Int]("nation") -> r).toMap
    assert(led(0).getAs[Long]("q_ppm") == 1000L &&
      led(3).getAs[Long]("q_ppm") == 25000L &&
      led.values.forall(_.getAs[Long]("sigma_milli") == 800L))
    led.values.foreach { r =>
      val q = r.getAs[Long]("q_ppm") / 1.0e6
      val s = r.getAs[Long]("sigma_milli") / 1.0e3
      // α = 2 admits the known closed form ε(2) = ln(1 + q²(e^{1/σ²}−1))
      // (the binomial sum telescopes); recomputed independently here, so
      // association order differs from the operator's unrolled sum —
      // allow the ceil to sit one micro-unit apart
      val closed = math.ceil(
        math.log(1.0 + q * q * (math.exp(1.0 / (s * s)) - 1.0)) * 1.0e6).toLong
      assert(math.abs(r.getAs[Long]("e_a2") - closed) <= 1L,
        s"e_a2=${r.getAs[Long]("e_a2")} closed=$closed")
      // subsampling only helps: ε_sub(α) ≤ α/(2σ²), the unsubsampled
      // Gaussian RDP (weights sum to 1 under the max term)
      RdpAlphas.foreach { a =>
        assert(r.getAs[Long](s"e_a$a") <=
          math.ceil(a / (2.0 * s * s) * 1.0e6).toLong + 1L)
      }
      // Rényi divergence is nondecreasing in the order
      RdpAlphas.sliding(2).foreach { case Seq(a, b) =>
        assert(r.getAs[Long](s"e_a$a") <= r.getAs[Long](s"e_a$b"))
      }
    }
    // per-step ε strictly increases with q at fixed σ, every order
    RdpAlphas.foreach { a =>
      val e = (0 to 3).map(n => led(n).getAs[Long](s"e_a$a"))
      assert(e == e.sorted && e.distinct.size == 4, s"alpha=$a: $e")
    }
    // planted campaign: 60 identical runs (q = 2.5%, σ = 0.8, T = 400 —
    // nation 3, 5-char segments keep every arm fixed while the class
    // key varies). The conversion trade-off makes best_alpha MOVE down
    // the ledger: large orders early (cheap ln(1/δ)/(α−1) penalty),
    // smaller orders as Σ T·ε_step(α) accumulates — nonincreasing, with
    // at least two distinct orders visited; eps_spent is nondecreasing
    // (budget once exceeded stays exceeded)
    val campaign = Privacy.dpAccountantRdp(
      Privacy.dpAccountantRdpLedgerFromClasses(
        (0 until 60).map(i => (3, f"S$i%04d"))
          .toDF("nation", "segment"))).collect()
    assert(campaign.length == 60 &&
      campaign.head.getAs[Long]("steps") == 400L)
    val byN = campaign.map(r => r.getAs[Long]("n_releases") -> r).toMap
    (2 to 60).foreach { k =>
      assert(byN(k.toLong).getAs[Double]("eps_spent") >=
        byN(k.toLong - 1).getAs[Double]("eps_spent"))
      assert(byN(k.toLong).getAs[Int]("best_alpha") <=
        byN(k.toLong - 1).getAs[Int]("best_alpha"))
    }
    assert(campaign.map(_.getAs[Int]("best_alpha")).distinct.length >= 2,
      campaign.map(_.getAs[Int]("best_alpha")).distinct.toSeq.toString)
    // the budget page fires mid-campaign on a MILDER planted campaign
    // (q = 1%, σ = 2.0, T = 200 — nation 2, 4-char segments): release 1
    // converts through α = 16 at ≈ 0.97, inside the 2.0 budget; the
    // accumulating spend crosses it near release ~25, and release 60
    // sits at ≈ 3.37 (the harsh movement campaign above is over budget
    // from release 1 — too loud to show the flip)
    val mild = Privacy.dpAccountantRdp(
      Privacy.dpAccountantRdpLedgerFromClasses(
        (0 until 60).map(i => (2, f"S$i%03d"))
          .toDF("nation", "segment"))).collect()
      .map(r => r.getAs[Long]("n_releases") -> r).toMap
    assert(mild(1L).getAs[Long]("steps") == 200L &&
      mild(1L).getAs[Boolean]("within_budget") &&
      !mild(60L).getAs[Boolean]("within_budget"))
    val flips = (2 to 60).count(k =>
      mild(k.toLong).getAs[Boolean]("within_budget") !=
        mild(k.toLong - 1).getAs[Boolean]("within_budget"))
    assert(flips == 1) // monotone spend ⇒ exactly one crossing
  }

  test("dpoPairsCapped: per-chosen cap, margin threshold, top-gap selection vs a driver reference") {
    // 40 docs, one (lang, source); unique-token count varies 1..13 so
    // cells contain many margin-qualified partners per chosen
    val docs = (0L until 40L).map(i =>
      (i, ('a' to ('a' + (i % 13)).toChar).map(_.toString).mkString(" "), "en", "s0", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Preference.dpoPairsCapped(docs, m = 2, minMargin = 3).collect()
    // independent reference: recompute blocks + ranking with plain Scala
    // collections (not the operator's join/heap machinery)
    val blk = docs.select(col("doc_id"),
        pmod(graft.functions.PortableHash.keyHash(col("doc_id")),
          lit(Preference.Blocks.toLong)).as("blk"),
        size(array_distinct(split(col("text"), " "))).as("uq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val expect = (for {
      (c, cb, cu) <- blk.toSeq
      ((r, _, ru), idx) <- blk.toSeq
        .filter { case (r, rb, ru) => rb == cb && cu - ru >= 3 }
        .sortBy { case (r, _, ru) => (-(cu - ru), r) }.take(2).zipWithIndex
    } yield (c, r, cu, ru, cu - ru, idx + 1)).toSet
    val got = out.map(r => (r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
      r.getAs[Int]("chosen_uq"), r.getAs[Int]("rejected_uq"), r.getAs[Int]("gap"),
      r.getAs[Int]("pair_rank"))).toSet
    assert(expect.nonEmpty && got == expect)
    assert(out.groupBy(_.getAs[Long]("chosen_id")).values.forall(_.size <= 2))
    assert(out.forall(_.getAs[Int]("gap") >= 3))
  }

  test("pairsWilson: closed-form interval on a known matrix, decisive iff CI excludes 1/2") {
    // one source, one block-dominant pair set: construct 20 de-en
    // comparisons where en wins 15 (p̂ = .75 for i = de is 5/20 = .25)
    val rows = (0L until 20L).flatMap { i =>
      Seq((i * 2, "x", "de", "s0", if (i < 5) 100L else 10L),
        (i * 2 + 1, "x", "en", "s0", 50L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Preference.pairsWilson(rows).collect()
    val deEn = out.find(r => r.getAs[String]("i") == "de" && r.getAs[String]("j") == "en").get
    val n = deEn.getAs[Long]("matches").toDouble
    val p = deEn.getAs[Long]("wins_i").toDouble / n
    assert(deEn.getAs[Double]("win_rate") == BigDecimal.valueOf(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // reference Wilson bounds computed independently
    val z = Preference.WilsonZ; val z2 = z * z
    val denom = 1.0 + z2 / n
    val center = (p + z2 / (2.0 * n)) / denom
    val half = z * math.sqrt((p * (1 - p)) / n + z2 / (4.0 * n * n)) / denom
    def r6(x: Double) = BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(deEn.getAs[Double]("wilson_lo") == r6(center - half))
    assert(deEn.getAs[Double]("wilson_hi") == r6(center + half))
    // the planted 5/20 matrix sits decisively below 1/2: pin the concrete
    // OUTCOME (not the implementation's own formula) so a broken decision
    // rule cannot satisfy this assertion by mirroring itself
    assert(deEn.getAs[Double]("wilson_hi") < 0.5)
    assert(deEn.getAs[Boolean]("decisive"))
  }

  // --- Retrieval metrics ----------------------------------------------

  private def frame(rows: Seq[(Long, Long, Int)]) =
    rows.toDF("query_id", "neighbor_id", "rank")

  test("retrievalMetrics: identical gold and retrieved give perfect metrics") {
    val r = frame((1 to 5).map(i => (7L, i.toLong, i)))
    val g = r.select(col("query_id"), col("neighbor_id"))
    val m = Similarity.retrievalMetrics(g, r, k = 5).collect()(0)
    assert(m.getAs[Long]("hits") == 5L)
    assert(m.getAs[Double]("recall_at_k") == 1.0)
    assert(m.getAs[Double]("rr") == 1.0)
    assert(m.getAs[Double]("ndcg") == 1.0)
  }

  test("retrievalMetrics: disjoint retrieval gives zero metrics") {
    val g = frame((1 to 5).map(i => (7L, i.toLong, i)))
      .select(col("query_id"), col("neighbor_id"))
    val r = frame((1 to 5).map(i => (7L, (100 + i).toLong, i)))
    val m = Similarity.retrievalMetrics(g, r, k = 5).collect()(0)
    assert(m.getAs[Long]("hits") == 0L)
    assert(m.getAs[Double]("recall_at_k") == 0.0)
    assert(m.getAs[Double]("rr") == 0.0)
    assert(m.getAs[Double]("ndcg") == 0.0)
  }

  test("retrievalMetrics: single hit at rank 3 gives the closed-form values") {
    val g = frame(Seq((7L, 42L, 1))).select(col("query_id"), col("neighbor_id"))
    val r = frame(Seq((7L, 1L, 1), (7L, 2L, 2), (7L, 42L, 3), (7L, 4L, 4), (7L, 5L, 5)))
    val m = Similarity.retrievalMetrics(g, r, k = 5).collect()(0)
    assert(m.getAs[Long]("hits") == 1L)
    assert(m.getAs[Double]("recall_at_k") == 0.2)
    assert(m.getAs[Double]("rr") == 0.333333)
    val expected = BigDecimal.valueOf(Similarity.ndcgGains(5)(2) / Similarity.idcgAt(5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m.getAs[Double]("ndcg") == expected)
  }

  test("retrievalEvalDims: full-width prefix reproduces the gold exactly (metrics = 1)") {
    val e = (0L until 20L).map(i =>
      (i, Array(math.sin(i * 1.7).toFloat, math.cos(i * 2.3).toFloat,
        math.sin(i * 0.9 + 1).toFloat, math.cos(i * 1.1 + 2).toFloat)))
      .toDF("vec_id", "embedding")
    val out = Similarity.retrievalEvalDims(
      e.filter(col("vec_id") < 4), e, k = 3, dims = Seq(2, 4)).collect()
    val full = out.find(_.getAs[Int]("dim") == 4).get
    assert(full.getAs[Double]("mean_recall") == 1.0)
    assert(full.getAs[Double]("mean_rr") == 1.0)
    assert(full.getAs[Double]("mean_ndcg") == 1.0)
    // the truncated prefix can only do as well or worse
    val half = out.find(_.getAs[Int]("dim") == 2).get
    assert(half.getAs[Double]("mean_recall") <= 1.0)
  }

  test("binaryQuantKnn preserves exact ranking for sign-aligned vectors") {
    // Vectors on axes: query q = (1,0,0...); candidate sharing q's sign
    // pattern must outrank one differing in every component.
    val e = Seq(
      (0L, Array(1f, 1f, 1f, 1f)),
      (1L, Array(0.9f, 0.8f, 0.7f, 0.6f)),   // same signs as 0 → dot 4
      (2L, Array(-1f, -1f, -1f, 0.5f)),      // 3 sign flips → dot -2
      (3L, Array(1f, -1f, 1f, -1f)))         // 2 flips → dot 0
      .toDF("vec_id", "embedding")
    val out = Similarity.binaryQuantKnn(e.filter(col("vec_id") === 0), e, k = 3)
      .orderBy(col("rank")).collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 3L, 2L))
    assert(out(0).getAs[Double]("cosine") == 4.0) // exact integer score
  }

  // --- Label propagation -------------------------------------------------

  test("labelPropagation splits two cliques joined by one bridge (CC would merge them)") {
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L).toDF("v")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("a", "b")
    val out = graft.operators.Graph.labelPropagation(nodes, edges, iters = 3)
      .groupBy(col("lbl")).agg(count(lit(1)).as("n"))
      .orderBy(col("lbl")).collect()
    // two communities of 3 — the bridge does not merge the cliques
    assert(out.length == 2, s"expected 2 communities, got ${out.toSeq}")
    assert(out.forall(_.getAs[Long]("n") == 3L))
    // sanity: connected components WOULD merge (everything is reachable)
    val cc = graft.operators.Dedup.connectedComponents(edges, "a", "b").collect()
    assert(cc.map(_.getLong(1)).distinct.length == 1)
  }

  test("modularity: hand-computed exact value on the two-clique bridge graph") {
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L).toDF("v")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("a", "b")
    val labels = graft.operators.Graph.labelPropagation(nodes, edges, iters = 3)
    val q = graft.operators.Graph.modularity(labels, edges).collect()(0)
    // m = 7; two communities, each m_c = 3, d_c = 7 (the bridge counts
    // toward both) ⇒ q_num = 2·(4·7·3 − 49) = 70; Q = 70/196 = 0.357143
    assert(q.getAs[Long]("m_edges") == 7L)
    assert(q.getAs[Long]("q_num") == 70L)
    assert(q.getAs[Double]("modularity") == 0.357143)
  }

  test("refineCommunities merges the positive-gain pair only, with the hand-computed exact gain") {
    // three triangles A={0,1,2}, B={3,4,5}, C={6,7,8}; A and B joined by
    // 4 cross edges, C isolated. m = 13, dA = dB = 10, dC = 6;
    // gain(A,B) = 4·13·4 − 2·10·10 = 8 > 0, no other community pair
    // shares an edge — so the mutual-best matching merges exactly A∪B.
    val labels = Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L,
      5L -> 3L, 6L -> 6L, 7L -> 6L, 8L -> 6L).toDF("v", "lbl")
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L),
      (6L, 7L), (6L, 8L), (7L, 8L), (0L, 3L), (0L, 4L), (1L, 3L), (1L, 4L))
      .toDF("a", "b")
    val refined = graft.operators.Graph.refineCommunities(labels, edges)
    val got = refined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 5L).forall(got(_) == 0L)) // B absorbed into A's root id
    assert((6L to 8L).forall(got(_) == 6L)) // C untouched
    // exact numerator moves by exactly the merge gain: 232 → 240
    val qB = graft.operators.Graph.modularity(labels, edges).collect()(0)
    val qA = graft.operators.Graph.modularity(refined, edges).collect()(0)
    assert(qB.getAs[Long]("q_num") == 232L && qA.getAs[Long]("q_num") == 240L)
    // after the merge no community pair shares an edge → round 2 is a
    // fixed point: iterating must not change the labeling further
    val r3 = graft.operators.Graph.refineCommunitiesRounds(labels, edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3 == got)
  }

  // --- Privacy audits --------------------------------------------------

  private def people = Seq(
    // (custkey, name, nation, acctbal, segment)
    (1L, "a", 1, 150.0, "AUTO"), (2L, "b", 1, 160.0, "AUTO"),
    (3L, "c", 1, 170.0, "AUTO"), (4L, "d", 1, 260.0, "AUTO"),
    (5L, "e", 2, 150.0, "AUTO"), (6L, "f", 2, 150.0, "AUTO"))
    .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  test("kAnonymityProfile: histogram of QI class sizes") {
    val prof = Privacy.kAnonymityProfile(
      people, Seq(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 100.0).cast("long"))).collect()
    // classes: (1,AUTO,1)={1,2,3} size 3; (1,AUTO,2)={4} size 1; (2,AUTO,1)={5,6} size 2
    val m = prof.map(r => r.getAs[Long]("class_size") ->
      (r.getAs[Long]("n_classes"), r.getAs[Long]("n_rows"))).toMap
    assert(m == Map(1L -> (1L, 1L), 2L -> (1L, 2L), 3L -> (1L, 3L)))
  }

  test("lDiversitySummary flags constant-sensitive classes") {
    val s = Privacy.lDiversitySummary(
      people, Seq(col("c_nationkey"), col("c_mktsegment")), col("c_acctbal"))
      .collect()(0)
    // classes: nation 1 (4 rows, 4 distinct bals → l=4), nation 2 (2 rows, l=1)
    assert(s.getAs[Long]("n_classes") == 2L)
    assert(s.getAs[Long]("min_l") == 1L)
    assert(s.getAs[Long]("classes_l1") == 1L)
    assert(s.getAs[Long]("rows_l1") == 2L)
  }

  test("dpRelease suppresses sub-k classes and adds the closed-form Laplace noise") {
    // nation 1 has 4 rows (< k=4? use k=3: released), nation 2 has 2 (< 3: suppressed)
    val out = graft.operators.Privacy.dpRelease(people, k = 3L, eps = 0.5).collect()
    assert(out.map(_.getAs[Int]("c_nationkey")).toSeq == Seq(1))
    val r = out.head
    // independent mirror of the inverse-CDF draw for key 1
    val P = graft.functions.PortableHash.P
    val h = ((1L % P) * graft.functions.PortableHash.A) % P
    val u = (h.toDouble + 0.5) / P.toDouble
    val v = u - 0.5
    val noise = -2.0 * (if (v >= 0) 1.0 else -1.0) * math.log(1.0 - 2.0 * math.abs(v))
    val expected = BigDecimal.valueOf(4.0 + noise)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("n_released") == expected)
    assert(r.getAs[Double]("epsilon") == 0.5)
  }

  test("generalizationLadder picks the first level meeting k, and floor buckets compose") {
    val lad = Privacy.generalizationLadder(people, k = 4L)
      .orderBy(col("level")).collect()
    assert(lad.length == 4)
    // level 0 min_k = 1; level 1 (bal/1000 → all bucket 0): classes are
    // (1,AUTO)=4 rows, (2,AUTO)=2 → min 2; level 2 same; level 3 (AUTO)=6 ≥ 4
    assert(lad(0).getAs[Long]("min_k") == 1L && !lad(0).getAs[Boolean]("chosen"))
    assert(lad(3).getAs[Long]("min_k") == 6L && lad(3).getAs[Boolean]("chosen"))
    assert(lad.count(_.getAs[Boolean]("chosen")) == 1)
    // floor composition incl. negatives: floor(x/1000) == floor(floor(x/100)/10)
    for (x <- Seq(-1950.0, -100.0, -1.0, 0.0, 99.9, 1049.5))
      assert(math.floor(x / 1000.0) == math.floor(math.floor(x / 100.0) / 10.0))
  }

  test("generalizationLadder level-1+ rows re-aggregate level 0 (single corpus scan)") {
    // Structural: all four level readouts consume the CHECKPOINTED level-0
    // class table — the corpus relation appears in no branch (it was
    // scanned exactly once, into the checkpoint).
    val plan = Privacy.generalizationLadder(people, k = 5L)
      .queryExecution.optimizedPlan
    val corpusScans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    val rddLeaves = plan.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }
    assert(corpusScans.isEmpty,
      s"every level must read the checkpointed class table, found ${corpusScans.length} corpus scans")
    assert(rddLeaves.distinct.length == 1 && rddLeaves.length == 4,
      s"expected 4 reads of one checkpoint, got $rddLeaves")
  }
}
