package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Time-series similarity search over event streams (the streaming-data
  * similarity-search shape): bucket each key's activity into a fixed-width
  * time series, then find the most-correlated key pairs.
  *
  * Scale shape: the candidate set is bounded FIRST (top-`topUsers` most
  * active keys — a (key,count) aggregate + TakeOrdered, broadcast back as a
  * semi-filter), so the pair join is over `topUsers²/2` series pairs, never
  * all-keys². Series align on the bucket equi-join (co-active buckets);
  * Pearson correlation is a single partial-merge aggregate per pair — no
  * per-pair sort, no windowed re-scan.
  */
object TimeSeries {

  /** Most-correlated co-activity pairs among the `topUsers` most active
    * users: hourly count series, Pearson corr over hours where BOTH are
    * active (co-active buckets), at least `minOverlap` shared hours.
    * Correlation is rounded before ranking so the order is stable across
    * engines; ties break on the user ids. */
  def correlatedActivity(events: DataFrame, topUsers: Int = 20, minOverlap: Int = 24): DataFrame = {
    val series = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).cast(DoubleType).as("n"))
    val top = events
      .groupBy(col("user_id")).agg(count(lit(1)).as("total"))
      .orderBy(col("total").desc, col("user_id"))
      .limit(topUsers)
      .select(col("user_id"))
    val s = series.join(broadcast(top), Seq("user_id"))
    val a = s.select(col("user_id").as("user_a"), col("bucket"), col("n").as("na"))
    val b = s.select(col("user_id").as("user_b"), col("bucket"), col("n").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("user_a") < col("user_b"))
      .groupBy(col("user_a"), col("user_b"))
      .agg(count(lit(1)).as("n_overlap"),
        covar_samp(col("na"), col("nb")).as("cv"),
        stddev_samp(col("na")).as("sa"),
        stddev_samp(col("nb")).as("sb"))
      .filter(col("n_overlap") >= minOverlap)
      // Pearson spelled out with a zero-variance guard: built-in `corr`
      // raises DIVIDE_BY_ZERO under ANSI when a series is constant; the
      // guarded form yields NULL there (matching SQL corr semantics).
      .select(col("user_a"), col("user_b"), col("n_overlap"),
        round(when(col("sa") > 0 && col("sb") > 0,
          col("cv") / (col("sa") * col("sb"))), 4).as("activity_corr"))
      .orderBy(col("activity_corr").desc_nulls_last, col("user_a"), col("user_b"))
      .limit(25)
  }

  /** Autocorrelation function of a daily aggregate series at lags
    * 1..`maxLag` — the seasonality probe (weekly cycles show as a lag-7
    * peak). Pearson r per lag from EXACT decimal sums (Σx, Σy, Σxy, Σx²,
    * Σy² all DECIMAL before ONE cast to double), so the result is
    * bit-portable despite double arithmetic at the end.
    *
    * Scale shape: the raw table aggregates DISTRIBUTED to one row per
    * day; only that bounded series (the date domain, not the row count)
    * flows through the ordered lead() window and the per-lag one-row
    * aggregates. The series is cached once and reused by all lags. */
  def autocorrelation(
      df: DataFrame, dateCol: String, moneyValue: Column, maxLag: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.dec2
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val series = df.groupBy(col(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
    val w = Window.orderBy(col("d"))
    val leads = series.select(
      col("rev") +: (1 to maxLag).map(k => lead(col("rev"), k).over(w).as(s"y$k")): _*)
      .cache()
    val rows = (1 to maxLag).map { k =>
      val y = col(s"y$k")
      val pairs = leads.filter(y.isNotNull)
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(col("rev")).as("sx"), sum(y).as("sy"),
          sum(col("rev") * y).as("sxy"),
          sum(col("rev") * col("rev")).as("sxx"), sum(y * y).as("syy"))
      val nD = col("n_pairs").cast(DoubleType)
      val (sx, sy) = (col("sx").cast(DoubleType), col("sy").cast(DoubleType))
      val (sxy, sxx, syy) =
        (col("sxy").cast(DoubleType), col("sxx").cast(DoubleType), col("syy").cast(DoubleType))
      val r = (nD * sxy - sx * sy) /
        sqrt((nD * sxx - sx * sx) * (nD * syy - sy * sy))
      pairs.select(lit(k).as("lag"), col("n_pairs"), round(r, 6).as("acf"))
    }
    val out = rows.reduce(_ unionByName _).orderBy(col("lag"))
    out
  }

  /** Per-`byCol`-segment autocorrelation — does the weekly rhythm hold
    * in every segment, or is the global lag-7 peak one segment's
    * artifact? Exactly [[autocorrelation]] with the segment riding the
    * day aggregation and every lead window / moment aggregate
    * partitioned by it. The windows still sit on the aggregation-bounded
    * (segment, day) domain — ≤ |segments|·days rows, the repo's window
    * discipline — and each lag's Pearson moments stay exact decimal
    * sums with one double cast. Segments with fewer than 2 pairs at a
    * lag yield a NULL acf for that (segment, lag) (zero variance has no
    * correlation), as in the global form. */
  def autocorrelationBy(
      df: DataFrame, dateCol: String, moneyValue: Column, byCol: String,
      maxLag: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.dec2
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val series = df.groupBy(col(byCol).as("__g"), col(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
    val w = Window.partitionBy(col("__g")).orderBy(col("d"))
    val leads = series.select(
      col("__g") +: col("rev") +:
        (1 to maxLag).map(k => lead(col("rev"), k).over(w).as(s"y$k")): _*)
      .cache()
    val rows = (1 to maxLag).map { k =>
      val y = col(s"y$k")
      val pairs = leads.filter(y.isNotNull)
        .groupBy(col("__g"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(col("rev")).as("sx"), sum(y).as("sy"),
          sum(col("rev") * y).as("sxy"),
          sum(col("rev") * col("rev")).as("sxx"), sum(y * y).as("syy"))
      val nD = col("n_pairs").cast(DoubleType)
      val (sx, sy) = (col("sx").cast(DoubleType), col("sy").cast(DoubleType))
      val (sxy, sxx, syy) =
        (col("sxy").cast(DoubleType), col("sxx").cast(DoubleType), col("syy").cast(DoubleType))
      val r = (nD * sxy - sx * sy) /
        sqrt((nD * sxx - sx * sx) * (nD * syy - sy * sy))
      pairs.select(col("__g"), lit(k).as("lag"), col("n_pairs"), round(r, 6).as("acf"))
    }
    rows.reduce(_ unionByName _)
      .select(col("__g").as(byCol), col("lag"), col("n_pairs"), col("acf"))
      .orderBy(byCol, "lag")
  }

  /** Ljung–Box portmanteau test on the daily money series — the ONE-
    * NUMBER whiteness gate over the first `maxLag` autocorrelations
    * ("is there ANY serial structure left?"), the standard residual
    * diagnostic behind [[forecastBacktest]]: if Q is small the naive
    * forecast already exhausted the signal; if large, a real model would
    * beat it. Q = n(n+2)·Σ_{k≤m} r_k²/(n−k), df = m, with r_k the
    * fixed-mean autocorrelation c_k/c_0 (the Box–Jenkins definition —
    * NOT the per-lag Pearson of [[autocorrelation]], which re-centers
    * each lag's overlap separately).
    *
    * Exactness: expand c_k and c_0 around the exact integer-cents sums —
    * numerator×n² = n²·Σx_t·x_{t+k} − n·S·(H_k+T_k) + (n−k)·S², and
    * denominator×n² = n·(n·SS − S²) — all exact DECIMAL(38,0) integers
    * (good to ~$50B/day across ~30 years: 4n³C² < 10³⁸ at n = 10⁴ days,
    * C = 5·10¹² cents), ONE double conversion per ratio, and a fixed
    * left-fold Q chain the oracle replays term by term. The naive
    * double-mean spelling would hash-diverge on the c_0 cancellation.
    *
    * Scale shape: the raw scan collapses to the bounded DAY domain
    * first; the lag leads and the single moment aggregate run over that
    * calendar-bounded table only (the [[autocorrelation]] discipline) —
    * one aggregate job, no per-lag re-scan. Q is NULL when n ≤ maxLag
    * or the series is constant (c_0 = 0) — fail-soft. */
  def ljungBox(
      df: DataFrame, dateCol: String, moneyValue: Column, maxLag: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.dec2
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // to_date key: the day domain is calendar-bounded (and DATE-typed,
    // which the ScaleSpec window guard verifies structurally)
    val series = df.groupBy(to_date(col(dateCol)).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .select(col("d"), (col("rev") * 100).cast(dec38).as("x"))
    val w = Window.orderBy(col("d"))
    val leads = series.select(
      col("x") +: (1 to maxLag).map(k => lead(col("x"), k).over(w).as(s"y$k")): _*)
    val aggs = Seq(
      count(lit(1)).cast(dec38).as("n"),
      sum(col("x")).as("s"),
      sum(col("x") * col("x")).as("ss")) ++
      (1 to maxLag).flatMap { k =>
        val y = col(s"y$k")
        Seq(
          count(y).cast(dec38).as(s"c$k"),
          sum(when(y.isNotNull, col("x") * y)).as(s"sxy$k"),
          sum(when(y.isNotNull, col("x"))).as(s"sh$k"),
          sum(y).as(s"st$k"))
      }
    val one = leads.agg(aggs.head, aggs.tail: _*)
    val nD = col("n").cast(DoubleType)
    val den = (col("n") * (col("n") * col("ss") - col("s") * col("s")))
      .cast(DoubleType)
    val terms = (1 to maxLag).map { k =>
      val num = (col("n") * col("n") * coalesce(col(s"sxy$k"), lit(0).cast(dec38)) -
        col("n") * col("s") *
          (coalesce(col(s"sh$k"), lit(0).cast(dec38)) +
            coalesce(col(s"st$k"), lit(0).cast(dec38))) +
        col(s"c$k") * col("s") * col("s")).cast(DoubleType)
      val r = num / den
      r * r / (nD - lit(k.toDouble))
    }
    val q = nD * (nD + lit(2.0)) * terms.reduce(_ + _)
    one.select(
      col("n").cast("long").as("n_days"),
      lit(maxLag).as("lags"),
      round(when(col("n") > maxLag && den =!= lit(0.0), q), 6).as("q_stat"))
  }

  /** Per-`byCol`-segment Ljung–Box — is the leftover serial structure a
    * corpus-wide property or one segment's? Exactly [[ljungBox]] with
    * the segment riding the day aggregation, the lead windows and the
    * single moment aggregate (all on the (segment, day) domain,
    * ≤ |segments|·days rows). Per-segment Q is NULL under the same
    * fail-soft conditions (n ≤ maxLag or a constant segment). */
  def ljungBoxBy(
      df: DataFrame, dateCol: String, moneyValue: Column, byCol: String,
      maxLag: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.dec2
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(col(byCol).as("__g"), to_date(col(dateCol)).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .select(col("__g"), col("d"), (col("rev") * 100).cast(dec38).as("x"))
    val w = Window.partitionBy(col("__g")).orderBy(col("d"))
    val leads = series.select(
      col("__g") +: col("x") +:
        (1 to maxLag).map(k => lead(col("x"), k).over(w).as(s"y$k")): _*)
    val aggs = Seq(
      count(lit(1)).cast(dec38).as("n"),
      sum(col("x")).as("s"),
      sum(col("x") * col("x")).as("ss")) ++
      (1 to maxLag).flatMap { k =>
        val y = col(s"y$k")
        Seq(
          count(y).cast(dec38).as(s"c$k"),
          sum(when(y.isNotNull, col("x") * y)).as(s"sxy$k"),
          sum(when(y.isNotNull, col("x"))).as(s"sh$k"),
          sum(y).as(s"st$k"))
      }
    val one = leads.groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
    val nD = col("n").cast(DoubleType)
    val den = (col("n") * (col("n") * col("ss") - col("s") * col("s")))
      .cast(DoubleType)
    val terms = (1 to maxLag).map { k =>
      val num = (col("n") * col("n") * coalesce(col(s"sxy$k"), lit(0).cast(dec38)) -
        col("n") * col("s") *
          (coalesce(col(s"sh$k"), lit(0).cast(dec38)) +
            coalesce(col(s"st$k"), lit(0).cast(dec38))) +
        col(s"c$k") * col("s") * col("s")).cast(DoubleType)
      val r = num / den
      r * r / (nD - lit(k.toDouble))
    }
    val q = nD * (nD + lit(2.0)) * terms.reduce(_ + _)
    one.select(
      col("__g").as(byCol),
      col("n").cast("long").as("n_days"),
      lit(maxLag).as("lags"),
      round(when(col("n") > maxLag && den =!= lit(0.0), q), 6).as("q_stat"))
      .orderBy(byCol)
  }

  /** Wald–Wolfowitz runs test on the daily money series — the
    * DISTRIBUTION-FREE randomness gate [[ljungBox]] is not: it sees only
    * the SIGN pattern around the series median (runs of above/below), so
    * it catches regime stickiness and slow oscillation even when
    * magnitudes are wild enough to swamp correlation-based tests. Days
    * equal to the median drop (the standard tie rule); R = number of
    * sign runs, z = (R − μ)/σ with μ = 2n₊n₋/N + 1 and
    * σ² = 2n₊n₋(2n₊n₋ − N)/(N²(N−1)).
    *
    * Exactness: n₊, n₋ and R are exact integers (the median is the
    * discrete rank-⌈n/2⌉ pick, an actual cents value, so sign
    * comparisons are exact decimal); ONE double chain computes z,
    * spelled identically in the oracle. z is NULL when either side is
    * empty or σ² = 0 (2n₊n₋ ≤ N) — fail-soft, the counts remain.
    *
    * Scale shape: everything after the one keyed day pre-agg runs on
    * the calendar-bounded day domain (rank window, 1-row median
    * broadcast, lag window, final fold) — the [[cusumChangepoint]]
    * shape. */
  def runsTest(df: DataFrame, dateCol: Column, moneyValue: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.dec2
    val series = df.groupBy(to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
    val cnt = series.agg(count(lit(1)).as("__c"))
    val med = series
      .withColumn("__rn", row_number().over(Window.orderBy(col("rev"), col("d"))))
      .crossJoin(broadcast(cnt))
      .filter(col("__rn") === expr("(__c + 1) div 2"))
      .select(col("rev").as("__med"))
    val signed = series.crossJoin(broadcast(med))
      .filter(col("rev") =!= col("__med"))
      .select(col("d"), (col("rev") > col("__med")).as("up"))
    val wd = Window.orderBy(col("d"))
    val trans = signed.select(
      col("up"), lag(col("up"), 1).over(wd).as("prev"))
    val agg = trans.agg(
      count(when(col("up"), 1)).as("n_plus"),
      count(when(!col("up"), 1)).as("n_minus"),
      sum(when(col("prev").isNotNull && (col("up") =!= col("prev")), 1L)
        .otherwise(0L)).as("__t"))
    val p = col("n_plus").cast(DoubleType)
    val q = col("n_minus").cast(DoubleType)
    val runs = when(col("n_plus") + col("n_minus") > 0, col("__t") + 1)
    val mu = lit(2.0) * p * q / (p + q) + lit(1.0)
    val sig2 = lit(2.0) * p * q * (lit(2.0) * p * q - (p + q)) /
      ((p + q) * (p + q) * (p + q - lit(1.0)))
    val z = (runs.cast(DoubleType) - mu) / sqrt(sig2)
    agg.select(
      col("n_plus"), col("n_minus"), runs.as("runs"),
      round(when(col("n_plus") > 0 && col("n_minus") > 0 &&
        col("n_plus") * col("n_minus") * 2 > col("n_plus") + col("n_minus"), z), 6)
        .as("z_stat"))
  }

  /** Per-`byCol`-segment runs test — each segment's sign pattern judged
    * around ITS OWN median (the grouped-gate convention). Exactly
    * [[runsTest]] with the segment riding every key: per-segment rank
    * pick (windows on the (segment, day) domain), segment-bounded median
    * broadcast, partitioned lag, one keyed fold. A segment whose every
    * day ties its median has no sign rows and DROPS (the
    * [[graft.operators.Robust.ksStatisticBy]] drop contract); the global
    * form instead emits its zero-count row. */
  def runsTestBy(
      df: DataFrame, dateCol: Column, moneyValue: Column, byCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.dec2
    val series = df.groupBy(col(byCol).as("__g"), to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
    val cnt = series.groupBy(col("__g")).agg(count(lit(1)).as("__c"))
    val med = series
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__g")).orderBy(col("rev"), col("d"))))
      .join(broadcast(cnt), "__g")
      .filter(col("__rn") === expr("(__c + 1) div 2"))
      .select(col("__g"), col("rev").as("__med"))
    val signed = series.join(broadcast(med), "__g")
      .filter(col("rev") =!= col("__med"))
      .select(col("__g"), col("d"), (col("rev") > col("__med")).as("up"))
    val wd = Window.partitionBy(col("__g")).orderBy(col("d"))
    val trans = signed.select(
      col("__g"), col("up"), lag(col("up"), 1).over(wd).as("prev"))
    val agg = trans.groupBy(col("__g")).agg(
      count(when(col("up"), 1)).as("n_plus"),
      count(when(!col("up"), 1)).as("n_minus"),
      sum(when(col("prev").isNotNull && (col("up") =!= col("prev")), 1L)
        .otherwise(0L)).as("__t"))
    val p = col("n_plus").cast(DoubleType)
    val q = col("n_minus").cast(DoubleType)
    val runs = when(col("n_plus") + col("n_minus") > 0, col("__t") + 1)
    val mu = lit(2.0) * p * q / (p + q) + lit(1.0)
    val sig2 = lit(2.0) * p * q * (lit(2.0) * p * q - (p + q)) /
      ((p + q) * (p + q) * (p + q - lit(1.0)))
    val z = (runs.cast(DoubleType) - mu) / sqrt(sig2)
    agg.select(
      col("__g").as(byCol),
      col("n_plus"), col("n_minus"), runs.as("runs"),
      round(when(col("n_plus") > 0 && col("n_minus") > 0 &&
        col("n_plus") * col("n_minus") * 2 > col("n_plus") + col("n_minus"), z), 6)
        .as("z_stat"))
      .orderBy(byCol)
  }

  /** Classical additive seasonal decomposition of the daily money series
    * — revenue = trend + seasonal + residual, the EXPLANATORY companion
    * to the gate family ([[dowBandAnomaly]] flags a weird Sunday;
    * this SHOWS the Sunday effect, the underlying drift, and what's left
    * over). Textbook moving-average recipe: trend = centered 7-day mean
    * (full windows only, so edge days drop), per-weekday seasonal index
    * = mean of the detrended series for that weekday, centered so the
    * seven indices sum to ~0, residual = the rest.
    *
    * Exactness: the trend window sums exact integer cents; detrending
    * stays exact by carrying 7·x − Σ₇ (the ×7 absorbs the /7, the
    * doubled-rank trick in money form); the weekday profile sums those
    * exactly. Only the final per-column conversions are double — each
    * spelled once, with the ≤7-row index centering folded in sorted
    * weekday order (the [[graft.operators.Robust.anovaF]] fold; a bare
    * 7-double aggregate would be summation-order-unstable across
    * engines). Weekday = epoch-day mod 7, the engine-portable spelling.
    *
    * Scale shape: one keyed day pre-agg, then everything rides the
    * calendar-bounded day domain — the centered window, the 7-row
    * profile (broadcast back), the 1-row centering constant. */
  def seasonalDecompose(
      df: DataFrame, dateCol: Column, moneyValue: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.dec2
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .select(col("d"),
        pmod(datediff(col("d"), lit("1970-01-01").cast("date")), lit(7))
          .cast("long").as("dow07"),
        col("rev"),
        (col("rev") * 100).cast(dec38).as("x"))
    val w7 = Window.orderBy(col("d")).rowsBetween(-3, 3)
    val trended = series
      .withColumn("__t7", sum(col("x")).over(w7))
      .withColumn("__c7", count(lit(1)).over(w7))
      .filter(col("__c7") === 7)
      .withColumn("__detr7", col("x") * 7 - col("__t7"))
    val prof = trended.groupBy(col("dow07"))
      .agg(sum(col("__detr7")).as("__sd"), count(lit(1)).cast(dec38).as("__cw"))
    val mean = prof.agg(
      array_sort(collect_list(struct(col("dow07"), col("__sd"), col("__cw")))).as("ws"),
      count(lit(1)).cast(DoubleType).as("__kw"))
      .select((aggregate(col("ws"), lit(0.0), (acc, g) =>
        acc + g.getField("__sd").cast(DoubleType) /
          (lit(7.0) * g.getField("__cw").cast(DoubleType))) / col("__kw")).as("__ms"))
    val sWD = col("__sd").cast(DoubleType) / (lit(7.0) * col("__cw").cast(DoubleType))
    val trendD = col("__t7").cast(DoubleType) / lit(700.0)
    val seasD = (sWD - col("__ms")) / lit(100.0)
    trended.join(broadcast(prof), "dow07").crossJoin(broadcast(mean))
      .select(
        col("d").cast("timestamp").as("day"),
        // exact-decimal total, surfaced as double (the RevSum convention)
        col("rev").cast(DoubleType).as("revenue"),
        round(trendD, 6).as("trend"),
        round(seasD, 6).as("seasonal"),
        round(col("rev").cast(DoubleType) - trendD - seasD, 6).as("residual"))
      .orderBy(col("day"))
  }

  /** Per-`byCol`-segment classical decomposition — each segment gets its
    * own trend line and weekday profile (the grouped-gate convention; a
    * weekend-heavy category's seasonal indices differ from the corpus).
    * Exactly [[seasonalDecompose]] with the segment riding every key:
    * centered windows partitioned by segment over the (segment, day)
    * domain, a ≤ 7·|segments|-row profile, per-segment centering folds
    * (≤ |segments| rows, broadcast back). */
  def seasonalDecomposeBy(
      df: DataFrame, dateCol: Column, moneyValue: Column, byCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.dec2
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(col(byCol).as("__g"), to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .select(col("__g"), col("d"),
        pmod(datediff(col("d"), lit("1970-01-01").cast("date")), lit(7))
          .cast("long").as("dow07"),
        col("rev"),
        (col("rev") * 100).cast(dec38).as("x"))
    val w7 = Window.partitionBy(col("__g")).orderBy(col("d")).rowsBetween(-3, 3)
    val trended = series
      .withColumn("__t7", sum(col("x")).over(w7))
      .withColumn("__c7", count(lit(1)).over(w7))
      .filter(col("__c7") === 7)
      .withColumn("__detr7", col("x") * 7 - col("__t7"))
    val prof = trended.groupBy(col("__g"), col("dow07"))
      .agg(sum(col("__detr7")).as("__sd"), count(lit(1)).cast(dec38).as("__cw"))
    val mean = prof.groupBy(col("__g")).agg(
      array_sort(collect_list(struct(col("dow07"), col("__sd"), col("__cw")))).as("ws"),
      count(lit(1)).cast(DoubleType).as("__kw"))
      .select(col("__g"), (aggregate(col("ws"), lit(0.0), (acc, g) =>
        acc + g.getField("__sd").cast(DoubleType) /
          (lit(7.0) * g.getField("__cw").cast(DoubleType))) / col("__kw")).as("__ms"))
    val sWD = col("__sd").cast(DoubleType) / (lit(7.0) * col("__cw").cast(DoubleType))
    val trendD = col("__t7").cast(DoubleType) / lit(700.0)
    val seasD = (sWD - col("__ms")) / lit(100.0)
    trended.join(broadcast(prof), Seq("__g", "dow07"))
      .join(broadcast(mean), "__g")
      .select(
        col("__g").as(byCol),
        col("d").cast("timestamp").as("day"),
        col("rev").cast(DoubleType).as("revenue"),
        round(trendD, 6).as("trend"),
        round(seasD, 6).as("seasonal"),
        round(col("rev").cast(DoubleType) - trendD - seasD, 6).as("residual"))
      .orderBy(byCol, "day")
  }

  /** Trailing-window anomaly gate over a daily money metric — the
    * standard pipeline monitor ("did today's volume jump off its recent
    * band?"): per-day exact-decimal totals, a trailing `window`-OBSERVED-
    * DAY mean/std with the current day EXCLUDED (an outlier must not
    * mask itself), and an `|x − mean| > z·std` flag. Only days with a
    * FULL trailing window are emitted — a half-filled baseline flags
    * noise. The window counts observed days, not calendar days (gap days
    * carry no baseline mass; the orders calendar is dense).
    *
    * Scale shape: the raw scan collapses to the bounded DAY domain first
    * (one keyed shuffle); the sliding frames run over that value-domain
    * table only — the global ordered window sits on an
    * aggregation-bounded input, the repo's window discipline.
    *
    * Exactness — the [[graft.operators.Robust.spearmanRho]] discipline:
    * everything accumulates as exact integer CENTS in DECIMAL(38,0)
    * (window sums are order-free; a double sliding sum would
    * hash-diverge across engines, whose frame evaluation orders differ),
    * the variance numerator `window·Σx² − (Σx)²` stays exact integer —
    * the naive `ss − s²/c` double chain loses the race to catastrophic
    * cancellation, which amplifies engine-level decimal→double last-bit
    * differences into visible std error (measured: one mismatched row
    * per ~1200 against DuckDB) — and ONE double conversion feeds a fixed
    * constant-denominator chain the oracle replays. */
  def rollingAnomaly(
      df: DataFrame, dateCol: Column, moneyValue: Column,
      window: Int = 28, z: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.dec2
    require(window >= 2, s"need window >= 2, got $window")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .withColumn("__rc", (col("rev") * 100).cast(dec38))
    val w = Window.orderBy(col("d")).rowsBetween(-window, -1)
    val stats = series
      .withColumn("__c", count(lit(1)).over(w))
      .withColumn("__s", sum(col("__rc")).over(w))
      .withColumn("__ss", sum(col("__rc") * col("__rc")).over(w))
      .filter(col("__c") === window)
    val s = col("__s").cast(DoubleType)
    val num = (lit(window).cast(dec38) * col("__ss") - col("__s") * col("__s"))
      .cast(DoubleType)
    val mean = s / lit(100.0 * window)
    val sd = sqrt(num / lit(window.toDouble * (window - 1))) / lit(100.0)
    stats.select(
      col("d").cast("timestamp").as("day"),
      col("rev").cast(DoubleType).as("revenue"),
      round(mean, 6).as("roll_mean"),
      round(sd, 6).as("roll_std"),
      (abs(col("__rc").cast(DoubleType) / lit(100.0) - mean) > lit(z) * sd)
        .as("is_anomaly"))
      .orderBy(col("day"))
  }

  /** Per-`segmentCol` trailing-window anomaly gate — the monitor a
    * marketplace actually runs: per-category / per-priority /
    * per-product daily bands, not one global series (a segment's 3σ jump
    * vanishes inside the corpus-wide total). Exactly
    * [[rollingAnomaly]]'s integer-cents DECIMAL(38,0) algebra with the
    * segment riding every key: the raw scan collapses to the
    * per-(segment, day) domain first (one keyed shuffle), and the
    * trailing frames run per segment over that calendar-bounded table —
    * `Window.partitionBy(segment).orderBy(day)` is safe HERE because its
    * input is the aggregated day domain (≤ |segments| × days rows), the
    * repo's window discipline; per-segment window work is bounded by the
    * calendar, not the data. Each segment's first `window` observed days
    * carry no full baseline and are dropped, per segment (the global
    * contract applied segment-wise). */
  def rollingAnomalyBy(
      df: DataFrame, segmentCol: Column, dateCol: Column, moneyValue: Column,
      window: Int = 28, z: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.dec2
    require(window >= 2, s"need window >= 2, got $window")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(segmentCol.as("seg"), to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .withColumn("__rc", (col("rev") * 100).cast(dec38))
    val w = Window.partitionBy(col("seg")).orderBy(col("d")).rowsBetween(-window, -1)
    val stats = series
      .withColumn("__c", count(lit(1)).over(w))
      .withColumn("__s", sum(col("__rc")).over(w))
      .withColumn("__ss", sum(col("__rc") * col("__rc")).over(w))
      .filter(col("__c") === window)
    val s = col("__s").cast(DoubleType)
    val num = (lit(window).cast(dec38) * col("__ss") - col("__s") * col("__s"))
      .cast(DoubleType)
    val mean = s / lit(100.0 * window)
    val sd = sqrt(num / lit(window.toDouble * (window - 1))) / lit(100.0)
    stats.select(
      col("seg").as("segment"),
      col("d").cast("timestamp").as("day"),
      col("rev").cast(DoubleType).as("revenue"),
      round(mean, 6).as("roll_mean"),
      round(sd, 6).as("roll_std"),
      (abs(col("__rc").cast(DoubleType) / lit(100.0) - mean) > lit(z) * sd)
        .as("is_anomaly"))
      .orderBy(col("segment"), col("day"))
  }

  /** CUSUM changepoint detection over a daily money metric — the "WHEN
    * did the level shift?" companion to [[rollingAnomaly]] (which flags
    * WHICH days sit off their trailing band but is blind to a sustained
    * step: after `window` days the new level IS the baseline). The
    * classic offline CUSUM estimator: S_d = Σ_{i≤d}(x_i − x̄) peaks at
    * the day the mean changed; the changepoint estimate is
    * argmax_d |S_d| (ties → earliest day), `cusum_max` = max |S_d| its
    * magnitude in money units, and the level before/after the estimated
    * change quantifies the shift ("revenue stepped from A to B on day
    * X" — Page 1954, the textbook single-changepoint recipe).
    *
    * Scale + exactness shape: the raw scan collapses to the bounded DAY
    * domain first (one keyed shuffle; the global ordered windows sit on
    * that aggregation-bounded table — the repo's window discipline), and
    * the statistic is computed SCALED BY D to stay integer: D·S_d =
    * D·cum_d − d·T in exact DECIMAL(38,0) cents (≤ 10²³ at 10⁵ days ×
    * 10¹⁸ cents — argmax is invariant to the positive scaling, so no
    * division happens before the pick); the winning row divides ONCE
    * per output column — bit-portable against a HUGEINT oracle. The
    * final day always has S_D = 0, so a constant series reports its
    * first day with `cusum_max` 0. */
  def cusumChangepoint(
      df: DataFrame, dateCol: Column, moneyValue: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.dec2
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // NOT checkpointed: the two consumers (cum rows + totals) re-run the
    // pruned two-column pre-agg, which is cheaper than a checkpoint
    // round-trip (the weightedMedian measurement) — and the checkpoint's
    // leaf would erase the aggregate lineage the ScaleSpec window guard
    // reads to prove this global window sits on the day domain.
    val series = df.groupBy(to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .withColumn("__rc", (col("rev") * 100).cast(dec38))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = series
      .withColumn("__i", count(lit(1)).over(w).cast(dec38))
      .withColumn("__cum", sum(col("__rc")).over(w))
    val tot = series.agg(
      count(lit(1)).cast(dec38).as("__dd"), sum(col("__rc")).as("__t"))
    val scored = cum.crossJoin(broadcast(tot))
      .withColumn("__stat", abs(col("__dd") * col("__cum") - col("__i") * col("__t")))
    scored
      .orderBy(col("__stat").desc, col("d").asc)
      .limit(1)
      .select(
        col("__dd").cast("long").as("n_days"),
        col("d").cast("timestamp").as("cp_day"),
        round(col("__stat").cast(DoubleType) /
          (col("__dd").cast(DoubleType) * lit(100.0)), 6).as("cusum_max"),
        round(col("__cum").cast(DoubleType) /
          (col("__i").cast(DoubleType) * lit(100.0)), 6).as("mean_before"),
        when(col("__dd") > col("__i"),
          round((col("__t") - col("__cum")).cast(DoubleType) /
            ((col("__dd") - col("__i")).cast(DoubleType) * lit(100.0)), 6))
          .as("mean_after"))
  }

  /** Per-`segmentCol` CUSUM changepoint — each segment's own "when did
    * MY level shift?" (a segment's step change smears into a ramp inside
    * the global total; the grouped-gate convention). Exactly
    * [[cusumChangepoint]]'s D-scaled integer algebra with the segment
    * riding every key: per-(segment, day) pre-agg first, cumulatives and
    * ranks partitioned by segment over the calendar-bounded domain,
    * per-segment totals from the same pre-agg, and the per-segment
    * argmax picked by one ranked window over that bounded table (ties →
    * earliest day). */
  def cusumChangepointBy(
      df: DataFrame, segmentCol: Column, dateCol: Column,
      moneyValue: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.dec2
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(segmentCol.as("seg"), to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .withColumn("__rc", (col("rev") * 100).cast(dec38))
      .localCheckpoint(false) // two consumers (cum rows + totals) of one pre-agg
    val w = Window.partitionBy(col("seg")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = series
      .withColumn("__i", count(lit(1)).over(w).cast(dec38))
      .withColumn("__cum", sum(col("__rc")).over(w))
    val tot = series.groupBy(col("seg"))
      .agg(count(lit(1)).cast(dec38).as("__dd"), sum(col("__rc")).as("__t"))
    val wPick = Window.partitionBy(col("seg"))
      .orderBy(col("__stat").desc, col("d").asc)
    cum.join(broadcast(tot), "seg")
      .withColumn("__stat", abs(col("__dd") * col("__cum") - col("__i") * col("__t")))
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
      .select(
        col("seg").as("segment"),
        col("__dd").cast("long").as("n_days"),
        col("d").cast("timestamp").as("cp_day"),
        round(col("__stat").cast(DoubleType) /
          (col("__dd").cast(DoubleType) * lit(100.0)), 6).as("cusum_max"),
        round(col("__cum").cast(DoubleType) /
          (col("__i").cast(DoubleType) * lit(100.0)), 6).as("mean_before"),
        when(col("__dd") > col("__i"),
          round((col("__t") - col("__cum")).cast(DoubleType) /
            ((col("__dd") - col("__i")).cast(DoubleType) * lit(100.0)), 6))
          .as("mean_after"))
      .orderBy(col("segment"))
  }

  /** Day-of-week band anomaly gate — the SEASONAL-PROFILE monitor
    * [[rollingAnomaly]] cannot be: a trailing band mixes weekdays and
    * weekends, so every quiet Sunday reads as a 3σ dip and every Black-
    * Friday-adjacent Monday as a spike. Here each day is judged against
    * ITS OWN weekday's history: per-weekday exact-decimal moments over
    * the whole series, with the current day EXCLUDED from its own
    * baseline via leave-one-out algebra (the [[rollingAnomaly]]
    * outlier-must-not-mask-itself rule): c′ = c−1, s′ = Σ−x,
    * ss′ = Σ²−x², var′ = (c′·ss′ − s′²)/(c′(c′−1)) — all exact integer
    * cents in DECIMAL(38,0) until one double conversion per output
    * column. Weekday = epoch-day mod 7 (0 = Thursday), the
    * engine-portable integer spelling. Days whose weekday has < 3
    * observations drop (a ≤ 1-day baseline flags noise).
    *
    * Scale shape: day-domain pre-agg (one keyed shuffle), a 7-row
    * broadcast join back, zero windows — the cheapest gate in the
    * anomaly family, and the one that actually survives seasonality. */
  def dowBandAnomaly(
      df: DataFrame, dateCol: Column, moneyValue: Column,
      z: Double = 3.0): DataFrame = {
    import graft.functions.dec2
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .select(col("d"), col("rev"),
        pmod(datediff(col("d"), lit("1970-01-01").cast("date")), lit(7))
          .cast("long").as("dow07"),
        (col("rev") * 100).cast(dec38).as("__rc"))
    val prof = series.groupBy(col("dow07"))
      .agg(count(lit(1)).as("__c"), sum(col("__rc")).as("__s"),
        sum(col("__rc") * col("__rc")).as("__ss"))
      .filter(col("__c") >= 3)
    val joined = series.join(broadcast(prof), "dow07")
    val c1 = (col("__c") - 1).cast(dec38)
    val s1 = col("__s") - col("__rc")
    val ss1 = col("__ss") - col("__rc") * col("__rc")
    val num = (c1 * ss1 - s1 * s1).cast(DoubleType)
    val mean = s1.cast(DoubleType) / (c1.cast(DoubleType) * lit(100.0))
    val sd = sqrt(num / (c1.cast(DoubleType) * (c1.cast(DoubleType) - lit(1.0)))) / lit(100.0)
    joined.select(
      col("d").cast("timestamp").as("day"),
      col("dow07"),
      col("rev").cast(DoubleType).as("revenue"),
      round(mean, 6).as("dow_mean"),
      round(sd, 6).as("dow_std"),
      (abs(col("__rc").cast(DoubleType) / lit(100.0) - mean) > lit(z) * sd)
        .as("is_anomaly"))
      .orderBy(col("day"))
  }

  /** Per-`segmentCol` day-of-week band anomaly — each segment judged
    * against ITS OWN weekday profile (the grouped-gate convention: a
    * category with weekend-heavy traffic has a different Sunday norm
    * than the corpus, so the global profile mislabels both). Exactly
    * [[dowBandAnomaly]]'s leave-one-out integer-cents algebra with the
    * segment riding every key: per-(segment, day) pre-agg, the profile
    * keyed by (segment, weekday) — ≤ 7·|segments| rows, broadcast —
    * and the same < 3-observations drop applied per (segment, weekday).
    * Still zero windows; one keyed shuffle + one model-sized join. */
  def dowBandAnomalyBy(
      df: DataFrame, segmentCol: Column, dateCol: Column,
      moneyValue: Column, z: Double = 3.0): DataFrame = {
    import graft.functions.dec2
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(segmentCol.as("seg"), to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .select(col("seg"), col("d"), col("rev"),
        pmod(datediff(col("d"), lit("1970-01-01").cast("date")), lit(7))
          .cast("long").as("dow07"),
        (col("rev") * 100).cast(dec38).as("__rc"))
    val prof = series.groupBy(col("seg"), col("dow07"))
      .agg(count(lit(1)).as("__c"), sum(col("__rc")).as("__s"),
        sum(col("__rc") * col("__rc")).as("__ss"))
      .filter(col("__c") >= 3)
    val joined = series.join(broadcast(prof), Seq("seg", "dow07"))
    val c1 = (col("__c") - 1).cast(dec38)
    val s1 = col("__s") - col("__rc")
    val ss1 = col("__ss") - col("__rc") * col("__rc")
    val num = (c1 * ss1 - s1 * s1).cast(DoubleType)
    val mean = s1.cast(DoubleType) / (c1.cast(DoubleType) * lit(100.0))
    val sd = sqrt(num / (c1.cast(DoubleType) * (c1.cast(DoubleType) - lit(1.0)))) / lit(100.0)
    joined.select(
      col("seg").as("segment"),
      col("d").cast("timestamp").as("day"),
      col("dow07"),
      col("rev").cast(DoubleType).as("revenue"),
      round(mean, 6).as("dow_mean"),
      round(sd, 6).as("dow_std"),
      (abs(col("__rc").cast(DoubleType) / lit(100.0) - mean) > lit(z) * sd)
        .as("is_anomaly"))
      .orderBy(col("segment"), col("day"))
  }

  /** Weekday-adjusted CUSUM changepoint — [[cusumChangepoint]] run on
    * the series NET of its weekly seasonality. On a weekend-heavy (or
    * weekend-quiet) business the raw CUSUM's cumulative sum zig-zags
    * with the weekly cycle and its argmax can land on a weekday-mix
    * artifact rather than the true level shift; de-seasonalizing first
    * isolates the step. The seasonal profile is the per-weekday MEDIAN
    * (a discrete rank-⌈c/2⌉ pick — an actual data value in exact cents,
    * and unlike the weekday MEAN it is itself robust to the very step
    * being hunted), so the residual x_d − med(dow(d)) stays an exact
    * integer and the whole D-scaled CUSUM algebra of
    * [[cusumChangepoint]] applies unchanged to residual cents.
    * `cusum_max` and the before/after levels are in residual money
    * units: mean deviation from the weekday norm before/after the
    * estimated change day.
    *
    * Scale shape: day-domain pre-agg (one keyed shuffle), the 7-row
    * median profile via one window over the calendar-bounded day table
    * + broadcast join back, then the global CUSUM windows on the same
    * bounded table — identical cost to the raw gate plus one
    * model-sized join. */
  def cusumSeasonalAdjusted(
      df: DataFrame, dateCol: Column, moneyValue: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.dec2
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .select(col("d"),
        pmod(datediff(col("d"), lit("1970-01-01").cast("date")), lit(7))
          .cast("long").as("dow07"),
        (col("rev") * 100).cast(dec38).as("__rc"))
    // NOT checkpointed (the [[cusumChangepoint]] measurement): the three
    // consumers re-run a pruned two-column pre-agg, cheaper than a
    // checkpoint round-trip, and the checkpoint leaf would erase the
    // aggregate lineage the ScaleSpec window guard reads.
    // Per-weekday median: rank-⌈c/2⌉ discrete pick (rn = (c+1) div 2).
    // Equal-cent ties pick equal values, so the rank tiebreak is moot.
    val wRank = Window.partitionBy(col("dow07")).orderBy(col("__rc"))
    val med = series
      .select(col("dow07"), col("__rc"),
        row_number().over(wRank).as("__rn"),
        count(lit(1)).over(Window.partitionBy(col("dow07"))).as("__c"))
      .filter(col("__rn") === expr("(__c + 1) div 2"))
      .select(col("dow07"), col("__rc").as("__med"))
    val resid = series.join(broadcast(med), "dow07")
      .select(col("d"), (col("__rc") - col("__med")).as("__rr"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = resid
      .withColumn("__i", count(lit(1)).over(w).cast(dec38))
      .withColumn("__cum", sum(col("__rr")).over(w))
    val tot = resid.agg(
      count(lit(1)).cast(dec38).as("__dd"), sum(col("__rr")).as("__t"))
    cum.crossJoin(broadcast(tot))
      .withColumn("__stat", abs(col("__dd") * col("__cum") - col("__i") * col("__t")))
      .orderBy(col("__stat").desc, col("d").asc)
      .limit(1)
      .select(
        col("__dd").cast("long").as("n_days"),
        col("d").cast("timestamp").as("cp_day"),
        round(col("__stat").cast(DoubleType) /
          (col("__dd").cast(DoubleType) * lit(100.0)), 6).as("cusum_max"),
        round(col("__cum").cast(DoubleType) /
          (col("__i").cast(DoubleType) * lit(100.0)), 6).as("mean_resid_before"),
        when(col("__dd") > col("__i"),
          round((col("__t") - col("__cum")).cast(DoubleType) /
            ((col("__dd") - col("__i")).cast(DoubleType) * lit(100.0)), 6))
          .as("mean_resid_after"))
  }

  /** Per-`segmentCol` weekday-adjusted CUSUM — each segment de-
    * seasonalized against ITS OWN weekday medians, then its own step
    * hunt (the grouped-gate convention; a weekend-heavy category's
    * profile differs from the corpus). Exactly [[cusumSeasonalAdjusted]]
    * with the segment riding every key: medians per (segment, weekday)
    * — ≤ 7·|segments| rows, broadcast — cumulatives/totals/argmax
    * partitioned by segment over the calendar-bounded day domain. */
  def cusumSeasonalAdjustedBy(
      df: DataFrame, segmentCol: Column, dateCol: Column,
      moneyValue: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.dec2
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(segmentCol.as("seg"), to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .select(col("seg"), col("d"),
        pmod(datediff(col("d"), lit("1970-01-01").cast("date")), lit(7))
          .cast("long").as("dow07"),
        (col("rev") * 100).cast(dec38).as("__rc"))
    val wRank = Window.partitionBy(col("seg"), col("dow07")).orderBy(col("__rc"))
    val med = series
      .select(col("seg"), col("dow07"), col("__rc"),
        row_number().over(wRank).as("__rn"),
        count(lit(1)).over(Window.partitionBy(col("seg"), col("dow07"))).as("__c"))
      .filter(col("__rn") === expr("(__c + 1) div 2"))
      .select(col("seg"), col("dow07"), col("__rc").as("__med"))
    val resid = series.join(broadcast(med), Seq("seg", "dow07"))
      .select(col("seg"), col("d"), (col("__rc") - col("__med")).as("__rr"))
    val w = Window.partitionBy(col("seg")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = resid
      .withColumn("__i", count(lit(1)).over(w).cast(dec38))
      .withColumn("__cum", sum(col("__rr")).over(w))
    val tot = resid.groupBy(col("seg"))
      .agg(count(lit(1)).cast(dec38).as("__dd"), sum(col("__rr")).as("__t"))
    val wPick = Window.partitionBy(col("seg"))
      .orderBy(col("__stat").desc, col("d").asc)
    cum.join(broadcast(tot), "seg")
      .withColumn("__stat", abs(col("__dd") * col("__cum") - col("__i") * col("__t")))
      .withColumn("__pick", row_number().over(wPick))
      .filter(col("__pick") === 1)
      .select(
        col("seg").as("segment"),
        col("__dd").cast("long").as("n_days"),
        col("d").cast("timestamp").as("cp_day"),
        round(col("__stat").cast(DoubleType) /
          (col("__dd").cast(DoubleType) * lit(100.0)), 6).as("cusum_max"),
        round(col("__cum").cast(DoubleType) /
          (col("__i").cast(DoubleType) * lit(100.0)), 6).as("mean_resid_before"),
        when(col("__dd") > col("__i"),
          round((col("__t") - col("__cum")).cast(DoubleType) /
            ((col("__dd") - col("__i")).cast(DoubleType) * lit(100.0)), 6))
          .as("mean_resid_after"))
      .orderBy(col("segment"))
  }

  /** Mann–Kendall trend test + Sen's slope over the daily money metric —
    * the MONOTONE-TREND companion to [[cusumChangepoint]] (CUSUM locates
    * a level STEP; Mann–Kendall asks "is the series drifting up or down
    * at all?", distribution-free, and Sen's slope says how fast in
    * money-per-day — the robust trend line a capacity review reads).
    * S = Σ_{i<j} sign(x_j − x_i) with the tie-corrected variance
    * Var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18 and the
    * continuity-corrected z = (S ∓ 1)/√Var; Sen's slope is the MEDIAN of
    * the pairwise slopes (x_j − x_i)/(d_j − d_i).
    *
    * Scale shape: the raw scan collapses to the DAY domain first; the
    * O(days²) pair set is over the CALENDAR-bounded table only — the
    * day side rides a `broadcast` nested-loop (a few KB at any data SF;
    * the pair count is SF-INVARIANT, ~5·10⁷ at 30 years — grows with
    * time, never with data). S and Var(S) aggregate as exact integers
    * in DECIMAL(38,0); each pairwise slope is ONE double division
    * spelled identically in the oracle, and the median is the DISCRETE
    * rank-⌈m/2⌉ order statistic picked by the [[Robust.weightedMedian]]
    * bit-grid selection (distributed, never a single-task sort).
    * Day-gap denominators use real DATE differences, so calendar gaps
    * weight slopes correctly. Under 2 days there are no pairs to test:
    * the result is EMPTY (the [[Robust.weightedMedian]] drop contract —
    * there is no trend of one point). */
  def mannKendallTrend(
      df: DataFrame, dateCol: Column, moneyValue: Column): DataFrame = {
    import graft.functions.dec2
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // __rc rides the O(days²) pair kernel as a PRIMITIVE long, not
    // DECIMAL(38,0): decimal(18,2)·100 is an integer of ≤ 18 significant
    // digits, so cents always fit a long BY CONSTRUCTION (max 10¹⁸ <
    // 2⁶³−1), the pair difference |xj−xi| < 2·10¹⁸ cannot overflow, and
    // long→double rounds to the identical nearest double as
    // decimal(38,0)→double — bit-for-bit the same signs, slopes, and tie
    // groups, with the 38-digit BigDecimal objects gone from the ~10⁷-row
    // pair loop (precision 38 > 18 forces Spark's Decimal onto the
    // BigDecimal slow path for every compare/subtract).
    val series = df.groupBy(to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .select(
        datediff(col("d"), lit("1970-01-01").cast("date")).cast("long").as("__dn"),
        (col("rev") * 100).cast(LongType).as("__rc"))
      .localCheckpoint(false) // consumers: both pair sides, ties, count
    val l = series.select(col("__dn").as("i"), col("__rc").as("xi"))
    val r = series.select(col("__dn").as("j"), col("__rc").as("xj"))
    val pairs = l.join(broadcast(r), col("j") > col("i"))
    // One projection carries BOTH the sign and the slope; consumers
    // REGENERATE the pair domain rather than checkpoint it — measured
    // (tools/ProbeMk): one broadcast-loop regeneration costs ~1.7 s at
    // sf0.1 and is embarrassingly parallel with zero memory footprint,
    // while a 14M-row checkpoint write costs ~2 regenerations AND turns
    // memory-pressure sensitive (9 → 14 s swings between bench runs).
    // The when() guard is load-bearing: whole-stage codegen fuses this
    // projection into the BNLJ consume and can evaluate it on a pair the
    // join condition is about to reject (j = i → zero gap) — ANSI then
    // raises on the division.
    val slopes = pairs.select(lit("all").as("__one"),
      when(col("xj") > col("xi"), 1L).when(col("xj") < col("xi"), -1L)
        .otherwise(0L).as("__sgn"),
      when(col("j") > col("i"),
        (col("xj") - col("xi")).cast(DoubleType) /
          (lit(100.0) * (col("j") - col("i")))).as("sl"))
    val nAgg = series.agg(count(lit(1)).as("n_days"))
    val tieAgg = series.groupBy(col("__rc")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t").cast(dec38) * (col("t") - 1) * (col("t") * 2 + 5)),
        lit(0L).cast(dec38)).as("ties"))
    // Sen's slope AND S in ONE consumption of the pair domain: the
    // rank-⌈m/2⌉ grid selection's summary pass already scans every pair
    // row, so Σ sign rides it as a fused long sum — one fewer BNLJ
    // regeneration than the former separate sAgg (tools/ProbeMk).
    val senS = Robust.weightedMedianWithSums(
      slopes, "__one", col("sl"), lit(1L), Seq("s" -> col("__sgn")))
      .select(col("w_median").as("sen_slope"), col("s"))
    val n = col("n_days").cast(dec38)
    val vnum = n * (n - 1) * (n * 2 + 5) - col("ties")
    val sD = col("s").cast(DoubleType)
    val cc = when(col("s") > 0, lit(1.0)).when(col("s") < 0, lit(-1.0))
      .otherwise(lit(0.0))
    nAgg.crossJoin(broadcast(tieAgg)).crossJoin(broadcast(senS))
      .select(
        col("n_days"), col("s").as("s_stat"),
        round(when(vnum > 0, (sD - cc) /
          sqrt(vnum.cast(DoubleType) / lit(18.0))), 6).as("z_stat"),
        col("sen_slope"))
  }

  /** Per-`segmentCol` Mann–Kendall + Sen's slope — each segment's own
    * "am I drifting?" (opposite per-segment trends cancel inside the
    * global series; the grouped-gate convention). Exactly
    * [[mannKendallTrend]]'s exact-integer S / Var(S) algebra with the
    * segment riding every key: per-(segment, day) pre-agg, the pair
    * domain an equi-join on segment (+ j > i) over the calendar-bounded
    * day table — still SF-invariant, ≤ |segments| × days² — and the
    * per-segment Sen median picked by the SAME grouped bit-grid
    * selection ([[Robust.weightedMedian]] keyed by segment). The four
    * |segments|-row aggregates broadcast back onto one spine. Segments
    * with < 2 observed days have no pairs and drop (the global EMPTY
    * contract applied per segment). */
  def mannKendallTrendBy(
      df: DataFrame, segmentCol: Column, dateCol: Column,
      moneyValue: Column): DataFrame = {
    import graft.functions.dec2
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(segmentCol.as("seg"), to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .select(col("seg"),
        datediff(col("d"), lit("1970-01-01").cast("date")).cast("long").as("__dn"),
        // long cents in the pair kernel — the mannKendallTrend narrowing
        // (provably exact: decimal(18,2)·100 always fits a long)
        (col("rev") * 100).cast(LongType).as("__rc"))
      .localCheckpoint(false) // consumers: both pair sides, ties, count
    val l = series.select(col("seg"), col("__dn").as("i"), col("__rc").as("xi"))
    val r = series.select(col("seg").as("__sr"), col("__dn").as("j"), col("__rc").as("xj"))
    val pairs = l.join(broadcast(r),
      col("seg") === col("__sr") && col("j") > col("i")).drop("__sr")
    // Sign + slope in one projection, consumers regenerate (the
    // mannKendallTrend decision — stable parallel regeneration beats a
    // memory-pressure-sensitive 14M-row checkpoint). Same load-bearing
    // when() guard: the projection can fuse into the join consume and
    // see a pair the range condition is about to reject.
    val slopes = pairs.select(col("seg"),
      when(col("xj") > col("xi"), 1L).when(col("xj") < col("xi"), -1L)
        .otherwise(0L).as("__sgn"),
      when(col("j") > col("i"),
        (col("xj") - col("xi")).cast(DoubleType) /
          (lit(100.0) * (col("j") - col("i")))).as("sl"))
    val nAgg = series.groupBy(col("seg")).agg(count(lit(1)).as("n_days"))
    val tieAgg = series.groupBy(col("seg"), col("__rc")).agg(count(lit(1)).as("t"))
      .groupBy(col("seg"))
      .agg(coalesce(sum(col("t").cast(dec38) * (col("t") - 1) * (col("t") * 2 + 5)),
        lit(0L).cast(dec38)).as("ties"))
    // Sen + per-segment S fused into one pair-domain consumption (the
    // mannKendallTrend fusion with the segment riding the group key)
    val senS = Robust.weightedMedianWithSums(
      slopes, "seg", col("sl"), lit(1L), Seq("s" -> col("__sgn")))
      .select(col("seg"), col("w_median").as("sen_slope"), col("s"))
    val n = col("n_days").cast(dec38)
    val vnum = n * (n - 1) * (n * 2 + 5) - col("ties")
    val sD = col("s").cast(DoubleType)
    val cc = when(col("s") > 0, lit(1.0)).when(col("s") < 0, lit(-1.0))
      .otherwise(lit(0.0))
    nAgg.join(broadcast(tieAgg), "seg")
      .join(broadcast(senS), "seg")
      .select(
        col("seg").as("segment"),
        col("n_days"), col("s").as("s_stat"),
        round(when(vnum > 0, (sD - cc) /
          sqrt(vnum.cast(DoubleType) / lit(18.0))), 6).as("z_stat"),
        col("sen_slope"))
      .orderBy(col("segment"))
  }

  /** Two-level binary segmentation of the CUSUM changepoint — the "how
    * MANY regime shifts, and where?" follow-up [[cusumChangepoint]]'s
    * single argmax cannot answer (classic binary segmentation, Scott &
    * Knott 1974 lineage): find the global changepoint, split the series
    * there, and re-run the same exact-integer D-scaled gate on each
    * half. Level 1 is the global row; level 2 is one row per half
    * ('left' ≤ cp < 'right'), each half's argmax judged against its OWN
    * totals.
    *
    * Scale shape: the composition is two runs of machinery that already
    * passed plan review — the only new cost is ONE bounded driver
    * transfer (the single level-1 row, the [[graft.operators.Robust
    * .quantileEdges]] class of model-sized collect) to derive the half
    * flag, then [[cusumChangepointBy]] with that flag as the segment.
    * EMPTY input stays EMPTY. */
  def cusumBinarySeg(
      df: DataFrame, dateCol: Column, moneyValue: Column): DataFrame = {
    val l1 = cusumChangepoint(df, dateCol, moneyValue)
      .select(lit(1).as("level"), lit("all").as("segment"),
        col("n_days"), col("cp_day"), col("cusum_max"),
        col("mean_before"), col("mean_after"))
    val first = l1.select(col("cp_day")).collect() // exactly one row, bounded
    if (first.isEmpty) return l1
    val cp1 = first(0).getTimestamp(0)
    val half = when(to_date(dateCol) <= to_date(lit(cp1)), "left")
      .otherwise("right")
    val l2 = cusumChangepointBy(df, half, dateCol, moneyValue)
      .select(lit(2).as("level"), col("segment"),
        col("n_days"), col("cp_day"), col("cusum_max"),
        col("mean_before"), col("mean_after"))
    l1.unionByName(l2).orderBy(col("level"), col("segment"))
  }

  /** Seasonal Mann–Kendall (Hirsch–Slack 1984) — the trend test that is
    * IMMUNE to weekly seasonality, the [[cusumSeasonalAdjusted]]
    * counterpart in the trend family: comparisons run only WITHIN each
    * weekday season (Monday vs Monday, never Monday vs Sunday), so a
    * pure weekly cycle contributes NOTHING to S while a genuine drift
    * still accumulates in every season. S = Σ_w S_w with
    * Var(S) = Σ_w [n_w(n_w−1)(2n_w+5) − Σ_t t(t−1)(2t+5)]/18 (ties
    * corrected within their own season, the Hirsch–Slack recipe) and the
    * continuity-corrected z; Sen's slope is the median over the
    * within-season pair slopes (real money/day — the pair gaps are
    * multiples of 7 days).
    *
    * Scale shape: exactly [[mannKendallTrend]] with the weekday riding
    * the pair join — the day side still broadcasts and the pair domain
    * SHRINKS ~7× (only same-weekday pairs); S/Var aggregate as exact
    * integers in DECIMAL(38,0); the Sen median rides the same
    * distributed bit-grid selection. Under 2 days in every season there
    * are no pairs: EMPTY result (the [[mannKendallTrend]] contract). */
  def mannKendallSeasonal(
      df: DataFrame, dateCol: Column, moneyValue: Column): DataFrame = {
    import graft.functions.dec2
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .select(
        pmod(datediff(col("d"), lit("1970-01-01").cast("date")), lit(7))
          .cast("long").as("w"),
        datediff(col("d"), lit("1970-01-01").cast("date")).cast("long").as("__dn"),
        // long cents in the pair kernel — the mannKendallTrend narrowing
        // (provably exact: decimal(18,2)·100 always fits a long)
        (col("rev") * 100).cast(LongType).as("__rc"))
      .localCheckpoint(false) // consumers: both pair sides, ties, counts
    val l = series.select(col("w"), col("__dn").as("i"), col("__rc").as("xi"))
    val r = series.select(col("w").as("w2"), col("__dn").as("j"), col("__rc").as("xj"))
    val pairs = l.join(broadcast(r), col("w") === col("w2") && col("j") > col("i"))
    // Sign + slope in one projection, consumers regenerate (the
    // mannKendallTrend decision).
    val slopes = pairs.select(lit("all").as("__one"),
      when(col("xj") > col("xi"), 1L).when(col("xj") < col("xi"), -1L)
        .otherwise(0L).as("__sgn"),
      when(col("j") > col("i"),
        (col("xj") - col("xi")).cast(DoubleType) /
          (lit(100.0) * (col("j") - col("i")))).as("sl"))
    val nAgg = series.agg(count(lit(1)).as("n_days"))
    // Σ_w n_w(n_w−1)(2n_w+5): the per-season base variance terms
    val vBase = series.groupBy(col("w")).agg(count(lit(1)).cast(dec38).as("nw"))
      .agg(sum(col("nw") * (col("nw") - 1) * (col("nw") * 2 + 5)).as("vbase"))
    // ties WITHIN their season (the Hirsch–Slack correction)
    val tieAgg = series.groupBy(col("w"), col("__rc")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t").cast(dec38) * (col("t") - 1) * (col("t") * 2 + 5)),
        lit(0L).cast(dec38)).as("ties"))
    // Sen + S fused into one pair-domain consumption (the
    // mannKendallTrend fusion)
    val senS = Robust.weightedMedianWithSums(
      slopes, "__one", col("sl"), lit(1L), Seq("s" -> col("__sgn")))
      .select(col("w_median").as("sen_slope"), col("s"))
    val vnum = col("vbase") - col("ties")
    val sD = col("s").cast(DoubleType)
    val cc = when(col("s") > 0, lit(1.0)).when(col("s") < 0, lit(-1.0))
      .otherwise(lit(0.0))
    nAgg.crossJoin(broadcast(vBase))
      .crossJoin(broadcast(tieAgg)).crossJoin(broadcast(senS))
      .select(
        col("n_days"), col("s").as("s_stat"),
        round(when(vnum > 0, (sD - cc) /
          sqrt(vnum.cast(DoubleType) / lit(18.0))), 6).as("z_stat"),
        col("sen_slope"))
  }

  /** Naive-forecast backtest over the daily money metric — the "how
    * predictable is this series, and does weekly seasonality matter?"
    * readout: for each lag L in `lags`, forecast day d as the actual of
    * day d−L (the lag-1 naive and lag-7 seasonal-naive baselines every
    * forecasting effort must beat — a model that can't outdo lag-7 on a
    * weekly-cyclic series adds nothing), scored only on days whose lag
    * source exists (calendar gaps drop honestly, no imputation). One
    * row per model with the standard backtest panel, every sum exact
    * integer cents until one double conversion per output column:
    * MAE, RMSE, WAPE = Σ|err|/Σ|actual| (the ratio-of-sums form —
    * per-row percentage averages are scale-unstable AND
    * summation-order-unstable in doubles; ratio-of-sums is neither),
    * and signed bias (mean error — systematic over/under-forecast).
    *
    * Scale shape: day-domain pre-agg (one keyed shuffle), one
    * broadcast self-join per lag on exact epoch-day arithmetic over
    * the calendar-bounded table, map-side-combined decimal sums —
    * |lags| rows out at any data scale. */
  /** Per-`segmentCol` seasonal Mann–Kendall — each segment's own
    * seasonality-immune "am I drifting?" (the grouped-gate convention
    * applied to [[mannKendallSeasonal]], completing the family: seasonal
    * CUSUM got its grouped form in round 10). Exactly the Hirsch–Slack
    * algebra with the segment riding EVERY key: per-(segment, day)
    * pre-agg, pairs equi-joined on (segment, weekday) (+ j > i) over the
    * calendar-bounded day table — still SF-invariant and ~7× smaller
    * than the unseasonal pair set — per-(segment, season) base-variance
    * and tie terms rolled up per segment, and the per-segment Sen median
    * AND S fused into ONE pair-domain consumption
    * ([[Robust.weightedMedianWithSums]] keyed by segment). Segments with
    * < 2 days in every season have no pairs and DROP (the
    * [[mannKendallTrend]] EMPTY contract applied per segment). */
  def mannKendallSeasonalBy(
      df: DataFrame, segmentCol: Column, dateCol: Column,
      moneyValue: Column): DataFrame = {
    import graft.functions.dec2
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(segmentCol.as("seg"), to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .select(col("seg"),
        pmod(datediff(col("d"), lit("1970-01-01").cast("date")), lit(7))
          .cast("long").as("w"),
        datediff(col("d"), lit("1970-01-01").cast("date")).cast("long").as("__dn"),
        // long cents in the pair kernel — the mannKendallTrend narrowing
        // (provably exact: decimal(18,2)·100 always fits a long)
        (col("rev") * 100).cast(LongType).as("__rc"))
      .localCheckpoint(false) // consumers: both pair sides, ties, counts
    val l = series.select(col("seg"), col("w"), col("__dn").as("i"), col("__rc").as("xi"))
    val r = series.select(col("seg").as("__sr"), col("w").as("w2"),
      col("__dn").as("j"), col("__rc").as("xj"))
    val pairs = l.join(broadcast(r),
      col("seg") === col("__sr") && col("w") === col("w2") && col("j") > col("i"))
    // Sign + slope in one projection, consumers regenerate (the
    // mannKendallTrend decision). Same load-bearing when() guard.
    val slopes = pairs.select(col("seg"),
      when(col("xj") > col("xi"), 1L).when(col("xj") < col("xi"), -1L)
        .otherwise(0L).as("__sgn"),
      when(col("j") > col("i"),
        (col("xj") - col("xi")).cast(DoubleType) /
          (lit(100.0) * (col("j") - col("i")))).as("sl"))
    val nAgg = series.groupBy(col("seg")).agg(count(lit(1)).as("n_days"))
    val vBase = series.groupBy(col("seg"), col("w"))
      .agg(count(lit(1)).cast(dec38).as("nw"))
      .groupBy(col("seg"))
      .agg(sum(col("nw") * (col("nw") - 1) * (col("nw") * 2 + 5)).as("vbase"))
    val tieAgg = series.groupBy(col("seg"), col("w"), col("__rc"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("seg"))
      .agg(coalesce(sum(col("t").cast(dec38) * (col("t") - 1) * (col("t") * 2 + 5)),
        lit(0L).cast(dec38)).as("ties"))
    val senS = Robust.weightedMedianWithSums(
      slopes, "seg", col("sl"), lit(1L), Seq("s" -> col("__sgn")))
      .select(col("seg"), col("w_median").as("sen_slope"), col("s"))
    val vnum = col("vbase") - col("ties")
    val sD = col("s").cast(DoubleType)
    val cc = when(col("s") > 0, lit(1.0)).when(col("s") < 0, lit(-1.0))
      .otherwise(lit(0.0))
    nAgg.join(broadcast(vBase), "seg").join(broadcast(tieAgg), "seg")
      .join(broadcast(senS), "seg")
      .select(
        col("seg").as("segment"),
        col("n_days"), col("s").as("s_stat"),
        round(when(vnum > 0, (sD - cc) /
          sqrt(vnum.cast(DoubleType) / lit(18.0))), 6).as("z_stat"),
        col("sen_slope"))
      .orderBy(col("segment"))
  }

  def forecastBacktest(
      df: DataFrame, dateCol: Column, moneyValue: Column,
      lags: Seq[Int] = Seq(1, 7)): DataFrame = {
    import graft.functions.dec2
    require(lags.nonEmpty && lags.forall(_ >= 1), s"need lags >= 1, got $lags")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .select(
        datediff(col("d"), lit("1970-01-01").cast("date")).cast("long").as("__dn"),
        (col("rev") * 100).cast(dec38).as("__rc"))
      .localCheckpoint(false) // 2·|lags| pair-side consumers of one pre-agg
    val scored = lags.map { lag =>
      val f = series.select(col("__dn").as("__fdn"), col("__rc").as("__fc"))
      series.join(broadcast(f), col("__dn") === col("__fdn") + lit(lag.toLong))
        .select(lit(s"lag_$lag").as("model"),
          (col("__rc") - col("__fc")).as("err"), col("__rc").as("act"))
    }.reduce(_ unionByName _)
    scored.groupBy(col("model")).agg(
        count(lit(1)).as("n_days"),
        sum(abs(col("err"))).as("__sae"),
        sum(col("err") * col("err")).as("__sse"),
        sum(abs(col("act"))).as("__sa"),
        sum(col("err")).as("__se"))
      .select(
        col("model"), col("n_days"),
        round(col("__sae").cast(DoubleType) /
          (col("n_days").cast(DoubleType) * lit(100.0)), 6).as("mae"),
        round(sqrt(col("__sse").cast(DoubleType) /
          col("n_days").cast(DoubleType)) / lit(100.0), 6).as("rmse"),
        round(col("__sae").cast(DoubleType) / col("__sa").cast(DoubleType), 6)
          .as("wape"),
        round(col("__se").cast(DoubleType) /
          (col("n_days").cast(DoubleType) * lit(100.0)), 6).as("bias"))
      .orderBy(col("model"))
  }

  /** Per-`segmentCol` naive-forecast backtest — each segment's own
    * predictability panel (the grouped-gate convention: the corpus
    * total can be lag-7-predictable while one category is pure noise).
    * Exactly [[forecastBacktest]] with the segment riding every key:
    * per-(segment, day) pre-agg, lag joins on (segment, epoch-day),
    * sums keyed by (segment, model) — |segments|·|lags| rows out. */
  def forecastBacktestBy(
      df: DataFrame, segmentCol: Column, dateCol: Column,
      moneyValue: Column, lags: Seq[Int] = Seq(1, 7)): DataFrame = {
    import graft.functions.dec2
    require(lags.nonEmpty && lags.forall(_ >= 1), s"need lags >= 1, got $lags")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(segmentCol.as("seg"), to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .select(col("seg"),
        datediff(col("d"), lit("1970-01-01").cast("date")).cast("long").as("__dn"),
        (col("rev") * 100).cast(dec38).as("__rc"))
      .localCheckpoint(false) // 2·|lags| pair-side consumers of one pre-agg
    val scored = lags.map { lag =>
      val f = series.select(col("seg").as("__fs"), col("__dn").as("__fdn"),
        col("__rc").as("__fc"))
      series.join(broadcast(f),
          col("seg") === col("__fs") && col("__dn") === col("__fdn") + lit(lag.toLong))
        .select(col("seg"), lit(s"lag_$lag").as("model"),
          (col("__rc") - col("__fc")).as("err"), col("__rc").as("act"))
    }.reduce(_ unionByName _)
    scored.groupBy(col("seg"), col("model")).agg(
        count(lit(1)).as("n_days"),
        sum(abs(col("err"))).as("__sae"),
        sum(col("err") * col("err")).as("__sse"),
        sum(abs(col("act"))).as("__sa"),
        sum(col("err")).as("__se"))
      .select(
        col("seg").as("segment"), col("model"), col("n_days"),
        round(col("__sae").cast(DoubleType) /
          (col("n_days").cast(DoubleType) * lit(100.0)), 6).as("mae"),
        round(sqrt(col("__sse").cast(DoubleType) /
          col("n_days").cast(DoubleType)) / lit(100.0), 6).as("rmse"),
        round(col("__sae").cast(DoubleType) / col("__sa").cast(DoubleType), 6)
          .as("wape"),
        round(col("__se").cast(DoubleType) /
          (col("n_days").cast(DoubleType) * lit(100.0)), 6).as("bias"))
      .orderBy(col("segment"), col("model"))
  }

  /** Forecast SKILL vs the seasonal-naive baseline — the judgment the
    * backtest panel withholds: MAE says how wrong lag-L is, but only the
    * ratio against the seasonal-naive says whether a model ADDS anything
    * over "same weekday last week" (the Hyndman–Koehler 2006 MASE shape
    * with the seasonal-naive denominator — the right yardstick for a
    * weekly-cyclic series; a model that can't beat mase < 1 adds
    * nothing). Evaluated on MATCHED days only (both the model's lag-L
    * source and the baseline's lag-`baselineLag` source exist), so
    * numerator and denominator score the SAME days — and mase(lag_7) ≡ 1
    * rides along as a built-in self-check. skill = 1 − mase (positive =
    * beats the baseline). A degenerate baseline (Σ|berr| = 0: the series
    * IS exactly weekly-periodic) yields NULL mase/skill, not a division
    * blow-up.
    *
    * Scale shape: the [[forecastBacktest]] day-domain pre-agg, TWO
    * broadcast lag joins per model over the calendar-bounded day table
    * (one more join on the domain the backtest already pays for); exact
    * integer-cents |err| sums; the only doubles are the final mae/mase/
    * skill divisions, each a fixed chain the oracle replays. */
  def forecastSkill(
      df: DataFrame, dateCol: Column, moneyValue: Column,
      lags: Seq[Int] = Seq(1, 7), baselineLag: Int = 7): DataFrame = {
    import graft.functions.dec2
    require(lags.nonEmpty && lags.forall(_ >= 1), s"need lags >= 1, got $lags")
    require(baselineLag >= 1, s"need baselineLag >= 1, got $baselineLag")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = df.groupBy(to_date(dateCol).as("d"))
      .agg(sum(dec2(moneyValue)).cast("decimal(18,2)").as("rev"))
      .select(
        datediff(col("d"), lit("1970-01-01").cast("date")).cast("long").as("__dn"),
        (col("rev") * 100).cast(dec38).as("__rc"))
      .localCheckpoint(false) // 3·|lags| pair-side consumers of one pre-agg
    val scored = lags.map { lag =>
      val f = series.select(col("__dn").as("__fdn"), col("__rc").as("__fc"))
      val b = series.select(col("__dn").as("__bdn"), col("__rc").as("__bc"))
      series
        .join(broadcast(f), col("__dn") === col("__fdn") + lit(lag.toLong))
        .join(broadcast(b), col("__dn") === col("__bdn") + lit(baselineLag.toLong))
        .select(lit(s"lag_$lag").as("model"),
          abs(col("__rc") - col("__fc")).as("aerr"),
          abs(col("__rc") - col("__bc")).as("berr"))
    }.reduce(_ unionByName _)
    scored.groupBy(col("model")).agg(
        count(lit(1)).as("n_days"),
        sum(col("aerr")).as("__sae"),
        sum(col("berr")).as("__sbe"))
      .select(
        col("model"), col("n_days"),
        round(col("__sae").cast(DoubleType) /
          (col("n_days").cast(DoubleType) * lit(100.0)), 6).as("mae"),
        round(col("__sbe").cast(DoubleType) /
          (col("n_days").cast(DoubleType) * lit(100.0)), 6).as("baseline_mae"),
        when(col("__sbe") > 0,
          round(col("__sae").cast(DoubleType) / col("__sbe").cast(DoubleType), 6))
          .as("mase"),
        when(col("__sbe") > 0,
          round(lit(1.0) -
            col("__sae").cast(DoubleType) / col("__sbe").cast(DoubleType), 6))
          .as("skill"))
      .orderBy(col("model"))
  }

  /** Last-touch revenue attribution: each `convType` event credits its
    * value to the LATEST `touchTypes` event by the same user at or before
    * it and within `windowMinutes`; conversions with no qualifying touch
    * fall into the `"direct"` channel.
    *
    * Same single-shuffle union+running-window formulation as
    * [[AsOfJoin]] — touches and conversions interleave on one
    * (user, time)-ordered window carrying the last touch as a running
    * `(ts, type)` struct, so there is no time-range join and per-key state
    * is one value; at any scale the cost is one keyed shuffle + sort.
    * Touch rows sort before a conversion at the same instant (`<=`
    * semantics); `event_id` makes same-instant touch order total.
    * Conversion values aggregate through exact DECIMAL(18,2).
    */
  def lastTouchAttribution(
      events: DataFrame, touchTypes: Seq[String], convType: String,
      windowMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.moneySum
    val tagged = events
      .filter(col("event_type").isin(touchTypes :+ convType: _*))
      .select(
        col("event_id"), col("user_id"), col("ts"), col("value"),
        (col("event_type") === lit(convType)).as("is_conv"),
        when(col("event_type") =!= lit(convType),
          struct(col("ts").as("t"), col("event_type").as("ch"))).as("touch"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_conv").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("lt", last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("is_conv"))
      .select(
        when(col("lt").isNotNull &&
            unix_micros(col("ts")) - unix_micros(col("lt.t"))
              <= lit(windowMinutes * 60L * 1000000L),
          col("lt.ch")).otherwise(lit("direct")).as("channel"),
        col("value"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"), moneySum(col("value")).as("total_value"))
      .orderBy(col("channel"))
  }
}
