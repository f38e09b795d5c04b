package graft.relational

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exact-integer statistical inference over the `events` table:
  * autocorrelation, Wilson score ranking, Poisson-bootstrap confidence
  * intervals, and a salted permutation test.
  *
  * Everything here follows the repo's determinism contract: every
  * statistic is assembled from exact integer / decimal(38,0) sufficient
  * statistics and exits as a ppm (parts-per-million) integer, so the
  * DuckDB oracle replays the arithmetic bit-for-bit. The resampling
  * operators draw their randomness from salted md5 — the at-scale
  * pattern (a hash draw per row is embarrassingly parallel and
  * replayable; a seeded RNG stream is neither).
  */
object Inference {

  import Tables.load

  /** Lag-k autocorrelation (k = 1..6) of each event type's hourly
    * arrival-count series — the time-series diagnostic behind "is this
    * metric seasonal / trending" questions (and the sufficient statistic
    * of an AR(1) fit: r₁ IS the least-squares AR coefficient).
    *
    * The series is gap-filled to the global hour spine (a missing hour
    * is an observed zero, not a skipped sample — without the fill, lag
    * pairs would silently span gaps and the statistic would be wrong).
    * ACF_k = Σ_{t>k}(y_t−ȳ)(y_{t−k}−ȳ) / Σ_t(y_t−ȳ)², computed in the
    * cross-multiplied integer form (n·y_t − S over n², which cancels):
    * num_k = Σ (n·y_t − S)(n·y_{t−k} − S), den = Σ (n·y_t − S)² — a
    * RATIO of two integer sums, so unlike Pearson there is no square
    * root and the ppm output is exact.
    *
    * Scale shape: the heavy pass (hour bucketing) is one map-side
    * combinable aggregation of the fact table; the spine is
    * CALENDAR-BOUNDED (≤ 8.8k hours/year — the qSurvival posture), so
    * the per-type windows run over bounded partitions. Signed division
    * goes through sign·(|num| div den) because Spark `div` truncates
    * while DuckDB `//` floors — they agree only on non-negatives. */
  def qAcf(spark: SparkSession, dir: String, maxLag: Int = 6): DataFrame = {
    val hours = load(spark, dir, "events")
      .select(col("event_type"),
        expr("ts div 1000 div 3600000000").as("hour"))
    val counts = hours.groupBy("event_type", "hour")
      .agg(count(lit(1)).as("y"))
    val bounds = hours.agg(min("hour").as("h0"), max("hour").as("h1"))
    val spine = counts.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"))).as("hour"))
    val series = spine.join(counts, Seq("event_type", "hour"), "left")
      .withColumn("y", coalesce(col("y"), lit(0L)))
    val stats = series.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("y").as("s"))
    val w = Window.partitionBy("event_type").orderBy("hour")
    val lagCols = (1 to maxLag).map(k => lag(col("y"), k).over(w).as(s"l$k"))
    val lagged = series
      .select(col("event_type") +: col("hour") +: col("y") +: lagCols: _*)
      .join(broadcast(stats), "event_type")
      .withColumn("dev",
        expr("cast(n as decimal(38,0)) * y - cast(s as decimal(38,0))"))
    val termCols =
      sum(expr("dev * dev")).as("den") +:
        (1 to maxLag).map(k => sum(expr(
          s"case when l$k is not null then" +
            s" dev * (cast(n as decimal(38,0)) * l$k - s) end")).as(s"num$k"))
    val sums = lagged.groupBy("event_type").agg(termCols.head, termCols.tail: _*)
    val stackArgs = (1 to maxLag)
      .map(k => s"$k, num$k").mkString(s"stack($maxLag, ", ", ", ")")
    sums.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("n"), col("den"),
        expr(s"$stackArgs as (lag_k, num)"))
      .select(col("event_type"), col("lag_k").cast("long").as("lag_k"),
        col("n").as("n_hours"),
        expr("""cast(case when den = 0 then 0 else
            |  cast(case when num < 0 then -1 else 1 end as decimal(38,0))
            |  * ((1000000 * abs(num)) div den) end as bigint)"""
          .stripMargin).as("acf_ppm"))
      .orderBy("event_type", "lag_k")
  }

  /** Wilson-score lower-bound ranking of hour-of-day conversion — the
    * "sort by lower confidence bound, not by raw rate" rule that keeps a
    * 1/1 = 100% cell from outranking a 900/1000 = 90% cell.
    *
    * Exact-integer form of the z=1.96 lower bound (z² = 38416/10⁴
    * exactly): with t trials and s successes,
    *   LB = (s + z²/2 − √(z²·(s(t−s)/t) + z⁴/4)) / (t + z²)
    * multiplied through by 10⁴t so every operand is an integer:
    *   x   = 38416·(10⁴·s·(t−s) + 9604·t)·t
    *   num = t·(10⁴·s + 19208) − isqrt(x)
    *   lb  = 10⁶·num div (t·(10⁴·t + 38416))
    * isqrt is a floor integer square root made EXACT by two integer
    * Newton steps + ±1 guards on a double seed (the guards make the
    * result independent of double rounding), so both engines agree
    * bit-for-bit. At s=0 the radicand is the perfect square (19208·t)²
    * and the bound is exactly 0. Domain: x < 8·10³⁷ keeps every
    * intermediate inside decimal(38,0) — t up to ~10⁹ trials per group;
    * beyond that a per-group count this size would be pre-aggregated
    * into coarser cells before ranking anyway.
    *
    * Scale shape: one map-side combinable aggregation to 24 rows; the
    * ranking window runs over the bounded 24-row census. */
  def qWilsonCtr(spark: SparkSession, dir: String): DataFrame = {
    val cells = load(spark, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(expr("(ts div 1000 div 3600000000) % 24").as("hour_of_day"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("hit"))
      .groupBy("hour_of_day")
      .agg(count(lit(1)).as("t"), sum("hit").as("s"))
    val withLb = cells
      .withColumn("x", expr(
        """cast(38416 as decimal(38,0)) *
          |  (10000 * cast(s as decimal(38,0)) * (t - s) + 9604 * t) * t"""
          .stripMargin))
      // seed biased +2 above the double sqrt so Newton descends from
      // above; cast double→decimal directly (a floor-to-long would
      // overflow once sqrt(x) clears 2⁶³, which 10³⁷ radicands do)
      .withColumn("r0", expr(
        "greatest(cast(1 as decimal(38,0))," +
          " cast(sqrt(cast(x as double)) as decimal(38,0)) + 2)"))
      .withColumn("r1", expr("(r0 + x div r0) div 2"))
      .withColumn("r2", expr("(r1 + x div r1) div 2"))
      .withColumn("r3", expr("case when r2 * r2 > x then r2 - 1 else r2 end"))
      .withColumn("isq",
        expr("case when (r3 + 1) * (r3 + 1) <= x then r3 + 1 else r3 end"))
      .withColumn("wilson_lb_ppm", expr(
        """cast((1000000 * (cast(t as decimal(38,0)) * (10000 * s + 19208)
          |  - isq)) div (cast(t as decimal(38,0)) * (10000 * t + 38416))
          |  as bigint)""".stripMargin))
    withLb
      .select(col("hour_of_day"), col("t"), col("s"),
        expr("cast((1000000 * cast(s as decimal(38,0))) div t as bigint)")
          .as("rate_ppm"),
        col("wilson_lb_ppm"))
      // 24-row census — the bounded-cardinality global-window posture
      .withColumn("rank_lb", row_number().over(
        Window.orderBy(col("wilson_lb_ppm").desc, col("hour_of_day")))
        .cast("long"))
  }

  /** Cumulative Poisson(1) CDF scaled to u32, floored — P[m ≤ k] · 2³².
    * A salted-md5 u32 draw compared against these thresholds yields each
    * row's bootstrap multiplicity. Constants are exact integers, so both
    * engines produce identical multiplicities. */
  private[graft] val poissonThresholds: Seq[Long] = Seq(
    1580030168L, 3160060337L, 3950075421L, 4213413783L, 4279248373L,
    4292415291L, 4294609777L, 4294923276L, 4294962463L)

  private[graft] def poissonCase(u: String): String =
    poissonThresholds.zipWithIndex
      .map { case (t, k) => s"when $u < ${t}L then $k" }
      .mkString("case ", " ", " else 9 end")

  /** Poisson-bootstrap 90% confidence interval of the mean event value
    * (micro-cents) per event type — the bootstrap that actually runs at
    * 100 TB: a true resample-n-with-replacement needs coordinated draws
    * across the corpus, but Binomial(n, 1/n) → Poisson(1) per row as
    * n → ∞, so each row independently draws a REPLICATE-SALTED Poisson
    * multiplicity and every replicate's sum is one map-side combinable
    * aggregation. B = 32 replicates ride the same scan via one explode.
    *
    * Determinism: multiplicities come from md5('boot:b:event_id') u32
    * draws against exact Poisson CDF thresholds ([[poissonThresholds]]);
    * replicate means are integer micro-cents (decimal div); the CI is a
    * rank selection over the B means with the replicate id as tiebreak —
    * every step replays exactly in DuckDB. The interval is the
    * percentile bootstrap: ranks ⌈0.05·B⌉ and ⌈0.95·B⌉ of the sorted
    * replicate means. */
  def qBootstrapCi(spark: SparkSession, dir: String, b: Int = 32): DataFrame = {
    val ev = load(spark, dir, "events")
      .select(col("event_type"), col("event_id"),
        expr("cast(floor(value * 100 + 0.5) as long)").as("cents"))
    val reps = ev
      .select(col("event_type"), col("event_id"), col("cents"),
        explode(sequence(lit(0), lit(b - 1))).as("rep"))
      .withColumn("u", expr(
        """conv(substring(md5(concat('boot:', cast(rep as string), ':',
          |  cast(event_id as string))), 1, 8), 16, 10)""".stripMargin)
        .cast("long"))
      .withColumn("m", expr(poissonCase("u")))
    val repMeans = reps.groupBy("event_type", "rep")
      .agg(sum(expr("cast(m as long) * cents")).as("sum_cents"),
        sum("m").as("n_rep"))
      .filter(col("n_rep") > 0)
      .withColumn("mean_microcents", expr(
        "cast((1000000 * cast(sum_cents as decimal(38,0))) div n_rep" +
          " as bigint)"))
    val ranked = repMeans.withColumn("rk", row_number().over(
      Window.partitionBy("event_type")
        .orderBy(col("mean_microcents"), col("rep"))))
    val nReps = repMeans.groupBy("event_type")
      .agg(count(lit(1)).as("n_reps"))
    // rank ⌈0.05·B⌉ = smallest rk with 20·rk ≥ B (and ⌈0.95·B⌉ with
    // 20·rk ≥ 19·B); since means ascend with rk, min-over-the-suffix IS
    // the value at that rank — one aggregation, no second window
    val ci = ranked.join(broadcast(nReps), "event_type")
      .groupBy("event_type", "n_reps")
      .agg(
        min(when(expr("rk * 20 >= n_reps"), col("mean_microcents")))
          .as("lo"),
        min(when(expr("rk * 20 >= 19 * n_reps"), col("mean_microcents")))
          .as("hi"))
    val point = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .withColumn("mean_microcents", expr(
        "cast((1000000 * cast(sum_cents as decimal(38,0))) div n as bigint)"))
    point.select(col("event_type"), col("n"), col("mean_microcents"))
      .join(ci
        .select(col("event_type"), col("n_reps"),
          col("lo").as("ci_lo_microcents"),
          col("hi").as("ci_hi_microcents")),
        "event_type")
      .orderBy("event_type")
  }

  /** Stationary distribution of the event-type Markov chain — where the
    * user journey settles: π = πP for the empirical transition matrix
    * [[EventQueries.qEventTransitions]] publishes, by `iters` rounds of
    * fixed-point power iteration.
    *
    * Exact-integer contract: P is the ppm transition census (one
    * corpus aggregation — the ONLY corpus-scale pass); π starts uniform
    * (10⁶ div K) and each round applies π'ⱼ = (Σᵢ πᵢ·pᵢⱼ) div 10⁶ —
    * all long arithmetic (πᵢ·pᵢⱼ ≤ 10¹²·K), truncation is part of the
    * contract, so the unrolled DuckDB replay is bit-exact. The
    * iteration itself runs driver-side over the COLLECTED K² census
    * (event-type cardinality squared — kilobytes, the qSurvival
    * bounded-collect posture); at 100 TB only the transition census
    * grows, never the iteration state. States are the distinct
    * `prev_type`s (on this lake every type both emits and receives). */
  def qMarkovStationary(
      spark: SparkSession, dir: String, iters: Int = 20): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val tr = load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
      .withColumn("prev_type", lag("event_type", 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val ot = tr.groupBy("prev_type").agg(sum("n").as("out_n"))
    val cells = tr.join(broadcast(ot), "prev_type")
      .select(col("prev_type"), col("next_type"),
        expr("n * 1000000 div out_n").as("p_ppm"), col("out_n"))
      .as[(String, String, Long, Long)].collect()
    val states = cells.map(_._1).distinct.sorted
    val outN = cells.map(c => c._1 -> c._4).toMap
    var pi = states.map(_ -> 1000000L / states.length).toMap
    for (_ <- 1 to iters) {
      val next = states.map { j =>
        j -> cells.filter(_._2 == j)
          .map(c => pi.getOrElse(c._1, 0L) * c._3).sum / 1000000L
      }
      pi = next.toMap
    }
    states.toSeq.map(s => (s, pi(s), outN(s)))
      .toDF("event_type", "pi_ppm", "n_out")
  }

  /** Markov removal-effect attribution (Anderl et al.'s Markov-chain
    * attribution) — the model-based upgrade of last-touch
    * [[graft.relational.EventQueries]] attribution: a channel's credit
    * is how much the probability of REACHING conversion drops when
    * every path through that channel breaks. The chain is the observed
    * event-type transition census ([[qMarkovStationary]]'s machinery);
    * conversion = reaching 'purchase' within `steps` transitions from
    * the per-user first-event start distribution; removal pins the
    * channel's hit probability to 0 (broken-path semantics, no
    * renormalization). Attribution shares normalize the positive
    * removal effects to ppm.
    *
    * Exact integers: transition ppm by truncating division, the hit
    * recurrence h ← (Σ p·h) div 10⁶ per step, every chain replayed on
    * the collected K²-census (the model-publish pattern — states are
    * event types, a handful; the corpus-sized work is the ONE
    * transition aggregation). Unrolled per-channel in the oracle. */
  /** The collected Markov conversion model: transition ppm cells,
    * per-start-state user counts, sorted state universe — the ONE
    * corpus-sized aggregation behind [[qMarkovAttribution]] and
    * [[qShapleyAttribution]]. */
  private def markovCensus(spark: SparkSession, dir: String)
      : (Array[(String, String, Long)], Array[(String, Long)],
         Array[String]) = {
    import spark.implicits._
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val ev = load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
    val tr = ev
      .withColumn("prev_type", lag("event_type", 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val ot = tr.groupBy("prev_type").agg(sum("n").as("out_n"))
    val cells = tr.join(broadcast(ot), "prev_type")
      .select(col("prev_type"), col("next_type"),
        expr("n * 1000000 div out_n").as("p_ppm"))
      .as[(String, String, Long)].collect()
    val starts = ev
      .withColumn("rn", row_number().over(byUser))
      .filter(col("rn") === 1)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    val states =
      (cells.map(_._1) ++ cells.map(_._2) ++ starts.map(_._1))
        .distinct.sorted
    (cells, starts, states)
  }

  /** Truncated hit probability h(s) of reaching `purchase` within
    * `steps` transitions, every state in `removed` pinned to 0; then
    * the start-distribution overall — the shared removal-semantics
    * evaluator (exact integer ppm, truncating division). */
  private def markovReach(
      cells: Array[(String, String, Long)],
      starts: Array[(String, Long)], states: Array[String],
      steps: Int, removed: Set[String]): Long = {
    val target = "purchase"
    val bySrc = cells.groupBy(_._1)
    var h = states.map(s =>
      s -> (if (s == target) 1000000L else 0L)).toMap
    for (_ <- 1 to steps) {
      h = states.map { s =>
        if (s == target) s -> 1000000L
        else if (removed.contains(s)) s -> 0L
        else s -> (bySrc.getOrElse(s, Array.empty[(String, String, Long)])
          .map { case (_, t, p) => p * h(t) }.sum / 1000000L)
      }.toMap
    }
    val nUsers = starts.map(_._2).sum
    starts.map { case (s, n) =>
      n * (if (removed.contains(s)) 0L else h.getOrElse(s, 0L))
    }.sum / nUsers
  }

  def qMarkovAttribution(
      spark: SparkSession, dir: String, steps: Int = 8): DataFrame = {
    val (cells, starts, states) = markovCensus(spark, dir)
    val pFull = markovReach(cells, starts, states, steps, Set.empty)
    val rows = states.filter(_ != "purchase").map { c =>
      val pRem = markovReach(cells, starts, states, steps, Set(c))
      (c, pFull, pRem, pFull - pRem)
    }
    val totEff = rows.map(r => math.max(r._4, 0L)).sum
    spark.createDataFrame(rows.toSeq.map { case (c, pf, pr, eff) =>
      (c, pf, pr, eff,
        if (totEff == 0) 0L else math.max(eff, 0L) * 1000000L / totEff)
    }).toDF("channel", "p_full_ppm", "p_removed_ppm", "effect_ppm",
      "attribution_ppm")
  }

  /** EXACT Shapley attribution over the Markov conversion model — the
    * game-theoretic upgrade of [[qMarkovAttribution]]'s single-removal
    * effect: with channels C (the non-purchase states) as players and
    * coalition value v(S) = conversion reach when every channel OUTSIDE
    * S is removed, each channel's Shapley value is the weighted mean of
    * its marginal contributions over all 2^{k-1} coalitions. k is the
    * event-type universe minus the target (a handful), so the 2^k
    * coalition table is tiny and every v(S) replays the SAME integer
    * recurrence as the removal effect — all on the one collected
    * census; the corpus never re-scans.
    *
    * Exactness without factorial division: weights |S|!·(k−1−|S|)!/k!
    * are rationals with denominator k!, so the Shapley value is emitted
    * as `phi_xkf_ppm` = k!·φ in ppm, an exact integer combination of
    * coalition values, with the scale published as its own
    * `k_factorial` column (a FIXED schema — a data-dependent column
    * name would silently re-shape the output as the channel universe
    * grows); `phi_ppm` is the single truncating division by k!.
    * Efficiency property Σφ = v(C) − v(∅) holds exactly in the ×k!
    * units (spec-pinned). */
  def qShapleyAttribution(
      spark: SparkSession, dir: String, steps: Int = 8): DataFrame = {
    val (cells, starts, states) = markovCensus(spark, dir)
    val channels = states.filter(_ != "purchase").toSeq
    val k = channels.size
    require(k <= 8, s"2^k coalition enumeration needs few channels, got $k")
    def fact(n: Int): Long = (1 to n).map(_.toLong).product
    val kFact = fact(k)
    val v = collection.mutable.Map[Set[String], Long]()
    def valueOf(s: Set[String]): Long = v.getOrElseUpdate(s,
      markovReach(cells, starts, states, steps,
        channels.toSet -- s))
    val rows = channels.map { c =>
      val others = channels.filterNot(_ == c)
      val phiXk = others.toSet.subsets().map { s =>
        val w = fact(s.size) * fact(k - 1 - s.size)
        w * (valueOf(s + c) - valueOf(s))
      }.sum
      (c, valueOf(channels.toSet), kFact, phiXk,
        phiXk / kFact)
    }
    spark.createDataFrame(rows.map { case (c, vc, kf, px, p) =>
      (c, vc, kf, px, p)
    }).toDF("channel", "v_full_ppm", "k_factorial", "phi_xkf_ppm",
      "phi_ppm")
  }

  /** Wald's SPRT over the hourly conversion stream — the SEQUENTIAL
    * testing primitive the fixed-horizon [[qPermutationTest]] family
    * lacks: monitor the cumulative log-likelihood ratio of H₁: p = p₁
    * against H₀: p = p₀ as cohorts arrive, stop the first hour the walk
    * exits (B, A). Design constants (p₀ = 0.40, p₁ = 0.50,
    * α = β = 0.05) become micronat INTEGER literals interpolated once
    * from Scala (the ndcgWeights discipline — no engine ever computes a
    * logarithm), so the whole walk is exact integer arithmetic.
    *
    * Per user: converted = made a >120-value purchase (the
    * [[qPermutationTest]] outcome), attributed to the user's FIRST-seen
    * hour (each user enters the test once). Per hour: the LLR
    * increment c·ln(p₁/p₀) + (n−c)·ln((1−p₁)/(1−p₀)), the cumulative
    * walk, and the decision state — `continue` until the first
    * boundary crossing, then frozen (the sequential-test contract:
    * evidence after stopping is not consumed).
    *
    * Scale shape: one map-side-combinable per-user reduction, one
    * calendar-bounded hourly census, windows over the bounded spine,
    * and a one-row broadcast crossing scalar. */
  def qSprt(spark: SparkSession, dir: String): DataFrame = {
    // micronat literals: ln(0.5/0.4), ln(0.5/0.6), ln(19), ln(1/19)
    val w1 = math.floor(math.log(0.5 / 0.4) * 1e6).toLong
    val w0 = math.floor(math.log(0.5 / 0.6) * 1e6).toLong
    val a = math.floor(math.log(0.95 / 0.05) * 1e6).toLong
    val b = -a
    val users = load(spark, dir, "events")
      .groupBy("user_id")
      .agg(min(expr("ts div 1000 div 3600000000")).as("hour"),
        max(when(col("event_type") === "purchase" &&
          col("value") > 120.0, 1L).otherwise(0L)).as("conv"))
    val hourly = users.groupBy("hour")
      .agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv"))
      .withColumn("llr_mnat",
        col("n_conv") * w1 + (col("n_users") - col("n_conv")) * w0)
      .withColumn("cum_llr_mnat",
        sum("llr_mnat").over(Window.orderBy("hour")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val cross = hourly
      .filter(col("cum_llr_mnat") >= a || col("cum_llr_mnat") <= b)
      .agg(min(struct(col("hour"), col("cum_llr_mnat"))).as("m"))
      .select(col("m.hour").as("cross_hour"),
        col("m.cum_llr_mnat").as("cross_llr"))
    hourly.crossJoin(broadcast(cross))
      .select(col("hour"), col("n_users"), col("n_conv"),
        col("llr_mnat"), col("cum_llr_mnat"),
        when(col("cross_hour").isNull || col("hour") < col("cross_hour"),
          "continue")
          .when(col("cross_llr") >= a, "accept_h1")
          .otherwise("accept_h0").as("decision"))
  }

  /** Salted permutation test of the A/B conversion difference — the
    * exact-inference twin of [[EventQueries.qAbTest]]'s χ²: does the
    * observed variant imbalance exceed what relabeling chance produces?
    *
    * Statistic: |convA·nB − convB·nA| (the conversion-rate difference
    * cross-multiplied into one integer — no division, no doubles).
    * Each permutation p ∈ 1..P relabels every user by an md5('perm:p:u')
    * u32 parity draw (< 2³¹ → group 0), so all P permutations ride ONE
    * fan-out scan of the per-user table and reduce map-side — the only
    * shuffle is (p) with P groups. p-value is the add-one estimate
    * (1 + #{p : stat_p ≥ stat_obs}) / (P + 1) in ppm, which is both the
    * standard bias correction and a guarantee the reported p is never 0.
    */
  def qPermutationTest(spark: SparkSession, dir: String, p: Int = 128)
      : DataFrame = {
    val perUser = load(spark, dir, "events")
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" &&
          col("value") > 120.0, 1L).otherwise(0L)).as("converted"))
    def stat(grpCol: String): org.apache.spark.sql.Column = expr(
      s"""abs(cast(sum(case when $grpCol = 0 then converted else 0 end)
         |      as decimal(38,0))
         |    * sum(case when $grpCol = 1 then 1 else 0 end)
         |  - cast(sum(case when $grpCol = 1 then converted else 0 end)
         |      as decimal(38,0))
         |    * sum(case when $grpCol = 0 then 1 else 0 end))"""
        .stripMargin)
    val obs = perUser
      .withColumn("grp", expr("cast(user_id % 2 as int)"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("grp") === 0, col("converted"))).as("conv0"),
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("grp") === 1, col("converted"))).as("conv1"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n1"),
        stat("grp").as("stat_obs"))
    val perms = perUser
      .select(col("user_id"), col("converted"),
        explode(sequence(lit(1), lit(p))).as("p"))
      .withColumn("grp", expr(
        """case when cast(conv(substring(md5(concat('perm:',
          |  cast(p as string), ':', cast(user_id as string))), 1, 8),
          |  16, 10) as long) < 2147483648 then 0 else 1 end"""
          .stripMargin))
      .groupBy("p").agg(stat("grp").as("stat_p"))
    perms.crossJoin(broadcast(obs))
      .groupBy("n_users", "conv0", "n0", "conv1", "n1")
      .agg(max(col("stat_obs")).as("stat_obs_d"),
        sum(when(col("stat_p") >= col("stat_obs"), 1L).otherwise(0L))
          .as("n_ge"))
      .select(col("n_users"), col("conv0"), col("n0"), col("conv1"),
        col("n1"), col("stat_obs_d").cast("long").as("stat_obs"),
        col("n_ge"),
        expr(s"cast(((1 + n_ge) * 1000000) div ${p + 1} as bigint)")
          .as("p_value_ppm"))
  }

  /** Isotonic calibration curve (pool-adjacent-violators) of return
    * rate against price — the monotone-fit primitive behind score
    * calibration: the best monotone non-decreasing approximation of the
    * per-bin rate, via the MINIMAX closed form
    * `g(i) = max_{j≤i} min_{k≥i} avg(y[j..k])` (equivalent to PAV, but
    * expressible as joins instead of a sequential pooling loop).
    *
    * The x-axis is exact-cents price bins (`cents div 100000`, $1000
    * wide — never a rank-derived bin, which would shift with the data);
    * range averages come from prefix sums over the BOUNDED bin
    * histogram and are fixed-point `S·10¹² div N` integers, so both
    * engines replay the identical fit (the fit is monotone by
    * construction of max-min regardless of the flooring). Scale shape:
    * ONE map-side-combinable corpus aggregation to ≤ ~100 bins; the
    * minimax runs over the bounded bin³ straddle relation (a constant
    * ~10⁵ rows, independent of corpus size) — the qWilsonCtr
    * bounded-census posture. */
  def qIsotonic(spark: SparkSession, dir: String): DataFrame = {
    val bins = load(spark, dir, "lineitem")
      .select(
        expr("floor(l_extendedprice * 100 + 0.5) div 100000").as("bin"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum("y").as("s"))
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val idx = bins
      .withColumn("i", row_number().over(Window.orderBy("bin")).cast("long"))
      .withColumn("cn", sum("n").over(w))
      .withColumn("cs", sum("s").over(w))
    val pre = idx.select(col("i").as("p_i"), col("cn"), col("cs"))
      .unionByName(
        bins.sparkSession.range(1).select(lit(0L).as("p_i"),
          lit(0L).as("cn"), lit(0L).as("cs")))
    val ranges = pre.as("lo").join(pre.as("hi"),
        col("lo.p_i") < col("hi.p_i"))
      .select((col("lo.p_i") + 1).as("j"), col("hi.p_i").as("k"),
        (col("hi.cs") - col("lo.cs")).as("rs"),
        (col("hi.cn") - col("lo.cn")).as("rn"))
      .withColumn("avg_fp",
        expr("cast((cast(rs as decimal(38,0)) * 1000000000000) div rn as bigint)"))
    val straddle = idx.select(col("i"), col("bin"), col("n"), col("s"))
      .join(ranges, col("j") <= col("i") && col("k") >= col("i"))
    straddle
      .groupBy("i", "bin", "n", "s", "j")
      .agg(min("avg_fp").as("m_j"))
      .groupBy("i", "bin", "n", "s")
      .agg(max("m_j").as("iso_fp"))
      .select(col("bin"), col("n"), col("s"),
        expr("(s * 1000000) div n").as("rate_ppm"), col("iso_fp"))
  }

  /** Split (Mondrian / group-conditional) conformal prediction — the
    * distribution-free calibration step a model-serving pipeline runs:
    * per group (return flag), the 90th-percentile calibration residual
    * `q̂` = the `ceil(0.9·(n+1))`-th smallest |unit price − retail
    * price| on the odd-order calibration half, then the achieved
    * coverage of `|residual| ≤ q̂` on the even-order test half —
    * guaranteed ≥ 90% in expectation by exchangeability, reported
    * exactly in ppm.
    *
    * Exact order statistic at scale: residuals are integer cents, so
    * the quantile comes from the VALUE-histogram + cumulative-count
    * walk (`min value with cum ≥ m`) — the qKmvQuantiles
    * histogram-first discipline, never a global sort of the corpus;
    * the per-group window runs over the bounded distinct-cents
    * histogram. */
  def qConformal(spark: SparkSession, dir: String): DataFrame = {
    val res = load(spark, dir, "lineitem")
      .join(load(spark, dir, "part")
        .select(col("p_partkey"), col("p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_returnflag").as("grp"),
        (col("l_orderkey") % 2).as("half"),
        abs(expr(
          "floor(l_extendedprice * 100 + 0.5) div cast(l_quantity as bigint)")
          - expr("floor(p_retailprice * 100 + 0.5)")).as("r"))
    val cal = res.filter(col("half") === 1)
    val calN = cal.groupBy("grp").agg(count(lit(1)).as("n_cal"))
      .withColumn("m", expr("(9 * n_cal + 18) div 10"))
    val hist = cal.groupBy("grp", "r").agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum("c").over(Window.partitionBy("grp").orderBy("r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val qhat = cum.join(broadcast(calN), "grp")
      .filter(col("cum") >= col("m"))
      .groupBy("grp").agg(min("r").as("qhat"),
        first("n_cal").as("n_cal"), first("m").as("m_rank"))
    res.filter(col("half") === 0)
      .join(broadcast(qhat), "grp")
      .groupBy("grp")
      .agg(first("n_cal").as("n_cal"), first("m_rank").as("m_rank"),
        first("qhat").as("qhat"),
        count(lit(1)).as("n_test"),
        sum(when(col("r") <= col("qhat"), 1L).otherwise(0L))
          .as("n_covered"))
      .withColumn("coverage_ppm",
        expr("(n_covered * 1000000) div n_test"))
  }
}
