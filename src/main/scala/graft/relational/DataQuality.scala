package graft.relational

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Data-quality census operators — the checks a lake runs before (and
  * after) every pipeline stage, as first-class queries rather than
  * ad-hoc notebook cells.
  *
  * - [[qFkCheck]]: referential-integrity audit across every declared
  *   FK edge of the star schema. Each edge is one left-anti join of
  *   the child's DISTINCT key set against the (broadcast) parent keys
  *   — the child fact table aggregates to its key distinct BEFORE any
  *   join, so a 100 TB fact costs one map-side-combinable distinct,
  *   never a fact×parent shuffle.
  * - [[qSchemaProfile]]: per-column completeness/cardinality/extrema
  *   census over lineitem. One pass: every column's (null-count,
  *   distinct, min, max) computes in a single aggregation (16 parallel
  *   aggregates over one scan), then unpivots to a row per column.
  *   Extrema travel as canonical strings (numerics via exact integer
  *   or fixed-cent renderings) so one schema fits every column and the
  *   oracle agrees byte-for-byte.
  */
object DataQuality {

  import Tables.load

  /** Orphan counts for every FK edge; all-zero on a consistent lake.
    * `n_child_keys` sizes the audit (distinct keys checked per edge).
    * NULL child keys are excluded before the distinct: a NULL never
    * equi-matches the parent side, so counting it as an orphan would
    * report a nullable-FK column as referential breakage — n_orphans
    * means only NON-NULL keys missing from the parent. */
  def qFkCheck(spark: SparkSession, dir: String): DataFrame = {
    def edge(name: String, childTable: String, childKey: String,
        parentTable: String, parentKey: String): DataFrame = {
      val keys = load(spark, dir, childTable)
        .filter(col(childKey).isNotNull)
        .select(col(childKey).as("k")).distinct()
      val parents = load(spark, dir, parentTable)
        .select(col(parentKey).as("k")).distinct()
      keys
        .join(broadcast(parents.withColumn("hit", lit(1))), Seq("k"), "left")
        .agg(count(lit(1)).as("n_child_keys"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("fk_edge"), col("n_child_keys"),
          col("n_orphans"))
    }
    Seq(
      edge("lineitem.orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      edge("lineitem.partkey->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      edge("lineitem.suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      edge("orders.custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      edge("customer.nationkey->nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      edge("supplier.nationkey->nation", "supplier", "s_nationkey",
        "nation", "n_nationkey"),
      edge("nation.regionkey->region", "nation", "n_regionkey",
        "region", "r_regionkey"))
      .reduce(_ unionAll _)
  }

  /** Benford first-digit forensics over order totals — the fraud/
    * synthetic-data smell test: organically-grown magnitudes follow
    * P(d) = log₁₀(1 + 1/d); uniform generators (like this synthetic
    * lake's) don't, and the χ² statistic quantifies the departure. The
    * digit census is exact integer work (first char of the cents
    * rendering); expectations and the χ² terms are the only IEEE ops,
    * computed from the same literal formula in both engines and rounded
    * (the q_ab_test discipline). One 9-group aggregation. */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    val digits = load(spark, dir, "orders")
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val total = digits.agg(sum("n_obs").as("n"))
    digits.crossJoin(broadcast(total))
      .select(col("digit").cast("long").as("digit"), col("n_obs"),
        round(expr("cast(n as double) * log10(1.0 + 1.0 / digit)"), 4)
          .as("n_expected"),
        round(expr(
          "pow(cast(n_obs as double) - cast(n as double) * log10(1.0 + 1.0 / digit), 2)" +
            " / (cast(n as double) * log10(1.0 + 1.0 / digit))"), 4)
          .as("chi2_term"))
  }

  /** Gini concentration of the token frequency distribution per
    * language — the inequality scalar behind "a few tokens dominate
    * the corpus" (vocabulary concentration drives BPE merge value and
    * dedup bucket skew alike). With frequencies ranked ascending
    * (ties broken by token), G = (2·Σ i·fᵢ − (n+1)·Σ fᵢ) / (n·Σ fᵢ)
    * — every sum exact integer over the token TYPE table (Heaps-law
    * bounded), emitted in ppm by integer division. The rank window
    * partitions by lang. */
  def qGini(spark: SparkSession, dir: String): DataFrame = {
    val freq = load(spark, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("f"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("f"), col("tok"))
    freq
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_types"), sum("f").as("n_tokens"),
        sum(expr("cast(i as decimal(38,0)) * f")).as("s_if"))
      .select(col("lang"), col("n_types"), col("n_tokens"),
        expr("cast((cast(2 as decimal(38,0)) * s_if" +
          " - cast(n_types + 1 as decimal(38,0)) * n_tokens) * 1000000" +
          " div (cast(n_types as decimal(38,0)) * n_tokens) as bigint)")
          .as("gini_ppm"))
  }

  /** One row per lineitem column: nulls, distinct count, extrema as
    * canonical strings (doubles in exact cents, dates as yyyy-MM-dd). */
  def qSchemaProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    // TRUE extrema on the native column, rendered canonically AFTER the
    // aggregate (string-typed extrema would be lexicographic: "10"<"9")
    def canonOf(c: Column, typeName: String): Column = typeName match {
      case "double" => floor(c * 100 + 0.5).cast("long").cast("string")
      case "timestamp" | "timestamp_ntz" => date_format(c, "yyyy-MM-dd")
      case _ => c.cast("string")
    }
    val cols = li.schema.fieldNames.toSeq
    // nulls + extrema: plain aggregates, ONE scan for all columns
    val aggs = cols.flatMap { c =>
      val tn = li.schema(c).dataType.typeName
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        canonOf(min(col(c)), tn).as(s"${c}__min"),
        canonOf(max(col(c)), tn).as(s"${c}__max"))
    }
    val wide = li.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__min, ${c}__max").mkString(", ")
    val base = wide.selectExpr(
      s"stack(${cols.length}, $stackArgs) as (col_name, n_nulls, min_s, max_s)")
    // exact distinct counts as a UNION of single-distinct aggregates:
    // n distincts in ONE aggregate make Catalyst Expand the fact table
    // n+1 times (22.9 s at sf0.1 vs 1.9 s this way); separately, each
    // subtree scans exactly one column through parquet pruning
    val distincts = cols.map { c =>
      li.agg(countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_distinct"))
    }.reduce(_ unionAll _)
    base.join(broadcast(distincts), "col_name")
      .select("col_name", "n_nulls", "n_distinct", "min_s", "max_s")
  }

  /** k-anonymity / l-diversity census of the events table under the
    * quasi-identifier tuple (event_type, hour-of-day, value bucket) with
    * user_id as the sensitive attribute — the privacy gate a
    * training-data release runs before shipping interaction logs.
    * k-anonymity asks "how many rows sit in re-identifiable (small)
    * equivalence classes"; l-diversity asks "does any class expose a
    * single user". All-integer: fixed-width value buckets (cents div
    * 5000 — NEVER rank-based deciles, whose boundaries shift with the
    * data and break replay), epoch-hour-of-day arithmetic, ppm shares.
    * Two aggregations: rows → classes (with one exact distinct per
    * class), classes → the one-row census. At 100 TB the class table is
    * the bounded relation (QI-cardinality-sized), so the census costs
    * one scan plus a class-keyed shuffle. */
  /** Differentially-private release counts per event type — the ε-DP
    * Laplace mechanism with DETERMINISTIC noise: the uniform draw is a
    * salted md5 (the [[graft.pipeline.TrainingData]] sampling
    * discipline — no rand(), so reruns and oracles reproduce
    * bit-for-bit), mapped through the Laplace inverse CDF
    *   x = −(Δf/ε)·sgn(u−½)·ln(1−2|u−½|)
    * with sensitivity Δf = 1 for counting queries. The ln sits in the
    * repo's accepted IEEE family (perplexity / HLL linear counting /
    * NB micronats); noise quantizes by floor(x+½), which both engines
    * compute from the same double. The true count rides along because
    * this operator's job in THIS repo is to be verifiable — a real
    * release would project it away (and would need a fresh secret salt
    * per release; a public salt de-randomizes the mechanism). One
    * aggregation; the noise math is per-GROUP, k rows. */
  def qDpCounts(
      spark: SparkSession, dir: String,
      epsilonPct: Int = 10, seed: String = "graft-dp"): DataFrame =
    load(spark, dir, "events")
      .groupBy("event_type").agg(count(lit(1)).as("n_true"))
      .withColumn("u", expr(
        s"cast(conv(substring(md5(concat('$seed:', event_type)), 1, 13)," +
          " 16, 10) as double) / 4503599627370496.0"))
      // greatest(..., 1e-15) fences the u ∈ {0, 1} singularity (an
      // md5-fixed 2^-52 event, but an infinity would poison the release)
      .withColumn("noise", expr(
        s"cast(floor(-(100.0 / $epsilonPct)" +
          " * sign(u - 0.5)" +
          " * ln(greatest(1.0 - 2.0 * abs(u - 0.5), 1e-15)) + 0.5)" +
          " as bigint)"))
      .select(col("event_type"), col("n_true"),
        (col("n_true") + col("noise")).as("n_noisy"),
        lit(epsilonPct.toLong).as("epsilon_pct"))

  /** ε-DP median (exponential mechanism, McSherry & Talwar) per event
    * type — the quantile-release sibling of [[qDpCounts]]: candidates
    * are the fixed-width value bins of [[qKAnonymity]] (rank-free, so
    * replayable), utility is the negated rank distance to the median
    * in doubled-integer units (u₂ = −|2·cum(b) − n|, ties absorbed
    * without halves), and selection is the Gumbel-max trick — argmax
    * of ε·u₂/4 + Gumbel(md5-derived uniform), which samples exactly
    * the exponential-mechanism distribution. Deterministic for the
    * same reason qDpCounts is: the uniform is a salted md5, ln sits in
    * the repo's accepted IEEE family, and both engines fold the same
    * doubles. The true median bin rides along for verifiability (a
    * real release projects it away and keeps the salt secret).
    *
    * Scale shape: one map-side-combinable histogram aggregation; the
    * mechanism runs on the bounded (type × bin) relation; cumulative
    * ranks in per-type windows over that bounded histogram. */
  def qDpQuantile(
      spark: SparkSession, dir: String,
      epsilonPct: Int = 100, seed: String = "graft-dpq"): DataFrame = {
    val hist = load(spark, dir, "events")
      .select(col("event_type"),
        expr("cast(floor(value * 100 + 0.5) as bigint) div 500")
          .as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum("c").over(
        Window.partitionBy("event_type").orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("c").over(Window.partitionBy("event_type")))
      .withColumn("u2", -abs(col("cum") * 2 - col("n")))
    val scored = cum
      // the salt is a COLUMN expression (concat of a lit), never
      // interpolated into SQL text — a seed containing a quote must
      // salt the hash, not re-parse the expression
      .withColumn("uu",
        conv(substring(md5(concat(lit(s"$seed:"), col("event_type"),
          lit(":"), col("bin").cast("string"))), 1, 13), 16, 10)
          .cast("double") / 4503599627370496.0)
      .withColumn("score", expr(
        s"($epsilonPct / 100.0) * u2 / 4.0" +
          " - ln(-ln(least(greatest(uu, 1e-15), 1.0 - 1e-15)))"))
    val pick = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("score").desc, col("bin"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n").as("n_rows"),
        col("bin").as("dp_bin"))
    val truth = cum.filter(col("cum") * 2 >= col("n"))
      .groupBy("event_type").agg(min("bin").as("median_bin"))
    pick.join(truth, "event_type")
      .select(col("event_type"), col("n_rows"), col("median_bin"),
        col("dp_bin"), lit(epsilonPct.toLong).as("epsilon_pct"))
  }

  def qKAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val classes = load(spark, dir, "events")
      .select(col("event_type"),
        expr("(ts div 3600000000000) % 24").as("hod"),
        expr("cast(floor(value * 100 + 0.5) as bigint) div 5000")
          .as("vbucket"),
        col("user_id"))
      .groupBy("event_type", "hod", "vbucket")
      .agg(count(lit(1)).as("sz"), countDistinct("user_id").as("l_div"))
    classes.agg(
        count(lit(1)).as("n_classes"),
        sum("sz").as("n_rows"),
        min("sz").as("min_class_size"),
        min("l_div").as("min_l_diversity"),
        sum(when(col("sz") < 2, col("sz")).otherwise(0L)).as("rows_k1"),
        sum(when(col("sz") < 5, col("sz")).otherwise(0L)).as("rows_lt5"),
        sum(when(col("sz") < 10, col("sz")).otherwise(0L)).as("rows_lt10"))
      .select(col("n_classes"), col("n_rows"), col("min_class_size"),
        col("min_l_diversity"), col("rows_k1"), col("rows_lt5"),
        col("rows_lt10"),
        expr("rows_lt5 * 1000000 div n_rows").as("risk5_ppm"))
  }
}
