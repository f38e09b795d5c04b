package graft.relational

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}

/** P11 (diagnostic dump, `lsp_common.c:37-39`) generalized: plan-attached
  * metrics via `Dataset.observe` — zero-cost accumulators evaluated during
  * the action, no extra pass over the data.
  */
object Observe {

  /** Attach row/byte-ish counters to a message-log-shaped frame; read the
    * results from the returned [[Observation]] after an action runs. */
  def logMetrics(df: DataFrame): (DataFrame, Observation) = {
    val obs = Observation("graft_log_metrics")
    val observed = df.observe(obs,
      count(lit(1)).as("n_msgs"),
      // DISTINCT aggregates are disallowed in observed metrics — HLL sketch
      approx_count_distinct(col("connid")).as("n_conns"),
      sum(length(col("payload"))).as("payload_bytes"))
    (observed, obs)
  }

  /** Corpus manifest — the lineage/caching fingerprint a pipeline stamps
    * on every run: per north-star table, the row count and an
    * ORDER-INDEPENDENT content checksum (`bit_xor` of a 60-bit
    * md5-derived row digest — XOR commutes and never overflows, so the
    * value is identical under any partitioning at any scale, unlike a
    * SUM which overflows and unlike a collected sort which doesn't
    * distribute). Canonical row strings avoid raw doubles (engines
    * print them differently); money-like values enter as fixed-point
    * cents, and floats/timestamps stay out of the canonical form. */
  def qManifest(spark: SparkSession, dir: String): DataFrame = {
    def digest(canon: Column): Column =
      conv(substring(md5(canon), 1, 15), 16, 10).cast("long")
    def row(name: String, canon: DataFrame => Column): DataFrame = {
      val t = Tables.load(spark, dir, name)
      t.select(digest(canon(t)).as("d"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(d)").as("checksum"))
        .select(lit(name).as("table_name"), col("n_rows"), col("checksum"))
    }
    row("documents", t => concat_ws(":", t("doc_id"), t("lang"),
        t("source"), md5(t("text"))))
      // the VECTOR must be in the canonical row (in the q16 fixed-point
      // discipline the IVF/PQ trainers use): a manifest that digests
      // only (vec_id, label) stays unchanged when every vector value is
      // rewritten, defeating its cache-invalidation purpose
      .unionAll(row("embeddings",
        t => concat_ws(":", t("vec_id"), t("label"),
          concat_ws(",", transform(t("embedding"),
            x => round(x.cast("double") * 65536).cast("long")
              .cast("string"))))))
      .unionAll(row("events", t => concat_ws(":", t("event_id"),
        t("user_id"), t("event_type"),
        floor(t("value") * 100 + 0.5).cast("long"))))
  }
}
