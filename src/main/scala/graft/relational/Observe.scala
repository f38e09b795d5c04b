package graft.relational

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Observation}

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
}
