package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Date-partitioned lake layout + dynamic partition pruning (DPP) — the
  * scan-elision mechanism a 100 TB fact table lives or dies by: lay the
  * fact out as one directory per day, and a join against a filtered
  * calendar dimension prunes the directories AT RUNTIME from the
  * broadcast join's build side (Catalyst inserts a
  * `dynamicpruningexpression(event_date IN dynamicpruning#N)` partition
  * filter that reuses the dim broadcast — no second dim scan, no manual
  * date list in the query). Static pushdown cannot do this: the
  * qualifying dates are only known after the dim filter runs.
  *
  * The partitioned copy is written ONCE per (session, dir) into the
  * session warehouse (the [[graft.relational.Bucketed]] write-once
  * contract — at 100 TB this is the lake's standing layout, not a
  * per-query step). 30 daily partitions here; the plan shape is
  * invariant in the partition count.
  *
  * Weekend selection uses pure epoch-day arithmetic
  * (`(days_since_1970 + 4) mod 7` with 1970-01-01 a Thursday, 0 =
  * Sunday) so the oracle's filter is the same integer formula — no
  * engine-specific `dayofweek` numbering to reconcile.
  */
object PartitionedLake {

  private val lock = new Object
  private val ready = TrieMap.empty[(String, String), String]

  /** Path of the date-partitioned events copy, writing it if absent. */
  private def ensurePartitioned(spark: SparkSession, dir: String): String = {
    val sid = org.apache.spark.sql.GraftShim.sessionId(spark)
    ready.get((sid, dir)) match {
      case Some(p) => p
      case None => lock.synchronized {
        ready.getOrElseUpdate((sid, dir), {
          val path = spark.conf.get("spark.sql.warehouse.dir")
            .stripSuffix("/") + "/graft_part_events_" +
            dir.replaceAll("[^a-zA-Z0-9]", "_")
          graft.relational.Tables.load(spark, dir, "events")
            // ts is the loader's epoch-NANOS long contract; the
            // partition value derives by pure integer division so the
            // directory name is engine-independent
            .withColumn("event_date",
              date_add(lit(java.sql.Date.valueOf("1970-01-01")),
                expr("cast(ts div 86400000000000 as int)")))
            // one file per partition directory: day-sized row groups are
            // the unit DPP skips, and a 30-way repartition on the
            // partition column avoids 30 files × tasks write amplification
            .repartition(col("event_date"))
            .write.partitionBy("event_date")
            .mode("overwrite").parquet(path)
          path
        })
      }
    }
  }

  /** Weekend revenue per day off the partitioned lake: the weekday dim
    * filter reaches the fact scan as a runtime partition filter (8 of
    * 30 directories read). Exact cents; dates exit as strings. */
  def qDppPrune(spark: SparkSession, dir: String): DataFrame = {
    val fact = spark.read.parquet(ensurePartitioned(spark, dir))
    // calendar dimension: generated date spine over the lake's OBSERVED
    // horizon (the qGapFill pattern — a hard-coded start/length would
    // silently drop qualifying days if the synthetic horizon ever moved),
    // filtered to weekends by epoch-day arithmetic. Bounds come from the
    // SOURCE events table (one pruned-to-ts column scan), not the
    // partitioned copy, so the partitioned fact is scanned exactly once
    // — with the runtime DPP filter — and the bounds scan carries no
    // partition schema for the pruning assertion to trip over.
    val bounds = graft.relational.Tables.load(spark, dir, "events")
      .agg(
        min(expr("cast(ts div 86400000000000 as int)")).as("d0"),
        max(expr("cast(ts div 86400000000000 as int)")).as("d1"))
    val calendar = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("epoch_day"))
      .select(date_add(lit(java.sql.Date.valueOf("1970-01-01")),
        col("epoch_day")).as("event_date"))
      .filter(
        (datediff(col("event_date"), lit("1970-01-01")) + 4) % 7 isin (0, 6))
    fact
      .join(broadcast(calendar), Seq("event_date"))
      .groupBy("event_date")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"))
      .select(date_format(col("event_date"), "yyyy-MM-dd").as("day"),
        col("n_events"), col("value_cents"))
  }
}
