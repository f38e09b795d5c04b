package graft.relational

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-located joins — the shuffle-elimination technique a
  * 100 TB warehouse leans on hardest: pay the fact-table shuffle ONCE at
  * write time (`bucketBy` on the join key), and every later join or
  * aggregation on that key reads co-located buckets with NO exchange on
  * either side. The reference engine (a single-node scan loop) has no
  * counterpart; on Spark this is how repeated fact⋈fact joins stop being
  * per-query shuffles.
  *
  * The bucketed copies here are written into the session warehouse once
  * per (session, dir) — the same compute-once-per-corpus contract as the
  * shingle and graph-edge caches. Bucket count is 8 at test scale; at
  * 100 TB the count is chosen once so a single bucket fits an executor
  * (e.g. 4096), and both sides of any co-bucketed join must agree on it
  * (Spark requires equal counts, or a multiple, to elide the exchange).
  *
  * `sortBy` on the key makes each bucket file pre-sorted, so the
  * sort-merge join needs neither exchange NOR sort when a bucket is one
  * file — the scan feeds SortMergeJoin directly. BucketedJoinSpec pins
  * exactly that plan: one SortMergeJoin, zero shuffle/sort below it, and
  * the only exchange in the query the final aggregation's.
  */
object Bucketed {

  import Tables.load

  /** Guards catalog writes: table creation is a side effect, and two
    * racing builders with deterministic table names would double-write
    * (the reason this is a lock, not a SessionCache putIfAbsent). */
  private val lock = new Object
  private val ready = TrieMap.empty[(String, String), (String, String)]

  private def tableName(base: String, dir: String): String =
    base + dir.replaceAll("[^a-zA-Z0-9]", "_")

  /** Bucketed (8 buckets, key-sorted) copies of lineitem and orders,
    * written once per (session, dir); returns the catalog table names. */
  private def ensureBucketed(
      spark: SparkSession, dir: String): (String, String) = {
    // Spark >= 3.0 stopped propagating bucket sort order to the scan
    // (claiming it with multi-file buckets would be WRONG — files are
    // individually sorted, their concatenation is not). The legacy flag
    // restores propagation, and it is sound here because this writer
    // guarantees ONE file per bucket (repartition on the bucket key
    // below; BucketedSpec pins the invariant). Without it every
    // bucketed SMJ re-sorts each bucket — no exchange, but at 100 TB a
    // full-bucket sort is a spill risk the sorted layout exists to
    // avoid.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    val sid = org.apache.spark.sql.GraftShim.sessionId(spark)
    ready.get((sid, dir)) match {
      case Some(t) => t
      case None => lock.synchronized {
        ready.getOrElseUpdate((sid, dir), {
          val li = tableName("graft_bkt_lineitem", dir)
          val ord = tableName("graft_bkt_orders", dir)
          // repartition on the bucket key BEFORE the write: Spark's
          // writer emits one file per (task, bucket) pair, and the
          // scan only trusts sortBy order when a bucket is a single
          // file — multi-file buckets put a Sort back under the join.
          // HashPartitioning and bucket assignment share the same
          // murmur3-mod hash, so 8-way repartition on the key lands
          // each bucket's rows in exactly one task.
          if (!spark.catalog.tableExists(li))
            load(spark, dir, "lineitem")
              .select("l_orderkey", "l_extendedprice", "l_discount")
              .repartition(8, col("l_orderkey"))
              .write.format("parquet")
              .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
              .mode("overwrite").saveAsTable(li)
          if (!spark.catalog.tableExists(ord))
            load(spark, dir, "orders")
              .select("o_orderkey", "o_orderpriority")
              .repartition(8, col("o_orderkey"))
              .write.format("parquet")
              .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
              .mode("overwrite").saveAsTable(ord)
          (li, ord)
        })
      }
    }
  }

  /** Fact⋈fact revenue by order priority over the bucketed copies: the
    * join reads co-located, pre-sorted buckets (no exchange, no sort on
    * either side — the write-time shuffle is amortized across every
    * query on this key); the lone exchange is the final 5-group
    * aggregation's. Revenue in exact cents (`floor(x·100+½)` per row,
    * one IEEE product), so the oracle matches bit-for-bit. The merge
    * hint pins the sort-merge strategy the bucketed layout serves —
    * without it the planner may broadcast test-scale inputs and the
    * plan under test would not be the 100 TB plan. */
  def qBucketJoin(spark: SparkSession, dir: String): DataFrame = {
    val (liName, ordName) = ensureBucketed(spark, dir)
    val li = spark.table(liName)
    val ord = spark.table(ordName)
    li.hint("merge")
      .join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          100 + 0.5).cast("long")).as("revenue_cents"),
        count(lit(1)).as("n_items"))
  }
}
