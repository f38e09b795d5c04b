package graft.relational

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Skyline (Pareto frontier) operator — "the parts no other part beats
  * on BOTH price and size": q dominates p iff q is no worse on every
  * axis and strictly better on at least one. The textbook formulation
  * is a quadratic correlated NOT EXISTS self-join (kept as the DuckDB
  * oracle); a 100 TB engine cannot pay |group|² comparisons, and for
  * the 2-D case it never has to:
  *
  *   sort each group by (price asc); a point is on the frontier iff its
  *   size strictly exceeds the running max size of all strictly-cheaper
  *   points.
  *
  * That is one distinct-aggregate plus one window over the SAME
  * group-key partitioning (the exchange is reused — no second shuffle),
  * i.e. O(n log n) with no self-join at all. Equal-price ties collapse
  * to their max size first (the cheaper-or-equal + strictly-bigger
  * dominance case); distinct parts sharing an identical (price, size)
  * point are mutually non-dominated and all surface, via the join back
  * from the kilobyte-scale frontier — broadcast, so the frontier filter
  * costs one map-side probe of the fact scan, the same serving shape as
  * the published ANN codebooks.
  *
  * Reference scope: the reference engine (a fixed scan loop,
  * `server.c`) has no preference-query surface; this is part of the
  * generalized relational frontier the SURVEY §2.9 build-out targets.
  * Prices enter as exact cents (`floor(x·100+½)`) so dominance and the
  * oracle's integer comparisons agree bit-for-bit in any engine.
  */
object Skyline {

  import Tables.load

  /** Pareto-optimal parts per brand: minimize retail price, maximize
    * size. Output: every non-dominated part with its frontier point. */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val parts = load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"),
        floor(col("p_retailprice") * 100 + 0.5).cast("long")
          .as("price_cents"),
        col("p_size").cast("long").as("p_size"))
    // distinct frontier-candidate points: per (brand, price) only the
    // max size can survive (same price, strictly larger size dominates)
    val points = parts.groupBy("p_brand", "price_cents")
      .agg(max("p_size").as("p_size"))
    // frontier membership = strictly above the running max of cheaper
    // points; the window reuses the groupBy's brand partitioning
    val byBrand = Window.partitionBy("p_brand")
      .orderBy(col("price_cents").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = points
      .withColumn("runmax", max("p_size").over(byBrand))
      .filter(col("runmax").isNull || col("p_size") > col("runmax"))
      .select("p_brand", "price_cents", "p_size")
    // kilobyte frontier broadcast back over the fact scan: emit every
    // part sitting exactly on a frontier point (ties all surface)
    parts.join(broadcast(frontier),
      Seq("p_brand", "price_cents", "p_size"))
      .select("p_partkey", "p_brand", "price_cents", "p_size")
  }
}
