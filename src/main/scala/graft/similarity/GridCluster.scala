package graft.similarity

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.relational.Tables

/** Grid-density clustering (GriDBSCAN / STING lineage) over the first two
  * embedding coordinates — the density-based clustering shape that
  * actually distributes: classic DBSCAN's per-point epsilon
  * neighborhoods are a similarity self-join, but quantizing space into
  * cells of the epsilon scale turns density into a per-cell COUNT (one
  * aggregation) and connectivity into an equi-join of each dense cell
  * against its 9-cell neighborhood (a broadcast of the constant offset
  * grid — never a spatial cross join). Cluster identity is connected
  * components over the dense-cell adjacency, reusing the
  * large-star/small-star machinery of the dedup pipeline; the component
  * relation is bounded by corpus/minPts cells, not by points.
  *
  * Exactness: coordinates are shifted non-negative BEFORE the integer
  * cell division (`floor(x·10⁴) + 10⁴ ≥ 0`, since embeddings live in
  * (−1, 1)); on non-negative operands truncation and floor coincide, so
  * no engine's integer-division convention matters (both Spark `div`
  * and DuckDB `//` truncate toward zero — verified −7 // 4 = −1 — but
  * FLOOR is the semantics a grid index needs for negative coordinates,
  * hence the shift); cluster labels are component minima, which the
  * oracle replays
  * with a recursive-CTE transitive closure over the same adjacency.
  */
object GridCluster {

  import Tables.load

  /** Points keyed by their integer grid cell. */
  private def gridPoints(
      spark: SparkSession, dir: String, cell: Int): DataFrame =
    load(spark, dir, "embeddings")
      // cast float -> double BEFORE the multiply: the float->double
      // widening is exact and the double multiply correctly rounded, so
      // every engine floors the same value (float×int promotion rules
      // would otherwise differ between engines)
      .select(col("vec_id"),
        (floor(expr("cast(embedding[0] as double)") * 10000) + 10000)
          .cast("long").as("cx"),
        (floor(expr("cast(embedding[1] as double)") * 10000) + 10000)
          .cast("long").as("cy"))
      .select(col("vec_id"),
        expr(s"cx div $cell").as("gx"), expr(s"cy div $cell").as("gy"))

  /** Density-connected cluster census: one row per cluster of dense
    * cells (≥ minPts points per cell), with its cell/point counts and
    * bounding box in grid units. Border/noise points (in sparse cells)
    * are summarized by the sentinel cluster_id −1 row. */
  def qGridCluster(
      spark: SparkSession, dir: String,
      cell: Int = 1000, minPts: Int = 5): DataFrame = {
    import spark.implicits._
    val pts = gridPoints(spark, dir, cell)
    val cells = pts.groupBy("gx", "gy")
      .agg(count(lit(1)).as("n_pts"))
      .filter(col("n_pts") >= minPts)
      .withColumn("cell_id", col("gx") * 100000L + col("gy"))
    // 8-neighborhood adjacency as an equi-join: probe each dense cell's
    // 9 offset positions against the dense-cell set (the offset grid is
    // a 9-row broadcast constant, so no inequality join is ever planned)
    val offs = Seq(-1L, 0L, 1L)
      .flatMap(dx => Seq(-1L, 0L, 1L).map(dy => (dx, dy)))
      .toDF("dx", "dy")
    val adj = cells.select(col("gx"), col("gy"), col("cell_id"))
      .crossJoin(broadcast(offs))
      .select((col("gx") + col("dx")).as("gx"),
        (col("gy") + col("dy")).as("gy"), col("cell_id").as("d1"))
      .join(cells.select(col("gx"), col("gy"), col("cell_id").as("d2")),
        Seq("gx", "gy"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2")
    val cc = graft.pipeline.TrainingData.connectedComponents(adj, spark)
      .select(col("doc_id").as("cell_id"), col("cluster_id"))
    val labeled = cells.join(cc, Seq("cell_id"), "left")
      // isolated dense cells form singleton clusters labeled by themselves
      .select(col("gx"), col("gy"), col("n_pts"),
        coalesce(col("cluster_id"), col("cell_id")).as("cluster_id"))
    val dense = labeled.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_cells"), sum("n_pts").as("n_points"),
        min("gx").as("gx_min"), max("gx").as("gx_max"),
        min("gy").as("gy_min"), max("gy").as("gy_max"))
    val noise = pts
      .join(cells.select("gx", "gy"), Seq("gx", "gy"), "left_anti")
      .agg(count(lit(1)).as("n_points"))
      .select(lit(-1L).as("cluster_id"), lit(0L).as("n_cells"),
        col("n_points"), lit(0L).as("gx_min"), lit(0L).as("gx_max"),
        lit(0L).as("gy_min"), lit(0L).as("gy_max"))
    dense.unionAll(noise)
  }
}
