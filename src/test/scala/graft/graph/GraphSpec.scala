package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PageRank: fixed-point contract against an in-memory reference
  * simulator, bit-identity across shuffle layouts, and the lineitem
  * trade-graph query shape. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of GraphOps.pageRank's per-round arithmetic:
    * truncating long division per edge, then damp. */
  private def simulate(
      edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = out.keys.map(_ -> GraphOps.Scale).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (s, _) => r(s) / out(s) }.sum
      }.toMap
      r = in.map { case (n, s) => n -> (GraphOps.Teleport + 85L * s / 100L) }
    }
    r
  }

  // undirected path 1-2-3 plus a pendant 4 on node 2, both arcs each
  private val pathEdges: Seq[(Long, Long)] =
    Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 2L -> 4L, 4L -> 2L)

  test("pageRank matches the exact fixed-point simulator") {
    val got = GraphOps
      .pageRank(spark, pathEdges.toDF("src", "dst"), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got === simulate(pathEdges, 5))
    // the hub (node 2) must outrank every leaf
    assert(got(2L) > got(1L) && got(2L) > got(3L) && got(2L) > got(4L))
  }

  test("pageRank is bit-identical across shuffle layouts") {
    val df = pathEdges.toDF("src", "dst")
    val a = GraphOps.pageRank(spark, df.repartition(1), 4)
      .as[(Long, Long)].collect().toMap
    val b = GraphOps.pageRank(spark, df.repartition(7, col("dst")), 4)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("q_pagerank covers every trade-graph node and conserves mass") {
    val dir = "/root/testdata/sf0.001"
    val res = GraphOps.qPageRank(spark, dir).cache()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val nSupp = li.select("l_suppkey").distinct().count()
    val nPart = li.select("l_partkey").distinct().count()
    assert(res.filter($"node_type" === "supplier").count() === nSupp)
    assert(res.filter($"node_type" === "part").count() === nPart)
    // truncating division only LOSES mass, a bounded few units per
    // node per round — total stays within 1e-6 of the initial mass
    val total = res.agg(sum($"rank_fp")).as[Long].head()
    val init = (nSupp + nPart) * GraphOps.Scale
    assert(total <= init)
    assert(total > (init * 0.999999).toLong)
    res.unpersist()
  }
}
