package graft.graph

import graft.SparkSpec

/** Scale gate for the random-walk loop: per-step cost must stay flat as
  * walks deepen. The failure mode this pins down is the neighbor index
  * going lazy — then every step replays the full edge sort and a
  * 20-step walk costs ~4× a 5-step walk in SORT work alone (O(steps ×
  * E log E) total), on top of the linear join work. With `nbr`/`deg`
  * persisted, deepening 5 → 20 steps only adds the (tiny) per-step
  * join rounds, so wall-clock grows well under the 4× step ratio. */
class GraphScaleGateSpec extends SparkSpec {
  import spark.implicits._

  test("20-step walks cost <= 4x 5-step walks (flat per-step cost)") {
    // ring + chord graph: 400 nodes, every node has degree >= 3
    val n = 400L
    val edges = (0L until n).flatMap(i =>
      Seq((i, (i + 1) % n), ((i + 1) % n, i), (i, (i * 7 + 3) % n)))
      .toDF("src", "dst")
    val starts = (0L until n).toDF("node")
    def run(steps: Int): Double = {
      val t0 = System.nanoTime()
      val out = GraphOps.randomWalks(spark, edges, starts, steps, 1)
      val rows = out.count()
      assert(rows === n * (steps + 1))
      out.unpersist(blocking = false)
      (System.nanoTime() - t0) / 1e9
    }
    run(2) // warm-up: JIT + codegen for the step shape, untimed
    val t5 = run(5)
    val t20 = run(20)
    // absolute floor guards sub-second scheduler noise on a busy box
    assert(t20 <= math.max(4.0 * t5, t5 + 3.0),
      s"20-step walk $t20 s vs 5-step $t5 s — per-step cost is not flat")
  }
}
