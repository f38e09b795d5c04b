package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's kill contract (r14): the round driver runs
  * `graft.Bench` under an external `timeout` and keeps only a bounded
  * tail of the combined output — r12 and r13 both lost their entire
  * round bench record because the SIGTERM-time Spark shutdown noise
  * displaced the last summary line from that tail. This spec drives a
  * real forked Bench JVM to the post-sweep emit, SIGTERMs it (exactly
  * the driver's kill), and asserts the LAST line of the merged
  * stdout+stderr stream is still a parseable summary — i.e. the
  * priority-1 Hadoop shutdown hook (which runs after Spark's
  * priority-40 hook stack) wins the tail.
  */
class BenchKillSpec extends AnyFunSuite {

  // same module opens the forked test JVM itself runs under (build.sbt)
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("SIGTERM after the sweep: last merged-output line parses as the summary") {
    val tmp = java.nio.file.Files.createTempDirectory("bench_kill").toFile
    val outFile = new java.io.File(tmp, "out.log")
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java")
      .getAbsolutePath
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx4g", "-cp", sys.props("java.class.path"), "graft.Bench"))
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(tmp) // keep BENCH_LOCAL.json/derby droppings out of the repo
    pb.redirectErrorStream(true) // the driver tails the MERGED stream
    pb.redirectOutput(outFile)
    val env = pb.environment()
    env.put("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    env.put("SPARK_GRAFT_CPUS", "2")
    env.put("SPARK_GRAFT_BENCH_N", "1")
    env.put("SPARK_GRAFT_BENCH_ONLY",
      "q1_pricing_summary,q6_forecast_revenue,q_dedup_exact")
    env.put("SPARK_GRAFT_SF1", "0")
    env.put("SPARK_GRAFT_TOTAL_BUDGET", "9999")
    // park after the post-sweep emit with the SparkContext ALIVE, so
    // the SIGTERM lands exactly where the driver's kill does: Spark's
    // context-stop hook fires mid-"work" and sprays its usual noise
    env.put("SPARK_GRAFT_TEST_SLEEP_AFTER_SWEEP", "600")
    val p = pb.start()
    try {
      // wait (<= 180 s) for the post-sweep summary emission
      val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
      var seen = false
      while (!seen && System.nanoTime() < deadline && p.isAlive) {
        Thread.sleep(500)
        seen = outFile.exists() &&
          new String(java.nio.file.Files.readAllBytes(outFile.toPath))
            .contains("\"metric\":\"total\"")
      }
      assert(seen, s"no post-sweep summary within 180s; tail: ${tailOf(outFile)}")
      p.destroy() // SIGTERM — what `timeout` sends
      assert(p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
        "killed Bench JVM did not exit within 60s of SIGTERM")
    } finally if (p.isAlive) p.destroyForcibly()

    val lines = new String(java.nio.file.Files.readAllBytes(outFile.toPath))
      .split('\n').map(_.trim).filter(_.nonEmpty)
    val last = lines.last
    // the driver's parse: last line of the bounded tail must be the JSON
    // summary — nothing (Spark shutdown stack traces included) after it
    val node =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(last)
      catch { case e: Throwable =>
        fail(s"last output line is not JSON (${e.getMessage}): $last")
      }
    assert(node.get("metric") != null && node.get("metric").asText == "total",
      s"last line is JSON but not the bench summary: $last")
    assert(node.get("n_queries").asInt == 3,
      s"hook re-printed the bootstrap line, not the post-sweep summary: $last")
  }

  private def tailOf(f: java.io.File): String =
    if (!f.exists()) "<no output file>"
    else {
      val s = new String(java.nio.file.Files.readAllBytes(f.toPath))
      s.substring(math.max(0, s.length - 2000))
    }
}
