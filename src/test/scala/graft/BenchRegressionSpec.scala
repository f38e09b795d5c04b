package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate's pure core: prior-median parsing and the
  * 1.5×-and-0.25s diff rule (round 9's +25% graph-family drift went
  * unnoticed for a full round — this is the tripwire). */
class BenchRegressionSpec extends AnyFunSuite {

  test("parseMedians reads the audit file's medians object") {
    val txt =
      """{"sf":"/x/sf0.1","n":3,"cpus":4,"runs":{"q_a":[0.5,0.6,0.4]},
        |"medians":{"q_a":0.5,"q_b":1.25,"q_c":-1.0}}""".stripMargin
    val m = Bench.parseMedians(txt)
    assert(m("q_a") === 0.5)
    assert(m("q_b") === 1.25)
    assert(m("q_c") === -1.0)
  }

  test("parseMedians stops at the medians object's closing brace") {
    // keys emitted AFTER medians (the audit format already grew
    // "baseline"/"regressions" before it) must not leak into the
    // baseline map — that would corrupt the regression gate (ADVICE r10)
    val txt =
      """{"medians":{"q_a":0.5,"q_b":1.25},
        |"extra":{"q_a":99.0,"q_z":7.0}}""".stripMargin
    val m = Bench.parseMedians(txt)
    assert(m === Map("q_a" -> 0.5, "q_b" -> 1.25))
  }

  test("parseMedians is empty on garbage or a missing medians key") {
    assert(Bench.parseMedians("not json") === Map.empty)
    assert(Bench.parseMedians("""{"runs":{"q_a":[1.0]}}""") === Map.empty)
  }

  test("regression rule: >1.5x AND >0.25s absolute, worst first") {
    val prior = Map("q_a" -> 1.0, "q_b" -> 0.1, "q_c" -> 2.0, "q_d" -> 1.0)
    val now = Seq(
      "q_a" -> 1.8,  // 1.8x and +0.8s -> regressed
      "q_b" -> 0.3,  // 3x but only +0.2s -> noise, kept out
      "q_c" -> 2.6,  // +0.6s but only 1.3x -> not regressed
      "q_d" -> 3.0,  // 3x and +2s -> regressed, worst
      "q_new" -> 9.9) // no baseline -> skipped
    val r = Bench.regressionsOf(prior, now)
    assert(r.map(_._1) === Seq("q_d", "q_a"))
    assert(r.head === ("q_d", 1.0, 3.0))
  }

  test("failed runs (median -1) never count as regressions or baselines") {
    assert(Bench.regressionsOf(Map("q_a" -> -1.0), Seq("q_a" -> 5.0)).isEmpty)
    assert(Bench.regressionsOf(Map("q_a" -> 1.0), Seq("q_a" -> -1.0)).isEmpty)
  }
}
