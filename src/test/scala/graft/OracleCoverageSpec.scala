package graft

import org.scalatest.funsuite.AnyFunSuite

/** The correctness gate's coverage contract: every registry query
  * either carries a DuckDB oracle or a documented by-design rationale
  * for not having one — EXACTLY one of the two. A query slipping into
  * neither set would ride every round as an unexplained rows-only
  * check; a query in both would let a stale rationale mask a real
  * oracle's failure being deleted. */
class OracleCoverageSpec extends AnyFunSuite {

  test("oracleSql and noOracleByDesign exactly partition the registry") {
    val all = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    val byDesign = SparkEntry.noOracleByDesign.keySet

    val overlap = oracled intersect byDesign
    assert(overlap.isEmpty,
      s"entries claiming BOTH an oracle and a by-design exemption: $overlap")

    val unexplained = all -- oracled -- byDesign
    assert(unexplained.isEmpty,
      s"registry entries with neither an oracle nor a by-design " +
        s"rationale: $unexplained")

    val phantomOracles = oracled -- all
    assert(phantomOracles.isEmpty,
      s"oracles for queries that do not exist: $phantomOracles")
    val phantomExemptions = byDesign -- all
    assert(phantomExemptions.isEmpty,
      s"by-design rationales for queries that do not exist: $phantomExemptions")
  }

  test("every by-design rationale names its verification surface") {
    // a rationale must point somewhere checkable: a Spec suite or an
    // exact-verified twin query
    SparkEntry.noOracleByDesign.foreach { case (q, why) =>
      assert(why.contains("Spec") || why.contains("q_"),
        s"$q rationale names no suite or twin: $why")
    }
  }
}
