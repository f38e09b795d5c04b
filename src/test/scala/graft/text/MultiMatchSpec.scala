package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class MultiMatchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Naive overlapping-occurrence reference: one startsWith probe per
    * (pattern, position) — the O(n·P) definition the automaton must
    * reproduce in O(n). */
  private def naive(text: String, pats: Seq[String]): Seq[Long] =
    pats.map(p =>
      (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong)

  private def kernel(text: String, pats: Seq[String]): Seq[Long] =
    AhoCorasick.counts(UTF8String.fromString(text), pats.mkString("\t"))
      .toLongArray().toSeq

  test("kernel: overlapping, nested, and cross-boundary matches") {
    // overlapping: one count per END position
    assert(kernel("aaaa", Seq("a", "aa", "aaa")) === Seq(4L, 3L, 2L))
    // nested patterns both emit at the same end position (suffix links)
    assert(kernel("table tab", Seq("table", "tab", "ta", "le t")) ===
      Seq(1L, 2L, 2L, 1L))
    // a space-containing pattern crosses token boundaries
    assert(kernel("scan slow scan s", Seq("an s", "scan", "w sc")) ===
      Seq(2L, 2L, 1L))
    // no match / empty text / pattern longer than text
    assert(kernel("", Seq("a")) === Seq(0L))
    assert(kernel("ab", Seq("abc", "zz")) === Seq(0L, 0L))
    // apostrophes are ordinary pattern bytes (r14: the ban was an
    // oracle-harness artifact, not a kernel limitation)
    assert(kernel("o'brien and o'malley", Seq("o'", "o'brien", "'m")) ===
      Seq(2L, 1L, 1L))
  }

  test("kernel equals the naive reference on seeded random strings") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab "
    val pats = Seq("a", "b", "ab", "ba", "aa", "a b", "b a", "aba", "bab",
      " a", "b ", "ab a")
    (0 until 200).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(60))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(kernel(s, pats) === naive(s, pats), s"text=${s}")
    }
  }

  test("q_multi_match equals a JVM replay; every pattern row present") {
    val got = TextOps.qMultiMatch(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
    val want = TextOps.Watchlist.map { p =>
      val perDoc = docs.map(t => naive(t, Seq(p)).head)
      (p, perDoc.count(_ > 0).toLong, perDoc.sum)
    }.toSet
    assert(got === want)
    assert(got.map(_._1) === TextOps.Watchlist.toSet,
      "a never-matching pattern still gets its census row")
    assert(got.exists(_._3 > 0), "watchlist hits the corpus")
  }

  test("SQL door: multi_match(text, array(...)) equals the Scala column") {
    graft.functions.registerAll(spark)
    val pats = Seq("table", "ta", "an s")
    val lit = pats.map("'" + _ + "'").mkString(", ")
    val viaSql = graft.relational.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", s"multi_match(text, array($lit)) AS c")
    val viaCol = graft.relational.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), graft.functions.multi_match(col("text"), pats).as("c"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("pattern spec validation rejects what the codegen literal can't carry") {
    intercept[IllegalArgumentException] {
      MultiMatchCounts(org.apache.spark.sql.catalyst.expressions.Literal("x"),
        Seq("a\tb"))
    }
    intercept[IllegalArgumentException] {
      MultiMatchCounts(org.apache.spark.sql.catalyst.expressions.Literal("x"),
        Seq("quote\""))
    }
    intercept[IllegalArgumentException] {
      MultiMatchCounts(org.apache.spark.sql.catalyst.expressions.Literal("x"),
        Seq.empty)
    }
    // apostrophes are ACCEPTED (r14): the codegen Java literal carries
    // them verbatim; only the oracle SQL needs escaping, and that is
    // the oracle generator's job, not an analysis-time ban
    MultiMatchCounts(org.apache.spark.sql.catalyst.expressions.Literal("x"),
      Seq("o'brien"))
  }
}
