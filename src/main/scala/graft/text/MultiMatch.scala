package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring counting — the one-pass scan
  * behind watchlist censuses (contamination phrases, PII markers,
  * blocklist terms) over a 100 TB corpus.
  *
  * Why an automaton and not P `contains`/`regexp` passes or a token
  * join: a pattern set of thousands compiles into one byte-level DFA,
  * so the corpus is read ONCE and each text byte costs one transition
  * plus the (precomputed) emit list of its node — independent of P.
  * Token-granular surfaces ([[TextOps.qPhraseSearch]]'s positional
  * index, the lexicon census) cannot see matches that cross token
  * boundaries or sit inside tokens; this one counts every occurrence
  * at character granularity, overlapping included (`"aa"` occurs 3
  * times in `"aaaa"` — one per end position), which is the
  * suffix-link semantics and what makes nested patterns like
  * `"tab"`/`"table"` both count at the same end position.
  *
  * Matching is over UTF-8 BYTES with patterns restricted to ASCII: an
  * ASCII byte sequence can never straddle a multi-byte UTF-8 character
  * (continuation bytes have the high bit set), so byte matches are
  * exactly character matches. The goto table is DENSE (256 ints per
  * node = ~1 KB per trie node, bounded by total pattern characters;
  * shared prefixes compress): one unconditional array read per text
  * byte, no fail-link walking in the hot loop. Cost
  * honesty: a 24-pattern watchlist is ~100 KB; a 5,000-pattern ×
  * 12-char one approaches ~60 MB per executor — at that scale a
  * production matcher switches to a compressed (double-array /
  * fail-link) transition table, trading a branch per byte for 50×
  * memory; this implementation chooses the dense hot loop for the
  * watchlist sizes the census query serves.
  *
  * The automaton is built once per (executor, pattern set) — the same
  * static-cache contract as [[graft.similarity.HyperplaneLsh]]'s
  * weight matrices — keyed by the tab-joined pattern spec the
  * expression also embeds into generated code. Build-time scratch
  * (edge-used flags, per-node emit lists, fail links) is local to the
  * factory and collected after construction; the cached object holds
  * only the goto table and merged emit arrays. */
object AhoCorasick {

  /** Compiled automaton: dense goto table (BFS-resolved, so matching
    * never walks fail links), plus per-node merged emit lists. */
  final class Automaton private[AhoCorasick] (
      val nPatterns: Int, val goto_ : Array[Int],
      val emits: Array[Array[Int]])

  /** Standard Aho–Corasick construction: byte trie, BFS fail links,
    * emit-list merging through fail links, then full goto resolution so
    * matching is one array read per byte. */
  private def build(patterns: Array[String]): Automaton = {
    val maxNodes = patterns.map(_.length).sum + 1
    val goto_ = new Array[Int](maxNodes * 256)
    val gotoUsed = new Array[Boolean](maxNodes * 256)
    val emitOwn = Array.fill(maxNodes)(List.empty[Int])
    var nNodes = 1
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.getBytes("US-ASCII").foreach { b =>
        val c = b & 0xff
        if (!gotoUsed(s * 256 + c)) {
          gotoUsed(s * 256 + c) = true
          goto_(s * 256 + c) = nNodes
          nNodes += 1
        }
        s = goto_(s * 256 + c)
      }
      emitOwn(s) ::= pid
    }
    val emits = new Array[Array[Int]](nNodes)
    val fail = new Array[Int](nNodes)
    emits(0) = emitOwn(0).toArray
    val queue = new java.util.ArrayDeque[Int]()
    (0 until 256).foreach { c =>
      val v = goto_(c)
      if (gotoUsed(c)) { fail(v) = 0; queue.add(v) }
      // root: missing edges stay at root (goto_ already 0)
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      emits(u) = (emitOwn(u) ++ emits(fail(u)).toList).toArray
      (0 until 256).foreach { c =>
        val idx = u * 256 + c
        if (gotoUsed(idx)) {
          val v = goto_(idx)
          fail(v) = goto_(fail(u) * 256 + c)
          queue.add(v)
        } else {
          goto_(idx) = goto_(fail(u) * 256 + c)
        }
      }
    }
    // trim to the realized node count — shared prefixes make
    // nNodes << sum of pattern lengths on real watchlists
    new Automaton(patterns.length,
      java.util.Arrays.copyOf(goto_, nNodes * 256), emits)
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Automaton]()

  /** Executor-static cache cap: a long-lived session issuing many
    * DISTINCT literal watchlists would otherwise retain every compiled
    * dense automaton (~1 KB per trie node) for the JVM's life. At the
    * cap the whole map clears — crude next to an LRU, but the hit path
    * (one CHM get per document batch) stays contention-free, and a
    * rebuild costs microseconds against the per-document scan it
    * serves. */
  private val MaxCachedSpecs = 64

  /** The automaton for a tab-joined pattern spec (executor-cached). */
  def automaton(spec: String): Automaton = {
    val hit = cache.get(spec)
    if (hit != null) hit
    else {
      if (cache.size >= MaxCachedSpecs) cache.clear()
      cache.computeIfAbsent(spec, s => build(s.split('\t')))
    }
  }

  /** Occurrence counts (overlapping, one per match end position) of each
    * pattern in `spec` within `text`, as a long array in pattern order. */
  def counts(text: UTF8String, spec: String): ArrayData = {
    val a = automaton(spec)
    val out = new Array[Long](a.nPatterns)
    val bytes = text.getBytes
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = a.goto_(s * 256 + (bytes(i) & 0xff))
      val em = a.emits(s)
      var j = 0
      while (j < em.length) { out(em(j)) += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `multi_match(text, patterns)` — per-pattern overlapping occurrence
  * counts via one Aho–Corasick pass (`array<bigint>`, pattern order). */
case class MultiMatchCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "multi_match needs at least one pattern")
  require(patterns.forall(p =>
    p.nonEmpty && p.forall(c =>
      c >= 0x20 && c < 0x7f && c != '"' && c != '\\')),
    "multi_match patterns must be non-empty printable ASCII without \"" +
      " or \\ (the spec embeds them in a generated-Java string literal" +
      " and joins on tab). Apostrophes are fine — real watchlist" +
      " literals carry them (o'brien); SQL-side consumers escape by" +
      " '' doubling (TextOracles does)")

  private val spec = patterns.mkString("\t")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_match"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    AhoCorasick.counts(input.asInstanceOf[UTF8String], spec)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // patterns are printable ASCII without quote/backslash (required
    // above), so the only escape the Java literal needs is the tab joiner
    val lit = spec.replace("\t", "\\t")
    defineCodeGen(ctx, ev, c => s"""graft.text.AhoCorasick.counts($c, "$lit")""")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatchCounts =
    copy(child = newChild)
}
