package graft.text

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Primitive kernels for the dedup hot path, callable from generated code.
  *
  * Shingling and MinHash signatures over array HOFs
  * (`transform`/`array_join`/`array_min`) evaluate interpreted with
  * per-element boxing — at corpus scale that is millions of lambda
  * invocations per partition. These kernels do one pass over the raw
  * bytes instead, and the expressions below keep the whole stage in
  * codegen.
  */
object TextKernels {

  /** Distinct, order-preserving n-token shingles of a space-tokenized
    * text. Matches the SQL construction exactly (split on single space,
    * shingles joined with single spaces) so Jaccard oracles stay
    * value-identical. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    // limit -1: keep trailing empty tokens, matching Spark's
    // split(text, " ") and DuckDB's string_split exactly
    val toks = s.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = mutable.LinkedHashSet.empty[String]
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    new GenericArrayData(seen.iterator.map(x => UTF8String.fromString(x): Any).toArray)
  }

  /** Non-distinct n-gram LIST (one entry per position) — the counting
    * companion of [[shingles]]: repetition statistics need every
    * occurrence, not the set. Same tokenizer contract. */
  def shingleList(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature: for each of `k` seeded xxhash64 functions, the
    * minimum over all shingles — one pass, k running minima, zero
    * allocation per element. Null (by contract of the expression) when
    * the shingle set is empty. */
  def minhash(shingleArr: ArrayData, k: Int): ArrayData = {
    val m = shingleArr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < m) {
      // skip null elements: the caller's array type may allow them, and a
      // null shingle carries no signal — NPEing the whole job did (ADVICE r1)
      if (!shingleArr.isNullAt(i)) {
        any = true
        val u = shingleArr.getUTF8String(i)
        var s = 0
        while (s < k) {
          val h = XXH64.hashUnsafeBytes(
            u.getBaseObject, u.getBaseOffset, u.numBytes(), s.toLong)
          if (h < mins(s)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    if (!any) return null
    new GenericArrayData(mins.map(x => x: Any))
  }
}

/** Subword (BPE-inference-style) tokenization: greedy LEFTMOST-LONGEST
  * matching of a fixed merge vocabulary, scanning each whitespace word
  * left to right and emitting the longest vocab token at each position
  * (single character when nothing matches) — exactly how WordPiece/BPE
  * inference consumes a learned merge table. The vocab is the library's
  * demo merge table; a production pipeline swaps in its tokenizer's.
  *
  * The greedy-longest contract (rather than learned-merge-order replay)
  * is chosen deliberately: it is the inference-time algorithm AND it is
  * recomputable by a SQL engine — the DuckDB oracle replays the same scan
  * with a recursive CTE over (word, pos) states, so the whole subword
  * count is hash-checked end to end, not just row-counted.
  */
object BpeVocab {

  /** The demo merge vocabulary: corpus terms plus common English subword
    * units, ASCII, 2..8 bytes (1-byte entries would be no-ops). Sorted
    * here for readability; the kernel builds packed per-length lookup
    * tables from it. */
  val tokens: Seq[String] = Seq(
    // whole corpus terms (longest-match wins over their prefixes)
    "shuffle", "window", "filter", "table", "value", "spark", "batch",
    "merge", "hash", "scan", "sort", "fast", "slow", "line", "part",
    "row", "key", "agg",
    // common subword units
    "the", "ing", "ion", "ent", "ter", "ate",
    "er", "an", "re", "on", "at", "en", "nd", "ti", "es", "or", "te",
    "ed", "is", "ar", "st", "al", "le", "ow", "ta", "va", "ke")

  require(tokens.distinct.size == tokens.size, "duplicate vocab token")
  require(tokens.forall(t => t.length >= 2 && t.length <= 8 &&
    t.forall(c => c > ' ' && c < 127)), "vocab tokens must be ASCII, 2-8 chars")

  /** `('tok1'),('tok2'),…` — the VALUES list the DuckDB oracle embeds, so
    * kernel and oracle share ONE vocab definition and cannot drift. */
  def sqlValues: String = tokens.map(t => s"('$t')").mkString(",")

  /** `(0,'tok1'),(1,'tok2'),…` — same list with the token's stable id
    * (its position in [[tokens]]), for oracles that check id assignment. */
  def sqlValuesWithId: String =
    tokens.zipWithIndex.map { case (t, i) => s"($i,'$t')" }.mkString(",")

  /** token → stable id, the Spark-side mirror of [[sqlValuesWithId]]. */
  val idOf: Map[String, Int] = tokens.zipWithIndex.toMap

  private[text] val maxLen = tokens.map(_.length).max
  // per-length sorted arrays of big-endian byte-packed tokens: the scan
  // probes (pos, len) slices with a binary search, zero allocation
  private[text] val packedByLen: Array[Array[Long]] =
    Array.tabulate(maxLen + 1) { len =>
      if (len < 2) Array.empty[Long]
      else tokens.filter(_.length == len)
        .map(t => pack(t.getBytes("UTF-8"), 0, len)).sorted.toArray
    }

  private[text] def pack(bytes: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (bytes(off + i) & 0xffL); i += 1 }
    v
  }
}

object BpeKernel {

  import BpeVocab._

  /** Number of subword tokens in `text` under greedy leftmost-longest
    * vocab matching, whitespace (0x20) separating words and contributing
    * no tokens. Scans UTF-8 bytes in place; a non-matching position
    * advances by the full UTF-8 sequence width and counts ONE token, so
    * the count equals the codepoint-level scan a SQL engine's
    * `substr`/`length` (character semantics) reproduces. ASCII vocab
    * tokens can never match inside a multi-byte sequence (continuation
    * bytes are ≥ 0x80), so byte-slice matching is exact. */
  def bpeCount(text: UTF8String): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    var count = 0L
    var pos = 0
    while (pos < n) {
      if (bytes(pos) == 0x20) { pos += 1 }
      else {
        var matched = 0
        var len = math.min(maxLen, n - pos)
        while (matched == 0 && len >= 2) {
          val table = packedByLen(len)
          if (table.length > 0 &&
            java.util.Arrays.binarySearch(table, pack(bytes, pos, len)) >= 0)
            matched = len
          len -= 1
        }
        if (matched > 0) pos += matched
        else {
          // single-codepoint token: advance the full UTF-8 sequence
          val b = bytes(pos) & 0xff
          pos += (if (b < 0x80) 1 else if (b < 0xe0) 2
                  else if (b < 0xf0) 3 else 4)
        }
        count += 1
      }
    }
    count
  }

  /** The pieces themselves, in scan order (same greedy leftmost-longest
    * walk as [[bpeCount]]; whitespace separates words and emits nothing).
    * Matched pieces are vocab tokens; fallbacks are single codepoints —
    * the SQL oracle reproduces both with character-semantics `substr`
    * because ASCII vocab tokens never straddle multi-byte sequences. */
  def bpePieces(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val out = mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < n) {
      if (bytes(pos) == 0x20) { pos += 1 }
      else {
        var matched = 0
        var len = math.min(maxLen, n - pos)
        while (matched == 0 && len >= 2) {
          val table = packedByLen(len)
          if (table.length > 0 &&
            java.util.Arrays.binarySearch(table, pack(bytes, pos, len)) >= 0)
            matched = len
          len -= 1
        }
        val width =
          if (matched > 0) matched
          else {
            val b = bytes(pos) & 0xff
            if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4
          }
        out += UTF8String.fromBytes(bytes, pos, math.min(width, n - pos))
        pos += width
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `bpe_pieces(text)` — the subword token sequence itself under the
  * [[BpeVocab]] greedy merge table (see [[BpeKernel.bpePieces]]);
  * `bpe_count(text) = size(bpe_pieces(text))` by construction. */
case class BpePieces(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_pieces"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.bpePieces(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.BpeKernel.bpePieces($c)")

  override protected def withNewChildInternal(newChild: Expression): BpePieces =
    copy(child = newChild)
}

/** `bpe_count(text)` — subword token count under the [[BpeVocab]] greedy
  * merge table (see [[BpeKernel.bpeCount]]). */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.bpeCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.BpeKernel.bpeCount($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object TextKernelsSimhash {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val digestBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** First 8 bytes of md5(bytes) as a big-endian long — the same value any
    * engine gets from parsing the leading 16 hex chars of its own `md5()`
    * (e.g. DuckDB `('0x' || substr(md5(t), 1, 16))::UBIGINT`). */
  def md5Hash64(bytes: Array[Byte]): Long = md5Hash64(bytes, 0, bytes.length)

  /** Slice form: thread-local digest + reused 16-byte output buffer — the
    * hot loop allocates NOTHING per token. */
  def md5Hash64(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(bytes, off, len)
    val d = digestBuf.get()
    md.digest(d, 0, 16)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** 64-bit SimHash over whitespace tokens (tf-weighted bit votes),
    * returned as 4 × 16-bit band values — one pass, no shuffle. The
    * explode-then-64-aggregates formulation costs a full groupBy exchange
    * per corpus; this is a pure map. `md5Hash` selects the token hash:
    * XXH64 (fast scale path) or md5-derived (portable — bit-reproducible
    * by any engine with an md5(), which makes the whole near-dup relation
    * oracle-checkable).
    *
    * Tokenization scans the UTF-8 BYTES in place (0x20 never occurs inside
    * a multi-byte sequence, so a byte scan splits exactly like the string
    * split) and both hash paths consume byte slices — the per-row cost is
    * one `getBytes` plus fixed-size scratch; the previous
    * toString/split/fromString/getBytes chain allocated 4 objects per
    * token and dominated the kernel under GC pressure. Empty tokens
    * (leading/adjacent/trailing separators) vote exactly like
    * `split(" ", -1)` produced them. */
  def simhashBands(text: UTF8String, seed: Long, md5Hash: Boolean): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val votes = new Array[Int](64)
    var start = 0
    while (start <= n) {
      var end = start
      while (end < n && bytes(end) != 0x20) end += 1
      val h =
        if (md5Hash) md5Hash64(bytes, start, end - start)
        else XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
          end - start, seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      start = end + 1
    }
    val bands = new Array[Any](4)
    var k = 0
    while (k < 4) {
      var band = 0L
      var j = 0
      while (j < 16) {
        if (votes(k * 16 + j) > 0) band |= 1L << j
        j += 1
      }
      bands(k) = band
      k += 1
    }
    new GenericArrayData(bands)
  }
}

/** `simhash_bands(text[, md5])` — 64-bit SimHash as 4 × 16-bit LSH bands.
  * `md5Hash = true` swaps the XXH64 token hash for the md5-derived one
  * (engine-portable; see [[TextKernelsSimhash.md5Hash64]]). */
case class SimHashBands(child: Expression, seed: Long = 42L,
    md5Hash: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_bands"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernelsSimhash.simhashBands(input.asInstanceOf[UTF8String], seed, md5Hash)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.text.TextKernelsSimhash.simhashBands($c, ${seed}L, $md5Hash)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBands =
    copy(child = newChild)
}

/** `shingle_set(text)` — distinct n-token shingles as a native expression. */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle_set width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** `shingle_list(text, n)` — every n-token shingle in position order
  * (non-distinct): the gram-COUNTING input for repetition stats. */
case class ShingleList(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle_list width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_list"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingleList(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.shingleList($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleList =
    copy(child = newChild)
}

/** `minhash_sig(shingles)` — k-permutation MinHash signature; NULL for an
  * empty shingle set (documents too short to fingerprint). */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"minhash_sig hash count must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("minhashSig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.text.TextKernels.minhash($c, $k);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
