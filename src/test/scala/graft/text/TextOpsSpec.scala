package graft.text

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Independent reference for the BPE kernel: greedy leftmost-longest
    * over the same vocab, implemented on String/codepoints instead of
    * UTF-8 bytes. */
  private def refBpeCount(text: String): Long = {
    var count = 0L
    var pos = 0
    while (pos < text.length) {
      if (text(pos) == ' ') pos += 1
      else {
        BpeVocab.tokens.filter(t => text.startsWith(t, pos))
          .map(_.length).maxOption match {
          case Some(l) => pos += l
          case None => pos += Character.charCount(text.codePointAt(pos))
        }
        count += 1
      }
    }
    count
  }

  test("bpe_count: greedy leftmost-longest merge, kernel == reference") {
    import org.apache.spark.unsafe.types.UTF8String
    def k(s: String): Long = BpeKernel.bpeCount(UTF8String.fromString(s))
    // hand-pinned semantics: whole-word merges win over their subwords
    assert(k("table") === 1L, "whole vocab word is one token")
    assert(k("tables") === 2L, "table + s")
    assert(k("the table") === 2L)
    assert(k("") === 0L)
    assert(k("   ") === 0L, "spaces bill nothing")
    assert(k("qqq") === 3L, "no merges -> one token per char")
    // multi-byte safety: one token per CODEPOINT, like SQL substr/length
    assert(k("héllo") === refBpeCount("héllo"))
    assert(k("日本語 text") === refBpeCount("日本語 text"))
    // randomized cross-check against the independent reference
    val rng = new scala.util.Random(11)
    val alpha = "abcdefghijklmnopqrstuvwxyzé日 "
    (1 to 200).foreach { _ =>
      val s = (1 to rng.nextInt(40)).map(_ => alpha(rng.nextInt(alpha.length))).mkString
      assert(k(s) === refBpeCount(s), s"kernel != ref on '$s'")
    }
    // corpus words through the real table, SQL-function path
    graft.functions.registerAll(spark)
    val rows = spark.sql(
      s"SELECT text, bpe_count(text) FROM parquet.`$dir/documents.parquet` LIMIT 50")
      .collect()
    rows.foreach(r => assert(r.getLong(1) === refBpeCount(r.getString(0))))
  }

  test("bpe_pieces: reconstructs text, count-consistent, ids stable") {
    import org.apache.spark.unsafe.types.UTF8String
    def pieces(s: String): Seq[String] = {
      val a = BpeKernel.bpePieces(UTF8String.fromString(s))
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    assert(pieces("the table") === Seq("the", "table"))
    assert(pieces("tables") === Seq("table", "s"))
    assert(pieces("") === Seq.empty)
    // é and 日 are single-codepoint fallbacks; no vocab merge applies
    assert(pieces("héllo 日本") === Seq("h", "é", "l", "l", "o", "日", "本"))
    // concatenating pieces restores the text minus spaces, and the piece
    // count equals bpe_count — on every corpus doc
    val rows = TextOps.qBpeEncode(spark, dir)
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("piece"))).as("chars"),
        org.apache.spark.sql.functions.min("piece_id").as("min_id"),
        org.apache.spark.sql.functions.max("piece_id").as("max_id"))
      .join(graft.relational.Tables.load(spark, dir, "documents"), "doc_id")
      .collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val text = r.getAs[String]("text")
      assert(r.getAs[Long]("n") === refBpeCount(text))
      assert(r.getAs[Long]("chars") ===
        text.codePointCount(0, text.length) - text.count(_ == ' '))
      assert(r.getAs[Long]("min_id") >= -1L)
      assert(r.getAs[Long]("max_id") < graft.text.BpeVocab.tokens.size.toLong)
    }
  }

  test("cdc chunks: JVM replay equality and insertion-stable boundaries") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def isBoundary(tok: String): Boolean = // 'cdc:'-salted policy
      java.lang.Long.parseLong(md5hex(s"cdc:$tok").take(4), 16) % 16 == 0
    def chunksOf(tokens: Seq[String]): Seq[Seq[String]] = {
      val out = scala.collection.mutable.ListBuffer.empty[Seq[String]]
      var cur = scala.collection.mutable.ListBuffer.empty[String]
      tokens.foreach { t =>
        cur += t
        if (isBoundary(t)) { out += cur.toSeq; cur = cur.take(0) }
      }
      if (cur.nonEmpty) out += cur.toSeq
      out.toSeq
    }
    // replay equality on the corpus
    val want = graft.relational.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect().flatMap { r =>
        chunksOf(r.getString(1).split(" ", -1).toSeq).zipWithIndex.map {
          case (c, i) => (r.getLong(0), i.toLong) ->
            ((c.length.toLong, md5hex(c.mkString(" "))))
        }
      }.toMap
    val got = TextOps.qCdcChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(4)))).toMap
    assert(got === want)
    // THE CDC property: inserting tokens mid-document only perturbs the
    // chunk containing the insertion — chunks before it AND after the
    // next boundary keep their hashes (a fixed-stride chunker shifts
    // every downstream window instead)
    val base = (1 to 400).map(i => s"tok$i")
    val ins = base.take(200) ++ Seq("INSERTED", "TOKENS") ++ base.drop(200)
    val (a, b) = (chunksOf(base).map(_.mkString(" ")),
      chunksOf(ins).map(_.mkString(" ")))
    val common = a.toSet.intersect(b.toSet)
    assert(common.size >= a.size - 2,
      s"insertion must perturb at most the chunk it lands in: " +
        s"${a.size} chunks, ${common.size} survive")
  }

  test("tokenizer fertility: per-lang pieces/words ratio from the kernel") {
    val rows = TextOps.qTokenizerFertility(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).map { case (lang, ds) =>
      val words = ds.map(_._2.split(" ", -1).count(_.nonEmpty).toLong).sum
      val pieces = ds.map(d => refBpeCount(d._2)).sum
      lang -> ((words, pieces))
    }
    rows.foreach { case (lang, (w, p, fb, fppm, fbppm)) =>
      assert((w, p) === want(lang), lang)
      assert(fb >= 0 && fb <= p)
      assert(fppm === p * 1000000L / w)
      assert(fbppm === fb * 1000000L / p)
      assert(fppm >= 1000000L, "every word emits at least one piece")
    }
    // every corpus language is present exactly once
    assert(rows.keySet === docs.map(_._1).toSet)
  }

  test("qTokenBpe: subword count next to whitespace count, sane compression") {
    val rows = TextOps.qTokenBpe(spark, dir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (ws, bpe) = (r.getLong(1), r.getLong(2))
      // merges only ever shrink a word's char count and every word emits
      // >= 1 token: ws <= bpe <= chars
      assert(bpe >= ws, s"doc ${r.getLong(0)}: bpe $bpe < ws $ws")
      assert(!r.isNullAt(3) && r.getDouble(3) > 1.0,
        "chars_per_tok > 1 — merges compress")
    }
  }

  test("PII scrub: injected identifiers counted and redacted byte-exactly") {
    import org.apache.spark.sql.functions._
    val rows = TextOps.qPiiScrub(spark, dir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === (if (id % 3 == 0) 1L else 0L), s"doc $id emails")
      assert(r.getLong(2) === (if (id % 4 == 0) 1L else 0L), s"doc $id phones")
      assert(r.getLong(3) === (if (id % 5 == 0) 1L else 0L), s"doc $id ips")
    }
    // independent end-to-end redaction check for one fully-loaded doc
    // (60 % 3 = 60 % 4 = 60 % 5 = 0): rebuild the seeded text in plain
    // Scala, scrub with java.util.regex, compare md5
    val text60 = graft.relational.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") === 60).select("text").collect()(0).getString(0)
    val seeded = text60 + " contact user60@mail.example.com" +
      " call 555-010-0060" + " from 10.0.60.164"
    val scrubbed = seeded
      .replaceAll("[a-z0-9.]+@[a-z0-9.]+[.][a-z]+", "<EMAIL>")
      .replaceAll("[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>")
      .replaceAll("[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}", "<IP>")
    val md = java.security.MessageDigest.getInstance("MD5")
    val wantHash = md.digest(scrubbed.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val got = rows.find(_.getLong(0) == 60L).get
    assert(got.getString(4) === wantHash, "byte-exact scrub for doc 60")
  }

  test("unigram perplexity matches an independent driver-side model") {
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val counts = docs.values.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = counts.values.sum.toDouble
    val v = counts.size.toDouble
    def nll(toks: Seq[String]): Double = {
      val raw = toks.map(tok => -math.log((counts(tok) + 1).toDouble / (t + v)))
        .sum / toks.size
      math.rint(raw * 10000) / 10000
    }
    val got = TextOps.qPerplexity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length === docs.size)
    got.foreach { case (id, n, gNll, gPpl) =>
      assert(n === docs(id).size.toLong, s"doc $id token count")
      // accumulation order differs (distributed vs sequential fold); the
      // 4-decimal rounding is the contract, allow the boundary ulp
      assert(math.abs(gNll - nll(docs(id))) < 2e-4, s"doc $id nll")
      assert(math.abs(gPpl - math.rint(math.exp(gNll) * 100) / 100) < 1e-9,
        s"doc $id ppl from rounded nll")
    }
    // the score separates documents (constant scores would filter nothing)
    assert(got.map(_._3).distinct.length > docs.size / 10)
  }

  test("bigram LM matches a driver-side model and beats the unigram fit") {
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val uc = docs.values.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bic = docs.values.flatMap(ts => ts.zip(ts.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = uc.values.sum.toDouble
    val v = uc.size.toDouble
    def nll(toks: Seq[String]): Double = {
      val raw = toks.zip(toks.tail).map { case (p, w) =>
        -math.log(0.75 * bic((p, w)).toDouble / uc(p) +
          0.25 * (uc(w) + 1).toDouble / (t + v))
      }.sum / (toks.size - 1)
      math.rint(raw * 10000) / 10000
    }
    val got = TextOps.qBigramLm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length === docs.count(_._2.size >= 2))
    got.foreach { case (id, n, gNll, _) =>
      assert(n === docs(id).size - 1L, s"doc $id bigram count")
      assert(math.abs(gNll - nll(docs(id))) < 2e-4, s"doc $id nll")
    }
    // a conditional model fits its training corpus better than the
    // unigram marginal (the reason one uses it as a quality signal)
    val uni = TextOps.qPerplexity(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val meanBi = got.map(_._3).sum / got.length
    val meanUni = got.map(g => uni(g._1)).sum / got.length
    assert(meanBi < meanUni, s"bigram NLL $meanBi !< unigram $meanUni")
  }

  test("Kneser-Ney NLL matches a driver-side model; probs are proper") {
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val bic = docs.values.flatMap(ts => ts.zip(ts.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cp = bic.toSeq.groupBy(_._1._1)
      .view.mapValues(es => (es.map(_._2).sum, es.size.toLong)).toMap
    val cont = bic.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nTypes = bic.size.toDouble
    def pKn(prev: String, w: String): Double = {
      val (c, n1pPrev) = cp(prev)
      (bic((prev, w)).toDouble - 0.75) / c +
        0.75 * n1pPrev.toDouble / c * (cont(w).toDouble / nTypes)
    }
    def nll(toks: Seq[String]): Double = {
      val raw = toks.zip(toks.tail).map { case (p, w) =>
        -math.log(pKn(p, w))
      }.sum / (toks.size - 1)
      math.rint(raw * 10000) / 10000
    }
    val got = TextOps.qKneserNey(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length === docs.count(_._2.size >= 2))
    got.foreach { case (id, n, gNll, gPpl) =>
      assert(n === docs(id).size - 1L, s"doc $id bigram count")
      assert(math.abs(gNll - nll(docs(id))) < 2e-4, s"doc $id nll")
      assert(gPpl === math.rint(math.exp(gNll) * 100) / 100,
        s"doc $id ppl from rounded nll")
    }
    // every scored probability is proper: positive (NLL finite > 0 — a
    // discount > observed count would flip it negative) and ≤ 1
    assert(got.forall(_._3 > 0), "NLL must be positive")
    // per-context discounted mass + backoff never exceeds 1: spot-check
    // the total conditional mass for every observed context
    cp.foreach { case (prev, (c, n1pPrev)) =>
      val seen = bic.collect { case ((p, w), _) if p == prev => pKn(p, w) }
      val mass = seen.sum
      assert(mass <= 1.0 + 1e-9, s"context '$prev' mass $mass > 1")
    }
  }

  test("vocab coverage equals a JVM replay and is monotone in k") {
    val toks = graft.relational.Tables.load(spark, dir, "documents")
      .select("text").collect().flatMap(_.getString(0).split(" ", -1))
    val uc = toks.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }
    val total = toks.length.toLong
    def cov(k: Int): Long = uc.take(k).map(_._2).sum * 1000000L / total
    val got = TextOps.qVocabCoverage(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    Seq(10, 100, 1000).foreach { k =>
      assert(got(k.toLong) === ((cov(k), uc.length.toLong, total)), s"k=$k")
    }
    assert(got(10L)._1 <= got(100L)._1 && got(100L)._1 <= got(1000L)._1)
  }

  test("doc-doc weighted Jaccard top-k equals an exact JVM replay") {
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).groupBy(identity)
          .view.mapValues(_.length.toLong).toMap)
      .toMap
    val dl = docs.view.mapValues(_.values.sum).toMap
    val want = (0L until 10L).map { q =>
      val scored = docs.keys.filter(_ != q).flatMap { d =>
        val inter = docs(q).keysIterator
          .map(t => math.min(docs(q)(t), docs(d).getOrElse(t, 0L))).sum
        if (inter == 0) None // no shared token -> no inverted-index row
        else Some(d -> inter * 1000000L / (dl(q) + dl(d) - inter))
      }.toSeq
      q -> scored.sortBy { case (d, s) => (-s, d) }.take(5)
    }.toMap
    val got = TextOps.qDocJaccardTopK(spark, dir).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(3))
        .map(r => (r.getLong(1), r.getLong(2))).toSeq).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (q, exp) => assert(got(q) === exp, s"query $q") }
  }

  test("dataset card equals a JVM replay of the per-source manifest") {
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("source", "text", "lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    val want = docs.groupBy(_._1).map { case (s, rows) =>
      s -> ((rows.length.toLong, rows.map(_._4).sum,
        rows.map(_._2.split(" ", -1).length.toLong).sum,
        rows.map(_._3).distinct.length.toLong,
        rows.length.toLong - rows.map(_._2).distinct.length.toLong))
    }
    val got = TextOps.qDatasetCard(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === want)
  }

  test("collocations equal an exact BigInt replay of the lift gate") {
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("text").collect().map(_.getString(0).split(" ", -1).toSeq)
    val uc = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bic = docs.flatMap(ts => ts.zip(ts.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = BigInt(uc.values.sum)
    val want = bic.collect { case ((a, b), c2) if c2 >= 10 =>
      val lift = (BigInt(c2) * n * 1000000) / (BigInt(uc(a)) * BigInt(uc(b)))
      ((a, b), (c2, uc(a), uc(b), lift.toLong))
    }.filter(_._2._4 >= 1200000L)
    val got = TextOps.qCollocations(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> // (prev, tok) order
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.size === want.size)
    want.foreach { case (k, v) => assert(got(k) === v, s"bigram $k") }
    // every surviving pair genuinely beats independence
    assert(got.values.forall(_._4 >= 1200000L) && got.nonEmpty)
  }

  test("repetition stats match a driver-side computation") {
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val got = TextOps.qRepetitionStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length === docs.size)
    got.foreach { case (id, n, nd, topTok, topBg) =>
      val toks = docs(id)
      val bgs = toks.sliding(2).map(_.mkString(" ")).toSeq
      assert(n === toks.size.toLong)
      assert(nd === toks.distinct.size.toLong)
      def frac(xs: Seq[String]) = {
        val top = xs.groupBy(identity).values.map(_.size).max
        // HALF_UP like Spark/DuckDB round(); math.rint would go half-even
        BigDecimal(top.toDouble / xs.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(topTok === frac(toks), s"doc $id top token")
      assert(topBg === frac(bgs), s"doc $id top bigram")
    }
    // repetition separates docs: planted "x x x" runs push the tail up
    assert(got.map(_._5).max > got.map(_._5).min)
  }

  test("feature hashing equals a JVM replay of bucket, sign, and counts") {
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // group-by semantics: a bucket whose signs cancel still emits its
    // weight-0 row — the replay keeps them too
    val want = docs.flatMap { case (id, text) =>
      text.split(" ", -1).map { tok =>
        val h = md5hex(tok)
        ((id, java.lang.Long.parseLong(h.take(2), 16) % 64),
          if (java.lang.Long.parseLong(h.substring(2, 3), 16) % 2 == 0) 1L else -1L)
      }
    }.groupBy(_._1).map { case (k, ss) => k -> ss.map(_._2).sum }
    val got = TextOps.qFeatureHash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === want)
    // vectors live in the declared dim space
    got.keys.foreach { case (_, dim) => assert(dim >= 0 && dim < 64) }
  }

  test("bm25TopK matches an exact BigInt replay of the rational score") {
    import spark.implicits._
    // tiny corpus: doc 0 is the query; 1 shares both its terms,
    // 2 shares one, 3 none, 4 shares one but is much longer
    val docs = Seq(
      (0L, "alpha beta"),
      (1L, "alpha beta gamma"),
      (2L, "beta delta delta"),
      (3L, "delta gamma epsilon"),
      (4L, "alpha zeta zeta zeta zeta zeta zeta zeta"))
      .toDF("doc_id", "text")
    val texts = docs.as[(Long, String)].collect().toMap
    val toks = texts.view.mapValues(_.split(" ").toSeq).toMap
    val n = BigInt(texts.size)
    val t = BigInt(toks.values.map(_.size).sum)
    def dfq(tok: String) = BigInt(toks.count(_._2.contains(tok)))
    // exact replay: num div den per (query term, doc), summed
    def score(qid: Long, did: Long): BigInt =
      toks(qid).distinct.filter(toks(did).contains).map { tok =>
        val tf = BigInt(toks(did).count(_ == tok))
        val dl = BigInt(toks(did).size)
        val num = 44 * tf * t * (2 * (n - dfq(tok)) + 1) * 1000000
        val den = (20 * tf * t + 6 * t + 18 * dl * n) * (2 * dfq(tok) + 1)
        num / den
      }.sum
    val want = (for {
      qid <- Seq(0L); did <- texts.keys if did != qid
      s = score(qid, did) if s > 0
    } yield (qid, did) -> s.toLong).toMap
    val res = TextOps.bm25TopK(docs, nQueries = 1, k = 10)
    val got = res.select("qid", "doc_id", "score_fp")
      .as[(Long, Long, Long)].collect()
      .map { case (q, d, s) => (q, d) -> s }.toMap
    assert(got === want)
    // ranking is by descending score with doc-id tiebreak
    val ranked = res.orderBy("rnk").select("doc_id").as[Long].collect()
    val wantOrder = want.toSeq.sortBy { case ((_, d), s) => (-s, d) }
      .map(_._1._2)
    assert(ranked.toSeq === wantOrder)
    // the never-overlapping doc is absent; no self-retrieval
    assert(!got.contains((0L, 3L)) && !got.contains((0L, 0L)))
  }

  test("kappa: cells tie out against a JVM replay; kappa is the exact ratio") {
    val dir = "/root/testdata/sf0.001"
    val row = TextOps.qKappa(spark, dir).collect().head
    val (n00, n01, n10, n11) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // JVM replay of both raters over the raw text
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val cells = docs.map { t =>
      val toks = t.split(" ", -1)
      val nStop = toks.count(w => w == "the" || w == "a")
      (toks.length >= 20 && toks.length <= 80, nStop * 5L < toks.length)
    }
    assert(n00 === cells.count(c => !c._1 && !c._2))
    assert(n01 === cells.count(c => !c._1 && c._2))
    assert(n10 === cells.count(c => c._1 && !c._2))
    assert(n11 === cells.count(c => c._1 && c._2))
    val n = n00 + n01 + n10 + n11
    val chance = (n10 + n11) * (n01 + n11) + (n00 + n01) * (n00 + n10)
    assert(row.getDouble(4) === (n * (n00 + n11) - chance).toDouble / (n * n - chance))
    assert(n === docs.length)
  }

  test("phrase search equals a JVM sliding-window count, incl. a 3-term phrase") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    def occurrences(toks: Array[String], phrase: Seq[String]): Long =
      toks.sliding(phrase.length)
        .count(w => w.length == phrase.length && w.sameElements(phrase))
    def replay(phrase: Seq[String]): Map[Long, Long] =
      docs.map { case (id, t) => id -> occurrences(t, phrase) }
        .filter(_._2 > 0).toMap
    val two = Seq("hash", "join")
    val gotTwo = TextOps.qPhraseSearch(spark, dir, two).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotTwo === replay(two))
    // a 3-term phrase exercises the fold past the oracle's bigram form;
    // pick the corpus's most common trigram so the case is non-empty
    val three = docs.flatMap(_._2.sliding(3).filter(_.length == 3))
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length)
      .toSeq.sortBy { case (p, n) => (-n, p.mkString(" ")) }.head._1
    val gotThree = TextOps.qPhraseSearch(spark, dir, three).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotThree.nonEmpty)
    assert(gotThree === replay(three))
  }

  test("textrank: top keywords exclude stopwords and match a JVM replay") {
    import org.apache.spark.sql.functions._
    val got = TextOps.qTextRank(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // the fixture vocabulary graph is smaller than k=30: every word ranks
    assert(got.nonEmpty && got.length <= 30)
    // every rank carries at least the teleport floor
    assert(got.forall(_._2 >= 150000000000L))
    // replay: tokens, DF-gated stoplist, filtered-sequence bigrams,
    // 5 fixed-point PageRank rounds — all BigInt-free long arithmetic
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val nDocs = docs.length
    val df = docs.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).view.mapValues(_.size).toMap
    val stop = df.filter(_._2 >= nDocs * 0.8).keySet
    val pairs = docs.flatMap { case (_, ts) =>
      val kept = ts.filterNot(stop)
      kept.zip(kept.tail).filter(p => p._1 != p._2)
        .map(p => if (p._1 < p._2) p else p.swap)
    }.distinct
    val arcs = pairs ++ pairs.map(_.swap)
    val deg = arcs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = deg.keys.map(_ -> 1000000000000L).toMap
    for (_ <- 1 to 5)
      r = arcs.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        r(s) / deg(s) }.sum).toMap
        .map { case (n, m) => n -> (150000000000L + 85 * m / 100) }
    val want = r.toSeq.sortBy { case (wd, rk) => (-rk, wd) }.take(30)
    assert(got.toSeq === want)
  }

  test("naive Bayes confusion matrix equals a JVM replay and is diagonal-heavy") {
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.map { case (id, lang, text) =>
      (id, lang, text.split(" ", -1).toSeq) }
    val cnt = toks.flatMap { case (_, l, ts) => ts.map((l, _)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val langTot = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val vocab = cnt.keysIterator.map(_._2).toSet
    val v = vocab.size.toLong
    val langs = langTot.keySet.toSeq.sorted
    val nd = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.length.toLong
    def w(l: String, t: String): Long =
      math.floor(math.log((cnt.getOrElse((l, t), 0L) + 1).toDouble /
        (langTot(l) + v)) * 1e6).toLong
    val want = toks.map { case (_, lang, ts) =>
      // argmax with lexicographic tiebreak on lang asc
      val best = langs.map(l => (ts.map(w(l, _)).sum +
        math.floor(math.log(nd(l).toDouble / n) * 1e6).toLong, l))
        .sortBy { case (s, l) => (-s, l) }.head._2
      (lang, best)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = TextOps.qNaiveBayes(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === want)
    // structural: every document lands in exactly one confusion cell
    // (NOTE: the synthetic corpus draws ALL langs from one shared token
    // pool, so the label is not actually learnable here — prediction
    // QUALITY is meaningless on this fixture; the operator's claim is
    // the exact model/argmax replay above and the DuckDB oracle)
    val rowSums = got.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    assert(rowSums === nd)
  }

  test("chi2 feature ranking equals a BigInt replay") {
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "lang", "text").collect()
      .map(r => (r.getString(1), r.getString(2).split(" ", -1).distinct))
    val n = BigInt(docs.length)
    val nl = docs.groupBy(_._1).view.mapValues(d => BigInt(d.length)).toMap
    val dft = docs.flatMap { case (_, ts) => ts }
      .groupBy(identity).view.mapValues(d => BigInt(d.length)).toMap
    val a = docs.flatMap { case (l, ts) => ts.map((l, _)) }
      .groupBy(identity).view.mapValues(d => BigInt(d.length)).toMap
    val want = a.keys.toSeq.flatMap { case (l, t) =>
      val (av, b, c) = (a((l, t)), nl(l) - a((l, t)), dft(t) - a((l, t)))
      val d = n - nl(l) - dft(t) + av
      if (av * d > b * c)
        Some((l, t,
          (n * (av * d - b * c) * (av * d - b * c) * 1000 /
            ((av + b) * (c + d) * (av + c) * (b + d))).toLong))
      else None
    }.groupBy(_._1).view.mapValues(
      _.sortBy { case (_, t, s) => (-s, t) }.take(10)
        .zipWithIndex.map { case ((_, t, s), i) => (t, s, i + 1L) }).toMap
    val got = TextOps.qChi2Features(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._4).map(t => (t._2, t._3, t._4)).toSeq).toMap
    assert(got === want.mapValues(_.toSeq).toMap)
  }

  test("lexical diversity equals a JVM replay") {
    val toks = graft.relational.Tables.load(spark, dir, "documents")
      .selectExpr("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map((r.getString(0), _)))
    val want = toks.groupBy(_._1).map { case (lang, ts) =>
      val cnt = ts.groupBy(_._2).view.mapValues(_.length.toLong)
      val n = ts.length.toLong
      val v = cnt.size.toLong
      val hapax = cnt.count(_._2 == 1L).toLong
      val coll = cnt.values.map(c => BigInt(c) * (c - 1)).sum
      lang -> ((n, v, hapax, v * 1000000 / n, hapax * 1000000 / v,
        (coll * 1000000 / (BigInt(n) * (n - 1))).toLong))
    }
    val got = TextOps.qLexicalDiversity(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got === want)
  }

  test("lexicon filter census equals a JVM replay") {
    val lex = Set("slow", "dup", "drop", "big")
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      val stats = ds.map { case (_, toks) =>
        val hits = toks.count(lex.contains).toLong
        (hits, hits >= 3 || hits * 25 >= toks.length)
      }
      src -> ((ds.length.toLong, stats.count(_._2).toLong,
        stats.map(_._1).sum,
        ds.length.toLong - stats.count(_._2).toLong))
    }
    val got = TextOps.qLexiconFilter(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got === want)
    assert(got.values.map(_._1).sum ===
      got.values.map(v => v._2 + v._4).sum, "flagged + kept = docs")
  }

  test("token entropy and KL equal a JVM micronat replay; KL non-negative") {
    val got = TextOps.qTokenEntropy(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val toks = graft.relational.Tables.load(spark, dir, "documents")
      .selectExpr("lang", "explode(split(text, ' ')) as tok").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val corp = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val gg = toks.length.toLong
    val want = toks.groupBy(_._1).map { case (lang, ts) =>
      val cnt = ts.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val nn = ts.length.toLong
      val h = cnt.values.map(c =>
        BigInt(c) * math.floor(math.log(nn.toDouble / c) * 1e6).toLong).sum
      val kl = cnt.map { case (tok, c) =>
        BigInt(c) * math.floor(math.log(
          c.toDouble * gg / (nn.toDouble * corp(tok))) * 1e6).toLong
      }.sum
      lang -> ((nn, cnt.size.toLong, (h / nn).toLong, (kl / nn).toLong))
    }
    assert(got === want)
    got.values.foreach { case (_, _, h, kl) =>
      assert(h > 0, "entropy must be positive on a mixed stream")
      assert(kl >= -1, s"KL must be non-negative up to flooring: $kl")
    }
  }

  test("lang-id profile confusion equals a JVM out-of-place replay") {
    val got = TextOps.qLangIdProfile(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._3.length >= 3)
    def tris(t: String): Seq[String] =
      (0 to t.length - 3).map(i => t.substring(i, i + 3))
    def profile(counts: Map[String, Int]): Seq[(String, Long)] =
      counts.toSeq.sortBy { case (tri, c) => (-c, tri) }.take(20)
        .zipWithIndex.map { case ((tri, _), i) => (tri, i + 1L) }
    val langProf = docs.filter(_._1 % 2 == 0).groupBy(_._2)
      .map { case (lang, ds) =>
        lang -> profile(ds.flatMap(d => tris(d._3))
          .groupBy(identity).view.mapValues(_.size).toMap).toMap
      }
    val langs = langProf.keys.toSeq.sorted
    val want = docs.filter(_._1 % 2 == 1).map { case (_, lang, text) =>
      val dp = profile(tris(text).groupBy(identity)
        .view.mapValues(_.size).toMap)
      val pred = langs.map { cand =>
        val lp = langProf(cand)
        val dist = dp.map { case (tri, dr) =>
          lp.get(tri).map(lr => math.abs(dr - lr)).getOrElse(20L)
        }.sum
        (dist, cand)
      }.min._2
      (lang, pred)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got === want)
    assert(got.values.sum === docs.count(_._1 % 2 == 1).toLong)
  }

  test("vocab growth curve equals a JVM replay of the shuffled-order census") {
    val got = TextOps.qVocabGrowth(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .sortBy { case (id, _) => md5hex(s"vg:$id") }
    val n = docs.length.toLong
    def bucket(p: Long): Int =
      if (p == 1) 0 else java.lang.Long.toBinaryString(p - 1).length
    val firstPos = scala.collection.mutable.Map[String, Long]()
    docs.zipWithIndex.foreach { case ((_, toks), i) =>
      toks.distinct.foreach(t =>
        if (!firstPos.contains(t)) firstPos(t) = i + 1L)
    }
    val maxB = bucket(n)
    val want = (0 to maxB).map { b =>
      val c = 1L << b
      ((1L << b), math.min(c, n),
        docs.take(math.min(c, n).toInt).map(_._2.length.toLong).sum,
        firstPos.values.count(_ <= c).toLong)
    }
    assert(got.toSeq === want)
    // growth is monotone and ends at the full vocabulary
    assert(got.last._4 === firstPos.size.toLong)
    val vs = got.map(_._4)
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
  }
}
