package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("exact jaccard pairs: symmetric-free (d1<d2), thresholded, planted dups found") {
    val pairs = Dedup.qNgramJaccardPairs(spark, dir).collect()
    assert(pairs.nonEmpty, "corpus has planted near-dups; result must not be empty")
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0)
    }
  }

  test("minhash LSH: every reported pair is exact-verified; recall >= 0.8 on strong pairs") {
    val exact = Dedup.qNgramJaccardPairs(spark, dir, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.qMinhashLshPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // precision 1.0 by construction: every LSH pair is in the exact set
    lsh.foreach { case (k, j) =>
      assert(exact.contains(k), s"LSH pair $k not in exact set")
      assert(math.abs(exact(k) - j) < 1e-9)
    }
    // recall on strong pairs (jaccard >= 0.8): 8 bands x 4 rows gives
    // P(candidate) ~ 0.985 per pair at j=0.8
    val strong = exact.filter(_._2 >= 0.8).keySet
    val found = strong.count(lsh.contains)
    assert(strong.isEmpty || found.toDouble / strong.size >= 0.8,
      s"recall ${found.toDouble / strong.size} < 0.8 on ${strong.size} strong pairs")
  }

  test("simhash banding is exactly complete for hamming <= 3 (pigeonhole)") {
    import spark.implicits._
    // brute-force reference: all pairs with hamming <= 3 over full signatures
    val lshPairs = Dedup.qSimhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // recompute hamming for ALL pairs from the (deterministic) signatures
    val sigs = Dedup.qSimhashPairs(spark, dir, maxHamming = 64)
      .collect() // maxHamming=64 ≅ all candidate pairs that share any band
    // pigeonhole: a pair with hamming <= 3 differs in <= 3 of 4 bands, so
    // shares >= 1 band → appears among candidates. Hence the thresholded
    // result must be exactly {candidates with hamming <= 3}.
    val expect = sigs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._3 <= 3).toSet
    assert(lshPairs === expect)
    lshPairs.foreach { case (d1, d2, h) =>
      assert(d1 < d2 && h >= 0 && h <= 3)
    }
  }

  test("simhash kernel matches the independent explode+xxhash64 formulation") {
    import org.apache.spark.sql.functions._
    // pinned vector (guards against silent kernel drift)
    val pinned = spark.createDataFrame(Seq((1L, "a b c"))).toDF("id", "text")
      .select(graft.functions.simhash_bands(col("text"))).collect()(0)
      .getSeq[Long](0)
    assert(pinned === Seq(58330L, 1460L, 16017L, 32876L))
    // independent oracle: the pre-kernel SQL formulation (tf-weighted
    // per-bit votes over xxhash64(token), Spark's default seed 42)
    val docs = graft.relational.Tables.load(spark, dir, "documents").limit(50)
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitVotes = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1))
        .as(s"bit$b")
    }
    val voted = tok.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
    val bandCols = (0 until 4).map { k =>
      (0 until 16).map { j =>
        when(col(s"bit${k * 16 + j}") > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _).as(s"band$k")
    }
    val expected = voted.select(col("doc_id") +: bandCols: _*).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toSeq).toMap
    val got = docs
      .select(col("doc_id"), graft.functions.simhash_bands(col("text")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got === expected)
  }

  test("md5 simhash kernel matches an independent md5-bit formulation") {
    import org.apache.spark.sql.functions._
    // independent hash derivation: Spark md5() hex -> leading 16 chars ->
    // unsigned decimal via conv -> signed 64-bit (mirrors how the DuckDB
    // oracle derives the same value)
    val docs = graft.relational.Tables.load(spark, dir, "documents").limit(30)
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("tok"))
      .withColumn("h",
        conv(substring(md5(col("tok")), 1, 16), 16, 10).cast("decimal(20,0)"))
      .withColumn("h",
        when(col("h") > Long.MaxValue,
          (col("h") - BigDecimal("18446744073709551616")).cast("long"))
          .otherwise(col("h").cast("long")))
    val bitVotes = (0 until 64).map { b =>
      sum(when(shiftrightunsigned(col("h"), b).bitwiseAND(lit(1L)) =!= 0, 1)
        .otherwise(-1)).as(s"bit$b")
    }
    val voted = tok.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
    val bandCols = (0 until 4).map { k =>
      (0 until 16).map { j =>
        when(col(s"bit${k * 16 + j}") > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _).as(s"band$k")
    }
    val expected = voted.select(col("doc_id") +: bandCols: _*).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toSeq).toMap
    val got = docs
      .select(col("doc_id"),
        graft.functions.simhash_bands(col("text"), md5Hash = true).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got === expected)
  }

  test("kernels keep trailing empty tokens (Spark split / DuckDB parity)") {
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(Seq((1L, "a b c d "))).toDF("id", "text")
    // "a b c d " → tokens [a,b,c,d,""] → shingles of 4: "a b c d", "b c d "
    val sh = df.select(graft.functions.shingle_set(col("text"), 4))
      .collect()(0).getSeq[String](0)
    assert(sh === Seq("a b c d", "b c d "))
  }

  test("length-banded edit distance equals the brand-only join (losslessness)") {
    import org.apache.spark.sql.functions._
    // the compound (brand, length±3) banding must not change the relation:
    // levenshtein >= |len(a) - len(b)| (property-tested below), so every
    // pair at distance <= 3 lives inside the probe window
    val part = graft.relational.Tables.load(spark, dir, "part")
    val brandOnly = part.as("a")
      .join(part.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .select(col("a.p_partkey"), col("b.p_partkey"),
        levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("dist"))
      .filter(col("dist") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Dedup.qEditDistancePairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded === brandOnly)
    assert(banded.nonEmpty, "corpus has near-identical part names")
  }

  test("length lower bound: dist <= k implies |len diff| <= k (band lemma)") {
    // the lemma the length banding relies on, checked on generated string
    // pairs (fixed seed) against a reference DP implementation
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(4242)
    def word() = (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    (0 until 2000).foreach { _ =>
      val (a, b) = (word(), word())
      assert(lev(a, b) >= math.abs(a.length - b.length), s"'$a' vs '$b'")
    }
  }

  test("exact dedup finds identical texts iff they exist") {
    val dups = Dedup.qDedupExact(spark, dir).collect()
    val distinctTexts = graft.relational.Tables.load(spark, dir, "documents")
      .select(countDistinct("text"), count(lit(1))).collect()(0)
    val hasDups = distinctTexts.getLong(0) < distinctTexts.getLong(1)
    assert(dups.nonEmpty === hasDups)
  }

  test("containment pairs equal an all-pairs JVM replay; direction is real") {
    // replay with the same shingle semantics: split keeps empties, only
    // full 4-token windows shingle, sets are distinct
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> {
        val t = r.getString(1).split(" ", -1)
        t.sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSet
      }).toMap
    val want = (for {
      (d1, a) <- docs; (d2, b) <- docs
      if d1 != d2 && a.size >= 5
      inter = (a & b).size
      if 10L * inter >= 9L * a.size
    } yield (d1, d2,
      BigDecimal(inter.toDouble / a.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    val got = Dedup.qContainmentPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
    assert(got.nonEmpty, "corpus has planted near-dups; containment must fire")
    got.foreach { case (_, _, c) => assert(c >= 0.9 && c <= 1.0) }
  }

  test("minhash eval: confusion counts tie out against the exact relation") {
    val truthN = Dedup.qNgramJaccardPairs(spark, dir).count()
    val row = Dedup.qMinhashEval(spark, dir).collect().head
    val (tp, fp, fn) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // tp + fn partitions the truth relation exactly
    assert(tp + fn === truthN)
    assert(tp >= 0 && fp >= 0 && fn >= 0)
    // the derived ppm ratios are the truncating divisions of the counts
    if (tp + fp > 0)
      assert(row.getLong(3) === 1000000L * tp / (tp + fp))
    if (tp + fn > 0)
      assert(row.getLong(4) === 1000000L * tp / (tp + fn))
    // planted near-dups are J >= 0.88; 8 bands x 2 rows miss such a pair
    // with p = (1 - 0.88^2)^8 < 2e-5 — recall must be high on this corpus
    assert(truthN === 0 || row.getLong(4) >= 900000L,
      s"recall_ppm ${row.getLong(4)} unexpectedly low")
  }

  test("hot-shingle cap kills boilerplate quadratic fan-out") {
    import spark.implicits._
    // 200 docs that all share a 10-token boilerplate header (nav bar /
    // license text) plus one unique token: 11 tokens → 8 shingles, of
    // which 7 are pure boilerplate shared by every doc. The uncapped
    // shared-shingle join emits 7 × C(200,2) = 139300 candidate rows and
    // floods 19900 J=7/9 "near-dup" pairs that are pure boilerplate; the
    // cap removes those 7 hot types so nothing collides
    val boiler = "this site and its contents are all rights reserved worldwide"
    val docs = (0 until 200).map { i => (i.toLong, s"$boiler unique$i") }
      .toDF("doc_id", "text")
    val shArr = Dedup.shingleArraysOf(docs)
    val sh = shArr.select(col("doc_id"), explode(col("sh_arr")).as("sh"))
    val capped = Dedup.capHotShingles(sh, maxDf = 50)
    // only the per-doc unique-suffix shingle survives the cap
    assert(capped.count() === 200)
    def candRows(s: org.apache.spark.sql.DataFrame): Long =
      s.as("a").join(s.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .count()
    assert(candRows(sh) === 7L * 19900L)
    assert(candRows(capped) === 0L)
    // end-to-end: uncapped floods 19900 boilerplate "pairs"; capped none
    assert(Dedup.ngramJaccardPairsOf(shArr, maxDf = Int.MaxValue).count()
      === 19900L)
    assert(Dedup.ngramJaccardPairsOf(shArr, maxDf = 50).count() === 0)
  }

  test("array-level cap (dir path) == stream-level cap (frame path) with a real hot set") {
    // testdata has no shingle at df > 1000, so force a tiny cap: the
    // cached array_except path and the inline stream anti-join path
    // must agree on the capped universe when the hot list is NON-empty
    val hotDf = 3
    val arrPath = Dedup.qNgramJaccardPairs(spark, dir, maxDf = hotDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamPath = Dedup.ngramJaccardPairsOf(
      Dedup.shingleArrays(spark, dir), maxDf = hotDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(arrPath === streamPath)
    // the cap actually bit: the capped relation differs from uncapped
    val uncapped = Dedup.qNgramJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(arrPath !== uncapped, "df<=3 cap should change planted-dup pairs")
  }

  test("prefix-filtered setsim join is lossless and prunes candidates") {
    val dir = "/root/testdata/sf0.001"
    // lossless: the prefix-filtered result equals the exhaustive
    // shared-shingle relation gated at the same 3/5 threshold
    val got = Dedup.qSetSimJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val sh = Dedup.shingleArrays(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val want = (for {
      (d1, s1) <- sh; (d2, s2) <- sh if d1 < d2
      inter = s1.intersect(s2).size.toLong
      uni = s1.size + s2.size - inter
      if inter * 5 >= uni * 3
    } yield (d1, d2) -> ((inter, uni, inter * 1000000L / uni))).toMap
    assert(got === want)
    assert(got.nonEmpty)
    // the point of the prefix: strictly fewer candidates than the
    // shared-shingle generator on the same corpus
    val (pruned, shared) = Dedup.setSimCandidateCounts(spark, dir)
    assert(pruned < shared,
      s"prefix filter should prune: $pruned vs $shared")
    assert(pruned >= got.size.toLong, "candidates cover every result pair")
  }

  test("ngram novelty: first doc fully novel, counts conserve") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.dedup.Dedup.qNgramNovelty(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nDocs = graft.relational.Tables.load(spark, dir, "documents").count()
    assert(rows.length.toLong === nDocs)
    rows.foreach { case (id, nSh, nNov, ppm) =>
      assert(nNov <= nSh, s"doc $id novel > total")
      if (nSh > 0) assert(ppm === 1000000L * nNov / nSh)
      else assert(ppm === 0L)
    }
    // the lowest doc_id with shingles is all-novel by construction
    val first = rows.filter(_._2 > 0).minBy(_._1)
    assert(first._4 === 1000000L, s"first doc not fully novel: $first")
    // conservation: every distinct shingle type is novel exactly once
    val types = graft.dedup.Dedup.shingleArrays(spark, dir)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("sh_arr")).as("sh"))
      .distinct().count()
    assert(rows.map(_._3).sum === types)
  }

  test("entity resolution equals a JVM block-verify-cluster replay") {
    val got = Dedup.qErEntities(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    val parts = graft.relational.Tables.load(spark, dir, "part")
      .selectExpr("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val names = parts.groupBy(_._2).map { case (n, ps) =>
      (n, ps.map(_._1).min, ps.length.toLong)
    }.toSeq
    def edit(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val parent = scala.collection.mutable.Map(names.map(n => n._2 -> n._2): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for {
      Seq(a, b) <- names.groupBy(_._1.split(" ").last).values
        .flatMap(_.combinations(2))
      if edit(a._1, b._1) <= 2
    } {
      val (ra, rb) = (find(a._2), find(b._2))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = names.groupBy(n => find(n._2)).map { case (eid, ms) =>
      eid -> ((ms.length.toLong, ms.map(_._3).sum,
        ms.find(_._2 == eid).get._1))
    }
    assert(got === want)
    assert(got.exists(_._2._1 > 1), "at least one multi-name entity")
  }
}
