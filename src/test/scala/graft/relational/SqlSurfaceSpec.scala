package graft.relational

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The pipeline library's SQL table-function front door: each function
  * must return EXACTLY what its Scala builder returns (same kernels, same
  * determinism contract), compose like any relation, and keep the Scala
  * twin's plan shape (banded candidates stay an equi-join in pure SQL).
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def viewsReady(): Unit = {
    graft.functions.registerAll(spark)
    Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("sqlsurface_documents")
    Tables.load(spark, dir, "embeddings")
      .createOrReplaceTempView("sqlsurface_embeddings")
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("dedup_exact(tbl) == Dedup.qDedupExact") {
    viewsReady()
    val sql = spark.sql("SELECT * FROM dedup_exact('sqlsurface_documents')")
    val scala = graft.dedup.Dedup.qDedupExact(spark, dir)
    assert(sql.columns.toSeq === scala.columns.toSeq)
    assert(sortedRows(sql) === sortedRows(scala))
  }

  test("dedup_pairs(tbl) == Dedup.qMinhashLshPairs, candidates stay equi-joined") {
    viewsReady()
    val sql = spark.sql("SELECT * FROM dedup_pairs('sqlsurface_documents')")
    val scala = graft.dedup.Dedup.qMinhashLshPairs(spark, dir)
    assert(sql.columns.toSeq === scala.columns.toSeq)
    assert(sortedRows(sql) === sortedRows(scala))
    val plan = sql.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // non-default banding parameters parse and run
    val custom = spark.sql(
      "SELECT * FROM dedup_pairs('sqlsurface_documents', 16, 4, 400000)")
    assert(custom.columns.toSeq === Seq("d1", "d2", "jaccard"))
    assert(custom.count() >= sql.count()) // looser threshold, coarser bands
  }

  test("ann_topk(tbl) == Similarity.qAnnBruteForce") {
    viewsReady()
    val sql = spark.sql("SELECT * FROM ann_topk('sqlsurface_embeddings')")
    val scala = graft.similarity.Similarity.qAnnBruteForce(spark, dir)
    assert(sql.columns.toSeq === scala.columns.toSeq)
    assert(sortedRows(sql) === sortedRows(scala))
    // explicit (n_queries, k)
    val k3 = spark.sql(
      "SELECT * FROM ann_topk('sqlsurface_embeddings', 10, 3)")
    assert(k3.groupBy("qid").count().collect().forall(_.getLong(1) === 3L))
  }

  test("ngram_jaccard / simhash_pairs == their Scala builders") {
    viewsReady()
    val nj = spark.sql("SELECT * FROM ngram_jaccard('sqlsurface_documents')")
    val njScala = graft.dedup.Dedup.qNgramJaccardPairs(spark, dir)
    assert(nj.columns.toSeq === njScala.columns.toSeq)
    assert(sortedRows(nj) === sortedRows(njScala))
    val sp = spark.sql("SELECT * FROM simhash_pairs('sqlsurface_documents')")
    val spScala = graft.dedup.Dedup.qSimhashPairs(spark, dir, md5Hash = true)
    assert(sp.columns.toSeq === spScala.columns.toSeq)
    assert(sortedRows(sp) === sortedRows(spScala))
    // both stay equi-joined in pure SQL
    Seq(nj, sp).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  test("text_stats / token_stats == their Scala builders") {
    viewsReady()
    val ts = spark.sql("SELECT * FROM text_stats('sqlsurface_documents')")
    val tsScala = graft.text.TextOps.qTextStatsByLang(spark, dir)
    assert(ts.columns.toSeq === tsScala.columns.toSeq)
    assert(sortedRows(ts) === sortedRows(tsScala))
    val tok = spark.sql("SELECT * FROM token_stats('sqlsurface_documents')")
    val tokScala = graft.text.TextOps.qTokenCount(spark, dir)
    assert(tok.columns.toSeq === tokScala.columns.toSeq)
    assert(sortedRows(tok) === sortedRows(tokScala))
  }

  test("crack_multi(array, len) == CrackQuery.crackMany; single scan plan") {
    viewsReady()
    val hashes = Seq(
      "81fe8bfe87576c3ecb22426f8e57847382917acf", // abcd
      "a94a8fe5ccb19ba61c4c0873d391e987982fbbd3", // test
      "7110eda4d09e062aa5e4a390b0a572ac0d2c0220") // sha1("1234"): no preimage
    val sql = spark.sql(s"SELECT * FROM crack_multi(array(${
      hashes.map(h => s"'$h'").mkString(",")}), 4)")
    val scala = graft.crack.CrackQuery.crackMany(spark, hashes, 4)
    assert(sql.columns.toSeq === scala.columns.toSeq)
    assert(sortedRows(sql) === sortedRows(scala))
    assert(sql.count() === 2) // the not-found digest is absent
    // ONE keyspace Range scan feeds the whole batch — no per-hash scans
    // (count inside the FINAL plan only; AQE's dump repeats the tree
    // under "== Initial Plan ==")
    val plan = sql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.linesIterator.count(_.contains("Range (0, 456976")) === 1,
      plan)
  }

  test("funnel TVFs == their Scala builders (split/cap/gate/corpus_build)") {
    viewsReady()
    val cases: Seq[(String, DataFrame)] = Seq(
      "split_assign('sqlsurface_documents')" ->
        graft.pipeline.TrainingData.qSplitAssign(spark, dir),
      "source_cap('sqlsurface_documents')" ->
        graft.pipeline.TrainingData.qSourceCap(spark, dir),
      "quality_gate('sqlsurface_documents')" ->
        graft.pipeline.TrainingData.qQualityGate(spark, dir),
      "corpus_build('sqlsurface_documents')" ->
        graft.pipeline.TrainingData.qCorpusBuildExact(spark, dir),
      "decontaminate('sqlsurface_documents')" ->
        graft.pipeline.TrainingData.qDecontaminate(spark, dir),
      "dup_passages('sqlsurface_documents')" ->
        graft.pipeline.TrainingData.qDupPassages(spark, dir))
    cases.foreach { case (fn, scala) =>
      val sql = spark.sql(s"SELECT * FROM $fn")
      assert(sql.columns.toSeq === scala.columns.toSeq, fn)
      assert(sortedRows(sql) === sortedRows(scala), fn)
    }
    // corpus_build (no near-dup stage) must still gate MORE than the raw
    // corpus census — the funnel actually filters at this SF
    val built = spark.sql(
      "SELECT sum(n_docs) FROM corpus_build('sqlsurface_documents')")
      .collect()(0).getLong(0)
    val total = Tables.load(spark, dir, "documents").count()
    assert(built < total, s"corpus_build kept everything ($built of $total)")
    // the templates that reference their exploded-shingle relation twice
    // must hoist it into ONE CTE definition — the physical plan shingles
    // the corpus once (a second shingle_set means the WITH was inlined
    // back into two full scans, the pre-r12 doubled-explode shape)
    for (fn <- Seq("dup_passages", "decontaminate")) {
      val plan = spark.sql(s"SELECT * FROM $fn('sqlsurface_documents')")
        .queryExecution.executedPlan.toString
      val n = "shingle_set".r.findAllIn(plan).length
      assert(n === 1, s"$fn physical plan shingles the corpus $n times:\n$plan")
    }
  }

  test("non-default knobs produce EXACTLY the non-default Scala results") {
    viewsReady()
    // each case runs a config the defaults don't cover and must equal the
    // Scala builder AT THAT CONFIG (shape-only checks would miss a knob
    // that parses but silently binds to the default)
    val knobbed: Seq[(String, DataFrame)] = Seq(
      "dedup_pairs('sqlsurface_documents', 16, 4, 400000)" ->
        graft.dedup.Dedup.qMinhashLshPairs(spark, dir,
          numHashes = 16, bands = 4, threshold = 0.4),
      "ann_topk('sqlsurface_embeddings', 10, 3)" ->
        graft.similarity.Similarity.qAnnBruteForce(spark, dir,
          nQueries = 10, k = 3),
      "ngram_jaccard('sqlsurface_documents', 300000, 500)" ->
        graft.dedup.Dedup.qNgramJaccardPairs(spark, dir,
          threshold = 0.3, maxDf = 500),
      "simhash_pairs('sqlsurface_documents', 5)" ->
        graft.dedup.Dedup.qSimhashPairs(spark, dir,
          maxHamming = 5, md5Hash = true),
      "source_cap('sqlsurface_documents', 5)" ->
        graft.pipeline.TrainingData.qSourceCap(spark, dir, cap = 5),
      "quality_gate('sqlsurface_documents', 500)" ->
        graft.pipeline.TrainingData.qQualityGate(spark, dir,
          keepPerMille = 500),
      "corpus_build('sqlsurface_documents', 10, 300000)" ->
        graft.pipeline.TrainingData.qCorpusBuildExact(spark, dir,
          minTokens = 10, maxBigramFrac = 0.3),
      "dup_passages('sqlsurface_documents', 6)" ->
        graft.pipeline.TrainingData.qDupPassages(spark, dir, n = 6))
    knobbed.foreach { case (fn, scala) =>
      val sql = spark.sql(s"SELECT * FROM $fn")
      assert(sql.columns.toSeq === scala.columns.toSeq, fn)
      assert(sortedRows(sql) === sortedRows(scala), fn)
    }
    // and the knob must actually CHANGE something vs the default call
    // (guards against a parsed-but-ignored parameter)
    assert(sortedRows(spark.sql(
      "SELECT * FROM quality_gate('sqlsurface_documents', 500)")) !==
      sortedRows(spark.sql(
        "SELECT * FROM quality_gate('sqlsurface_documents')")))
    assert(sortedRows(spark.sql(
      "SELECT * FROM source_cap('sqlsurface_documents', 5)")) !==
      sortedRows(spark.sql(
        "SELECT * FROM source_cap('sqlsurface_documents')")))
  }

  test("table functions compose: join, aggregate, nest in subqueries") {
    viewsReady()
    // aggregate over a table function
    val n = spark.sql(
      """SELECT count(1) AS n FROM dedup_exact('sqlsurface_documents')""")
      .collect()(0).getLong(0)
    assert(n === graft.dedup.Dedup.qDedupExact(spark, dir).count())
    // join a table function against a base table
    val joined = spark.sql(
      """SELECT t.lang, s.n_docs FROM text_stats('sqlsurface_documents') s
        |JOIN (SELECT DISTINCT lang FROM sqlsurface_documents) t
        |  ON s.lang = t.lang""".stripMargin)
    assert(joined.count() === spark.sql(
      "SELECT DISTINCT lang FROM sqlsurface_documents").count())
  }

  test("bad arguments are rejected: injection, arity, divisibility") {
    viewsReady()
    // a non-identifier table argument must be rejected, not spliced
    val inj = intercept[Exception](spark.sql(
      "SELECT * FROM dedup_exact('sqlsurface_documents WHERE 1=0 --')").collect())
    assert(inj.getMessage.contains("table identifier"), inj.getMessage)
    val arity = intercept[Exception](spark.sql(
      "SELECT * FROM text_stats('a', 'b')").collect())
    assert(arity.getMessage.contains("argument"), arity.getMessage)
    val div = intercept[Exception](spark.sql(
      "SELECT * FROM dedup_pairs('sqlsurface_documents', 32, 7)").collect())
    assert(div.getMessage.contains("divisible"), div.getMessage)
  }

  test("docs quote the REGISTRY's table-function count (no drift)") {
    // the registry is the source of truth; SURVEY/NOTES interpolate it.
    // Round 11 shipped "17" against a 16-entry registry — this pins the
    // number the way Bench pinned the query count.
    val n = graft.GraftExtensions.tableBuilders.size
    for ((path, re) <- Seq(
        "SURVEY.md" -> """\((\d+) total now""".r,
        "NOTES.md" -> """\((\d+) table\s+functions total\)""".r)) {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(p)) {
        val txt = java.nio.file.Files.readString(p)
        re.findAllMatchIn(txt).foreach { m =>
          assert(m.group(1).toInt === n,
            s"$path quotes ${m.group(1)} table functions; registry has $n")
        }
      }
    }
  }
}
