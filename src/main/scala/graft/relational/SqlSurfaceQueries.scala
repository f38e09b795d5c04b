package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract entries for the pipeline-library SQL table functions
  * ([[graft.GraftExtensions.tableBuilders]]): each query reaches its
  * operator purely through the SQL front door — temp view + table
  * function — and must hash-match the same DuckDB oracle as its Scala
  * twin (same kernels, same determinism envelope). Registration is
  * idempotent, so the queries are self-contained on any session (the
  * qCrackSql pattern). */
object SqlSurfaceQueries {

  private def view(
      spark: SparkSession, dir: String, table: String): String = {
    graft.functions.registerAll(spark)
    val name = s"graft_sql_$table"
    Tables.load(spark, dir, table).createOrReplaceTempView(name)
    name
  }

  /** MinHash+LSH near-dup pairs via `dedup_pairs()` (SQL twin of
    * q_minhash_lsh). */
  def qDedupSql(spark: SparkSession, dir: String): DataFrame =
    spark.sql(s"SELECT * FROM dedup_pairs('${view(spark, dir, "documents")}')")

  /** Exact dup groups via `dedup_exact()` (SQL twin of q_dedup_exact). */
  def qDedupExactSql(spark: SparkSession, dir: String): DataFrame =
    spark.sql(s"SELECT * FROM dedup_exact('${view(spark, dir, "documents")}')")

  /** Brute-force cosine top-k via `ann_topk()` (SQL twin of
    * q_ann_bruteforce). */
  def qAnnSql(spark: SparkSession, dir: String): DataFrame =
    spark.sql(s"SELECT * FROM ann_topk('${view(spark, dir, "embeddings")}')")

  /** Per-language corpus stats via `text_stats()` (SQL twin of
    * q_text_stats_by_lang). */
  def qTextStatsSql(spark: SparkSession, dir: String): DataFrame =
    spark.sql(s"SELECT * FROM text_stats('${view(spark, dir, "documents")}')")

  /** Per-doc token counts via `token_stats()` (SQL twin of
    * q_token_count). */
  def qTokenStatsSql(spark: SparkSession, dir: String): DataFrame =
    spark.sql(s"SELECT * FROM token_stats('${view(spark, dir, "documents")}')")

  /** Shared-shingle exact-Jaccard pairs via `ngram_jaccard()` (SQL twin
    * of q_ngram_jaccard). */
  def qNgramJaccardSql(spark: SparkSession, dir: String): DataFrame =
    spark.sql(
      s"SELECT * FROM ngram_jaccard('${view(spark, dir, "documents")}')")

  /** Banded SimHash near-dup pairs via `simhash_pairs()` (SQL twin of
    * q_simhash, md5-hash mode). */
  def qSimhashSql(spark: SparkSession, dir: String): DataFrame =
    spark.sql(
      s"SELECT * FROM simhash_pairs('${view(spark, dir, "documents")}')")

  /** Train/val/test assignment via `split_assign()` (SQL twin of
    * q_split_assign — THE split policy, inlined in the template). */
  def qSplitAssignSql(spark: SparkSession, dir: String): DataFrame =
    spark.sql(
      s"SELECT * FROM split_assign('${view(spark, dir, "documents")}')")

  /** Per-source cap census via `source_cap()` (SQL twin of
    * q_source_cap at the same cap=15 default). */
  def qSourceCapSql(spark: SparkSession, dir: String): DataFrame =
    spark.sql(s"SELECT * FROM source_cap('${view(spark, dir, "documents")}')")

  /** Per-language quality-percentile gate via `quality_gate()` (SQL twin
    * of q_quality_gate at the same 700‰ default). */
  def qQualityGateSql(spark: SparkSession, dir: String): DataFrame =
    spark.sql(
      s"SELECT * FROM quality_gate('${view(spark, dir, "documents")}')")

  /** Duplicated-passage census via `dup_passages()` (SQL twin of
    * q_dup_passages at the same 8-token span default). */
  def qDupPassagesSql(spark: SparkSession, dir: String): DataFrame =
    spark.sql(
      s"SELECT * FROM dup_passages('${view(spark, dir, "documents")}')")

  /** Train/eval contamination census via `decontaminate()` (SQL twin of
    * q_decontaminate — THE split policy inlined). */
  def qDecontaminateSql(spark: SparkSession, dir: String): DataFrame =
    spark.sql(
      s"SELECT * FROM decontaminate('${view(spark, dir, "documents")}')")

  /** Corpus-build funnel via `corpus_build()` (SQL twin of
    * q_corpus_build minus the near-dup cluster stage ≡
    * TrainingData.qCorpusBuildExact). */
  def qCorpusBuildSql(spark: SparkSession, dir: String): DataFrame =
    spark.sql(
      s"SELECT * FROM corpus_build('${view(spark, dir, "documents")}')")

  /** Batch crack via `crack_multi()` (SQL twin of q_crack_multi — one
    * keyspace scan for the whole digest batch; the not-found digest is
    * absent from the result, matching crackMany). */
  def qCrackMultiSql(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.registerAll(spark)
    spark.sql(
      """SELECT * FROM crack_multi(array(
        |  '81fe8bfe87576c3ecb22426f8e57847382917acf',
        |  'a94a8fe5ccb19ba61c4c0873d391e987982fbbd3',
        |  '7110eda4d09e062aa5e4a390b0a572ac0d2c0220'), 4)""".stripMargin)
  }
}
