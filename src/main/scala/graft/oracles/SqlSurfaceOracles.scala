package graft.oracles

import graft.oracles.OracleCtes._

/** DuckDB oracle SQL for the SQL table-function twins (split from SparkEntry in r11;
  * entries unchanged — SparkEntry.baseOracleSql concatenates the
  * family maps). */
private[graft] object SqlSurfaceOracles {
  val sql: Map[String, String] = Map(
    // SQL-front-door twins share their Scala twin's oracle verbatim:
    // the table function and the Scala builder are pinned equal by
    // SqlSurfaceSpec, so one oracle covers both
    "q_dedup_sql" -> exactJaccardSql,
    "q_dedup_exact_sql" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "q_ann_sql" -> annTopKSql(5),
    "q_text_stats_sql" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars
        |FROM documents GROUP BY 1""".stripMargin,
    "q_token_stats_sql" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_ws,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_tokens_re,
        |  n_chars
        |FROM documents""".stripMargin,
    "q_source_cap_sql" -> sourceCapOracle,
    "q_quality_gate_sql" -> qualityGateOracle,
    "q_split_assign_sql" -> splitAssignOracle,
    "q_corpus_build_sql" -> corpusBuildExactOracle,
  )
}
