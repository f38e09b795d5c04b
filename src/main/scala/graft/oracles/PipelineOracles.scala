package graft.oracles

import graft.oracles.OracleCtes._

/** DuckDB oracle SQL for the training-data pipeline family (split from SparkEntry in r11;
  * entries unchanged — SparkEntry.baseOracleSql concatenates the
  * family maps). */
private[graft] object PipelineOracles {
  val sql: Map[String, String] = Map(
    // independent fixpoint formulation: recursive-CTE reachability over
    // the same exact-Jaccard pair relation, min reachable id = cluster
    "q_dedup_clusters" -> dedupClustersOracle,
    // the incremental ingest must EQUAL the from-scratch clusters — its
    // oracle is literally the same from-scratch recursive CTE
    "q_dedup_incremental" -> dedupClustersOracle,
    "q_dedup_keep_best" -> dedupKeepBestOracle,
    "q_corpus_build_v2" -> corpusBuildV2Oracle,
    "q_corpus_build_v3" -> corpusBuildV3Oracle,
    "q_corpus_build_v4" -> corpusBuildV4Oracle,
    "q_corpus_build_v5" -> corpusBuildV5Oracle,
    // one chained program: MW mixture training -> tuned rates, stump
    // training -> leaf model, then the three per-row gates + census
    "q_corpus_build_v6" ->
      s"""WITH ${mixMwCtes(4, 200000L)},
         |${boostedStumpsCtes(3)},
         |ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM w4),
         |tws AS (SELECT CAST(sum(w) AS HUGEINT) AS t FROM w4),
         |rt AS (SELECT source, least(1000000,
         |    CAST((w * 1000000) // (SELECT t FROM tws) AS BIGINT)
         |      * (SELECT n FROM ns)) AS rate FROM w4),
         |base AS (SELECT d.doc_id, d.source, d.lang, f.f1, f.f2, f.f3,
         |    CAST(len(list_filter(string_split(d.text, ' '),
         |      t -> t IN ('slow', 'dup', 'drop', 'big'))) AS BIGINT) AS hits,
         |    CAST(('0x' || substr(md5('v6:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
         |      ::UBIGINT % 1000000 AS BIGINT) AS u
         |  FROM documents d JOIN f ON d.doc_id = f.doc_id),
         |gp AS (SELECT b.source, b.lang,
         |    b.u < rt.rate AS mix,
         |    b.u < rt.rate AND NOT (b.hits >= 3 OR b.hits * 25 >= b.f1) AS lex,
         |    b.u < rt.rate AND NOT (b.hits >= 3 OR b.hits * 25 >= b.f1)
         |      AND ((CASE WHEN (CASE p1.fe WHEN 'f1' THEN b.f1 WHEN 'f2' THEN b.f2 ELSE b.f3 END) <= p1.th THEN p1.dl ELSE p1.dr END)
         |         + (CASE WHEN (CASE p2.fe WHEN 'f1' THEN b.f1 WHEN 'f2' THEN b.f2 ELSE b.f3 END) <= p2.th THEN p2.dl ELSE p2.dr END)
         |         + (CASE WHEN (CASE p3.fe WHEN 'f1' THEN b.f1 WHEN 'f2' THEN b.f2 ELSE b.f3 END) <= p3.th THEN p3.dl ELSE p3.dr END))
         |        >= 22000000 AS mdl
         |  FROM base b JOIN rt ON b.source = rt.source
         |  CROSS JOIN p1 CROSS JOIN p2 CROSS JOIN p3)
         |SELECT source, lang, CAST(count(*) AS BIGINT) AS n_base,
         |  CAST(sum(CASE WHEN mix THEN 1 ELSE 0 END) AS BIGINT) AS n_mix,
         |  CAST(sum(CASE WHEN lex THEN 1 ELSE 0 END) AS BIGINT) AS n_lex,
         |  CAST(sum(CASE WHEN mdl THEN 1 ELSE 0 END) AS BIGINT) AS n_final
         |FROM gp GROUP BY 1, 2""".stripMargin,
    "q_lang_sample_temp" ->
      """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS total FROM c),
        |w AS (SELECT lang, n_docs,
        |        CAST(round(pow(n_docs / total, 0.3) * 1e12) AS BIGINT) AS wt_fp,
        |        total FROM c, t),
        |s AS (SELECT CAST(sum(wt_fp) AS BIGINT) AS wsum_fp FROM w),
        |r AS (SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
        |        least(1000000, CAST(floor(0.5 * (wt_fp / wsum_fp) * total / n_docs * 1e6)
        |          AS BIGINT)) AS rate_ppm
        |      FROM w, s),
        |u AS (SELECT lang,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |          % 1000000 AS BIGINT) AS u_ppm
        |      FROM documents)
        |SELECT r.lang, r.n_docs, r.rate_ppm,
        |  CAST(sum(CASE WHEN u.u_ppm < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  round(CAST(sum(CASE WHEN u.u_ppm < r.rate_ppm THEN 1 ELSE 0 END) AS DOUBLE)
        |    / r.n_docs, 4) AS achieved_rate
        |FROM u JOIN r ON u.lang = r.lang
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_source_cap" -> sourceCapOracle,
    "q_quality_gate" -> qualityGateOracle,
    "q_global_shuffle" ->
      """WITH r AS (SELECT doc_id,
        |    CAST(row_number() OVER (
        |      ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR))) AS BIGINT) AS pos
        |  FROM documents)
        |SELECT CAST((pos - 1) // 100 AS BIGINT) AS shard,
        |  count(*) AS n_docs, min(pos) AS first_pos, max(pos) AS last_pos,
        |  CAST(sum(doc_id) AS BIGINT) AS docid_sum
        |FROM r GROUP BY 1""".stripMargin,
    "q_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
        |          AS BIGINT) AS bucket
        |      FROM documents),
        |sh AS (SELECT doc_id, bucket, unnest(list_distinct(list_transform(
        |         range(1, greatest(len(l) - 2, 1)),
        |         i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))) AS sh
        |       FROM toks),
        |ev AS (SELECT DISTINCT sh FROM sh WHERE bucket >= 90),
        |tr AS (SELECT doc_id, sh FROM sh WHERE bucket < 80),
        |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM tr GROUP BY 1),
        |hits AS (SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |         FROM tr JOIN ev ON tr.sh = ev.sh GROUP BY 1)
        |SELECT h.doc_id, s.n_shingles, h.n_hits,
        |  round(CAST(h.n_hits AS DOUBLE) / s.n_shingles, 4) AS frac
        |FROM hits h JOIN sz s ON h.doc_id = s.doc_id""".stripMargin,
    "q_dup_passages" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |sp AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(1, greatest(len(l) - 6, 1)),
        |         i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' ||
        |              l[i+4] || ' ' || l[i+5] || ' ' || l[i+6] || ' ' || l[i+7]))) AS span
        |       FROM toks),
        |shared AS (SELECT span, CAST(count(*) AS BIGINT) AS n_docs
        |           FROM sp GROUP BY 1 HAVING count(*) >= 2)
        |SELECT sp.doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
        |  max(shared.n_docs) AS max_span_docs
        |FROM sp JOIN shared ON sp.span = shared.span
        |GROUP BY 1""".stripMargin,
    "q_split_assign" -> splitAssignOracle,
    "q_corpus_build_exact" -> corpusBuildExactOracle,
    // window/stride arithmetic mirrored in integers; unnest(generate_series)
    // is the correlated explode
    "q_chunk_windows" ->
      """WITH d AS (SELECT lang,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |      FROM documents),
        |w AS (SELECT lang, n,
        |        CASE WHEN n <= 256 THEN 1
        |             ELSE (n - 256 + 191) // 192 + 1 END AS n_win
        |      FROM d),
        |x AS (SELECT lang, n, unnest(generate_series(0, n_win - 1)) AS k
        |      FROM w)
        |SELECT lang,
        |  CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
        |  count(*) AS n_windows,
        |  CAST(sum(CASE WHEN least(256, n - k * 192) = 256 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_full,
        |  CAST(sum(least(256, n - k * 192)) AS BIGINT) AS token_sum
        |FROM x GROUP BY 1""".stripMargin,
    // integer ppm rates; salted md5 draw (every hash policy its own stream)
    "q_mix_mw" -> mixMwSql(4, 200000L),
    "q_domain_mix" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
        |        count(*) AS n_sources FROM c),
        |r AS (SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |        least(1000000, (total * 500000) // (n_sources * n_docs))
        |          AS rate_ppm
        |      FROM c, t),
        |u AS (SELECT source,
        |        CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |          ::UBIGINT % 1000000 AS BIGINT) AS u_ppm
        |      FROM documents)
        |SELECT u.source, r.n_docs, r.rate_ppm,
        |  CAST(sum(CASE WHEN u_ppm < rate_ppm THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  round(CAST(sum(CASE WHEN u_ppm < rate_ppm THEN 1 ELSE 0 END) AS DOUBLE)
        |    / r.n_docs, 4) AS achieved_rate
        |FROM u JOIN r USING (source)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_quality_classifier" -> qualityClassifierSql(64, 4),
    "q_auc" -> aucSql(64, 4),
    "q_quality_ensemble" -> qualityEnsembleSql(64, 4),
    "q_calibration" -> calibrationSql(64, 4),
    "q_dsir_weights" ->
      s"""WITH $dsirWeightsCte
        |SELECT doc_id, n_tokens, dsir_score FROM dsird""".stripMargin,
    // the group key inherits q_split_assign's policy: docs with no
    // near-dup cluster hash their own id, so the two splits agree there
    "q_split_leakfree" ->
      (dedupClustersCte + ",\n" +
      """cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
        |g AS (SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS group_id
        |      FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
        |SELECT doc_id, group_id,
        |  CASE WHEN b < 80 THEN 'train'
        |       WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id, group_id,
        |        CAST(('0x' || substr(md5(CAST(group_id AS VARCHAR)), 1, 8))::UBIGINT % 100
        |          AS BIGINT) AS b
        |      FROM g)""".stripMargin),
    "q_token_budget" ->
      """WITH d AS (SELECT doc_id, source,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |      FROM documents),
        |ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(n_toks) AS BIGINT) AS src_toks
        |       FROM d GROUP BY 1),
        |ns AS (SELECT count(*) AS n_sources FROM ps),
        |r AS (SELECT source, n_docs, src_toks,
        |        least(1000000, ((100000 // n_sources) * 1000000) // src_toks)
        |          AS rate_ppm
        |      FROM ps, ns),
        |u AS (SELECT doc_id, source, n_toks,
        |        CAST(('0x' || substr(md5('tokbudget:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |          ::UBIGINT % 1000000 AS BIGINT) AS u_ppm
        |      FROM d)
        |SELECT u.source, r.n_docs, r.src_toks, r.rate_ppm,
        |  CAST(sum(CASE WHEN u_ppm < rate_ppm THEN 1 ELSE 0 END) AS BIGINT)
        |    AS kept_docs,
        |  CAST(sum(CASE WHEN u_ppm < rate_ppm THEN n_toks ELSE 0 END) AS BIGINT)
        |    AS kept_toks
        |FROM u JOIN r ON u.source = r.source
        |GROUP BY 1, 2, 3, 4""".stripMargin,
    "q_group_sample" ->
      """SELECT doc_id, source, pri, rnk FROM (
        |  SELECT doc_id, source, pri,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY pri, doc_id) AS BIGINT) AS rnk
        |  FROM (SELECT doc_id, source,
        |          md5('gsamp:' || CAST(doc_id AS VARCHAR)) AS pri
        |        FROM documents))
        |WHERE rnk <= 10""".stripMargin,
    "q_priority_sample" ->
      s"""WITH $dsirWeightsCte
        |SELECT doc_id, avg_w, (u_ppm * 1000000) // avg_w AS pri FROM (
        |  SELECT doc_id,
        |    greatest(dsir_score // n_tokens, 1) AS avg_w,
        |    CAST(('0x' || substr(md5('prio:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::UBIGINT % 1000000 AS BIGINT) AS u_ppm
        |  FROM dsird)
        |ORDER BY pri, doc_id LIMIT 200""".stripMargin,
    "q_dsir_resample" ->
      s"""WITH $dsirWeightsCte
        |SELECT doc_id, n_tokens, dsir_score,
        |  dsir_score // n_tokens AS avg_w,
        |  CAST(('0x' || substr(md5('dsirsample:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |    % 1000000 AS BIGINT) AS u_ppm
        |FROM dsird
        |WHERE CAST(('0x' || substr(md5('dsirsample:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |    % 1000000 AS BIGINT) < dsir_score // n_tokens""".stripMargin,
    "q_stratified_sample" ->
      """SELECT event_type, count(*) AS n_total,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |  round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
        |    AS achieved_rate
        |FROM (SELECT event_type,
        |        ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::UBIGINT % 1000
        |          < (CASE WHEN event_type = 'purchase' THEN 1000
        |                  WHEN event_type = 'click' THEN 100 ELSE 10 END) AS keep
        |      FROM events)
        |GROUP BY 1""".stripMargin,
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, lang,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |r AS (SELECT lang, n_tokens,
        |        sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |      FROM t)
        |SELECT lang, CAST(floor((running - n_tokens) / 2048) AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(n_tokens) AS DOUBLE) / 2048, 4) AS fill
        |FROM r GROUP BY 1, 2""".stripMargin,
    "q_pack_bpe" ->
      s"""WITH RECURSIVE
        |bpe_vocab(tok) AS (VALUES ${graft.text.BpeVocab.sqlValues}),
        |states(doc_id, word, pos, n) AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')), 0, 0 FROM documents
        |  UNION ALL
        |  SELECT doc_id, word,
        |    pos + coalesce((SELECT max(length(tok)) FROM bpe_vocab
        |                    WHERE substr(word, pos + 1, length(tok)) = tok), 1),
        |    n + 1
        |  FROM states WHERE pos < length(word)),
        |bpe AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens
        |        FROM states WHERE pos >= length(word) GROUP BY doc_id),
        |t AS (SELECT d.doc_id, d.lang, b.n_tokens
        |      FROM documents d JOIN bpe b ON d.doc_id = b.doc_id),
        |r AS (SELECT lang, n_tokens,
        |        sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |      FROM t)
        |SELECT lang, CAST(floor((running - n_tokens) / 2048) AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(n_tokens) AS DOUBLE) / 2048, 4) AS fill
        |FROM r GROUP BY 1, 2""".stripMargin,
    // the five-stage corpus build, recomposed from the proven per-stage
    // oracle formulations (jaccard pairs + recursive-CTE clusters + md5
    // exact groups + hash split + repetition quality)
    "q_corpus_build" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(1, greatest(len(l) - 2, 1)),
        |         i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))) AS sh
        |       FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |ip AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |       FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2),
        |pairs AS (SELECT d1, d2 FROM ip
        |          JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        |          WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.5),
        |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
        |          UNION ALL SELECT d2, d1 FROM pairs),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT reach.id, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
        |near_losers AS (SELECT id AS doc_id FROM reach GROUP BY id
        |                HAVING min(r) <> id),
        |exact_losers AS (SELECT doc_id FROM (
        |  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep
        |  FROM documents) WHERE doc_id <> keep),
        |bg AS (SELECT doc_id, max(c) AS top_bg, sum(c) AS n_bg FROM (
        |  SELECT doc_id, g, count(*) AS c FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |      i -> l[i] || ' ' || l[i+1])) AS g FROM toks) GROUP BY 1, 2)
        |  GROUP BY 1),
        |kept AS (SELECT d.doc_id, d.lang,
        |           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
        |         FROM documents d JOIN bg USING (doc_id)
        |         WHERE len(string_split(d.text, ' ')) >= 20
        |           AND CAST(bg.top_bg AS DOUBLE) / bg.n_bg <= 0.2
        |           AND d.doc_id NOT IN (SELECT doc_id FROM exact_losers)
        |           AND d.doc_id NOT IN (SELECT doc_id FROM near_losers))
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM (SELECT doc_id, lang, n_tokens,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
        |          AS BIGINT) AS bucket
        |      FROM kept)
        |GROUP BY 1, 2""".stripMargin,
  )
}
