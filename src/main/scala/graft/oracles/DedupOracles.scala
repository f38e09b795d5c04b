package graft.oracles

import graft.oracles.OracleCtes._

/** DuckDB oracle SQL for the dedup family (split from SparkEntry in r11;
  * entries unchanged — SparkEntry.baseOracleSql concatenates the
  * family maps). */
private[graft] object DedupOracles {
  val sql: Map[String, String] = Map(
    "q_events_dedup" ->
      """SELECT user_id, event_type, min(event_id) AS keep_event,
        |  count(*) AS n_duplicates
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    // ExactSubstr passage dedup: all-integer span bookkeeping and a
    // string rebuild, so the compare is exact with no float anywhere
    "q_substr_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |occ AS (SELECT doc_id,
        |         CAST(unnest(range(1, greatest(len(l) - 6, 1))) - 1 AS BIGINT) AS pos,
        |         unnest(list_transform(range(1, greatest(len(l) - 6, 1)),
        |           i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' ||
        |                l[i+4] || ' ' || l[i+5] || ' ' || l[i+6] || ' ' || l[i+7])) AS g
        |       FROM toks),
        |dup AS (SELECT g, min(doc_id) AS a FROM occ GROUP BY g HAVING count(*) >= 2),
        |fir AS (SELECT o.g, o.doc_id AS fdoc, min(o.pos) AS fpos
        |        FROM occ o JOIN dup d ON o.g = d.g AND o.doc_id = d.a
        |        GROUP BY 1, 2),
        |later AS (SELECT o.doc_id, o.pos FROM occ o JOIN fir f ON o.g = f.g
        |          WHERE NOT (o.doc_id = f.fdoc AND o.pos = f.fpos)),
        |removed AS (SELECT DISTINCT doc_id, pos + t.i AS idx
        |            FROM later, generate_series(0, 7) t(i)),
        |spans AS (SELECT doc_id, count(*) AS sl FROM (
        |            SELECT doc_id, idx,
        |              idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS isl
        |            FROM removed) GROUP BY doc_id, isl),
        |stats AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
        |            CAST(sum(sl) AS BIGINT) AS n_dup_tokens
        |          FROM spans GROUP BY 1),
        |kept AS (SELECT t.doc_id,
        |           CAST(unnest(range(1, len(l) + 1)) - 1 AS BIGINT) AS idx,
        |           unnest(l) AS tok
        |         FROM toks t JOIN stats s ON t.doc_id = s.doc_id),
        |surv AS (SELECT k.doc_id, k.idx, k.tok FROM kept k
        |         ANTI JOIN removed r ON k.doc_id = r.doc_id AND k.idx = r.idx),
        |reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS clean_text
        |        FROM surv GROUP BY 1)
        |SELECT t.doc_id, CAST(len(t.l) AS BIGINT) AS n_tokens,
        |  coalesce(s.n_dup_spans, 0) AS n_dup_spans,
        |  coalesce(s.n_dup_tokens, 0) AS n_dup_tokens,
        |  CASE WHEN s.doc_id IS NULL THEN d.text
        |       ELSE coalesce(r.clean_text, '') END AS clean_text
        |FROM toks t JOIN documents d ON t.doc_id = d.doc_id
        |LEFT JOIN stats s ON t.doc_id = s.doc_id
        |LEFT JOIN reb r ON t.doc_id = r.doc_id""".stripMargin,
    // brand-banded fuzzy dedup; both engines run the classic DP distance
    "q_edit_distance" ->
      """SELECT a.p_partkey AS k1, b.p_partkey AS k2,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin,
    "q_ngram_jaccard" -> cappedJaccardSql,
    "q_setsim_join" -> setSimSql,
    "q_containment" -> containmentSql,
    // MinHash+LSH emits candidate pairs verified by EXACT Jaccard, so its
    // oracle is the same brute-force join — recall 1.0 on this corpus is
    // asserted by DedupSpec (every true pair here is J >= 0.88; the 8-band
    // signature misses such a pair with p < 1e-8, and the check is
    // deterministic on fixed data).
    "q_minhash_lsh" -> exactJaccardSql,
    "q_minhash_eval" -> minhashEvalSql(16, 8),
    // the q_ivf_ingest pipeline trained on the FULL corpus, then
    // within-cell cosine pairs -> recursive-CTE reachability (the
    // q_dedup_clusters oracle pattern on the semantic pair relation)
    "q_semdedup" ->
      s"""WITH RECURSIVE $ivfTrainCte,
        |$semDedupReachCte
        |SELECT id AS vec_id, min(rr) AS cluster_id, min(rr) = id AS is_keeper
        |FROM reach GROUP BY id""".stripMargin,
    // cell-sampled twin (r14): same full-corpus index training replay,
    // pair scan + recursive closure restricted to cell % 4 = 0 —
    // exact for the sampled cells (components are cell-closed), and
    // cheap enough for the sf1 sweep's per-oracle cap on a loaded box
    "q_semdedup_cells" ->
      s"""WITH RECURSIVE $ivfTrainCte,
        |${semDedupReachCteSampled("a.cell % 4 = 0 AND")}
        |SELECT id AS vec_id, min(rr) AS cluster_id, min(rr) = id AS is_keeper
        |FROM reach GROUP BY id""".stripMargin,
    // Full independent SimHash mirror: the md5-derived token hash is
    // computable by DuckDB ('0x' || leading md5 hex -> UBIGINT), so the
    // oracle rebuilds signatures, bands, candidates and hamming from
    // scratch.
    "q_simhash" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT) AS hv FROM toks),
        |votes AS (SELECT doc_id, b AS bit,
        |            sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |          FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS b)
        |          GROUP BY 1, 2),
        |bands AS (SELECT doc_id, CAST(bit // 16 AS INT) AS band,
        |            CAST(sum(CASE WHEN v > 0 THEN 1 << CAST(bit % 16 AS INT) ELSE 0 END) AS BIGINT) AS value
        |          FROM votes GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.value = b.value AND a.doc_id < b.doc_id),
        |sig AS (SELECT doc_id, list(value ORDER BY band) AS s FROM bands GROUP BY 1)
        |SELECT d1, d2, hamming FROM (
        |  SELECT d1, d2,
        |    CAST(bit_count(xor(sa.s[1], sb.s[1])) + bit_count(xor(sa.s[2], sb.s[2]))
        |       + bit_count(xor(sa.s[3], sb.s[3])) + bit_count(xor(sa.s[4], sb.s[4])) AS BIGINT) AS hamming
        |  FROM cand JOIN sig sa ON d1 = sa.doc_id JOIN sig sb ON d2 = sb.doc_id)
        |WHERE hamming <= 3""".stripMargin,
    // blocked levenshtein verify + recursive-CTE reachability (the
    // q_dedup_clusters pattern), singletons self-labeled
    "q_er_entities" ->
      """WITH RECURSIVE names AS (SELECT p_name,
        |    CAST(min(p_partkey) AS BIGINT) AS name_id,
        |    CAST(count(*) AS BIGINT) AS n_parts FROM part GROUP BY 1),
        |k AS (SELECT p_name, name_id, n_parts,
        |    string_split(p_name, ' ')[-1] AS block FROM names),
        |e0 AS (SELECT a.name_id AS src, b.name_id AS dst
        |      FROM k a JOIN k b ON a.block = b.block
        |        AND a.name_id < b.name_id
        |      WHERE levenshtein(a.p_name, b.p_name) <= 2),
        |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |reach(id, rr) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT reach.id, edges.dst FROM reach
        |  JOIN edges ON reach.rr = edges.src),
        |lab AS (SELECT id AS name_id, min(rr) AS cluster_id
        |        FROM reach GROUP BY 1),
        |alln AS (SELECT k.p_name, k.name_id, k.n_parts,
        |    coalesce(lab.cluster_id, k.name_id) AS entity_id
        |  FROM k LEFT JOIN lab ON k.name_id = lab.name_id),
        |census AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS n_names,
        |    CAST(sum(n_parts) AS BIGINT) AS n_parts
        |  FROM alln GROUP BY 1)
        |SELECT c.entity_id, c.n_names, c.n_parts, a.p_name AS canonical_name
        |FROM census c JOIN alln a ON a.name_id = c.entity_id""".stripMargin,
    "q_ngram_novelty" ->
      s"""$shingleCte,
        |fs AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY 1),
        |pd AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |         CAST(sum(CASE WHEN f.first_doc = s.doc_id
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |       FROM sh s JOIN fs f ON s.sh = f.sh GROUP BY 1)
        |SELECT d.doc_id, d.source,
        |  CAST(coalesce(pd.n_shingles, 0) AS BIGINT) AS n_shingles,
        |  CAST(coalesce(pd.n_novel, 0) AS BIGINT) AS n_novel,
        |  CAST(CASE WHEN coalesce(pd.n_shingles, 0) = 0 THEN 0
        |    ELSE (1000000 * pd.n_novel) // pd.n_shingles END AS BIGINT)
        |    AS novelty_ppm
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id"""
        .stripMargin,
    // tf-weighted Jaccard over the NON-distinct (multiset) shingle
    // universe, same df > 1000 hot cap as the set variant; Σmax
    // recovered via tot_a + tot_b − Σmin so only shared types join
    "q_weighted_jaccard" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |shl AS (SELECT doc_id, unnest(list_transform(
        |         range(1, greatest(len(l) - 2, 1)),
        |         i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3])) AS sh
        |       FROM toks),
        |tf AS (SELECT doc_id, sh, count(*) AS tf FROM shl GROUP BY 1, 2),
        |hot AS (SELECT sh FROM tf GROUP BY 1 HAVING count(*) > 1000),
        |ctf AS (SELECT * FROM tf WHERE sh NOT IN (SELECT sh FROM hot)),
        |tot AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS tot FROM ctf GROUP BY 1),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |          CAST(sum(least(a.tf, b.tf)) AS BIGINT) AS inter_w
        |        FROM ctf a JOIN ctf b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |        GROUP BY 1, 2)
        |SELECT d1, d2, inter_w,
        |  CAST(t1.tot + t2.tot - inter_w AS BIGINT) AS union_w,
        |  CAST((inter_w * 1000000) // (t1.tot + t2.tot - inter_w) AS BIGINT)
        |    AS jw_ppm
        |FROM inter JOIN tot t1 ON d1 = t1.doc_id JOIN tot t2 ON d2 = t2.doc_id
        |WHERE 2 * inter_w >= t1.tot + t2.tot - inter_w""".stripMargin,
    // dHash over the stub-decoded 9x8 grid, 4x16-bit band candidate
    // join (lossless to hamming 3), exact popcount verify
    "q_image_neardup" ->
      """WITH m AS MATERIALIZED (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents),
        |d AS MATERIALIZED (SELECT doc_id, text, nb,
        |  nb % 64 + 1 AS w, nb // 64 + 1 AS h FROM m),
        |g AS MATERIALIZED (
        |  SELECT doc_id, i, j,
        |    CASE WHEN nb = 0 THEN 0
        |         ELSE ord(substr(text,
        |           CAST(least((i * h // 8) * w + (j * w // 9), nb - 1) AS INT) + 1, 1))
        |    END AS v
        |  FROM d, range(0, 8) ti(i), range(0, 9) tj(j)),
        |bits AS MATERIALIZED (
        |  SELECT a.doc_id, a.i, a.j, CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
        |  FROM g a JOIN g b ON a.doc_id = b.doc_id AND a.i = b.i AND b.j = a.j + 1
        |  WHERE a.j < 8),
        |bands AS MATERIALIZED (
        |  SELECT doc_id, i // 2 AS band,
        |    CAST(sum(bit * (CAST(1 AS BIGINT) << ((i % 2) * 8 + j))) AS BIGINT) AS bv
        |  FROM bits GROUP BY 1, 2),
        |hx AS MATERIALIZED (
        |  SELECT doc_id,
        |    max(CASE WHEN band = 0 THEN bv END) AS b0,
        |    max(CASE WHEN band = 1 THEN bv END) AS b1,
        |    max(CASE WHEN band = 2 THEN bv END) AS b2,
        |    max(CASE WHEN band = 3 THEN bv END) AS b3
        |  FROM bands GROUP BY 1),
        |cand AS MATERIALIZED (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2 FROM hx a JOIN hx b ON a.b0 = b.b0 AND a.doc_id < b.doc_id
        |  UNION SELECT a.doc_id, b.doc_id FROM hx a JOIN hx b ON a.b1 = b.b1 AND a.doc_id < b.doc_id
        |  UNION SELECT a.doc_id, b.doc_id FROM hx a JOIN hx b ON a.b2 = b.b2 AND a.doc_id < b.doc_id
        |  UNION SELECT a.doc_id, b.doc_id FROM hx a JOIN hx b ON a.b3 = b.b3 AND a.doc_id < b.doc_id)
        |SELECT * FROM (
        |  SELECT c.d1, c.d2,
        |    CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
        |         bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming
        |  FROM cand c JOIN hx a ON c.d1 = a.doc_id JOIN hx b ON c.d2 = b.doc_id)
        |WHERE hamming <= 3""".stripMargin,
  )
}
