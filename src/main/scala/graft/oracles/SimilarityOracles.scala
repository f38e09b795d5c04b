package graft.oracles

import graft.oracles.OracleCtes._

/** DuckDB oracle SQL for the ANN/embedding family (split from SparkEntry in r11;
  * entries unchanged — SparkEntry.baseOracleSql concatenates the
  * family maps). */
private[graft] object SimilarityOracles {
  val sql: Map[String, String] = Map(
    "q_ann_bruteforce" -> annTopKSql(5),
    "q_mrl_eval" -> mrlEvalSql(20, 5, Seq(8, 16, 32)),
    // dense-band LSH + exact re-rank computes the brute-force relation
    // (SimilaritySpec asserts row-for-row equality; an escape needs a
    // neighbor missing all 32 signature bands, p <= 1.6e-4 per pair even
    // at cosine 0)
    "q_ann_lsh_verified" -> annTopKSql(5),
    "q_ann_ivf" -> annTopKSql(10),
    "q_kmeanspp_seed" -> kmeansParSeedSql(3, 8),
    "q_kcenter_coreset" -> kcenterSql(8),
    // same trained-index replay as q_semdedup, then quota nearest per
    // cell with the (dist, vec_id) total order of the heap operator
    "q_cluster_sample" ->
      s"""WITH $ivfTrainCte,
        |best AS (SELECT vec_id, cell, dist FROM (
        |           SELECT t.vec_id, c.cell, list_reduce(
        |             list_transform(range(1, 65), i ->
        |               CAST(floor((t.v[i] - c.m[i]) * (t.v[i] - c.m[i]) * 1e12 + 0.5) AS BIGINT)),
        |             (x, y) -> x + y) AS dist,
        |             row_number() OVER (PARTITION BY t.vec_id ORDER BY list_reduce(
        |               list_transform(range(1, 65), i ->
        |                 CAST(floor((t.v[i] - c.m[i]) * (t.v[i] - c.m[i]) * 1e12 + 0.5) AS BIGINT)),
        |               (x, y) -> x + y), c.cell) AS rn
        |           FROM e t, c1 c)
        |         WHERE rn = 1)
        |SELECT vec_id, CAST(cell AS BIGINT) AS cell, dist AS dist_fp, rnk
        |FROM (SELECT vec_id, cell, dist,
        |        CAST(row_number() OVER (PARTITION BY cell
        |          ORDER BY dist, vec_id) AS BIGINT) AS rnk
        |      FROM best)
        |WHERE rnk <= 10""".stripMargin,
    // same 16-bit fixed-point arithmetic: quantize, exact integer sum,
    // one rescale — every step engine-reproducible
    "q_embedding_centroids" ->
      """SELECT CAST(label AS BIGINT) AS label,
        |  CAST(dim - 1 AS BIGINT) AS dim,
        |  round(sum(q) / 65536.0 / count(*), 6) AS mean,
        |  count(*) AS n_vectors
        |FROM (SELECT label,
        |        generate_subscripts(embedding, 1) AS dim,
        |        CAST(round(CAST(unnest(embedding) AS DOUBLE) * 65536) AS BIGINT) AS q
        |      FROM embeddings)
        |GROUP BY 1, 2""".stripMargin,
    // replays the single unrolled Lloyd round (Forgy seed), ADC
    // shortlist, and exact re-rank in SQL: every reduction is an integer
    // sum of fixed-point terms, so the replay is exact
    "q_ann_pq" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |r AS (SELECT vec_id, CAST((i - 1) // 8 AS INT) AS sub, CAST((i - 1) % 8 AS INT) AS d,
        |        v[i] AS x, CAST(round(v[i] * 65536) AS BIGINT) AS q16
        |      FROM e, generate_series(1, 64) t(i)),
        |tr AS (SELECT * FROM r WHERE vec_id % 2 = 0),
        |c0 AS (SELECT sub, CAST(vec_id AS INT) AS cell, d, round(x, 6) AS m
        |       FROM r WHERE vec_id < 64),
        |a1 AS (SELECT vec_id, sub, cell FROM (
        |         SELECT dd.vec_id, dd.sub, dd.cell,
        |           row_number() OVER (PARTITION BY dd.vec_id, dd.sub ORDER BY dd.dist, dd.cell) AS rn
        |         FROM (SELECT r.vec_id, r.sub, c.cell,
        |                 sum(CAST(floor((r.x - c.m) * (r.x - c.m) * 1e12 + 0.5) AS BIGINT)) AS dist
        |               FROM tr r JOIN c0 c ON r.sub = c.sub AND r.d = c.d GROUP BY 1, 2, 3) dd)
        |       WHERE rn = 1),
        |c1 AS (SELECT r.sub, a.cell, r.d, round(sum(r.q16) / 65536.0 / count(*), 6) AS m
        |       FROM tr r JOIN a1 a ON r.vec_id = a.vec_id AND r.sub = a.sub GROUP BY 1, 2, 3),
        |codes AS (SELECT vec_id, sub, cell FROM (
        |         SELECT dd.vec_id, dd.sub, dd.cell,
        |           row_number() OVER (PARTITION BY dd.vec_id, dd.sub ORDER BY dd.dist, dd.cell) AS rn
        |         FROM (SELECT r.vec_id, r.sub, c.cell,
        |                 sum(CAST(floor((r.x - c.m) * (r.x - c.m) * 1e12 + 0.5) AS BIGINT)) AS dist
        |               FROM r JOIN c1 c ON r.sub = c.sub AND r.d = c.d GROUP BY 1, 2, 3) dd)
        |       WHERE rn = 1),
        |n AS (SELECT vec_id, sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm FROM e),
        |lut AS (SELECT r.vec_id AS qid, r.sub, c.cell,
        |          CAST(sum(CAST(floor(r.x * c.m * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS l
        |        FROM r JOIN c1 c ON r.sub = c.sub AND r.d = c.d
        |        WHERE r.vec_id < 20 GROUP BY 1, 2, 3),
        |sc AS (SELECT l.qid, k.vec_id AS nid, CAST(sum(l.l) AS BIGINT) AS s_fp
        |       FROM lut l JOIN codes k ON l.sub = k.sub AND l.cell = k.cell
        |       WHERE k.vec_id <> l.qid GROUP BY 1, 2),
        |short AS (SELECT qid, nid FROM (
        |    SELECT sc.qid, sc.nid, row_number() OVER (PARTITION BY sc.qid
        |      ORDER BY round(sc.s_fp / 1e12 / (qn.nrm * cn.nrm), 6) DESC, sc.nid) AS srnk
        |    FROM sc JOIN n qn ON sc.qid = qn.vec_id JOIN n cn ON sc.nid = cn.vec_id)
        |  WHERE srnk <= 50),
        |rr AS (SELECT s.qid, s.nid,
        |         round(list_reduce(list_transform(range(1, 65), i -> q.v[i] * c.v[i]), (x, y) -> x + y)
        |           / (qn.nrm * cn.nrm), 6) AS sim
        |       FROM short s
        |       JOIN e q ON s.qid = q.vec_id JOIN e c ON s.nid = c.vec_id
        |       JOIN n qn ON s.qid = qn.vec_id JOIN n cn ON s.nid = cn.vec_id)
        |SELECT * FROM (SELECT qid, nid, sim,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
        |  FROM rr)
        |WHERE rnk <= 5""".stripMargin,
    // IVF-PQ: the trained-cell CTE (shared with q_semdedup/q_ivf_ingest)
    // picks each query's 4 probe cells; the q_ann_pq codebook chain
    // (renamed sr/str/sc0/sa1/scb) scores only their members via ADC
    "q_ann_ivfpq" ->
      s"""WITH $ivfTrainCte,
        |best AS (SELECT vec_id, cell FROM (
        |           SELECT t.vec_id, c.cell, row_number() OVER (
        |             PARTITION BY t.vec_id ORDER BY list_reduce(
        |               list_transform(range(1, 65), i ->
        |                 CAST(floor((t.v[i] - c.m[i]) * (t.v[i] - c.m[i]) * 1e12 + 0.5) AS BIGINT)),
        |               (x, y) -> x + y), c.cell) AS rn
        |           FROM e t, c1 c)
        |         WHERE rn = 1),
        |n AS (SELECT vec_id, sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm FROM e),
        |probe AS (SELECT qid, cell FROM (
        |           SELECT t.vec_id AS qid, c.cell, row_number() OVER (
        |             PARTITION BY t.vec_id ORDER BY list_reduce(
        |               list_transform(range(1, 65), i ->
        |                 CAST(floor((t.v[i] - c.m[i]) * (t.v[i] - c.m[i]) * 1e12 + 0.5) AS BIGINT)),
        |               (x, y) -> x + y), c.cell) AS rn
        |           FROM e t, c1 c WHERE t.vec_id < 20)
        |         WHERE rn <= 4),
        |sr AS (SELECT vec_id, CAST((i - 1) // 8 AS INT) AS sub, CAST((i - 1) % 8 AS INT) AS d,
        |         v[i] AS x, CAST(round(v[i] * 65536) AS BIGINT) AS q16
        |       FROM e, generate_series(1, 64) t(i)),
        |str AS (SELECT * FROM sr WHERE vec_id % 2 = 0),
        |sc0 AS (SELECT sub, CAST(vec_id AS INT) AS cell, d, round(x, 6) AS m
        |        FROM sr WHERE vec_id < 64),
        |sa1 AS (SELECT vec_id, sub, cell FROM (
        |         SELECT dd.vec_id, dd.sub, dd.cell,
        |           row_number() OVER (PARTITION BY dd.vec_id, dd.sub ORDER BY dd.dist, dd.cell) AS rn
        |         FROM (SELECT r.vec_id, r.sub, c.cell,
        |                 sum(CAST(floor((r.x - c.m) * (r.x - c.m) * 1e12 + 0.5) AS BIGINT)) AS dist
        |               FROM str r JOIN sc0 c ON r.sub = c.sub AND r.d = c.d GROUP BY 1, 2, 3) dd)
        |       WHERE rn = 1),
        |scb AS (SELECT r.sub, a.cell, r.d, round(sum(r.q16) / 65536.0 / count(*), 6) AS m
        |        FROM str r JOIN sa1 a ON r.vec_id = a.vec_id AND r.sub = a.sub GROUP BY 1, 2, 3),
        |codes AS (SELECT vec_id, sub, cell FROM (
        |         SELECT dd.vec_id, dd.sub, dd.cell,
        |           row_number() OVER (PARTITION BY dd.vec_id, dd.sub ORDER BY dd.dist, dd.cell) AS rn
        |         FROM (SELECT r.vec_id, r.sub, c.cell,
        |                 sum(CAST(floor((r.x - c.m) * (r.x - c.m) * 1e12 + 0.5) AS BIGINT)) AS dist
        |               FROM sr r JOIN scb c ON r.sub = c.sub AND r.d = c.d GROUP BY 1, 2, 3) dd)
        |       WHERE rn = 1),
        |lut AS (SELECT r.vec_id AS qid, r.sub, c.cell,
        |          CAST(sum(CAST(floor(r.x * c.m * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS l
        |        FROM sr r JOIN scb c ON r.sub = c.sub AND r.d = c.d
        |        WHERE r.vec_id < 20 GROUP BY 1, 2, 3),
        |cand AS (SELECT p.qid, b.vec_id AS nid
        |         FROM probe p JOIN best b ON p.cell = b.cell
        |         WHERE b.vec_id <> p.qid),
        |adcs AS (SELECT c.qid, c.nid, CAST(sum(l.l) AS BIGINT) AS s_fp
        |        FROM cand c JOIN codes k ON k.vec_id = c.nid
        |        JOIN lut l ON l.qid = c.qid AND l.sub = k.sub AND l.cell = k.cell
        |        GROUP BY 1, 2),
        |short AS (SELECT qid, nid FROM (
        |    SELECT s.qid, s.nid, row_number() OVER (PARTITION BY s.qid
        |      ORDER BY round(s.s_fp / 1e12 / (qn.nrm * cn.nrm), 6) DESC, s.nid) AS srnk
        |    FROM adcs s JOIN n qn ON s.qid = qn.vec_id JOIN n cn ON s.nid = cn.vec_id)
        |  WHERE srnk <= 50),
        |rr AS (SELECT s.qid, s.nid,
        |         round(list_reduce(list_transform(range(1, 65), i -> q.v[i] * c.v[i]), (x, y) -> x + y)
        |           / (qn.nrm * cn.nrm), 6) AS sim
        |       FROM short s
        |       JOIN e q ON s.qid = q.vec_id JOIN e c ON s.nid = c.vec_id
        |       JOIN n qn ON s.qid = qn.vec_id JOIN n cn ON s.nid = cn.vec_id)
        |SELECT * FROM (SELECT qid, nid, sim,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
        |  FROM rr)
        |WHERE rnk <= 5""".stripMargin,
    // brute-force cross-label top-k: the banded candidate path computes
    // this exact relation (escape bound is label-independent).
    // ACCEPTED MISMATCH RISK: the banded generator has a nonzero
    // all-bands-escape probability (~1.6e-4 per near-orthogonal pair),
    // so an unlucky corpus/SF can hash-miss this oracle even though the
    // operator behaves as designed. SimilaritySpec's candidate-recall
    // assertion ("hard negatives: banded candidates cover...") makes
    // such a miss diagnosable as band escape rather than a logic bug;
    // on the driver's corpora recall is exactly 1.0.
    "q_mmr_rerank" -> mmrSql,
    // majority vote tiebreak = smallest label; qid partitioning keeps
    // the vote argmax per query before the confusion census
    "q_knn_eval" ->
      s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings),
        |d AS (SELECT q.vec_id AS qid, q.label AS tl, c.vec_id AS nid,
        |        c.label AS nl, round(${duckCos("q.v", "c.v")}, 6) AS sim
        |      FROM e q JOIN e c
        |        ON q.vec_id < 100 AND q.vec_id <> c.vec_id),
        |top AS (SELECT qid, tl, nl FROM (
        |          SELECT qid, tl, nl, row_number() OVER (
        |            PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM d)
        |        WHERE rn <= 5),
        |v AS (SELECT qid, tl, nl, count(*) AS votes
        |      FROM top GROUP BY 1, 2, 3),
        |p AS (SELECT qid, tl, nl FROM (
        |        SELECT qid, tl, nl, row_number() OVER (
        |          PARTITION BY qid ORDER BY votes DESC, nl) AS rn FROM v)
        |      WHERE rn = 1)
        |SELECT tl AS true_label, nl AS pred_label, count(*) AS n
        |FROM p GROUP BY 1, 2""".stripMargin,
    "q_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings),
        |d AS (SELECT q.vec_id AS qid, c.vec_id AS nid, c.label AS neg_label,
        |        round(${duckCos("q.v", "c.v")}, 6) AS sim
        |      FROM e q JOIN e c
        |        ON q.vec_id < 20 AND q.vec_id <> c.vec_id AND q.label <> c.label)
        |SELECT * FROM (SELECT qid, nid, neg_label, sim,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
        |  FROM d)
        |WHERE rnk <= 5""".stripMargin,
    // same Forgy + one-Lloyd-round + fixed-point discipline as q_ann_pq,
    // over full 64-dim vectors and 16 cells; the ingest census is the
    // all-vector assignment against the trained (resident-batch) index
    "q_ivf_ingest" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |r AS (SELECT vec_id, CAST(i AS INT) AS d,
        |        CAST(round(v[i] * 65536) AS BIGINT) AS q16
        |      FROM e, generate_series(1, 64) t(i)),
        |cc AS (SELECT greatest(16, (count(*) + 99) // 100) AS nc FROM embeddings),
        |c0 AS (SELECT CAST(vec_id AS INT) AS cell,
        |         list_transform(v, x -> round(x, 6)) AS m
        |       FROM e WHERE vec_id < (SELECT nc FROM cc)),
        |a1 AS (SELECT vec_id, cell FROM (
        |         SELECT t.vec_id, c.cell, row_number() OVER (
        |           PARTITION BY t.vec_id ORDER BY list_reduce(
        |             list_transform(range(1, 65), i ->
        |               CAST(floor((t.v[i] - c.m[i]) * (t.v[i] - c.m[i]) * 1e12 + 0.5) AS BIGINT)),
        |             (x, y) -> x + y), c.cell) AS rn
        |         FROM e t, c0 c WHERE t.vec_id % 2 = 0)
        |       WHERE rn = 1),
        |c1d AS (SELECT a.cell, r.d, round(sum(r.q16) / 65536.0 / count(*), 6) AS m
        |        FROM r JOIN a1 a ON r.vec_id = a.vec_id GROUP BY 1, 2),
        |c1 AS (SELECT cell, list(m ORDER BY d) AS m FROM c1d GROUP BY 1),
        |best AS (SELECT vec_id, cell, dist FROM (
        |           SELECT t.vec_id, c.cell, list_reduce(
        |             list_transform(range(1, 65), i ->
        |               CAST(floor((t.v[i] - c.m[i]) * (t.v[i] - c.m[i]) * 1e12 + 0.5) AS BIGINT)),
        |             (x, y) -> x + y) AS dist,
        |             row_number() OVER (PARTITION BY t.vec_id ORDER BY list_reduce(
        |               list_transform(range(1, 65), i ->
        |                 CAST(floor((t.v[i] - c.m[i]) * (t.v[i] - c.m[i]) * 1e12 + 0.5) AS BIGINT)),
        |               (x, y) -> x + y), c.cell) AS rn
        |           FROM e t, c1 c)
        |         WHERE rn = 1)
        |SELECT CAST(cell AS BIGINT) AS cell,
        |  CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_existing,
        |  CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(coalesce(sum(CASE WHEN vec_id % 2 = 1 THEN dist END), 0) AS BIGINT) AS new_dist_fp
        |FROM best GROUP BY 1""".stripMargin,
    // same integer sufficient statistics (Σqi, Σqj, Σqiqj); the exact
    // integer numerator (BIGINT here — oracle SFs fit comfortably) goes
    // through ONE IEEE division, matching Spark's decimal path bit-for-bit
    // q16 moments + the proven Wilson isqrt chain + the signed
    // truncating-div transform census
    "q_embed_whiten" ->
      s"""WITH $embedWhitenCtes,
        |za AS (SELECT r.d, sum(abs(CASE WHEN w6.isq = 0 THEN 0::HUGEINT
        |    ELSE ((CAST(r.q AS HUGEINT) * w6.n - w6.s) * 1000000) // w6.isq
        |    END)) AS saz
        |  FROM r JOIN w6 ON r.d = w6.d GROUP BY 1)
        |SELECT w6.d, w6.n,
        |  CAST((s * 1000000) // n AS BIGINT) AS mean_fp,
        |  CAST((isq * 1000000) // n AS BIGINT) AS sd_fp,
        |  CAST(za.saz AS BIGINT) AS sum_absz
        |FROM w6 JOIN za ON w6.d = za.d""".stripMargin,
    // diagonal Mahalanobis over the same whitening parameters
    "q_ood_score" ->
      s"""WITH $embedWhitenCtes,
        |z AS (SELECT r.vec_id, CASE WHEN w6.isq = 0 THEN 0::HUGEINT
        |    ELSE ((CAST(r.q AS HUGEINT) * w6.n - w6.s) * 1000) // w6.isq
        |    END AS z
        |  FROM r JOIN w6 ON r.d = w6.d),
        |sc AS (SELECT vec_id, CAST(sum(z * z) AS BIGINT) AS score
        |  FROM z GROUP BY 1)
        |SELECT sc.vec_id, CAST(e2.label AS BIGINT) AS label, sc.score
        |FROM sc JOIN embeddings e2 ON sc.vec_id = e2.vec_id
        |ORDER BY score DESC, sc.vec_id LIMIT 20""".stripMargin,
    "q_embedding_cov" ->
      """WITH r AS (SELECT vec_id, CAST(i - 1 AS INT) AS d,
        |        CAST(round(CAST(embedding[i] AS DOUBLE) * 65536) AS BIGINT) AS q
        |      FROM embeddings, generate_series(1, 64) t(i)),
        |p AS (SELECT a.d AS i, b.d AS j, a.q AS qi, b.q AS qj
        |      FROM r a JOIN r b ON a.vec_id = b.vec_id AND a.d <= b.d)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |  CAST(CAST(sum(qi * qj) * count(*) - sum(qi) * sum(qj) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) * count(*) AS DOUBLE) / 4294967296.0 AS cov,
        |  count(*) AS n_vectors
        |FROM p GROUP BY 1, 2""".stripMargin,
    "q_ann_bq" -> annBinarySql(5, 50),
    "q_ann_q8" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        greatest(list_max(list_transform(v, x -> abs(x))) / 127.0, 1e-30) AS sc
        |      FROM e),
        |qz AS (SELECT vec_id, sc,
        |         list_transform(v, x -> CAST(round(x / sc) AS INT)) AS qv
        |       FROM s),
        |d AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
        |        round(a.sc * b.sc * list_reduce(
        |          list_transform(range(1, 65), i -> CAST(a.qv[i] AS DOUBLE) * b.qv[i]),
        |          (x, y) -> x + y), 6) AS qsim
        |      FROM qz a JOIN qz b ON a.vec_id < 20 AND a.vec_id <> b.vec_id)
        |SELECT * FROM (SELECT qid, nid, qsim,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY qsim DESC, nid) AS BIGINT) AS rnk
        |  FROM d)
        |WHERE rnk <= 5""".stripMargin,
    "q_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
         |SELECT * FROM (
         |  SELECT a.vec_id AS d1, b.vec_id AS d2, round(${duckCos("a.v", "b.v")}, 6) AS sim
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |WHERE sim > 0.4""".stripMargin,
    // strict-threshold door over the planted-twin corpus: the oracle is
    // the exact all-pairs relation (the Spark side's multi-table banded
    // candidates realize recall 1.0 on the frozen corpora, spec-pinned).
    // Twin arithmetic mirrors Similarity.plantedCorpus bit-for-bit:
    // integer jitter, double multiply, float cast; DuckDB's i is
    // 1-based so (i-1) aligns with Spark's 0-based transform index.
    "q_embedding_neardup_strict" ->
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings),
         |tw AS (SELECT vec_id + 1000000000 AS tid,
         |         list_transform(range(1, 65), i ->
         |           CAST(CAST(embedding[i] AS DOUBLE) *
         |             (1 + ((vec_id * 7 + (i - 1) * 3) % 13 - 6) / 40.0) AS REAL)) AS twe
         |       FROM base WHERE vec_id % 4 = 0),
         |u AS (SELECT vec_id, embedding FROM base
         |      UNION ALL SELECT tid, twe FROM tw),
         |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM u)
         |SELECT * FROM (
         |  SELECT a.vec_id AS d1, b.vec_id AS d2, round(${duckCos("a.v", "b.v")}, 6) AS sim
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |WHERE sim > 0.8""".stripMargin,
    // same Spark result as q_embedding_neardup_strict, verified against
    // the TWIN-RESTRICTED relation: the corpus contract (no non-twin
    // pair above 0.8 — spec-guarded) makes the expected output exactly
    // the N/4 planted pairs, so the oracle joins each base vector to
    // its twin alone instead of replaying all pairs — linear, which is
    // what lets the sf1 oracle sweep carry this door. A spurious pair
    // the door emitted, or a twin it missed, still hash-mismatches.
    "q_neardup_strict_twins" ->
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings),
         |tw AS (SELECT vec_id + 1000000000 AS tid,
         |         list_transform(range(1, 65), i ->
         |           CAST(CAST(embedding[i] AS DOUBLE) *
         |             (1 + ((vec_id * 7 + (i - 1) * 3) % 13 - 6) / 40.0) AS REAL)) AS twe
         |       FROM base WHERE vec_id % 4 = 0),
         |ea AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |       FROM base WHERE vec_id % 4 = 0),
         |eb AS (SELECT tid, list_transform(twe, x -> CAST(x AS DOUBLE)) AS v FROM tw)
         |SELECT * FROM (
         |  SELECT a.vec_id AS d1, b.tid AS d2, round(${duckCos("a.v", "b.v")}, 6) AS sim
         |  FROM ea a JOIN eb b ON b.tid = a.vec_id + 1000000000)
         |WHERE sim > 0.8""".stripMargin,
    "q_embedding_outliers" ->
      s"""WITH $ivfTrainCte,
        |d2 AS (SELECT t.vec_id, c.cell, list_reduce(
        |         list_transform(range(1, 65), i ->
        |           CAST(floor((t.v[i] - c.m[i]) * (t.v[i] - c.m[i]) * 1e12 + 0.5) AS BIGINT)),
        |         (x, y) -> x + y) AS dist
        |       FROM e t, c1 c),
        |best AS (SELECT vec_id, cell, dist FROM (
        |           SELECT vec_id, cell, dist, row_number() OVER (
        |             PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM d2)
        |         WHERE rn = 1)
        |SELECT vec_id, CAST(cell AS BIGINT) AS cell, CAST(dist AS BIGINT) AS dist_fp
        |FROM best ORDER BY dist DESC, vec_id LIMIT 20""".stripMargin,
    "q_lof" ->
      s"""WITH $ivfTrainCte,
        |d2c AS (SELECT t.vec_id, c.cell, list_reduce(
        |         list_transform(range(1, 65), i ->
        |           CAST(floor((t.v[i] - c.m[i]) * (t.v[i] - c.m[i]) * 1e12 + 0.5) AS BIGINT)),
        |         (x, y) -> x + y) AS dist
        |       FROM e t, c1 c),
        |best AS MATERIALIZED (SELECT vec_id, cell FROM (
        |           SELECT vec_id, cell, row_number() OVER (
        |             PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM d2c)
        |         WHERE rn = 1),
        |q AS MATERIALIZED (SELECT e.vec_id, b.cell,
        |         list_transform(e.v, x -> round(x * 65536)) AS q
        |       FROM e JOIN best b USING (vec_id)),
        |pd AS (SELECT x.vec_id AS a, y.vec_id AS b, x.cell,
        |         CAST(list_reduce(list_transform(range(1, 65), i ->
        |             (x.q[i] - y.q[i]) * (x.q[i] - y.q[i])),
        |           (p, s) -> p + s) AS BIGINT) AS d2
        |       FROM q x JOIN q y
        |         ON x.cell = y.cell AND x.vec_id != y.vec_id),
        |knn AS MATERIALIZED (SELECT a, b, cell, d2 FROM (
        |         SELECT a, b, cell, d2, row_number() OVER (
        |           PARTITION BY a ORDER BY d2, b) AS rn FROM pd)
        |       WHERE rn <= 8),
        |kd AS MATERIALIZED (SELECT a, max(d2) AS kdist,
        |         CAST(count(*) AS BIGINT) AS cnt, min(cell) AS cell
        |       FROM knn GROUP BY 1),
        |lrd AS MATERIALIZED (SELECT r.a, kd.cnt, kd.cell,
        |         CASE WHEN sum(r.reach) = 0
        |           THEN 1000000000000000000::HUGEINT
        |           ELSE (kd.cnt::HUGEINT * 1000000000000000000)
        |             // sum(r.reach) END AS lrd_fp
        |       FROM (SELECT k.a, greatest(kb.kdist, k.d2) AS reach
        |             FROM knn k JOIN kd kb ON k.b = kb.a) r
        |       JOIN kd ON r.a = kd.a GROUP BY r.a, kd.cnt, kd.cell),
        |lof AS (SELECT k.a, sum(lb.lrd_fp) AS slb
        |        FROM knn k JOIN lrd lb ON k.b = lb.a GROUP BY 1)
        |SELECT l.a AS vec_id, CAST(d.cell AS BIGINT) AS cell,
        |  d.cnt AS n_nbrs, CAST(d.lrd_fp AS BIGINT) AS lrd_fp,
        |  CAST((l.slb * 1000000) // (d.cnt::HUGEINT * d.lrd_fp)
        |    AS BIGINT) AS lof_ppm
        |FROM lof l JOIN lrd d ON l.a = d.a
        |ORDER BY lof_ppm DESC, vec_id LIMIT 50""".stripMargin,
    "q_semantic_decontam" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |d AS (SELECT c.vec_id, q.vec_id AS eval_id,
        |        round((list_reduce(list_transform(range(1, 65), i -> q.v[i] * c.v[i]), (x, y) -> x + y)
        | / (sqrt(list_reduce(list_transform(range(1, 65), i -> q.v[i] * q.v[i]), (x, y) -> x + y))
        |   * sqrt(list_reduce(list_transform(range(1, 65), i -> c.v[i] * c.v[i]), (x, y) -> x + y)))), 6) AS sim
        |      FROM e c JOIN e q ON q.vec_id < 50 AND c.vec_id >= 50)
        |SELECT vec_id, eval_id, sim FROM (
        |  SELECT vec_id, eval_id, sim, row_number()
        |    OVER (PARTITION BY vec_id ORDER BY sim DESC, eval_id) AS rn
        |  FROM d WHERE sim >= 0.35)
        |WHERE rn = 1""".stripMargin,
    // mutual-kNN ratio-margin mining: brute-force kNN (rounded-cosine
    // rank contract), integer micro-sims, 2k·s6·1e6 // (Σknn_a+Σknn_b)
    "q_mutual_knn" -> mutualKnnSql,
    // the LSH-shortlist miner verifies against the SAME exact relation
    // (the qAnnLshVerified pattern: approximate candidate generation,
    // exact scoring, empirically-total recall at 32 two-bit bands —
    // SimilaritySpec pins row-for-row equality with the exact miner)
    "q_mutual_knn_lsh" -> mutualKnnSql,
    // the IVF-shortlist miner replays its OWN full pipeline — trained
    // cells (shared ivfTrainCte), fixed-point assignment, within-cell
    // rounded-cosine ranks, mutual margin — cell-restricted semantics
    // are the contract, so this oracle is exact, not recall-trusting
    "q_mutual_knn_ivf" ->
      s"""WITH $ivfTrainCte,
        |best AS (SELECT vec_id, cell FROM (
        |           SELECT t.vec_id, c.cell, row_number() OVER (
        |             PARTITION BY t.vec_id ORDER BY list_reduce(
        |               list_transform(range(1, 65), i ->
        |                 CAST(floor((t.v[i] - c.m[i]) * (t.v[i] - c.m[i]) * 1e12 + 0.5) AS BIGINT)),
        |               (x, y) -> x + y), c.cell) AS rn
        |           FROM e t, c1 c)
        |         WHERE rn = 1),
        |d AS (SELECT a.vec_id AS a, b.vec_id AS b,
        |        round(${duckCos("ea.v", "eb.v")}, 6) AS sim
        |      FROM best a JOIN best b ON a.cell = b.cell AND a.vec_id <> b.vec_id
        |      JOIN e ea ON ea.vec_id = a.vec_id
        |      JOIN e eb ON eb.vec_id = b.vec_id),
        |d6 AS (SELECT a, b, CAST(round(sim * 1000000, 0) AS BIGINT) AS s6,
        |         row_number() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rn
        |       FROM d),
        |knn AS MATERIALIZED (SELECT a, b, s6 FROM d6 WHERE rn <= 10),
        |ks AS (SELECT a, CAST(sum(s6) AS BIGINT) AS ksum FROM knn GROUP BY 1),
        |m AS (SELECT f.a, f.b, f.s6 FROM knn f
        |      JOIN knn r ON f.a = r.b AND f.b = r.a WHERE f.a < f.b)
        |SELECT m.a, m.b, m.s6 AS sim_i6,
        |  CAST((20 * m.s6 * 1000000) // (ka.ksum + kb.ksum) AS BIGINT)
        |    AS margin_ppm
        |FROM m JOIN ks ka ON m.a = ka.a JOIN ks kb ON m.b = kb.a
        |WHERE m.s6 > 0 AND ka.ksum + kb.ksum > 0""".stripMargin,
    "q_pca_power" -> pcaPowerSql,
  )

  private lazy val mutualKnnSql: String =
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |d AS (SELECT a.vec_id AS a, b.vec_id AS b,
        |        round(${duckCos("a.v", "b.v")}, 6) AS sim
        |      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |d6 AS (SELECT a, b, CAST(round(sim * 1000000, 0) AS BIGINT) AS s6,
        |         row_number() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rn
        |       FROM d),
        |knn AS MATERIALIZED (SELECT a, b, s6 FROM d6 WHERE rn <= 10),
        |ks AS (SELECT a, CAST(sum(s6) AS BIGINT) AS ksum FROM knn GROUP BY 1),
        |m AS (SELECT f.a, f.b, f.s6 FROM knn f
        |      JOIN knn r ON f.a = r.b AND f.b = r.a WHERE f.a < f.b)
        |SELECT m.a, m.b, m.s6 AS sim_i6,
        |  CAST((20 * m.s6 * 1000000) // (ka.ksum + kb.ksum) AS BIGINT)
        |    AS margin_ppm
        |FROM m JOIN ks ka ON m.a = ka.a JOIN ks kb ON m.b = kb.a
        |WHERE m.s6 > 0 AND ka.ksum + kb.ksum > 0""".stripMargin
}
