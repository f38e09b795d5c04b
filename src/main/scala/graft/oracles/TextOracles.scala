package graft.oracles

import graft.oracles.OracleCtes._

/** DuckDB oracle SQL for the text/tokenizer family (split from SparkEntry in r11;
  * entries unchanged — SparkEntry.baseOracleSql concatenates the
  * family maps). */
private[graft] object TextOracles {
  val sql: Map[String, String] = Map(
    "q_text_stats_by_lang" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars
        |FROM documents GROUP BY 1""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_ws,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_tokens_re,
        |  n_chars
        |FROM documents""".stripMargin,
    // replays the kernel's greedy leftmost-longest scan as a recursive
    // CTE over (word, pos) states; terminal states carry the word's
    // token count. Vocab interpolated from BpeVocab — ONE definition.
    "q_token_bpe" ->
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
        |bpe AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bpe
        |        FROM states WHERE pos >= length(word) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens_ws,
        |  b.n_bpe AS n_tokens_bpe,
        |  round(CAST(d.n_chars AS DOUBLE) / nullif(b.n_bpe, 0), 4) AS chars_per_tok
        |FROM documents d JOIN bpe b ON d.doc_id = b.doc_id""".stripMargin,
    "q_tokenizer_fertility" ->
      s"""WITH RECURSIVE
        |bpe_vocab(tok) AS (VALUES ${graft.text.BpeVocab.sqlValues}),
        |words AS (SELECT lang, unnest(string_split(text, ' ')) AS word
        |          FROM documents),
        |wc AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_words
        |       FROM words WHERE word <> '' GROUP BY 1),
        |states(lang, word, pos, piece) AS (
        |  SELECT lang, word, 0, CAST(NULL AS VARCHAR) FROM words
        |  UNION ALL
        |  SELECT lang, word, pos + step, substr(word, pos + 1, step)
        |  FROM (SELECT lang, word, pos,
        |          coalesce((SELECT max(length(tok)) FROM bpe_vocab
        |                    WHERE substr(word, pos + 1, length(tok)) = tok), 1) AS step
        |        FROM states WHERE pos < length(word)) s),
        |pc AS (SELECT lang, count(*) AS n_pieces,
        |         CAST(sum(CASE WHEN piece NOT IN (SELECT tok FROM bpe_vocab)
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_fallback
        |       FROM states WHERE piece IS NOT NULL GROUP BY 1)
        |SELECT lang, n_words, n_pieces, n_fallback,
        |  n_pieces * 1000000 // n_words AS fertility_ppm,
        |  n_fallback * 1000000 // n_pieces AS fallback_ppm
        |FROM wc JOIN pc USING (lang)""".stripMargin,
    "q_bpe_encode" ->
      s"""WITH RECURSIVE
        |bpe_vocab(vid, tok) AS (VALUES ${graft.text.BpeVocab.sqlValuesWithId}),
        |words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
        |            generate_subscripts(string_split(text, ' '), 1) AS widx
        |          FROM documents),
        |states(doc_id, widx, word, pos, piece) AS (
        |  SELECT doc_id, widx, word, 0, CAST(NULL AS VARCHAR) FROM words
        |  UNION ALL
        |  SELECT doc_id, widx, word, pos + step, substr(word, pos + 1, step)
        |  FROM (SELECT doc_id, widx, word, pos,
        |          coalesce((SELECT max(length(tok)) FROM bpe_vocab
        |                    WHERE substr(word, pos + 1, length(tok)) = tok), 1) AS step
        |        FROM states WHERE pos < length(word)) s)
        |SELECT doc_id,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY widx, pos) - 1 AS seq,
        |  piece,
        |  CAST(coalesce((SELECT vid FROM bpe_vocab v WHERE v.tok = piece), -1)
        |    AS BIGINT) AS piece_id
        |FROM states WHERE piece IS NOT NULL""".stripMargin,
    // same deterministic PII injection, replayed in RE2; 'g' flag makes
    // DuckDB's regexp_replace global like Spark's
    "q_pii_scrub" ->
      """WITH seeded AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN ' contact user' || doc_id || '@mail.example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0
        |      THEN ' call 555-010-' || format('{:04d}', doc_id % 10000) ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |      THEN ' from 10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256) ELSE '' END
        |    AS text FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+[.][a-z]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(text, '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[a-z0-9.]+@[a-z0-9.]+[.][a-z]+', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |    '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}', '<IP>', 'g')) AS scrub_hash
        |FROM seeded""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id, lang, n_tokens, n_stop,
        |  round(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stop_ratio,
        |  CASE WHEN n_tokens BETWEEN 20 AND 80
        |        AND round(CAST(n_stop AS DOUBLE) / n_tokens, 4) < 0.2
        |       THEN 'good' ELSE 'low' END AS quality
        |FROM (SELECT doc_id, lang,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |        CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop
        |      FROM documents)""".stripMargin,
    "q_lexicon_filter" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('slow', 'dup', 'drop', 'big'))) AS BIGINT) AS hits
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN hits >= 3 OR hits * 25 >= n_tokens
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |  CAST(sum(hits) AS BIGINT) AS total_hits,
        |  CAST(count(*) - sum(CASE WHEN hits >= 3 OR hits * 25 >= n_tokens
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM t GROUP BY 1""".stripMargin,
    // independent overlapping-count replay: for each watchlist pattern
    // (interpolated from the SAME Scala literal the query compiles into
    // its automaton), count match END POSITIONS by brute substr probing
    "q_multi_match" -> {
      // standard SQL single-quote escaping ('' doubling): the runtime
      // accepts apostrophes in patterns (o'brien-style watchlist
      // literals), so the oracle generator must carry them safely
      val pats = graft.text.TextOps.Watchlist.zipWithIndex
        .map { case (p, i) => s"($i, '${p.replace("'", "''")}')" }
        .mkString(", ")
      s"""WITH pats AS (SELECT * FROM (VALUES $pats) p(pid, pat)),
         |h AS (SELECT p.pat,
         |        len(list_filter(range(1, len(d.text) - len(p.pat) + 2),
         |          i -> substr(d.text, i, len(p.pat)) = p.pat)) AS cnt
         |      FROM documents d CROSS JOIN pats p)
         |SELECT pat AS pattern,
         |  CAST(sum(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
         |  CAST(sum(cnt) AS BIGINT) AS hits
         |FROM h GROUP BY 1""".stripMargin
    },
    // row_number over the md5 shuffle key stands in for the
    // distributed zipWithIndex total order (same order, same ranks)
    "q_vocab_growth" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |    md5('vg:' || CAST(doc_id AS VARCHAR)) AS skey FROM documents),
        |p AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS nt, toks,
        |    CAST(row_number() OVER (ORDER BY skey) AS BIGINT) AS pos FROM d),
        |tf AS (SELECT tok, min(pos) AS fp FROM (
        |    SELECT pos, unnest(list_distinct(toks)) AS tok FROM p) GROUP BY 1),
        |vb AS (SELECT CASE WHEN fp = 1 THEN 0
        |      ELSE length(printf('%b', fp - 1)) END AS b,
        |    CAST(count(*) AS BIGINT) AS v FROM tf GROUP BY 1),
        |db AS (SELECT CASE WHEN pos = 1 THEN 0
        |      ELSE length(printf('%b', pos - 1)) END AS b,
        |    CAST(count(*) AS BIGINT) AS nd, CAST(sum(nt) AS BIGINT) AS tt
        |  FROM p GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM p)
        |SELECT CAST(1::BIGINT << b AS BIGINT) AS checkpoint,
        |  least(CAST(1::BIGINT << b AS BIGINT), (SELECT nn FROM n)) AS n_docs,
        |  CAST(sum(tt) OVER (ORDER BY b) AS BIGINT) AS tokens_seen,
        |  CAST(sum(coalesce(v, 0)) OVER (ORDER BY b) AS BIGINT) AS vocab_size
        |FROM db LEFT JOIN vb USING (b)""".stripMargin,
    "q_token_entropy" ->
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1, 2),
        |lt AS (SELECT lang, CAST(sum(c) AS BIGINT) AS nn,
        |    CAST(count(*) AS BIGINT) AS n_types FROM c GROUP BY 1),
        |g AS (SELECT tok, CAST(count(*) AS BIGINT) AS g FROM t GROUP BY 1),
        |gt AS (SELECT CAST(sum(g) AS BIGINT) AS gg FROM g)
        |SELECT c.lang, min(lt.nn) AS n_tokens, min(lt.n_types) AS n_types,
        |  CAST(sum(CAST(c.c AS HUGEINT)
        |      * CAST(floor(ln(CAST(lt.nn AS DOUBLE) / c.c) * 1e6) AS BIGINT))
        |    // min(lt.nn) AS BIGINT) AS h_micronat,
        |  CAST(sum(CAST(c.c AS HUGEINT)
        |      * CAST(floor(ln(CAST(c.c AS DOUBLE) * gt.gg
        |        / (CAST(lt.nn AS DOUBLE) * g.g)) * 1e6) AS BIGINT))
        |    // min(lt.nn) AS BIGINT) AS kl_micronat
        |FROM c JOIN lt ON c.lang = lt.lang JOIN g ON c.tok = g.tok
        |CROSS JOIN gt
        |GROUP BY 1""".stripMargin,
    "q_langid_profile" ->
      """WITH d AS (SELECT doc_id, lang, text FROM documents WHERE len(text) >= 3),
        |tr AS (SELECT doc_id, lang, substr(text, CAST(i AS INT), 3) AS tri
        |       FROM (SELECT doc_id, lang, text,
        |               unnest(range(1, len(text) - 1)) AS i FROM d)),
        |lp AS (SELECT lang AS cand, tri, lrank FROM (
        |    SELECT lang, tri, CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY count(*) DESC, tri) AS BIGINT) AS lrank
        |    FROM tr WHERE doc_id % 2 = 0 GROUP BY lang, tri)
        |  WHERE lrank <= 20),
        |dp AS (SELECT doc_id, lang, tri, drank FROM (
        |    SELECT doc_id, lang, tri, CAST(row_number() OVER (
        |      PARTITION BY doc_id ORDER BY count(*) DESC, tri) AS BIGINT)
        |      AS drank
        |    FROM tr WHERE doc_id % 2 = 1 GROUP BY doc_id, lang, tri)
        |  WHERE drank <= 20),
        |m AS (SELECT dp.doc_id, lp.cand,
        |    CAST(sum(abs(dp.drank - lp.lrank)) AS BIGINT) AS msum,
        |    CAST(count(*) AS BIGINT) AS mcnt
        |  FROM dp JOIN lp ON dp.tri = lp.tri GROUP BY 1, 2),
        |ps AS (SELECT doc_id, min(lang) AS true_lang,
        |    CAST(count(*) AS BIGINT) AS psize FROM dp GROUP BY 1),
        |ls AS (SELECT DISTINCT cand FROM lp),
        |dist AS (SELECT ps.doc_id, ps.true_lang, ls.cand,
        |    coalesce(m.msum, 0) + (ps.psize - coalesce(m.mcnt, 0)) * 20
        |      AS dist
        |  FROM ps CROSS JOIN ls
        |  LEFT JOIN m ON m.doc_id = ps.doc_id AND m.cand = ls.cand),
        |prd AS (SELECT doc_id, true_lang, cand FROM (
        |    SELECT doc_id, true_lang, cand, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY dist, cand) AS rn FROM dist)
        |  WHERE rn = 1)
        |SELECT true_lang AS lang, cand AS pred_lang,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM prd GROUP BY 1, 2""".stripMargin,
    "q_kappa" ->
      """WITH lab AS (SELECT
        |    CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN n_stop * 5 < n_tokens THEN 1 ELSE 0 END AS b
        |  FROM (SELECT
        |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |      CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop
        |    FROM documents)),
        |cells AS (SELECT
        |    CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
        |    CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        |    CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |    CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
        |  FROM lab)
        |SELECT n00, n01, n10, n11,
        |  CAST((n00 + n01 + n10 + n11) * (n00 + n11)
        |       - ((n10 + n11) * (n01 + n11) + (n00 + n01) * (n00 + n10)) AS DOUBLE)
        |  / ((n00 + n01 + n10 + n11) * (n00 + n01 + n10 + n11)
        |     - ((n10 + n11) * (n01 + n11) + (n00 + n01) * (n00 + n10))) AS kappa
        |FROM cells""".stripMargin,
    "q_lang_guess" ->
      """SELECT lang, CASE WHEN en_hits >= 2 THEN 'en'
        |                  WHEN en_hits = 1 THEN 'en_maybe'
        |                  ELSE 'unk' END AS guessed, count(*) AS n_docs
        |FROM (SELECT lang, len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS en_hits
        |      FROM documents)
        |GROUP BY 1, 2""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id,
        |  CAST(sum(ord * (ascii(substr(tok, 1, 1)) * 31 + len(tok))) % 1000000007 AS BIGINT) AS fingerprint
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |        generate_subscripts(string_split(text, ' '), 1) AS ord
        |      FROM documents)
        |GROUP BY 1""".stripMargin,
    "q_feature_hash" ->
      """SELECT doc_id,
        |  CAST(('0x' || substr(md5(tok), 1, 2))::UBIGINT % 64 AS BIGINT) AS dim,
        |  CAST(sum(CASE WHEN ('0x' || substr(md5(tok), 3, 1))::UBIGINT % 2 = 0
        |               THEN 1 ELSE -1 END) AS BIGINT) AS weight
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY 1, 2""".stripMargin,
    "q_textrank" -> textRankSql(5, 30),
    // corpus-derived stoplist (df >= 80% of docs), order-preserving rebuild
    "q_stopword_prune" ->
      """WITH toks AS (SELECT doc_id,
        |         unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |       FROM documents),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |stop AS (SELECT tok FROM (SELECT tok, count(DISTINCT doc_id) AS dfq FROM toks GROUP BY 1)
        |         CROSS JOIN n WHERE dfq >= n_docs * 0.8),
        |kept AS (SELECT doc_id, pos, tok FROM toks
        |         WHERE tok NOT IN (SELECT tok FROM stop))
        |SELECT doc_id, count(*) AS n_kept,
        |  string_agg(tok, ' ' ORDER BY pos) AS pruned_text
        |FROM kept GROUP BY 1""".stripMargin,
    // add-one-smoothed corpus unigram LM; ppl derives from the ROUNDED
    // nll so both engines exponentiate the same value
    // λ = 0.75 interpolation; the first token of each doc has no prev
    // and is excluded from the bigram stream in both engines
    "q_bigram_lm" ->
      """WITH toks AS (SELECT doc_id,
        |        CAST(unnest(range(1, len(l) + 1)) - 1 AS BIGINT) AS pos,
        |        unnest(l) AS tok
        |      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
        |bi AS (SELECT doc_id, tok,
        |         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |       FROM toks),
        |bi2 AS (SELECT doc_id, prev, tok FROM bi WHERE prev IS NOT NULL),
        |bic AS (SELECT prev, tok, count(*) AS c2 FROM bi2 GROUP BY 1, 2),
        |uc AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS t,
        |          CAST(count(*) AS DOUBLE) AS v FROM uc),
        |d AS (SELECT b.doc_id, count(*) AS n_bigrams,
        |        round(avg(-ln(
        |          0.75 * CAST(c.c2 AS DOUBLE) / up.c1 +
        |          0.25 * CAST(uw.c1 + 1 AS DOUBLE) / (tot.t + tot.v))), 4)
        |          AS nll
        |      FROM bi2 b
        |      JOIN bic c ON b.prev = c.prev AND b.tok = c.tok
        |      JOIN uc up ON b.prev = up.tok
        |      JOIN uc uw ON b.tok = uw.tok
        |      CROSS JOIN tot
        |      GROUP BY 1)
        |SELECT doc_id, n_bigrams, nll, round(exp(nll), 2) AS ppl FROM d""".stripMargin,
    // Kneser-Ney: same IEEE expression tree as the Spark side —
    // discounted ML term + D·N1+(prev,·)/c(prev) · continuation prob
    "q_kneser_ney" ->
      """WITH toks AS (SELECT doc_id,
        |        CAST(unnest(range(1, len(l) + 1)) - 1 AS BIGINT) AS pos,
        |        unnest(l) AS tok
        |      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
        |bi AS (SELECT doc_id, tok,
        |         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |       FROM toks),
        |bi2 AS (SELECT doc_id, prev, tok FROM bi WHERE prev IS NOT NULL),
        |bic AS (SELECT prev, tok, count(*) AS c2 FROM bi2 GROUP BY 1, 2),
        |ctx AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS cp,
        |          count(*) AS n1p_prev FROM bic GROUP BY 1),
        |cont AS (SELECT tok, count(*) AS n1p_tok FROM bic GROUP BY 1),
        |tot AS (SELECT count(*) AS n_types FROM bic),
        |d AS (SELECT b.doc_id, count(*) AS n_bigrams,
        |        round(avg(-ln(
        |          (CAST(c.c2 AS DOUBLE) - 0.75) / x.cp +
        |          0.75 * CAST(x.n1p_prev AS DOUBLE) / x.cp *
        |            (CAST(w.n1p_tok AS DOUBLE) / tot.n_types))), 4) AS nll
        |      FROM bi2 b
        |      JOIN bic c ON b.prev = c.prev AND b.tok = c.tok
        |      JOIN ctx x ON b.prev = x.prev
        |      JOIN cont w ON b.tok = w.tok
        |      CROSS JOIN tot
        |      GROUP BY 1)
        |SELECT doc_id, n_bigrams, nll, round(exp(nll), 2) AS ppl FROM d""".stripMargin,
    // weighted Jaccard: Σmin/(|q|+|d|−Σmin) in exact integer ppm
    "q_doc_jaccard_topk" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |q AS (SELECT doc_id AS qid, tok, tf AS qtf FROM tf WHERE doc_id < 10),
        |i AS (SELECT q.qid, t.doc_id AS did,
        |        CAST(sum(least(t.tf, q.qtf)) AS BIGINT) AS inter
        |      FROM tf t JOIN q ON t.tok = q.tok AND t.doc_id <> q.qid
        |      GROUP BY 1, 2),
        |s AS (SELECT i.qid, i.did,
        |        CAST(i.inter * 1000000 // (ql.dl + dd.dl - i.inter) AS BIGINT) AS sim_ppm
        |      FROM i JOIN dl ql ON i.qid = ql.doc_id
        |      JOIN dl dd ON i.did = dd.doc_id)
        |SELECT qid, did, sim_ppm, rnk FROM (
        |  SELECT qid, did, sim_ppm,
        |    CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY sim_ppm DESC, did) AS BIGINT) AS rnk
        |  FROM s)
        |WHERE rnk <= 5""".stripMargin,
    "q_vocab_coverage" ->
      """WITH uc AS (SELECT tok, count(*) AS c FROM
        |        (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |      GROUP BY 1),
        |r AS (SELECT c, CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rnk
        |      FROM uc),
        |wide AS (SELECT CAST(sum(c) AS BIGINT) AS total,
        |    count(*) AS n_vocab,
        |    CAST(sum(CASE WHEN rnk <= 10 THEN c ELSE 0 END) AS BIGINT) AS c10,
        |    CAST(sum(CASE WHEN rnk <= 100 THEN c ELSE 0 END) AS BIGINT) AS c100,
        |    CAST(sum(CASE WHEN rnk <= 1000 THEN c ELSE 0 END) AS BIGINT) AS c1000
        |  FROM r)
        |SELECT CAST(10 AS BIGINT) AS k,
        |  CAST(c10 * 1000000 // total AS BIGINT) AS covered_ppm,
        |  n_vocab, total AS total_tokens FROM wide
        |UNION ALL SELECT 100, CAST(c100 * 1000000 // total AS BIGINT),
        |  n_vocab, total FROM wide
        |UNION ALL SELECT 1000, CAST(c1000 * 1000000 // total AS BIGINT),
        |  n_vocab, total FROM wide""".stripMargin,
    "q_dataset_card" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS dup_docs
        |FROM documents GROUP BY 1""".stripMargin,
    // lift = c_ab·N/(c_a·c_b) in exact integer ppm; support gate c2 ≥ 10
    "q_phrase_search" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok,
        |    generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents)
        |SELECT a.doc_id, count(*) AS n_occ
        |FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |WHERE a.tok = 'hash' AND b.tok = 'join'
        |GROUP BY 1""".stripMargin,
    "q_collocations" ->
      """WITH toks AS (SELECT doc_id,
        |        CAST(unnest(range(1, len(l) + 1)) - 1 AS BIGINT) AS pos,
        |        unnest(l) AS tok
        |      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
        |bi AS (SELECT doc_id, tok,
        |         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |       FROM toks),
        |bic AS (SELECT prev, tok, count(*) AS c2 FROM bi
        |        WHERE prev IS NOT NULL GROUP BY 1, 2),
        |uc AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM toks),
        |s AS (SELECT b.prev, b.tok, b.c2, ua.c1 AS ca, ub.c1 AS cb,
        |        CAST((CAST(b.c2 AS HUGEINT) * tot.n * 1000000)
        |          // (CAST(ua.c1 AS HUGEINT) * ub.c1) AS BIGINT) AS lift_ppm
        |      FROM bic b
        |      JOIN uc ua ON b.prev = ua.tok
        |      JOIN uc ub ON b.tok = ub.tok
        |      CROSS JOIN tot
        |      WHERE b.c2 >= 10)
        |SELECT prev, tok, c2, ca, cb, lift_ppm FROM s
        |WHERE lift_ppm >= 1200000""".stripMargin,
    "q_perplexity" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t, CAST(count(*) AS DOUBLE) AS v FROM cnt),
        |d AS (SELECT doc_id, count(*) AS n_tokens,
        |        round(avg(-ln(CAST(cnt + 1 AS DOUBLE) / (t + v))), 4) AS nll
        |      FROM toks JOIN cnt USING (tok) CROSS JOIN tot
        |      GROUP BY 1)
        |SELECT doc_id, n_tokens, nll, round(exp(nll), 2) AS ppl FROM d""".stripMargin,
    "q_repetition_stats" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |tok AS (SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct_tokens,
        |          max(c) AS top_tok
        |        FROM (SELECT doc_id, g, count(*) AS c
        |              FROM (SELECT doc_id, unnest(l) AS g FROM t) GROUP BY 1, 2)
        |        GROUP BY 1),
        |bg AS (SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram
        |       FROM (SELECT doc_id, g, count(*) AS c
        |             FROM (SELECT doc_id,
        |                     unnest(list_transform(range(1, len(l)),
        |                       i -> l[i] || ' ' || l[i+1])) AS g
        |                   FROM t) GROUP BY 1, 2)
        |       GROUP BY 1)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_distinct_tokens AS BIGINT) AS n_distinct_tokens,
        |  round(CAST(top_tok AS DOUBLE) / n_tokens, 4) AS top_tok_frac,
        |  round(CAST(top_bigram AS DOUBLE) / n_bigrams, 4) AS top_bigram_frac
        |FROM tok JOIN bg USING (doc_id)""".stripMargin,
    // rational tf-idf (tf * N / df, no log) ranks identically in any IEEE
    // engine; ranking runs through the native TopKPerKey operator
    "q_tfidf_topk" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT tok, count(*) AS dfq FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (SELECT doc_id, tok,
        |             round(CAST(tf * n AS DOUBLE) / dfq, 6) AS score
        |           FROM tf JOIN dfq USING (tok) CROSS JOIN n)
        |SELECT doc_id, tok, score, rnk FROM (
        |  SELECT doc_id, tok, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, tok) AS BIGINT) AS rnk
        |  FROM scored)
        |WHERE rnk <= 3""".stripMargin,
    // rational BM25: per-term scores are exact fixed-point integers
    // (num div den), so the per-doc sum is order-free in both engines;
    // HUGEINT keeps DuckDB's products exact like Spark's decimal(38,0)
    "q_bm25_topk" ->
      s"""WITH ${retrievalListCtes(20, 10)}
         |SELECT qid, id AS doc_id, score_fp, rnk FROM lex""".stripMargin,
    "q_lexical_diversity" ->
      """WITH t AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c FROM
        |    (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |     FROM documents) GROUP BY 1, 2),
        |a AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |    CAST(sum(c * (c - 1)) AS BIGINT) AS coll
        |  FROM t GROUP BY 1)
        |SELECT lang, n_tokens, n_types, n_hapax,
        |  CAST(n_types * 1000000 // n_tokens AS BIGINT) AS ttr_ppm,
        |  CAST(n_hapax * 1000000 // n_types AS BIGINT) AS hapax_ppm,
        |  CAST(coll::HUGEINT * 1000000
        |    // (n_tokens::HUGEINT * (n_tokens - 1)) AS BIGINT) AS simpson_ppm
        |FROM a""".stripMargin,
    "q_naive_bayes" ->
      """WITH toks AS (SELECT doc_id, lang,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM toks GROUP BY 1, 2),
        |lt AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1),
        |vocab AS (SELECT DISTINCT tok FROM cnt),
        |vn AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
        |grid AS (SELECT lt.lang AS mlang, vocab.tok,
        |    CAST(floor(ln((COALESCE(cnt.c, 0) + 1)::DOUBLE
        |      / (lt.t + vn.v)::DOUBLE) * 1e6) AS BIGINT) AS w
        |  FROM vocab CROSS JOIN lt CROSS JOIN vn
        |  LEFT JOIN cnt ON cnt.lang = lt.lang AND cnt.tok = vocab.tok),
        |prior AS (SELECT d.lang AS mlang,
        |    CAST(floor(ln(d.nd::DOUBLE / n.n::DOUBLE) * 1e6) AS BIGINT)
        |      AS prior_w
        |  FROM (SELECT lang, count(*) AS nd FROM documents GROUP BY 1) d
        |  CROSS JOIN (SELECT count(*) AS n FROM documents) n),
        |sc AS (SELECT t.doc_id, t.lang, g.mlang,
        |    CAST(sum(g.w) AS BIGINT) AS tok_w
        |  FROM toks t JOIN grid g USING (tok) GROUP BY 1, 2, 3),
        |pick AS (SELECT sc.doc_id, sc.lang, sc.mlang,
        |    row_number() OVER (PARTITION BY sc.doc_id
        |      ORDER BY sc.tok_w + p.prior_w DESC, sc.mlang) AS rn
        |  FROM sc JOIN prior p USING (mlang))
        |SELECT lang, mlang AS pred_lang, CAST(count(*) AS BIGINT) AS n_docs
        |FROM pick WHERE rn = 1 GROUP BY 1, 2""".stripMargin,
    "q_chi2_features" ->
      """WITH pres AS (SELECT DISTINCT doc_id, lang, tok FROM
        |    (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |     FROM documents)),
        |aa AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS a
        |  FROM pres GROUP BY 1, 2),
        |ln_ AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl
        |  FROM documents GROUP BY 1),
        |dt AS (SELECT tok, CAST(count(*) AS BIGINT) AS dft
        |  FROM pres GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |sc AS (SELECT aa.lang, aa.tok,
        |    CAST(nn.n::HUGEINT
        |      * (aa.a::HUGEINT * (nn.n - ln_.nl - dt.dft + aa.a)
        |         - (ln_.nl - aa.a)::HUGEINT * (dt.dft - aa.a))
        |      * (aa.a::HUGEINT * (nn.n - ln_.nl - dt.dft + aa.a)
        |         - (ln_.nl - aa.a)::HUGEINT * (dt.dft - aa.a))
        |      * 1000
        |      // (ln_.nl::HUGEINT * (nn.n - ln_.nl) * dt.dft * (nn.n - dt.dft))
        |      AS BIGINT) AS chi2_milli
        |  FROM aa JOIN ln_ USING (lang) JOIN dt USING (tok) CROSS JOIN nn
        |  WHERE aa.a::HUGEINT * (nn.n - ln_.nl - dt.dft + aa.a)
        |      > (ln_.nl - aa.a)::HUGEINT * (dt.dft - aa.a)),
        |rk AS (SELECT lang, tok, chi2_milli, CAST(row_number() OVER (
        |    PARTITION BY lang ORDER BY chi2_milli DESC, tok ASC) AS BIGINT)
        |    AS rnk
        |  FROM sc)
        |SELECT lang, tok, chi2_milli, rnk FROM rk WHERE rnk <= 10""".stripMargin,
    "q_cdc_chunks" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
        |       FROM documents),
        |b AS (SELECT doc_id, pos, tok,
        |        CASE WHEN ('0x' || substr(md5('cdc:' || tok), 1, 4))::UBIGINT % 16 = 0
        |             THEN 1 ELSE 0 END AS is_b
        |      FROM toks),
        |c AS (SELECT doc_id, pos, tok,
        |        coalesce(sum(is_b) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
        |      FROM b)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  count(*) AS n_tokens, CAST(min(pos) AS BIGINT) AS first_pos,
        |  md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
        |FROM c GROUP BY 1, 2""".stripMargin,
  )
}
