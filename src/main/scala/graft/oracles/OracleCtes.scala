package graft.oracles

/** Shared DuckDB-oracle CTE fragments and SQL builders used by the
  * per-family oracle maps (split out of SparkEntry in r11; content
  * unchanged). Cross-family fragments (shingle CTEs, cosine helpers,
  * markov/stump/walk builders) live here so family files hold ONLY
  * their `"q_*" -> sql` entries.
  */
private[graft] object OracleCtes {

  /** Shared CTE: the deterministic LSP/DPC message log derived from
    * `events` (mirrors [[LspAnalytics.messageLog]]). */
  val logCte: String =
    """WITH log AS (
      |  SELECT event_id, user_id AS connid,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seqnum,
      |    CASE WHEN event_type = 'signup' THEN 'j'
      |         WHEN event_type = 'purchase' THEN 'c ' || md5(CAST(event_id AS VARCHAR)) || ' aaaa zzzz'
      |         WHEN event_type = 'click' THEN 'f abcd'
      |         WHEN event_type = 'error' THEN 'x'
      |         ELSE '' END AS payload
      |  FROM events)""".stripMargin

  /** Fixed-point q12 squared distance — the [[graft.similarity
    * .Similarity]] cellDist contract: per-dim floor((aᵢ−bᵢ)²·10¹²+½)
    * as BIGINT, summed left-to-right. */
  def kmppDist(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, 65), i -> " +
      s"CAST(floor(($a[i] - $b[i]) * ($a[i] - $b[i]) * 1e12 + 0.5) " +
      s"AS BIGINT)), (x, y) -> x + y)"

  /** k-means|| oracle: unrolled rounds — per round the min quantized
    * distance to the accumulated seed set, the HUGEINT total, the
    * salted-md5 accept draw, and the seed-set union; then the
    * nearest-seed weighting pass. Seed/dist/draw arithmetic replays the
    * Spark side bit-for-bit (seeds are raw data points, never rounded;
    * the accept test cross-multiplies integers). */
  /** k-center oracle: the farthest-point traversal unrolled — per pick
    * the min quantized distance to the accumulated set, the (d DESC,
    * vec_id) argmax, and the set union; replays
    * [[graft.similarity.Similarity.qKcenterCoreset]] exactly. */
  def kcenterSql(k: Int): String = {
    val rounds = (1 until k).map { r =>
      s"""d$r AS MATERIALIZED (SELECT e.vec_id,
         |    min(${kmppDist("e.xs", "m.ms")}) AS d
         |  FROM e CROSS JOIN m${r - 1} m GROUP BY 1),
         |p$r AS (SELECT vec_id, d FROM d$r ORDER BY d DESC, vec_id LIMIT 1),
         |m$r AS MATERIALIZED (SELECT * FROM m${r - 1} UNION ALL
         |  SELECT e.vec_id AS cid, e.xs AS ms
         |  FROM e JOIN p$r ON e.vec_id = p$r.vec_id)""".stripMargin
    }.mkString(",\n")
    val picks = (1 until k).map(r =>
      s"SELECT CAST($r AS BIGINT) AS pick_order, vec_id, d AS radius_fp FROM p$r")
      .mkString("\nUNION ALL ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs FROM embeddings),
       |m0 AS (SELECT vec_id AS cid, xs AS ms FROM e
       |  WHERE vec_id = (SELECT min(vec_id) FROM e)),
       |$rounds
       |SELECT CAST(0 AS BIGINT) AS pick_order,
       |  (SELECT min(vec_id) FROM e) AS vec_id,
       |  CAST(0 AS BIGINT) AS radius_fp
       |UNION ALL $picks""".stripMargin
  }

  /** Louvain oracle: unrolled synchronous move rounds — per round the
    * neighbor-community weight census, the Σtot table, the integer
    * modularity-gain score, and the (score DESC, comm ASC) argmax —
    * then the final per-community census, replaying
    * [[graft.graph.GraphOps.qLouvain]]. */
  def louvainSql(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { t =>
      s"""n$t AS (SELECT a.src, l.lbl AS comm, CAST(sum(a.w) AS BIGINT) AS kiin
         |  FROM arcs a JOIN l${t - 1} l ON a.dst = l.node GROUP BY 1, 2),
         |c$t AS (SELECT src, comm, CAST(sum(kiin) AS BIGINT) AS kiin FROM (
         |    SELECT src, comm, kiin FROM n$t
         |    UNION ALL SELECT node, lbl, 0 FROM l${t - 1}) GROUP BY 1, 2),
         |st$t AS (SELECT l.lbl AS comm, CAST(sum(kk.kw) AS BIGINT) AS sig
         |  FROM l${t - 1} l JOIN k kk ON l.node = kk.node GROUP BY 1),
         |sc$t AS (SELECT c.src, c.comm,
         |    CAST((SELECT w2 FROM m2) AS HUGEINT) * c.kiin
         |      - CAST(kk.kw AS HUGEINT) * (st.sig -
         |        CASE WHEN c.comm = l.lbl THEN kk.kw ELSE 0 END) AS score
         |  FROM c$t c JOIN l${t - 1} l ON c.src = l.node
         |  JOIN k kk ON c.src = kk.node
         |  JOIN st$t st ON c.comm = st.comm),
         |l$t AS MATERIALIZED (SELECT src AS node, comm AS lbl FROM (
         |    SELECT src, comm, row_number() OVER (PARTITION BY src
         |      ORDER BY score DESC, comm) AS rn FROM sc$t) WHERE rn = 1)"""
        .stripMargin
    }.mkString(",\n")
    s"""$copurchaseCte,
       |arcs AS MATERIALIZED (SELECT u AS src, v AS dst, support AS w FROM und
       |  UNION ALL SELECT v, u, support FROM und),
       |k AS MATERIALIZED (SELECT src AS node, CAST(sum(w) AS BIGINT) AS kw
       |  FROM arcs GROUP BY 1),
       |m2 AS (SELECT CAST(sum(w) AS BIGINT) AS w2 FROM arcs),
       |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM arcs),
       |$roundCtes,
       |in2 AS (SELECT la.lbl AS community, CAST(sum(a.w) AS BIGINT) AS in2_w
       |  FROM arcs a JOIN l$rounds la ON a.src = la.node
       |  JOIN l$rounds lb ON a.dst = lb.node AND la.lbl = lb.lbl GROUP BY 1),
       |tot AS (SELECT l.lbl AS community, CAST(count(*) AS BIGINT) AS n_nodes,
       |    CAST(sum(kk.kw) AS BIGINT) AS tot_w
       |  FROM l$rounds l JOIN k kk ON l.node = kk.node GROUP BY 1)
       |SELECT t.community, t.n_nodes, t.tot_w,
       |  coalesce(i.in2_w, 0) AS in2_w,
       |  CAST(CAST(coalesce(i.in2_w, 0) AS HUGEINT) * (SELECT w2 FROM m2)
       |    - CAST(t.tot_w AS HUGEINT) * t.tot_w AS BIGINT) AS q_num
       |FROM tot t LEFT JOIN in2 i ON t.community = i.community""".stripMargin
  }

  /** Boosted-stumps oracle: candidate grid + per-round conditional
    * split census, BigInt-free argmax via HUGEINT cross-multiplied
    * NOT EXISTS (gain comparison never divides), truncating leaf
    * divisions, residual update — replaying
    * [[graft.pipeline.BoostedStumps.qBoostedStumps]] exactly. */
  /** The WITH-body fragment of [[boostedStumpsSql]] (features,
    * candidate grid, unrolled split/update rounds ending at
    * `p<rounds>` / `r<rounds>` / `a<rounds>`) — shared with the
    * capstone v6 oracle. */
  /** The shared stump feature table (`f`). */
  val stumpFeatureCte: String =
    """f AS MATERIALIZED (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS f1,
      |    CAST(n_chars AS BIGINT) AS f2,
      |    CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS BIGINT) AS f3,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 1000000 AS y
      |  FROM documents)""".stripMargin

  /** One stump TRAINING program over `f WHERE <trainWhere>` with every
    * CTE name prefixed by `p` — instantiable per cross-validation fold
    * (grid and residuals both derive from the training slice only). */
  def stumpTrainCtes(
      rounds: Int, p: String, trainWhere: String): String = {
    def featC(a: String) =
      s"(CASE c.fe WHEN 'f1' THEN $a.f1 WHEN 'f2' THEN $a.f2 ELSE $a.f3 END)"
    val roundCtes = (1 to rounds).map { t =>
      s"""${p}s$t AS (SELECT c.fe, c.th,
         |    CAST(sum(CASE WHEN ${featC("r")} <= c.th THEN 1 ELSE 0 END) AS BIGINT) AS nl,
         |    CAST(sum(CASE WHEN ${featC("r")} <= c.th THEN r.r ELSE 0 END) AS BIGINT) AS sl,
         |    CAST(count(*) AS BIGINT) AS n, CAST(sum(r.r) AS BIGINT) AS st
         |  FROM ${p}r${t - 1} r CROSS JOIN ${p}c c GROUP BY 1, 2),
         |${p}g$t AS (SELECT fe, th, nl, sl, n - nl AS nr, st - sl AS sr,
         |    CAST(sl AS HUGEINT) * (n - nl) - CAST(st - sl AS HUGEINT) * nl AS num,
         |    CAST(nl AS HUGEINT) * (n - nl) AS den
         |  FROM ${p}s$t WHERE nl > 0 AND nl < n),
         |${p}p$t AS (SELECT fe, th, nl, sl // nl AS dl, sr // nr AS dr
         |  FROM ${p}g$t g
         |  WHERE NOT EXISTS (SELECT 1 FROM ${p}g$t h WHERE
         |      h.num * h.num * g.den > g.num * g.num * h.den
         |      OR (h.num * h.num * g.den = g.num * g.num * h.den
         |          AND (h.fe < g.fe OR (h.fe = g.fe AND h.th < g.th))))),
         |${p}r$t AS MATERIALIZED (SELECT r.doc_id, r.f1, r.f2, r.f3,
         |    r.r - (CASE WHEN (CASE p.fe WHEN 'f1' THEN r.f1
         |      WHEN 'f2' THEN r.f2 ELSE r.f3 END) <= p.th
         |      THEN p.dl ELSE p.dr END) AS r
         |  FROM ${p}r${t - 1} r CROSS JOIN ${p}p$t p),
         |${p}a$t AS (SELECT CAST(sum(abs(r)) AS BIGINT) AS ar FROM ${p}r$t)"""
        .stripMargin
    }.mkString(",\n")
    s"""${p}bb AS (SELECT min(f1) AS mn1, max(f1) AS mx1, min(f2) AS mn2,
       |    max(f2) AS mx2, min(f3) AS mn3, max(f3) AS mx3
       |  FROM f WHERE $trainWhere),
       |${p}c AS MATERIALIZED (SELECT fe, mn + ((mx - mn) * i) // 8 AS th
       |  FROM (SELECT 'f1' AS fe, mn1 AS mn, mx1 AS mx FROM ${p}bb
       |        UNION ALL SELECT 'f2', mn2, mx2 FROM ${p}bb
       |        UNION ALL SELECT 'f3', mn3, mx3 FROM ${p}bb) fx,
       |       generate_series(1, 7) gs(i)),
       |${p}r0 AS MATERIALIZED (SELECT doc_id, f1, f2, f3, y AS r
       |  FROM f WHERE $trainWhere),
       |$roundCtes""".stripMargin
  }

  def boostedStumpsCtes(rounds: Int): String =
    s"$stumpFeatureCte,\n${stumpTrainCtes(rounds, "", "TRUE")}"

  /** k-fold stump cross-validation oracle: one full training program
    * per fold (prefixed CTEs, grid from the training slice only), then
    * the held-out MAE census — replaying
    * [[graft.pipeline.BoostedStumps.qStumpCrossval]]. */
  def stumpCrossvalSql(folds: Int, rounds: Int): String = {
    val programs = (0 until folds).map(f =>
      stumpTrainCtes(rounds, s"cv${f}_", s"doc_id % $folds <> $f"))
      .mkString(",\n")
    val evals = (0 until folds).map { f =>
      val joins = (1 to rounds)
        .map(t => s"CROSS JOIN cv${f}_p$t m$t").mkString(" ")
      val pred = (1 to rounds).map(t =>
        s"(CASE WHEN (CASE m$t.fe WHEN 'f1' THEN t.f1 WHEN 'f2' THEN t.f2" +
          s" ELSE t.f3 END) <= m$t.th THEN m$t.dl ELSE m$t.dr END)")
        .mkString(" + ")
      s"""SELECT CAST($f AS BIGINT) AS fold,
         |  (SELECT CAST(count(*) AS BIGINT) FROM f
         |   WHERE doc_id % $folds <> $f) AS n_train,
         |  CAST(count(*) AS BIGINT) AS n_test,
         |  CAST(sum(abs(t.y - ($pred))) AS BIGINT) AS sum_abs_err,
         |  CAST(sum(abs(t.y - ($pred))) AS BIGINT)
         |    // CAST(count(*) AS BIGINT) AS mae_fp
         |FROM f t $joins WHERE t.doc_id % $folds = $f""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH $stumpFeatureCte,
       |$programs
       |$evals""".stripMargin
  }

  def boostedStumpsSql(rounds: Int): String = {
    val snaps = (1 to rounds).map { t =>
      s"""SELECT CAST($t AS BIGINT) AS step, fe AS feature,
         |  th AS threshold, nl AS n_left, dl AS left_fp, dr AS right_fp,
         |  (SELECT ar FROM a$t) AS abs_resid FROM p$t""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH ${boostedStumpsCtes(rounds)}
       |$snaps""".stripMargin
  }

  /** Multiplicative-weights mixture oracle: the per-domain loss census
    * and `rounds` unrolled integer weight updates, replaying
    * [[graft.pipeline.TrainingData.qMixMw]] (truncating division on
    * both engines — the negative-excess agreement). */
  /** Markov removal-effect attribution oracle: transition ppm census +
    * per-chain unrolled hit-probability recurrences — one chain for the
    * full graph and one per removed channel (the event-type universe is
    * fixed across SFs, so channels are literal; replays
    * [[graft.relational.Inference.qMarkovAttribution]]). */
  /** SPRT oracle — the SAME Scala-computed micronat literals as
    * [[graft.relational.Inference.qSprt]] (no engine logarithms). */
  def sprtSql: String = {
    val w1 = math.floor(math.log(0.5 / 0.4) * 1e6).toLong
    val w0 = math.floor(math.log(0.5 / 0.6) * 1e6).toLong
    val a = math.floor(math.log(0.95 / 0.05) * 1e6).toLong
    s"""WITH u AS (SELECT user_id,
       |    min(epoch_us(ts) // 3600000000) AS hour,
       |    CAST(max(CASE WHEN event_type = 'purchase' AND value > 120.0
       |      THEN 1 ELSE 0 END) AS BIGINT) AS conv
       |  FROM events GROUP BY 1),
       |h AS (SELECT hour, CAST(count(*) AS BIGINT) AS n_users,
       |    CAST(sum(conv) AS BIGINT) AS n_conv FROM u GROUP BY 1),
       |w AS (SELECT hour, n_users, n_conv,
       |    n_conv * $w1 + (n_users - n_conv) * $w0 AS llr_mnat FROM h),
       |cm AS (SELECT *, CAST(sum(llr_mnat) OVER (ORDER BY hour) AS BIGINT)
       |    AS cum_llr_mnat FROM w),
       |cr AS (SELECT min(hour) AS cross_hour FROM cm
       |  WHERE cum_llr_mnat >= $a OR cum_llr_mnat <= ${-a}),
       |cl AS (SELECT cm.cum_llr_mnat AS cross_llr FROM cm JOIN cr
       |  ON cm.hour = cr.cross_hour)
       |SELECT cm.hour, cm.n_users, cm.n_conv, cm.llr_mnat,
       |  cm.cum_llr_mnat,
       |  CASE WHEN (SELECT cross_hour FROM cr) IS NULL
       |      OR cm.hour < (SELECT cross_hour FROM cr) THEN 'continue'
       |    WHEN (SELECT cross_llr FROM cl) >= $a THEN 'accept_h1'
       |    ELSE 'accept_h0' END AS decision
       |FROM cm""".stripMargin
  }

  /** The fixed channel universe of the events table (every SF carries
    * all five event types; 'purchase' is the conversion target). */
  val markovChannels = Seq("click", "error", "signup", "view")

  /** Shared Markov-model CTEs: transition ppm table `p`, start census
    * `st`, user total `su`, state universe `states`. */
  val markovModelCtes: String =
    """ev AS MATERIALIZED (SELECT user_id, event_id, event_type,
      |    epoch_us(ts) AS ts_us FROM events),
      |tr AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
      |  FROM (SELECT event_type AS next_type,
      |      lag(event_type) OVER (PARTITION BY user_id
      |        ORDER BY ts_us, event_id) AS prev_type FROM ev)
      |  WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |ot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS out_n
      |  FROM tr GROUP BY 1),
      |p AS MATERIALIZED (SELECT tr.prev_type, tr.next_type,
      |    (tr.n * 1000000) // ot.out_n AS p_ppm
      |  FROM tr JOIN ot ON tr.prev_type = ot.prev_type),
      |st AS MATERIALIZED (SELECT event_type AS s,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM (SELECT user_id, event_type, row_number() OVER (
      |      PARTITION BY user_id ORDER BY ts_us, event_id) AS rn FROM ev)
      |  WHERE rn = 1 GROUP BY 1),
      |su AS (SELECT CAST(sum(n) AS BIGINT) AS nu FROM st),
      |states AS MATERIALIZED (SELECT DISTINCT s FROM (
      |  SELECT prev_type AS s FROM p
      |  UNION SELECT next_type FROM p
      |  UNION SELECT s FROM st))""".stripMargin

  /** One unrolled hit-probability chain with every state in `removed`
    * pinned to 0; ends at `pv<tag>(pv)`. */
  def markovChain(
      tag: String, removed: Seq[String], steps: Int): String = {
    val inList = removed.map("'" + _ + "'").mkString(", ")
    val remCase =
      if (removed.isEmpty) "" else s"WHEN s.s IN ($inList) THEN 0"
    val stepsCtes = (1 to steps).map { t =>
      s"""h$tag$t AS MATERIALIZED (SELECT s.s,
         |    CAST(CASE WHEN s.s = 'purchase' THEN 1000000
         |      $remCase
         |      ELSE coalesce(x.v, 0) END AS BIGINT) AS h
         |  FROM states s LEFT JOIN (
         |    SELECT p.prev_type AS s,
         |      CAST(sum(p.p_ppm * hh.h) // 1000000 AS BIGINT) AS v
         |    FROM p JOIN h$tag${t - 1} hh ON p.next_type = hh.s
         |    GROUP BY 1) x ON s.s = x.s)""".stripMargin
    }.mkString(",\n")
    val remStart =
      if (removed.isEmpty) "coalesce(hh.h, 0)"
      else s"CASE WHEN st.s IN ($inList) THEN 0 ELSE coalesce(hh.h, 0) END"
    s"""h${tag}0 AS (SELECT s, CAST(CASE WHEN s = 'purchase'
       |    THEN 1000000 ELSE 0 END AS BIGINT) AS h FROM states),
       |$stepsCtes,
       |pv$tag AS (SELECT CAST(sum(st.n * ($remStart))
       |    // (SELECT nu FROM su) AS BIGINT) AS pv
       |  FROM st LEFT JOIN h$tag$steps hh ON st.s = hh.s)""".stripMargin
  }

  def markovAttributionSql(steps: Int): String = {
    val chains = (markovChain("f", Nil, steps) +:
      markovChannels.map(c => markovChain(c, Seq(c), steps)))
      .mkString(",\n")
    val effRows = markovChannels.map { c =>
      s"""SELECT '$c' AS channel, (SELECT pv FROM pvf) AS pf,
         |  (SELECT pv FROM pv$c) AS pr""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH $markovModelCtes,
       |$chains,
       |effs AS (SELECT channel, pf, pr, pf - pr AS eff FROM (
       |  $effRows)),
       |tot AS (SELECT CAST(sum(greatest(eff, 0)) AS BIGINT) AS t FROM effs)
       |SELECT channel, pf AS p_full_ppm, pr AS p_removed_ppm,
       |  eff AS effect_ppm,
       |  CAST(CASE WHEN (SELECT t FROM tot) = 0 THEN 0
       |    ELSE (greatest(eff, 0) * 1000000) // (SELECT t FROM tot)
       |    END AS BIGINT) AS attribution_ppm
       |FROM effs""".stripMargin
  }

  /** Exact-Shapley oracle: one chain per coalition (2^k, k = 4), then
    * each channel's weighted marginal sum in ×k! units — replaying
    * [[graft.relational.Inference.qShapleyAttribution]]. */
  def shapleyAttributionSql(steps: Int): String = {
    val ch = markovChannels
    val k = ch.size
    def fact(n: Int): Long = (1 to n).map(_.toLong).product
    val kFact = fact(k)
    def tagOf(s: Set[String]): String =
      "m" + ch.map(c => if (s.contains(c)) "1" else "0").mkString
    val subsets = ch.toSet.subsets().toSeq
    val chains = subsets.map { s =>
      markovChain(tagOf(s), (ch.toSet -- s).toSeq.sorted, steps)
    }.mkString(",\n")
    val rows = ch.map { c =>
      val others = ch.filterNot(_ == c).toSet
      val terms = others.subsets().map { s =>
        val w = fact(s.size) * fact(k - 1 - s.size)
        s"$w * ((SELECT pv FROM pv${tagOf(s + c)})" +
          s" - (SELECT pv FROM pv${tagOf(s)}))"
      }.mkString(" + ")
      s"""SELECT '$c' AS channel,
         |  (SELECT pv FROM pv${tagOf(ch.toSet)}) AS v_full_ppm,
         |  CAST($kFact AS BIGINT) AS k_factorial,
         |  CAST($terms AS BIGINT) AS phi_xkf_ppm,
         |  CAST(($terms) // $kFact AS BIGINT) AS phi_ppm""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH $markovModelCtes,
       |$chains
       |$rows""".stripMargin
  }

  /** q16 rows + per-dim moments + the exact-isqrt chain (ends at
    * `w6(d, n, s, isq)` with `r(vec_id, d, q)` still in scope) — the
    * SQL mirror of `Similarity.whitenStats`, shared by the
    * q_embed_whiten and q_ood_score oracles. */
  val embedWhitenCtes: String =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |r AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS d,
      |        CAST(round(v[i] * 65536) AS BIGINT) AS q
      |      FROM e, generate_series(1, 64) t(i)),
      |st AS (SELECT d, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(q) AS HUGEINT) AS s,
      |    CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS ss
      |  FROM r GROUP BY 1),
      |w1 AS (SELECT d, n, s, n * ss - s * s AS x FROM st),
      |w2 AS (SELECT *, greatest(1::HUGEINT,
      |    CAST(sqrt(CAST(x AS DOUBLE)) AS HUGEINT) + 2) AS r0 FROM w1),
      |w3 AS (SELECT *, (r0 + x // r0) // 2 AS r1 FROM w2),
      |w4 AS (SELECT *, (r1 + x // r1) // 2 AS r2 FROM w3),
      |w5 AS (SELECT *, CASE WHEN r2 * r2 > x THEN r2 - 1 ELSE r2 END
      |  AS r3 FROM w4),
      |w6 AS (SELECT d, n, s, CASE WHEN (r3 + 1) * (r3 + 1) <= x
      |  THEN r3 + 1 ELSE r3 END AS isq FROM w5)""".stripMargin

  /** The WITH-body fragment of [[mixMwSql]] (loss census + unrolled
    * weight rounds, ending at `w<rounds>`) — shared with the capstone
    * v6 oracle so one definition drives both. */
  def mixMwCtes(rounds: Int, etaPpm: Long): String = {
    val roundCtes = (1 to rounds).map { t =>
      s"""t${t - 1} AS (SELECT CAST(sum(w) AS HUGEINT) AS tw,
         |    CAST(sum(w * loss_ppm) AS HUGEINT) AS twl FROM w${t - 1}),
         |w$t AS MATERIALIZED (SELECT source, loss_ppm,
         |    CAST((w * (1000000 + ($etaPpm * (loss_ppm -
         |      (SELECT CAST(twl // tw AS BIGINT) FROM t${t - 1}))) // 1000000))
         |      // 1000000 AS BIGINT) AS w
         |  FROM w${t - 1})""".stripMargin
    }.mkString(",\n")
    s"""l AS MATERIALIZED (SELECT source,
       |    (CAST(sum(CASE WHEN NOT (n_tokens BETWEEN 20 AND 80
       |        AND 5 * n_stop < n_tokens) THEN 1 ELSE 0 END) AS BIGINT)
       |      * 1000000) // CAST(count(*) AS BIGINT) AS loss_ppm
       |  FROM (SELECT source,
       |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |      CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop
       |    FROM documents)
       |  GROUP BY 1),
       |w0 AS (SELECT source, loss_ppm, CAST(1000000 AS BIGINT) AS w FROM l),
       |$roundCtes""".stripMargin
  }

  def mixMwSql(rounds: Int, etaPpm: Long): String = {
    val snaps = (0 to rounds).map { t =>
      s"""SELECT source, CAST($t AS BIGINT) AS step, loss_ppm, w,
         |  CAST((w * 1000000) // (SELECT sum(w) FROM w$t) AS BIGINT)
         |    AS share_ppm FROM w$t""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH ${mixMwCtes(rounds, etaPpm)}
       |$snaps""".stripMargin
  }

  def kmeansParSeedSql(rounds: Int, ell: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""d$r AS MATERIALIZED (SELECT e.vec_id,
         |    min(${kmppDist("e.xs", "s.ms")}) AS d2
         |  FROM e CROSS JOIN s${r - 1} s GROUP BY 1),
         |t$r AS (SELECT CAST(sum(d2) AS HUGEINT) AS tot FROM d$r),
         |a$r AS (SELECT vec_id FROM d$r CROSS JOIN t$r
         |  WHERE CAST(('0x' || substring(md5('kmpp:$r:' || CAST(vec_id AS VARCHAR)), 1, 8))::UBIGINT % 1000000 AS HUGEINT) * tot
         |    < CAST(d2 AS HUGEINT) * ${ell}000000),
         |s$r AS MATERIALIZED (SELECT * FROM s${r - 1} UNION ALL
         |  SELECT e.vec_id AS seed_id, $r AS pick_round, e.xs AS ms
         |  FROM e JOIN a$r ON e.vec_id = a$r.vec_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs FROM embeddings),
       |s0 AS (SELECT vec_id AS seed_id, 0 AS pick_round, xs AS ms FROM e
       |  WHERE vec_id = (SELECT min(vec_id) FROM e)),
       |$roundCtes,
       |assign AS (SELECT vec_id, seed_id FROM (
       |    SELECT e.vec_id, s.seed_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${kmppDist("e.xs", "s.ms")}, s.seed_id) AS rn
       |    FROM e CROSS JOIN s$rounds s) WHERE rn = 1),
       |w AS (SELECT seed_id, count(*) AS n FROM assign GROUP BY 1)
       |SELECT s.seed_id, CAST(s.pick_round AS BIGINT) AS pick_round,
       |  CAST(coalesce(w.n, 0) AS BIGINT) AS weight
       |FROM s$rounds s LEFT JOIN w ON s.seed_id = w.seed_id""".stripMargin
  }

  /** Hilbert oracle: the xy2d transform unrolled — one CTE per bit
    * plane (s = 2¹⁵ … 1), each accumulating the quadrant offset and
    * applying the reflect-and-swap rotation in CASE/bit arithmetic,
    * exactly [[graft.sources.HilbertKernels.xy2d]]. */
  def hilbertSql: String = {
    val steps = (15 to 0 by -1).map { k =>
      val s = 1L << k
      s"""h$k AS (SELECT uid0, qv0,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN 65535 - y ELSE y END ELSE x END AS x,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN 65535 - x ELSE x END ELSE y END AS y,
         |    d + ${s * s} * xor(3 * rx, ry) AS d
         |  FROM (SELECT uid0, qv0, x, y, d,
         |    CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |    CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry FROM h${k + 1}))""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT user_id & 65535 AS uid0,
       |    greatest(CAST(floor(value) AS BIGINT), 0) & 65535 AS qv0 FROM events),
       |h16 AS (SELECT uid0, qv0, uid0 AS x, qv0 AS y, CAST(0 AS BIGINT) AS d FROM q),
       |$steps
       |SELECT d >> 10 AS hbucket, count(*) AS n,
       |  min(uid0) AS u_min, max(uid0) AS u_max,
       |  min(qv0) AS v_min, max(qv0) AS v_max
       |FROM h0 GROUP BY 1""".stripMargin
  }

  /** Shared retrieval-list CTE prefix: the BM25 lexical list
    * `lex(qid, id, score_fp, rnk ≤ kIn)` and the exact-cosine dense
    * list `den(qid, id, sim, rnk ≤ kIn)` — ONE definition consumed by
    * the q_bm25_topk, q_rrf_fusion, and q_ndcg_eval oracles (a BM25
    * constant or tie-break fix must hit all three at once or the
    * oracles silently diverge from the one Spark retriever they
    * share). */
  def retrievalListCtes(nQueries: Int, kIn: Int): String =
    s"""toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |st AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS t FROM dl),
       |dfq AS (SELECT tok, count(*) AS dfq FROM tf GROUP BY 1),
       |qt AS (SELECT DISTINCT doc_id AS qid, tok FROM tf WHERE doc_id < $nQueries),
       |sc AS (SELECT q.qid, f.doc_id,
       |    CAST((44::HUGEINT * f.tf * st.t * (2*(st.n - d.dfq) + 1) * 1000000)
       |      // ((20::HUGEINT * f.tf * st.t + 6 * st.t + 18 * l.dl * st.n)
       |          * (2*d.dfq + 1)) AS BIGINT) AS s
       |  FROM tf f JOIN qt q USING (tok) JOIN dfq d USING (tok)
       |  JOIN dl l ON f.doc_id = l.doc_id CROSS JOIN st
       |  WHERE f.doc_id <> q.qid),
       |agg AS (SELECT qid, doc_id, CAST(sum(s) AS BIGINT) AS score_fp
       |        FROM sc GROUP BY 1, 2),
       |lex AS (SELECT qid, id, score_fp, rnk FROM (
       |    SELECT qid, doc_id AS id, score_fp,
       |      CAST(row_number() OVER (PARTITION BY qid
       |        ORDER BY score_fp DESC, doc_id) AS BIGINT) AS rnk
       |    FROM agg) WHERE rnk <= $kIn),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |dist AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
       |        round(${duckCos("q.v", "c.v")}, 6) AS sim
       |      FROM e q JOIN e c ON q.vec_id < $nQueries AND q.vec_id <> c.vec_id),
       |den AS (SELECT qid, id, sim, rnk FROM (
       |    SELECT qid, nid AS id, sim,
       |      CAST(row_number() OVER (PARTITION BY qid
       |        ORDER BY sim DESC, nid) AS BIGINT) AS rnk
       |    FROM dist) WHERE rnk <= $kIn)""".stripMargin

  /** RRF union + fused ranking over the [[retrievalListCtes]] lists:
    * `fused(qid, id, rrf_fp, n_lists, rnk ≤ kOut)`. */
  def rrfFusedCte(kOut: Int): String =
    s"""u AS (SELECT qid, id, 1000000000 // (60 + rnk) AS c FROM lex
       |      UNION ALL
       |      SELECT qid, id, 1000000000 // (60 + rnk) AS c FROM den),
       |fs AS (SELECT qid, id, CAST(sum(c) AS BIGINT) AS rrf_fp,
       |        count(*) AS n_lists FROM u GROUP BY 1, 2),
       |fused AS (SELECT qid, id, rrf_fp, n_lists, rnk FROM (
       |    SELECT qid, id, rrf_fp, n_lists,
       |      CAST(row_number() OVER (PARTITION BY qid
       |        ORDER BY rrf_fp DESC, id) AS BIGINT) AS rnk
       |    FROM fs) WHERE rnk <= $kOut)""".stripMargin

  /** nDCG oracle: both retriever lists + the RRF fusion (the shared
    * [[retrievalListCtes]] chain), binary share-a-label relevance, and
    * the SAME interpolated weight/prefix literals the Spark plan
    * broadcasts ([[graft.similarity.HybridRetrieval.ndcgWeights]] —
    * one definition, so no engine recomputes a logarithm). */
  def ndcgEvalSql(nQueries: Int, k: Int): String = {
    val wVals = graft.similarity.HybridRetrieval.ndcgWeights(k)
      .map { case (r, w) => s"($r, $w)" }.mkString(", ")
    val cumVals = graft.similarity.HybridRetrieval.ndcgIdealPrefix(k)
      .map { case (c, s) => s"($c, $s)" }.mkString(", ")
    s"""WITH ${retrievalListCtes(nQueries, k)},
       |${rrfFusedCte(k)},
       |lists AS (SELECT 'bm25' AS system, qid, id, rnk FROM lex
       |  UNION ALL SELECT 'dense', qid, id, rnk FROM den
       |  UNION ALL SELECT 'hybrid', qid, id, rnk FROM fused),
       |w(rnk, w_fp) AS (VALUES $wVals),
       |cums(cap, idcg_fp) AS (VALUES $cumVals),
       |lab AS (SELECT vec_id, label FROM embeddings),
       |ql AS (SELECT vec_id AS qid, label AS qlabel FROM lab
       |  WHERE vec_id < $nQueries),
       |dcg AS (SELECT l.system, l.qid,
       |    CAST(sum(CASE WHEN d.label = ql.qlabel THEN w.w_fp ELSE 0 END)
       |      AS BIGINT) AS dcg_fp
       |  FROM lists l JOIN ql ON l.qid = ql.qid
       |  JOIN lab d ON l.id = d.vec_id
       |  JOIN w ON l.rnk = w.rnk
       |  GROUP BY 1, 2),
       |nrel AS (SELECT ql.qid, count(*) AS n_rel FROM lab d
       |  JOIN ql ON d.label = ql.qlabel AND d.vec_id <> ql.qid GROUP BY 1),
       |idcg AS (SELECT qid, idcg_fp FROM nrel
       |  JOIN cums ON cums.cap = least(n_rel, $k) WHERE n_rel > 0),
       |nd AS (SELECT system, d.qid, dcg_fp * 1000000 // idcg_fp AS ndcg_ppm
       |  FROM dcg d JOIN idcg i ON d.qid = i.qid)
       |SELECT system, count(*) AS n_queries,
       |  CAST(sum(ndcg_ppm) // count(*) AS BIGINT) AS mean_ndcg_ppm
       |FROM nd GROUP BY 1""".stripMargin
  }

  /** MRR@k oracle: same lists/judgments as [[ndcgEvalSql]], reciprocal
    * rank of the first relevant hit (0 on a whiff) over the fixed
    * universe×system grid. */
  def mrrEvalSql(nQueries: Int, k: Int): String =
    s"""WITH ${retrievalListCtes(nQueries, k)},
       |${rrfFusedCte(k)},
       |lists AS (SELECT 'bm25' AS system, qid, id, rnk FROM lex
       |  UNION ALL SELECT 'dense', qid, id, rnk FROM den
       |  UNION ALL SELECT 'hybrid', qid, id, rnk FROM fused),
       |lab AS (SELECT vec_id, label FROM embeddings),
       |ql AS (SELECT vec_id AS qid, label AS qlabel FROM lab
       |  WHERE vec_id < $nQueries),
       |fr AS (SELECT l.system, l.qid, CAST(min(l.rnk) AS BIGINT) AS r1
       |  FROM lists l JOIN ql ON l.qid = ql.qid
       |  JOIN lab d ON l.id = d.vec_id
       |  WHERE d.label = ql.qlabel GROUP BY 1, 2),
       |uni AS (SELECT DISTINCT ql.qid FROM lab d
       |  JOIN ql ON d.label = ql.qlabel AND d.vec_id <> ql.qid),
       |grid AS (SELECT s.system, uni.qid FROM uni
       |  CROSS JOIN (VALUES ('bm25'), ('dense'), ('hybrid')) s(system)),
       |rr AS (SELECT g.system,
       |    COALESCE(1000000 // fr.r1, 0) AS rr_ppm,
       |    CASE WHEN fr.r1 IS NOT NULL THEN 1 ELSE 0 END AS hit,
       |    CASE WHEN fr.r1 = 1 THEN 1 ELSE 0 END AS hit1
       |  FROM grid g LEFT JOIN fr
       |    ON g.system = fr.system AND g.qid = fr.qid)
       |SELECT system, CAST(count(*) AS BIGINT) AS n_queries,
       |  CAST(sum(rr_ppm) // count(*) AS BIGINT) AS mean_rr_ppm,
       |  CAST(sum(hit) AS BIGINT) AS n_hit,
       |  CAST(sum(hit1) AS BIGINT) AS n_hit_at_1
       |FROM rr GROUP BY 1""".stripMargin

  /** DuckDB cosine with the same left-to-right fold as the Spark side. */
  def duckCos(a: String, b: String): String =
    s"""(list_reduce(list_transform(range(1, 65), i -> $a[i] * $b[i]), (x, y) -> x + y)
       | / (sqrt(list_reduce(list_transform(range(1, 65), i -> $a[i] * $a[i]), (x, y) -> x + y))
       |   * sqrt(list_reduce(list_transform(range(1, 65), i -> $b[i] * $b[i]), (x, y) -> x + y))))""".stripMargin

  /** Unrolled greedy MMR: one MATERIALIZED pick-CTE per round (each is
    * referenced by every later round — inlining would replay the whole
    * prefix per reference, the k-core/pagerank CTE trap). Integer MMR
    * score `7·rel_fp − 3·max_s` mirrors [[graft.similarity.Similarity
    * .qMmrRerank]] exactly. */
  lazy val mmrSql: String = {
    val k = 5
    val rounds = (2 to k).map { r =>
      val prev = (1 until r).map(i => s"SELECT vec_id FROM p$i")
        .mkString(" UNION ALL ")
      s"""p$r AS MATERIALIZED (
         |  SELECT vec_id, rel_fp FROM (
         |    SELECT s.vec_id, s.rel_fp, s.rel_fp * 7 - max(m.s_fp) * 3 AS score
         |    FROM short s JOIN sims m ON m.a = s.vec_id
         |      AND m.b IN ($prev)
         |    WHERE s.vec_id NOT IN ($prev)
         |    GROUP BY s.vec_id, s.rel_fp)
         |  ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to k).map(r =>
      s"SELECT CAST($r AS BIGINT) AS mmr_rank, vec_id, rel_fp FROM p$r")
      .mkString("\nUNION ALL ")
    s"""WITH e AS (SELECT vec_id,
       |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |      FROM embeddings),
       |q AS (SELECT v FROM e WHERE vec_id = 0),
       |rel AS (SELECT e.vec_id,
       |          CAST(floor(${duckCos("e.v", "q.v")} * 1e12 + 0.5) AS BIGINT) AS rel_fp,
       |          e.v
       |        FROM e, q WHERE e.vec_id <> 0),
       |short AS MATERIALIZED (SELECT vec_id, rel_fp, v FROM rel
       |         ORDER BY rel_fp DESC, vec_id LIMIT 20),
       |sims AS MATERIALIZED (SELECT a.vec_id AS a, b.vec_id AS b,
       |          CAST(floor(${duckCos("a.v", "b.v")} * 1e12 + 0.5) AS BIGINT) AS s_fp
       |        FROM short a JOIN short b ON a.vec_id <> b.vec_id),
       |p1 AS MATERIALIZED (SELECT vec_id, rel_fp FROM short
       |      ORDER BY rel_fp DESC, vec_id LIMIT 1),
       |$rounds
       |$out""".stripMargin
  }

  /** Matryoshka truncation eval (see Similarity.qMrlEval): per-width
    * prefix-truncated cosine top-k vs the full-width truth, integer
    * recall census. */
  def mrlEvalSql(
      nQueries: Int, k: Int, widths: Seq[Int]): String = {
    def cosD(a: String, b: String, d: Int): String =
      s"""(list_reduce(list_transform(range(1, ${d + 1}), i -> $a[i] * $b[i]), (x, y) -> x + y)
         | / (sqrt(list_reduce(list_transform(range(1, ${d + 1}), i -> $a[i] * $a[i]), (x, y) -> x + y))
         |   * sqrt(list_reduce(list_transform(range(1, ${d + 1}), i -> $b[i] * $b[i]), (x, y) -> x + y))))""".stripMargin
    def topkCte(name: String, d: Int): String =
      s"""$name AS MATERIALIZED (SELECT qid, nid FROM (
         |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
         |  FROM (SELECT q.vec_id AS qid, c.vec_id AS nid,
         |          round(${cosD("q.v", "c.v", d)}, 6) AS sim
         |        FROM e q JOIN e c ON q.vec_id < $nQueries AND q.vec_id <> c.vec_id))
         |WHERE rnk <= $k)""".stripMargin
    val widthCtes = widths.map(d => topkCte(s"t$d", d)).mkString(",\n")
    val rows = widths.map { d =>
      s"""SELECT CAST($d AS BIGINT) AS trunc_dim, hits,
         |  CAST((1000000 * hits) // ${nQueries.toLong * k} AS BIGINT) AS recall_ppm
         |FROM (SELECT count(*) AS hits
         |      FROM t$d JOIN truth USING (qid, nid))""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |${topkCte("truth", 64)},
       |$widthCtes
       |$rows""".stripMargin
  }

  /** Exact cosine top-k ANN — the shared oracle for brute force and for
    * every exact-or-exactly-verified accelerated variant (IVF cell
    * pruning, dense-band LSH + exact re-rank). */
  def annTopKSql(k: Int): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |d AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
       |        round(${duckCos("q.v", "c.v")}, 6) AS sim
       |      FROM e q JOIN e c ON q.vec_id < 20 AND q.vec_id <> c.vec_id)
       |SELECT * FROM (SELECT qid, nid, sim,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
       |  FROM d)
       |WHERE rnk <= $k""".stripMargin

  /** Binary-quantization ANN oracle: the full deterministic pipeline —
    * sign-bit code pack (1-based subscripts → bit j−1, matching Spark's
    * 0-based posexplode), Hamming shortlist cut by (distance, id), exact
    * cosine re-rank of the shortlist only. */
  def annBinarySql(k: Int, shortlist: Int): String =
    s"""WITH bits AS (SELECT vec_id, unnest(embedding) AS x,
       |    generate_subscripts(embedding, 1) AS j FROM embeddings),
       |codes AS (SELECT vec_id,
       |    CAST(sum(CASE WHEN x > 0 AND j <= 32 THEN (1::BIGINT << (j - 1))
       |      ELSE 0::BIGINT END) AS BIGINT) AS lo,
       |    CAST(sum(CASE WHEN x > 0 AND j > 32 THEN (1::BIGINT << (j - 33))
       |      ELSE 0::BIGINT END) AS BIGINT) AS hi
       |  FROM bits GROUP BY 1),
       |short AS (SELECT qid, nid, hamming FROM (
       |    SELECT q.vec_id AS qid, c.vec_id AS nid,
       |      CAST(bit_count(xor(q.lo, c.lo)) + bit_count(xor(q.hi, c.hi)) AS BIGINT) AS hamming,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY bit_count(xor(q.lo, c.lo)) + bit_count(xor(q.hi, c.hi)), c.vec_id) AS hrnk
       |    FROM codes q JOIN codes c ON q.vec_id < 20 AND q.vec_id <> c.vec_id)
       |  WHERE hrnk <= $shortlist),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |rr AS (SELECT qid, nid, hamming,
       |    round(${duckCos("q.v", "c.v")}, 6) AS sim
       |  FROM short JOIN e q ON qid = q.vec_id JOIN e c ON nid = c.vec_id)
       |SELECT * FROM (SELECT qid, nid, hamming, sim,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
       |  FROM rr)
       |WHERE rnk <= $k""".stripMargin

  /** Exact 4-token-shingle Jaccard near-dup pairs at threshold 0.5 — the
    * oracle for both the brute-force join and the LSH-accelerated,
    * exact-verified variant (which computes the same relation). */
  /** Shared 4-token-shingle CTE prefix (`sh`, `sizes`) — the SQL mirror
    * of [[graft.dedup.Dedup.shingleArrays]]; every shingle-based oracle
    * must derive from this one definition so they cannot drift. */
  val shingleCte: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |         range(1, greatest(len(l) - 2, 1)),
      |         i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))) AS sh
      |       FROM toks),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1)""".stripMargin

  val exactJaccardSql: String =
    s"""$shingleCte,
      |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT d1, d2, round(jaccard, 6) AS jaccard
      |FROM (SELECT d1, d2, CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS jaccard
      |      FROM pairs JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id)
      |WHERE jaccard >= 0.5""".stripMargin

  /** Funnel oracles shared by the Scala builders and their `*_sql`
    * table-function twins (identical relations, so ONE oracle string
    * each — a drifting copy would silently verify different policies). */
  val sourceCapOracle: String =
    """SELECT source, count(*) AS n_total,
      |  CAST(sum(CASE WHEN rn <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN rn <= 15 THEN doc_id END) AS BIGINT) AS kept_docid_sum
      |FROM (SELECT doc_id, source,
      |        CAST(row_number() OVER (PARTITION BY source
      |          ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
      |      FROM documents)
      |GROUP BY 1""".stripMargin

  val qualityGateOracle: String =
    """SELECT lang, count(*) AS n_total,
      |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  min(CASE WHEN keep THEN n_chars END) AS cut_chars
      |FROM (SELECT lang, n_chars,
      |        CAST(row_number() OVER (PARTITION BY lang
      |          ORDER BY n_chars DESC, doc_id) AS BIGINT) * 1000
      |          <= count(*) OVER (PARTITION BY lang) * 700 + 999 AS keep
      |      FROM documents)
      |GROUP BY 1""".stripMargin

  val splitAssignOracle: String =
    """SELECT doc_id, bucket,
      |  CASE WHEN bucket < 80 THEN 'train'
      |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
      |FROM (SELECT doc_id,
      |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
      |          AS BIGINT) AS bucket
      |      FROM documents)""".stripMargin

  /** q_corpus_build's oracle minus its near-dup CTEs — the four
    * SQL-expressible stages (quality gate, exact-dup removal, split,
    * census) shared by q_corpus_build_exact and q_corpus_build_sql. */
  val corpusBuildExactOracle: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
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
      |           AND d.doc_id NOT IN (SELECT doc_id FROM exact_losers))
      |SELECT CASE WHEN bucket < 80 THEN 'train'
      |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
      |  lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      |FROM (SELECT doc_id, lang, n_tokens,
      |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
      |          AS BIGINT) AS bucket
      |      FROM kept)
      |GROUP BY 1, 2""".stripMargin

  /** Hot-shingle-capped CTE extension: `csh` is the shingle stream with
    * document-frequency > 1000 types removed (the PPJoin boilerplate
    * cap, mirroring Dedup.capHotShingles), `csizes` the per-doc counts
    * over that capped universe. At the test scales the cap is vacuous
    * (no synthetic shingle reaches df 1000) but the oracle expresses the
    * same universe the Spark plan computes over, so the contract holds
    * if the data ever grows a hot key. */
  val cappedShingleCte: String =
    s"""$shingleCte,
      |hot AS (SELECT sh FROM sh GROUP BY 1 HAVING count(*) > 1000),
      |csh AS (SELECT doc_id, sh FROM sh WHERE sh NOT IN (SELECT sh FROM hot)),
      |csizes AS (SELECT doc_id, count(*) AS sz FROM csh GROUP BY 1)""".stripMargin

  /** Exact Jaccard over the capped universe — the oracle for the
    * brute-force shared-shingle join (Dedup.qNgramJaccardPairs). */
  val cappedJaccardSql: String =
    s"""$cappedShingleCte,
      |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |          FROM csh a JOIN csh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT d1, d2, round(jaccard, 6) AS jaccard
      |FROM (SELECT d1, d2, CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS jaccard
      |      FROM pairs JOIN csizes s1 ON d1 = s1.doc_id JOIN csizes s2 ON d2 = s2.doc_id)
      |WHERE jaccard >= 0.5""".stripMargin

  /** Exact quadratic form of the prefix-filtered set-similarity join
    * (Dedup.qSetSimJoin): the prefix filter is LOSSLESS, so the
    * candidate-pruned Spark plan must reproduce this relation exactly.
    * Integer gate 5·∩ ≥ 3·∪; ppm by integer division. */
  val setSimSql: String =
    s"""$shingleCte,
      |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT d1, d2, CAST(inter AS BIGINT) AS inter,
      |  CAST(s1.sz + s2.sz - inter AS BIGINT) AS uni,
      |  CAST((inter * 1000000) // (s1.sz + s2.sz - inter) AS BIGINT) AS jac_ppm
      |FROM pairs JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
      |WHERE 5 * inter >= 3 * (s1.sz + s2.sz - inter)""".stripMargin

  /** Directed containment pairs (see Dedup.qContainmentPairs): integer
    * gate, one division, same capped shingle universe as Jaccard. */
  val containmentSql: String =
    s"""$cappedShingleCte,
      |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |          FROM csh a JOIN csh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
      |          GROUP BY 1, 2)
      |SELECT d1, d2, round(CAST(inter AS DOUBLE) / sz, 6) AS containment
      |FROM pairs JOIN csizes s1 ON d1 = s1.doc_id
      |WHERE sz >= 5 AND inter * 10 >= sz * 9""".stripMargin

  /** Confusion census of banded MinHash vs exact Jaccard (see
    * Dedup.qMinhashEval): md5-permutation signatures (min of the first
    * 60 md5 bits per permutation), band buckets as joined signature
    * slices, counts vs the threshold-0.5 exact-Jaccard relation. */
  def minhashEvalSql(numHashes: Int, bands: Int): String = {
    val rows = numHashes / bands
    val minCols = (0 until numHashes).map { s =>
      s"  min(('0x' || substr(md5('mh$s:' || sh), 1, 15))::UBIGINT::BIGINT) AS m$s"
    }.mkString(",\n")
    val bandRows = (0 until bands).map { b =>
      val bucket = (0 until rows).map(i => s"m${b * rows + i}")
        .mkString(" || ':' || ")
      s"SELECT doc_id, $b AS band, $bucket AS bucket FROM mins"
    }.mkString("\n  UNION ALL ")
    s"""$shingleCte,
       |mins AS MATERIALIZED (SELECT doc_id,
       |$minCols
       |  FROM sh GROUP BY 1),
       |banded AS MATERIALIZED (
       |  $bandRows),
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |         FROM banded a JOIN banded b
       |           ON a.band = b.band AND a.bucket = b.bucket
       |          AND a.doc_id < b.doc_id),
       |truth AS (SELECT d1, d2 FROM (
       |    SELECT p.d1, p.d2,
       |      CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS j
       |    FROM (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2) p
       |    JOIN sizes s1 ON p.d1 = s1.doc_id
       |    JOIN sizes s2 ON p.d2 = s2.doc_id)
       |  WHERE j >= 0.5),
       |conf AS (SELECT c.d1 AS cd1, t.d1 AS td1
       |         FROM cand c FULL OUTER JOIN truth t
       |           ON c.d1 = t.d1 AND c.d2 = t.d2)
       |SELECT tp, fp, fn,
       |  CASE WHEN tp + fp > 0 THEN (1000000 * tp) // (tp + fp) END AS precision_ppm,
       |  CASE WHEN tp + fn > 0 THEN (1000000 * tp) // (tp + fn) END AS recall_ppm
       |FROM (SELECT
       |  CAST(sum(CASE WHEN cd1 IS NOT NULL AND td1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(sum(CASE WHEN cd1 IS NOT NULL AND td1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(sum(CASE WHEN cd1 IS NULL AND td1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS fn
       |  FROM conf)""".stripMargin
  }

  /** Unrolled power-iteration oracle for q_pca_power: the covariance
    * numerator matrix (q16 sufficient statistics, HUGEINT), then
    * [[graft.similarity.Similarity.PcaIters]] exact matrix-vector
    * rounds with sign-split magnitude renormalization — positives-only
    * division, so `//` (truncate) can never diverge from BigInt `/`. */
  val pcaPowerSql: String = {
    val s = graft.similarity.Similarity.PcaScale
    // every multi-referenced CTE is MATERIALIZED: DuckDB inlines by
    // default, and the 60 rounds each reference their predecessor twice
    // (w_k feeds both m_k and p_k) — inlined, the expansion doubles per
    // round and the plan re-opens the parquet thousands of times
    val head =
      """WITH e AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |r AS MATERIALIZED (SELECT vec_id, CAST(i AS INT) AS d,
        |        CAST(round(v[i] * 65536) AS BIGINT) AS q16
        |      FROM e, generate_series(1, 64) t(i)),
        |st AS (SELECT a.d AS i, b.d AS j, count(*) AS n,
        |         sum(a.q16) AS si, sum(b.q16) AS sj,
        |         sum(a.q16 * b.q16) AS spp
        |       FROM r a JOIN r b ON a.vec_id = b.vec_id AND a.d <= b.d
        |       GROUP BY 1, 2),
        |nm AS (SELECT i, j, spp * n - si * sj AS nu FROM st),
        |sym AS MATERIALIZED (SELECT i, j, nu FROM nm
        |        UNION ALL SELECT j, i, nu FROM nm WHERE i <> j),""".stripMargin +
      s"\np0 AS (SELECT DISTINCT d AS i, CAST($s AS HUGEINT) AS x FROM r)"
    val rounds = (1 to graft.similarity.Similarity.PcaIters).map { k =>
      s"""w$k AS MATERIALIZED (SELECT s.i, sum(s.nu * p.x) AS w
         |       FROM sym s JOIN p${k - 1} p ON s.j = p.i GROUP BY 1),
         |m$k AS (SELECT max(abs(w)) AS m FROM w$k),
         |p$k AS MATERIALIZED (SELECT i, CASE WHEN w < 0 THEN -((-w * $s) // m)
         |          ELSE (w * $s) // m END AS x FROM w$k, m$k)""".stripMargin
    }.mkString(",\n")
    val proj =
      s"""SELECT r.vec_id, CAST(sum(r.q16 * p.x) AS BIGINT) AS proj_fp
         |FROM r JOIN p${graft.similarity.Similarity.PcaIters} p ON r.d = p.i
         |GROUP BY 1""".stripMargin
    s"$head,\n$rounds\n$proj"
  }

  /** Unrolled synchronous k-core peel for q_kcore (k = 3): each round
    * drops every node under degree 3 and its arcs. MATERIALIZED per
    * round — e_k feeds both the next survivor set and the next edge
    * filter, and DuckDB's default inlining would double the expansion
    * per round. Converged rounds are identities, so the fixed unroll
    * equals the fixpoint whenever it converges within the budget. */
  // lazy: interpolates copurchaseCte, which is declared LATER in this
  // object — a strict val here would capture null at init order
  lazy val kCoreSql: String = {
    val rounds = graft.graph.GraphOps.KCoreRounds
    val head =
      s"""$copurchaseCte,
         |e0 AS MATERIALIZED (SELECT u AS src, v AS dst FROM und
         |      UNION ALL SELECT v, u FROM und)""".stripMargin
    val peel = (1 to rounds).map { i =>
      s"""k$i AS MATERIALIZED (SELECT src AS node FROM e${i - 1}
         |      GROUP BY 1 HAVING count(*) >= 3),
         |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
         |      SEMI JOIN k$i a ON e.src = a.node
         |      SEMI JOIN k$i b ON e.dst = b.node)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$peel
       |SELECT src AS node, CAST(count(*) AS BIGINT) AS deg_in_core
       |FROM e$rounds GROUP BY 1""".stripMargin
  }

  /** q_audio_frames: the unrolled 16-term code-point energy kernel and
    * the same framing arithmetic as the Spark side, all integers. */
  lazy val audioFramesSql: String = {
    val fl = graft.multimodal.Multimodal.AudioFrame
    val h = graft.multimodal.Multimodal.AudioHop
    val t = graft.multimodal.Multimodal.SilentBelow
    val energy = (0 until fl).map { j =>
      val s = s"CAST(ascii(substr(text, CAST(f * $h + ${j + 1} AS BIGINT), 1)) AS BIGINT)"
      s"$s * $s"
    }.mkString(" +\n      ")
    s"""WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
       |fr AS (SELECT doc_id, text,
       |         CAST((len - $fl) // $h AS BIGINT) + 1 AS n_frames
       |       FROM d WHERE len >= $fl),
       |x AS (SELECT doc_id, text, n_frames,
       |        unnest(range(0, n_frames)) AS f FROM fr),
       |e AS (SELECT doc_id, n_frames, f,
       |      $energy AS energy FROM x)
       |SELECT doc_id, any_value(n_frames) AS n_frames,
       |  CAST(sum(CASE WHEN energy < $t THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_silent,
       |  max(energy) AS max_energy,
       |  coalesce(min(CASE WHEN energy >= $t THEN f END),
       |    any_value(n_frames)) AS lead_silent
       |FROM e GROUP BY doc_id""".stripMargin
  }

  /** q_audio_features: division-free centered samples (c_j = 16·s_j −
    * Σs), integer zero crossings, lag-2..8 autocorrelations with the
    * first-max-lag pitch CASE, and the min-over-max-count pitch mode —
    * mirrors [[graft.multimodal.Multimodal.qAudioFeatures]] exactly. */
  lazy val audioFeaturesSql: String = {
    import graft.multimodal.Multimodal.{AudioFrame, AudioHop, LagMax, LagMin}
    val sCols = (0 until AudioFrame).map { j =>
      s"CAST(ascii(substr(text, CAST(f * $AudioHop + ${j + 1} AS BIGINT), 1)) AS BIGINT) AS s$j"
    }.mkString(",\n        ")
    val ssum = (0 until AudioFrame).map(i => s"s$i").mkString(" + ")
    val cCols = (0 until AudioFrame).map { j =>
      s"$AudioFrame * s$j - ($ssum) AS c$j"
    }.mkString(",\n        ")
    val zcr = (1 until AudioFrame).map { j =>
      s"CASE WHEN c$j * c${j - 1} < 0 THEN 1 ELSE 0 END"
    }.mkString(" + ")
    val rCols = (LagMin to LagMax).map { lag =>
      val terms = (0 until AudioFrame - lag)
        .map(j => s"c$j * c${j + lag}").mkString(" + ")
      s"$terms AS r$lag"
    }.mkString(",\n        ")
    val rmax = s"greatest(${(LagMin to LagMax).map(l => s"r$l").mkString(", ")})"
    val pitch = (LagMin to LagMax).map { l =>
      s"WHEN r$l = rmax THEN CAST($l AS BIGINT)"
    }.mkString("CASE ", " ", " END")
    s"""WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
       |fr AS (SELECT doc_id, text,
       |         CAST((len - $AudioFrame) // $AudioHop AS BIGINT) + 1 AS n_frames
       |       FROM d WHERE len >= $AudioFrame),
       |x AS (SELECT doc_id, text, n_frames,
       |        unnest(range(0, n_frames)) AS f FROM fr),
       |sm AS (SELECT doc_id, n_frames,
       |        $sCols
       |      FROM x),
       |cc AS (SELECT doc_id, n_frames,
       |        $cCols
       |      FROM sm),
       |rr AS (SELECT doc_id, n_frames,
       |        CAST($zcr AS BIGINT) AS zcr,
       |        $rCols
       |      FROM cc),
       |ft AS (SELECT doc_id, n_frames, zcr, rmax, $pitch AS pitch
       |      FROM (SELECT *, $rmax AS rmax FROM rr)),
       |census AS (SELECT doc_id, any_value(n_frames) AS n_frames,
       |        CAST(sum(zcr) AS BIGINT) AS zcr_total,
       |        CAST(sum(CASE WHEN rmax > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |          AS n_voiced
       |      FROM ft GROUP BY 1),
       |pm AS (SELECT doc_id, pitch, count(*) AS c FROM ft GROUP BY 1, 2),
       |md AS (SELECT doc_id, min(pitch) AS pitch_mode FROM (
       |        SELECT doc_id, pitch, c, max(c) OVER (PARTITION BY doc_id) AS mc
       |        FROM pm) WHERE c = mc GROUP BY 1)
       |SELECT census.doc_id, n_frames, zcr_total, n_voiced, pitch_mode
       |FROM census JOIN md ON census.doc_id = md.doc_id""".stripMargin
  }

  /** The deterministic customer change batch (LakeMerge.changeBatch's
    * SQL mirror): heavy customers upsert with `c_acctbal` = order count,
    * mid customers re-send an identical row, order-less keys ≡ 0 (mod 5)
    * insert at key + 1e6, keys ≡ 1 (mod 5) delete. */
  val mergeChangeCte: String =
    """WITH cnts AS (SELECT o_custkey AS c_custkey, count(*) AS cnt
      |              FROM orders GROUP BY 1),
      |src AS (SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
      |          c.c_mktsegment, n.cnt
      |        FROM customer c LEFT JOIN cnts n ON c.c_custkey = n.c_custkey),
      |chg AS (
      |  SELECT c_custkey, c_name, c_nationkey, CAST(cnt AS DOUBLE) AS c_acctbal,
      |    c_mktsegment, 'U' AS op FROM src WHERE cnt >= 15
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, 'U'
      |  FROM src WHERE cnt BETWEEN 10 AND 14
      |  UNION ALL
      |  SELECT c_custkey + 1000000, c_name, c_nationkey, CAST(0.0 AS DOUBLE),
      |    c_mktsegment, 'U' FROM src WHERE cnt IS NULL AND c_custkey % 5 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, 'D'
      |  FROM src WHERE cnt IS NULL AND c_custkey % 5 = 1)""".stripMargin

  /** Support-thresholded co-purchase edges (GraphOps.copurchaseEdges's
    * SQL mirror): canonical part pairs sharing ≥ 2 distinct orders. */
  /** Unrolled fixed-point power iteration for the event-type Markov
    * chain: `iters` rounds of π'ⱼ = (Σᵢ πᵢ·pᵢⱼ) div 10⁶ over the ppm
    * transition census, uniform 10⁶ div K start. The pi-chain is
    * linear (each round referenced once), but `p` and `st` feed every
    * round and are MATERIALIZED. */
  def markovSql(iters: Int): String = {
    val pis = (1 to iters).map { t =>
      s"""pi$t AS (SELECT p.next_type AS state,
         |  CAST(sum(pi${t - 1}.v * p.p_ppm) // 1000000 AS BIGINT) AS v
         |  FROM pi${t - 1} JOIN p ON pi${t - 1}.state = p.prev_type
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    """WITH ev AS (SELECT user_id, event_id, event_type,
      |        epoch_us(ts) AS ts_us FROM events),
      |t AS (SELECT user_id, event_type,
      |        lag(event_type) OVER (PARTITION BY user_id
      |          ORDER BY ts_us, event_id) AS prev_type
      |      FROM ev),
      |tr AS (SELECT prev_type, event_type AS next_type, count(*) AS n
      |       FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |o AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS out_n
      |      FROM tr GROUP BY 1),
      |p AS MATERIALIZED (SELECT tr.prev_type, tr.next_type,
      |       CAST(tr.n * 1000000 // o.out_n AS BIGINT) AS p_ppm
      |     FROM tr JOIN o ON tr.prev_type = o.prev_type),
      |st AS MATERIALIZED (SELECT DISTINCT prev_type AS state FROM tr),
      |k AS (SELECT count(*) AS c FROM st),
      |pi0 AS (SELECT state,
      |  CAST(1000000 // (SELECT c FROM k) AS BIGINT) AS v FROM st),
      |""".stripMargin +
      pis + "\n" +
      s"""SELECT st.state AS event_type,
         |  CAST(coalesce(pi$iters.v, 0) AS BIGINT) AS pi_ppm,
         |  o.out_n AS n_out
         |FROM st LEFT JOIN pi$iters ON st.state = pi$iters.state
         |JOIN o ON st.state = o.prev_type""".stripMargin
  }

  /** Unrolled Luby-MIS replay: `rounds` fixed rounds of the salted-
    * priority elimination (converged rounds are empty no-ops, so the
    * unroll only needs to be ≥ the actual round count — Spark throws
    * past 64, the oracle carries 8, observed convergence ≤ 4 at every
    * SF). Key arithmetic (u32·2³¹ + n) stays in signed-64 exactly as
    * the engine computes it. */
  def lubyMisSql(rounds: Int): String = {
    // every multiply-referenced CTE is MATERIALIZED — without it DuckDB
    // inlines each reference, the u-chain fans out ~3^rounds copies of
    // the base scan, and the planner exhausts file handles on round 8
    val body = (0 until rounds).map { r =>
      s"""p$r AS MATERIALIZED (SELECT n, ('0x' || substring(md5('mis:$r:'
         |    || CAST(n AS VARCHAR)), 1, 8))::UBIGINT::BIGINT
         |    * 2147483648 + n AS k FROM u$r),
         |act$r AS MATERIALIZED (SELECT e.u, e.v FROM und e
         |  JOIN u$r x ON e.u = x.n JOIN u$r y ON e.v = y.n),
         |arc$r AS MATERIALIZED (SELECT u AS a, v AS b FROM act$r
         |  UNION ALL SELECT v, u FROM act$r),
         |nm$r AS (SELECT c.a AS n, min(pb.k) AS mk
         |  FROM arc$r c JOIN p$r pb ON c.b = pb.n GROUP BY 1),
         |win$r AS MATERIALIZED (SELECT p$r.n FROM p$r LEFT JOIN nm$r
         |    ON p$r.n = nm$r.n
         |  WHERE nm$r.mk IS NULL OR p$r.k < nm$r.mk),
         |lose$r AS (SELECT DISTINCT b AS n FROM arc$r
         |  WHERE a IN (SELECT n FROM win$r)),
         |dec$r AS MATERIALIZED (SELECT n, CAST(1 AS BIGINT) AS in_mis,
         |    CAST($r AS BIGINT) AS mis_round FROM win$r
         |  UNION ALL SELECT n, CAST(0 AS BIGINT), CAST($r AS BIGINT)
         |    FROM lose$r),
         |u${r + 1} AS MATERIALIZED (SELECT n FROM u$r
         |  WHERE n NOT IN (SELECT n FROM dec$r))""".stripMargin
    }.mkString(",\n")
    val tail = (0 until rounds).map(r => s"SELECT * FROM dec$r")
      .mkString(" UNION ALL ")
    // concatenation, not an outer stripMargin: the body's own margins
    // are already stripped, and a second pass would eat the first pipe
    // of every line-leading `||` concat operator
    s"$copurchaseCte,\n" +
      "u0 AS MATERIALIZED (SELECT u AS n FROM und" +
      " UNION SELECT v FROM und),\n" +
      body + "\n" +
      s"SELECT n AS node, in_mis, mis_round FROM ($tail)"
  }

  val copurchaseCte: String =
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |und AS (SELECT a.l_partkey AS u, b.l_partkey AS v,
       |          CAST(count(*) AS BIGINT) AS support
       |        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |          AND a.l_partkey < b.l_partkey
       |        GROUP BY 1, 2
       |        HAVING count(*) >= ${graft.graph.GraphOps.CopurchaseMinSupport})""".stripMargin

  /** q_hll_sliding oracle: the q_hll_distinct register replay with an
    * hour dimension, then the trailing-window re-merge as a bounded
    * spine join with elementwise (max) register fold — the same algebra
    * the Spark side's blob re-merge runs, so the estimates match
    * bit-for-bit. */
  def hllSlidingSql(w: Int): String =
    s"""WITH r AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
       |    user_id,
       |    CAST(('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 2))::UBIGINT AS INT) AS bucket,
       |    CAST(('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)), 3, 15))::UBIGINT AS BIGINT) AS v
       |  FROM events),
       |s1 AS (SELECT event_type, hour, bucket, v | (v >> 1) AS x FROM r),
       |s2 AS (SELECT event_type, hour, bucket, x | (x >> 2) AS x FROM s1),
       |s3 AS (SELECT event_type, hour, bucket, x | (x >> 4) AS x FROM s2),
       |s4 AS (SELECT event_type, hour, bucket, x | (x >> 8) AS x FROM s3),
       |s5 AS (SELECT event_type, hour, bucket, x | (x >> 16) AS x FROM s4),
       |s6 AS (SELECT event_type, hour, bucket, x | (x >> 32) AS x FROM s5),
       |b AS (SELECT event_type, hour, bucket,
       |    max(61 - bit_count(x)) AS mj
       |  FROM s6 GROUP BY 1, 2, 3),
       |spine AS (SELECT DISTINCT event_type, hour FROM r),
       |tb AS (SELECT h.event_type, h.hour, p.bucket, max(p.mj) AS mj
       |  FROM spine h JOIN b p ON p.event_type = h.event_type
       |    AND p.hour > h.hour - $w AND p.hour <= h.hour
       |  GROUP BY 1, 2, 3),
       |z AS (SELECT event_type, hour,
       |    sum((1::BIGINT << (61 - mj))::HUGEINT)
       |      + (256 - count(*))::HUGEINT * 2305843009213693952::HUGEINT AS zs,
       |    256 - count(*) AS v0
       |  FROM tb GROUP BY 1, 2),
       |e AS (SELECT event_type, hour,
       |    CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE)/CAST(256.0 AS DOUBLE))
       |      * CAST(65536.0 AS DOUBLE) * CAST(2305843009213693952.0 AS DOUBLE)
       |      / CAST(zs AS DOUBLE) AS est_raw,
       |    v0 FROM z),
       |x AS (SELECT event_type, hour,
       |    round(CASE WHEN est_raw <= 640.0 AND v0 > 0
       |          THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE) / v0)
       |          ELSE est_raw END, 2) AS hll_est
       |  FROM e),
       |ex AS (SELECT h.event_type, h.hour,
       |    count(DISTINCT d.user_id) AS n_exact
       |  FROM spine h JOIN (SELECT DISTINCT event_type, hour, user_id
       |                     FROM r) d
       |    ON d.event_type = h.event_type
       |      AND d.hour > h.hour - $w AND d.hour <= h.hour
       |  GROUP BY 1, 2)
       |SELECT ex.event_type, ex.hour, ex.n_exact, x.hll_est
       |FROM ex JOIN x USING (event_type, hour)""".stripMargin

  /** q_dyadic_quantiles oracle: rebuild the dyadic count-min counter
    * table with the same md5 bucketing (one digest per node, the d CM
    * rows are its 5-hex-char slices), then unroll the top-down trie
    * walk one level per CTE pair (probe the d counters of the candidate
    * node, take bit j when rank + est stays below the target). The
    * Spark side's driver walk and this unroll read the same additive
    * counters, so the match is bit-exact. */
  def dyadicQuantilesSql(levels: Int, d: Int, w: Int): String = {
    val is = (0 until d).mkString(", ")
    val steps = (0 until levels).reverse.map { j =>
      s"""p$j AS MATERIALIZED (
         |  SELECT wk.event_type, wk.q, wk.tgt, wk.v, wk.r,
         |    min(coalesce(c.cnt, 0)) AS est
         |  FROM w${j + 1} wk
         |  CROSS JOIN (SELECT unnest([$is]) AS i) ri
         |  LEFT JOIN counters c ON c.event_type = wk.event_type
         |    AND c.i = ri.i AND c.j = $j
         |    AND c.bucket = ('0x' || substring(md5('dq:' ||
         |      $j || ':' || (wk.v >> $j)), 1 + 5 * ri.i, 5))::UBIGINT % $w
         |  GROUP BY 1, 2, 3, 4, 5),
         |w$j AS MATERIALIZED (
         |  SELECT event_type, q, tgt,
         |    CASE WHEN r + est < tgt THEN v + (1::BIGINT << $j) ELSE v END AS v,
         |    CASE WHEN r + est < tgt THEN r + est ELSE r END AS r
         |  FROM p$j)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS MATERIALIZED (SELECT event_type,
       |    least(CAST(floor(value * 100 + 0.5) AS BIGINT),
       |      (1::BIGINT << $levels) - 1) AS cents FROM events),
       |h AS MATERIALIZED (SELECT event_type, cents, count(*) AS cnt
       |  FROM ev GROUP BY 1, 2),
       |nodes AS (SELECT event_type, cnt, j,
       |    md5('dq:' || j || ':' || (cents >> j)) AS hx
       |  FROM h CROSS JOIN (SELECT unnest(range($levels)) AS j)),
       |st AS (SELECT event_type, cnt, i, j,
       |    ('0x' || substring(hx, 1 + 5 * i, 5))::UBIGINT % $w AS bucket
       |  FROM nodes CROSS JOIN (SELECT unnest([$is]) AS i)),
       |counters AS MATERIALIZED (SELECT event_type, i, j, bucket,
       |    CAST(sum(cnt) AS BIGINT) AS cnt FROM st GROUP BY 1, 2, 3, 4),
       |tg AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM h
       |  GROUP BY 1),
       |w$levels AS (SELECT event_type, q, tgt,
       |    CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT) AS r
       |  FROM (SELECT event_type, 'p50' AS q, (n + 1) // 2 AS tgt FROM tg
       |        UNION ALL
       |        SELECT event_type, 'p95', (19 * n + 19) // 20 FROM tg)),
       |$steps,
       |walked AS (SELECT event_type,
       |    max(CASE WHEN q = 'p50' THEN v END) AS p50_est,
       |    max(CASE WHEN q = 'p95' THEN v END) AS p95_est
       |  FROM w0 GROUP BY 1),
       |cumh AS (SELECT event_type, cents,
       |    sum(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
       |    sum(cnt) OVER (PARTITION BY event_type) AS n
       |  FROM h),
       |exact AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       |    min(CASE WHEN cum * 2 >= n THEN cents END) AS p50_cents,
       |    min(CASE WHEN cum * 20 >= n * 19 THEN cents END) AS p95_cents
       |  FROM cumh GROUP BY 1)
       |SELECT e.event_type, e.n, e.p50_cents, k.p50_est,
       |  e.p95_cents, k.p95_est
       |FROM exact e JOIN walked k USING (event_type)""".stripMargin
  }

  /** q_betweenness oracle: Brandes unrolled level-by-level. Forward
    * pass = multi-source BFS with σ path counts (one CTE pair per
    * level, the bfsSql pattern plus a running seen set); backward pass
    * replays the fixed-point dependency recurrence
    * `(σ_v · (2²⁰ + δ_w)) // σ_w` per predecessor arc, deepest level
    * first — all operands are non-negative, so DuckDB's floor `//`
    * equals Spark's truncating `div` term-for-term. Levels beyond the
    * graph's actual eccentricity are empty identities, so the fixed
    * unroll equals the fixpoint whenever BFS exhausts within it. */
  def betweennessSql(
      nSources: Int, k: Int, depth: Int): String = {
    val fp = 1L << 20
    val fwd = (1 to depth).map { l =>
      s"""f$l AS MATERIALIZED (
         |  SELECT f.s, a.b AS v, CAST(sum(f.sigma) AS BIGINT) AS sigma
         |  FROM f${l - 1} f JOIN arcs a ON f.v = a.a
         |  ANTI JOIN seen${l - 1} sn ON f.s = sn.s AND a.b = sn.v
         |  GROUP BY 1, 2),
         |seen$l AS MATERIALIZED (
         |  SELECT s, v FROM seen${l - 1}
         |  UNION ALL SELECT s, v FROM f$l)""".stripMargin
    }.mkString(",\n")
    val bwd = (depth - 1) to 1 by -1
    val back = bwd.map { l =>
      s"""d$l AS MATERIALIZED (
         |  SELECT f.s, f.v, f.sigma,
         |    CAST(coalesce(sum((f.sigma * ($fp + nx.delta)) // nx.sigma_w),
         |      0) AS BIGINT) AS delta
         |  FROM f$l f
         |  LEFT JOIN (SELECT d.s, a.a AS pv, d.sigma AS sigma_w, d.delta
         |             FROM d${l + 1} d JOIN arcs a ON a.b = d.v) nx
         |    ON nx.s = f.s AND nx.pv = f.v
         |  GROUP BY 1, 2, 3)""".stripMargin
    }.mkString(",\n")
    val union = (1 until depth)
      .map(l => s"SELECT s, v, delta FROM d$l").mkString(" UNION ALL ")
    s"""$copurchaseCte,
       |arcs AS MATERIALIZED (SELECT u AS a, v AS b FROM und
       |  UNION ALL SELECT v, u FROM und),
       |srcs AS (SELECT DISTINCT a AS node FROM arcs
       |  ORDER BY 1 LIMIT $nSources),
       |f0 AS (SELECT node AS s, node AS v, CAST(1 AS BIGINT) AS sigma
       |  FROM srcs),
       |seen0 AS (SELECT s, v FROM f0),
       |$fwd,
       |d$depth AS (SELECT s, v, sigma, CAST(0 AS BIGINT) AS delta
       |  FROM f$depth),
       |$back
       |SELECT v AS node, CAST(sum(delta) AS BIGINT) AS centrality_fp
       |FROM ($union) WHERE v <> s GROUP BY 1
       |ORDER BY 2 DESC, 1 LIMIT $k""".stripMargin
  }

  /** q_mst oracle: Borůvka unrolled round-by-round (the q_bfs_dist /
    * kCore pattern), exact because the (w, u, v) total order makes edge
    * keys distinct, so the minimum spanning forest is UNIQUE — Kruskal
    * (the Spark side's local gate), distributed Borůvka contraction (its
    * scale path) and this unroll all land on the same edge set.
    *
    * Per round: every component picks its lightest outgoing edge under
    * (w, u, v); the picks form a functional pointer graph over component
    * ids whose only cycles are 2-cycles (a longer cycle would need a
    * strictly-decreasing closed key walk). Contraction labels each
    * component by the canonical root (smaller id) of the 2-cycle its
    * pointer path terminates in — a recursive-CTE walk that stays tiny
    * because keys strictly decrease along the path. Converged rounds are
    * identities, so the fixed unroll equals the fixpoint (components at
    * least halve per round; 2^16 covers any fixture SF). */
  lazy val mstSql: String = {
    val rounds = 16
    val head =
      s"""${copurchaseCte.replace("WITH li", "WITH RECURSIVE li")},
         |edges AS MATERIALIZED (SELECT u, v,
         |    CAST(1000000 // support AS BIGINT) AS w, support FROM und),
         |c0 AS MATERIALIZED (SELECT node, node AS c FROM
         |  (SELECT u AS node FROM edges UNION SELECT v FROM edges))""".stripMargin
    val loop = (1 to rounds).map { i =>
      s"""cand$i AS MATERIALIZED (
         |  SELECT cu.c AS ca, cv.c AS cb, e.u, e.v, e.w
         |  FROM edges e JOIN c${i - 1} cu ON e.u = cu.node
         |    JOIN c${i - 1} cv ON e.v = cv.node
         |  WHERE cu.c <> cv.c),
         |pick$i AS MATERIALIZED (
         |  SELECT c, other, u, v, w FROM (
         |    SELECT ca AS c, cb AS other, u, v, w FROM cand$i
         |    UNION ALL SELECT cb, ca, u, v, w FROM cand$i) d$i
         |  QUALIFY row_number() OVER (PARTITION BY c ORDER BY w, u, v) = 1),
         |root$i AS MATERIALIZED (
         |  SELECT p.c AS r FROM pick$i p JOIN pick$i q ON p.other = q.c
         |  WHERE q.other = p.c AND p.c < p.other),
         |reach$i(c, x) AS (
         |  SELECT c, c FROM pick$i
         |  UNION
         |  SELECT r.c, p.other FROM reach$i r JOIN pick$i p ON r.x = p.c),
         |c$i AS MATERIALIZED (
         |  SELECT n.node, coalesce(rt.newc, n.c) AS c
         |  FROM c${i - 1} n LEFT JOIN (
         |    SELECT r.c, min(r.x) AS newc FROM reach$i r
         |    SEMI JOIN root$i t ON r.x = t.r GROUP BY r.c) rt
         |  ON n.c = rt.c)""".stripMargin
    }.mkString(",\n")
    val allPicks = (1 to rounds)
      .map(i => s"SELECT u, v, w FROM pick$i").mkString(" UNION ALL ")
    s"""$head,
       |$loop
       |SELECT f.u, f.v, f.w AS dist, e.support
       |FROM (SELECT DISTINCT u, v, w FROM ($allPicks)) f
       |JOIN edges e ON f.u = e.u AND f.v = e.v""".stripMargin
  }

  /** base-26 len-4 encode of ordinal expression `x`, in DuckDB SQL. */
  /** Shared IVF training prefix (Forgy seed + one fixed-point Lloyd
    * round over the full embedding corpus): ends at `c1`, the trained
    * centroid lists — the SQL mirror of the cached
    * `lloydCentroids(..., "full")` artifact that q_semdedup and
    * q_embedding_outliers both serve. The assignment scan (`a1`) is
    * spelled RELATIONALLY (unnested `rv` joined to per-dim seed rows
    * `c0d`, integer SUM, identical floor-q12 arithmetic) rather than
    * as per-pair list lambdas: DuckDB vectorizes the join form ~40×,
    * which is what lets the sf1 oracle sweep replay the N × cells
    * training inside its per-oracle cap (r14 — the lambda form timed
    * BOTH semdedup doors out at 900 s while Spark finished in
    * seconds). Consumers keep `e` (vector lists), `rv` (unnested),
    * `r` (q16), `c1d` (per-dim trained centroids), `c1` (lists). */
  val ivfTrainCte: String =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |rv AS MATERIALIZED (SELECT vec_id, CAST(i AS INT) AS d, v[i] AS x
      |      FROM e, generate_series(1, 64) t(i)),
      |r AS (SELECT vec_id, d, CAST(round(x * 65536) AS BIGINT) AS q16 FROM rv),
      |cc AS (SELECT greatest(16, (count(*) + 99) // 100) AS nc FROM embeddings),
      |c0d AS (SELECT CAST(vec_id AS INT) AS cell, d, round(x, 6) AS m
      |        FROM rv WHERE vec_id < (SELECT nc FROM cc)),
      |a1 AS (SELECT vec_id, cell FROM (
      |         SELECT t.vec_id, t.cell, row_number() OVER (
      |           PARTITION BY t.vec_id ORDER BY t.dist, t.cell) AS rn
      |         FROM (SELECT rv.vec_id, c.cell,
      |                 sum(CAST(floor((rv.x - c.m) * (rv.x - c.m) * 1e12 + 0.5) AS BIGINT)) AS dist
      |               FROM rv JOIN c0d c ON rv.d = c.d GROUP BY 1, 2) t)
      |       WHERE rn = 1),
      |c1d AS MATERIALIZED (SELECT a.cell, r.d, round(sum(r.q16) / 65536.0 / count(*), 6) AS m
      |        FROM r JOIN a1 a ON r.vec_id = a.vec_id GROUP BY 1, 2),
      |c1 AS (SELECT cell, list(m ORDER BY d) AS m FROM c1d GROUP BY 1)""".stripMargin

  /** The within-cell cosine-pair → reachability tail of the SemDeDup
    * oracle (needs [[ivfTrainCte]] ahead of it; ends at `reach(id, rr)`
    * — min(rr) per id is the cluster label). Shared by q_semdedup and
    * [[corpusBuildV3Oracle]]; [[semDedupReachCteSampled]] is the
    * cell-sampled form for the scale-cheap q_semdedup_cells twin. */
  val semDedupReachCte: String = semDedupReachCteSampled("")

  /** [[semDedupReachCte]] with an optional extra pair predicate (e.g.
    * `a.cell % 8 = 0 AND` — note the trailing AND) restricting the
    * pair scan and the recursive closure to sampled cells: components
    * are cell-closed, so the restriction is exact for those cells.
    *
    * `edges` MUST be MATERIALIZED (r15): DuckDB inlines plain CTEs, so
    * the recursive `reach` step would otherwise re-run the ENTIRE
    * pairs pipeline (both assignment scans + the cosine join) once per
    * closure iteration — at sf1 that replay spilled >90 GB of hash-
    * join temp and died on disk while the materialized form finishes
    * in ~90 s. Same rows either way; the keyword only pins evaluate-
    * once (the [[mstSql]] rounds already did this). */
  def semDedupReachCteSampled(pairPred: String): String =
    s"""best AS (SELECT vec_id, cell FROM (
      |           SELECT t.vec_id, t.cell, row_number() OVER (
      |             PARTITION BY t.vec_id ORDER BY t.dist, t.cell) AS rn
      |           FROM (SELECT rv.vec_id, c.cell,
      |                   sum(CAST(floor((rv.x - c.m) * (rv.x - c.m) * 1e12 + 0.5) AS BIGINT)) AS dist
      |                 FROM rv JOIN c1d c ON rv.d = c.d GROUP BY 1, 2) t)
      |         WHERE rn = 1),
      |n AS (SELECT vec_id, sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm FROM e),
      |pairs AS (SELECT a.vec_id AS d1, b.vec_id AS d2
      |          FROM best a JOIN best b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |          JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
      |          JOIN n na ON na.vec_id = a.vec_id JOIN n nb ON nb.vec_id = b.vec_id
      |          WHERE $pairPred round(list_reduce(list_transform(range(1, 65),
      |              i -> ea.v[i] * eb.v[i]), (x, y) -> x + y)
      |            / (na.nrm * nb.nrm), 6) >= 0.4),
      |edges AS MATERIALIZED (SELECT d1 AS src, d2 AS dst FROM pairs
      |          UNION ALL SELECT d2, d1 FROM pairs),
      |reach(id, rr) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT reach.id, edges.dst FROM reach JOIN edges ON reach.rr = edges.src)""".stripMargin

  /** Unrolled random-walk CTE chain (ending in a `walks` relation):
    * neighbor ranks by node id, md5-driven hop choice — mirrors
    * [[graft.graph.GraphOps.qRandomWalks]]. Shared by the walk oracle
    * and the skip-gram pair oracle. */
  def randomWalkCtes(steps: Int, walksPerNode: Int): String = {
    // each w_i feeds BOTH w_{i+1} and the final union — MATERIALIZED or
    // the inlined expansion doubles per hop (the PCA/k-core lesson)
    val hops = (1 to steps).map { i =>
      s"""w$i AS MATERIALIZED (SELECT c.walk_id, CAST($i AS BIGINT) AS step, n.dst AS node
         |  FROM w${i - 1} c JOIN deg d ON c.node = d.src
         |  JOIN nbr n ON n.src = c.node AND n.rk =
         |    CAST(('0x' || substr(md5(CAST(c.walk_id AS VARCHAR) || ':$i'), 1, 8))::UBIGINT
         |      AS BIGINT) % d.outdeg)""".stripMargin
    }.mkString(",\n")
    val union = (0 to steps).map(i => s"SELECT * FROM w$i")
      .mkString("\n UNION ALL ")
    s"""$tradeGraphCte,
       |nbr AS MATERIALIZED (SELECT src, dst,
       |          row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rk
       |        FROM edges),
       |w0 AS MATERIALIZED (SELECT n.node * $walksPerNode + t.w AS walk_id,
       |         CAST(0 AS BIGINT) AS step, n.node
       |       FROM (SELECT DISTINCT s * 2 AS node FROM pairs) n,
       |            range(0, $walksPerNode) t(w)),
       |$hops,
       |walks AS MATERIALIZED ($union)""".stripMargin
  }

  def randomWalkSql(steps: Int, walksPerNode: Int): String =
    s"""WITH ${randomWalkCtes(steps, walksPerNode)}
       |SELECT * FROM walks""".stripMargin

  /** Skip-gram pair oracle: symmetric within-window pairs over the
    * unrolled walk relation — mirrors
    * [[graft.graph.GraphOps.qWalkPairs]]. */
  def walkPairsSql(
      steps: Int, walksPerNode: Int, window: Int): String =
    s"""WITH ${randomWalkCtes(steps, walksPerNode)},
       |pr AS MATERIALIZED (SELECT a.node AS ctr, b.node AS ctx
       |       FROM walks a JOIN walks b ON a.walk_id = b.walk_id
       |        AND b.step > a.step AND b.step <= a.step + $window),
       |sym AS (SELECT ctr, ctx FROM pr
       |        UNION ALL SELECT ctx AS ctr, ctr AS ctx FROM pr)
       |SELECT CASE WHEN ctr % 2 = 0 THEN 'supplier' ELSE 'part' END
       |    AS center_type,
       |  ctr // 2 AS center_id,
       |  CASE WHEN ctx % 2 = 0 THEN 'supplier' ELSE 'part' END AS ctx_type,
       |  ctx // 2 AS ctx_id,
       |  CAST(count(*) AS BIGINT) AS pairs
       |FROM sym GROUP BY 1, 2, 3, 4""".stripMargin

  /** Unrolled fixed-point SGNS oracle for q_node_embed: the walk + pair
    * CTEs feed deterministic hashed-negative training rows, md5-seeded
    * initial embeddings, and `NodeEmbed.Epochs` unrolled full-batch
    * gradient rounds — every product integer, division sign-safe
    * truncating, coordinates clamped — mirroring
    * [[graft.graph.NodeEmbed]] bit-for-bit. */
  def duckSdiv(a: String, b: String): String =
    s"(CASE WHEN $a >= 0 THEN ($a) // ($b) ELSE -((-($a)) // ($b)) END)"

  /** The WITH-body CTE chain ending in the trained `em{Epochs}`
    * embedding relation — shared by the q_node_embed decode and the
    * q_embed_eval census so the training replay cannot drift between
    * the two oracles. */
  def nodeEmbedCtes(
      steps: Int, walksPerNode: Int, window: Int): String = {
    import graft.graph.NodeEmbed.{Clamp, Dims, Epochs, LrDiv, NegK, S}
    val dims = 0 until Dims
    def sdiv(a: String, b: String): String = duckSdiv(a, b)
    // NOTE: the outer template re-applies stripMargin to these embedded
    // fragments, so no fragment line may begin with whitespace + '|'
    // (a '||' concat opening a continuation line would lose a pipe)
    val negBranches = (0 until NegK).map { i =>
      s"""SELECT ctr AS a,
         |    CASE WHEN idx < ns THEN idx * 2 ELSE (idx - ns) * 2 + 1 END AS b,
         |    w, CAST(0 AS BIGINT) AS t
         |  FROM (SELECT ctr, ctx, w, ns,
         |      ('0x' || substr(md5('nw:' || CAST(ctr AS VARCHAR) || ':' ||
         |        CAST(ctx AS VARCHAR) || ':$i'), 1, 8))::UBIGINT::BIGINT
         |        % (ns + np) AS idx
         |    FROM pc, ks)""".stripMargin
    }.mkString("\n  UNION ALL ")
    val initCols = dims.map { i =>
      s"""  CAST(('0x' || substr(md5('emb:' || CAST(node AS VARCHAR) ||
         |    ':$i'), 1, 4))::UBIGINT AS BIGINT) % 2001 - 1000 AS v$i"""
        .stripMargin
    }.mkString(",\n")
    val dot = dims.map(i => s"ea.v$i * eb.v$i").mkString(" + ")
    val rounds = (1 to Epochs).map { r =>
      val gradCols = dims.map(i =>
        s"    sum(r.w * ($dot - r.t) * eb.v$i) AS g$i").mkString(",\n")
      val updCols = dims.map { i =>
        val step = sdiv(s"g$i", s"wa * $LrDiv")
        s"""  CAST(greatest(-$Clamp, least($Clamp,
           |    e.v$i - COALESCE($step, 0))) AS BIGINT) AS v$i""".stripMargin
      }.mkString(",\n")
      s"""g$r AS (SELECT r.a AS node, sum(r.w) AS wa,
         |$gradCols
         |  FROM rows r JOIN em${r - 1} ea ON r.a = ea.node
         |  JOIN em${r - 1} eb ON r.b = eb.node
         |  GROUP BY 1),
         |em$r AS MATERIALIZED (SELECT e.node,
         |$updCols
         |  FROM em${r - 1} e LEFT JOIN g$r g ON e.node = g.node)""".stripMargin
    }.mkString(",\n")
    s"""${randomWalkCtes(steps, walksPerNode)},
       |pr AS MATERIALIZED (SELECT a.node AS ctr, b.node AS ctx
       |       FROM walks a JOIN walks b ON a.walk_id = b.walk_id
       |        AND b.step > a.step AND b.step <= a.step + $window),
       |sym AS (SELECT ctr, ctx FROM pr
       |        UNION ALL SELECT ctx AS ctr, ctr AS ctx FROM pr),
       |pc AS MATERIALIZED (SELECT ctr, ctx, CAST(count(*) AS BIGINT) AS w
       |       FROM sym GROUP BY 1, 2),
       |ks AS (SELECT (SELECT count(*) FROM supplier) AS ns,
       |              (SELECT count(*) FROM part) AS np),
       |rows AS MATERIALIZED (
       |  SELECT ctr AS a, ctx AS b, w, CAST(${S * S} AS BIGINT) AS t FROM pc
       |  UNION ALL $negBranches),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |em0 AS MATERIALIZED (SELECT node,
       |$initCols
       |  FROM nodes),
       |$rounds""".stripMargin
  }

  def nodeEmbedSql(
      steps: Int, walksPerNode: Int, window: Int): String = {
    import graft.graph.NodeEmbed.{Dims, Epochs}
    s"""WITH ${nodeEmbedCtes(steps, walksPerNode, window)}
       |SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END
       |    AS node_type,
       |  node // 2 AS node_id,
       |  ${(0 until Dims).map(i => s"v$i").mkString(", ")}
       |FROM em$Epochs""".stripMargin
  }

  /** q_embed_eval: edge-vs-hashed-random paired dot comparison over the
    * trained embedding relation (mirrors
    * [[graft.graph.NodeEmbed.qEmbedEval]] exactly, including the
    * LEFT-join dot-0 convention for out-of-vocabulary partners). */
  def embedEvalSql(
      steps: Int, walksPerNode: Int, window: Int): String = {
    import graft.graph.NodeEmbed.{Dims, Epochs}
    def dot(a: String, b: String): String =
      (0 until Dims).map(i => s"$a.v$i * $b.v$i").mkString(" + ")
    s"""WITH ${nodeEmbedCtes(steps, walksPerNode, window)},
       |arcs AS (SELECT src, dst FROM edges WHERE src % 2 = 0),
       |wr AS (SELECT src, dst,
       |    (('0x' || substr(md5('ne:' || CAST(src AS VARCHAR) || ':' ||
       |      CAST(dst AS VARCHAR)), 1, 8))::UBIGINT::BIGINT
       |      % (SELECT np FROM ks)) * 2 + 1 AS rnd
       |  FROM arcs),
       |sc AS (SELECT CAST(${dot("s", "p")} AS BIGINT) AS edge_dot,
       |    CAST(COALESCE(${dot("s", "r")}, 0) AS BIGINT) AS rand_dot
       |  FROM wr JOIN em$Epochs s ON wr.src = s.node
       |  JOIN em$Epochs p ON wr.dst = p.node
       |  LEFT JOIN em$Epochs r ON wr.rnd = r.node)
       |SELECT CAST(count(*) AS BIGINT) AS n_arcs,
       |  CAST(${duckSdiv("sum(edge_dot)", "count(*)")} AS BIGINT)
       |    AS mean_edge_dot,
       |  CAST(${duckSdiv("sum(rand_dot)", "count(*)")} AS BIGINT)
       |    AS mean_rand_dot,
       |  CAST((1000000 * sum(CASE WHEN edge_dot > rand_dot THEN 1 ELSE 0 END))
       |    // count(*) AS BIGINT) AS win_ppm
       |FROM sc""".stripMargin
  }

  /** Unrolled synchronous-LPA oracle: per round, count labels over
    * in-neighbors, keep the most frequent with min-label tiebreak —
    * mirrors [[graft.graph.GraphOps.labelPropagation]]'s
    * `min(struct(-c, lbl))` exactly. */
  /** Shared LPA-round CTE chain `l0..l<iters> (node, lbl)` over the
    * arc relation `rel(src, dst)` — referenced by both the label-prop
    * oracle (trade graph) and the modularity census (co-purchase
    * graph). */
  def lpaRoundsCte(iters: Int, rel: String = "edges"): String = {
    val rounds = (1 to iters).map { i =>
      s"""l$i AS (SELECT node, min(lbl) AS lbl FROM (
         |  SELECT dst AS node, lbl, c, max(c) OVER (PARTITION BY dst) AS mc
         |  FROM (SELECT e2.dst, l.lbl, count(*) AS c
         |        FROM $rel e2 JOIN l${i - 1} l ON e2.src = l.node
         |        GROUP BY 1, 2) c$i) m$i
         |  WHERE c = mc GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM $rel),
       |$rounds""".stripMargin
  }

  def labelPropSql(iters: Int): String =
    s"""WITH $tradeGraphCte,
       |${lpaRoundsCte(iters)}
       |SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END
       |    AS node_type,
       |  node // 2 AS node_id, lbl AS community FROM l$iters""".stripMargin

  /** Modularity oracle: LPA labels over the co-purchase arcs (shared
    * round CTE chain), then the Newman per-community Q in ppm — both
    * divisions on non-negative HUGEINT numerators, subtracted after,
    * mirroring the Spark side's decimal(38,0) discipline (so
    * truncate-vs-floor never diverges). */
  def modularitySql(iters: Int): String =
    s"""$copurchaseCte,
       |cedges AS MATERIALIZED (SELECT u AS src, v AS dst FROM und
       |  UNION ALL SELECT v, u FROM und),
       |${lpaRoundsCte(iters, "cedges")},
       |lab AS MATERIALIZED (SELECT node, lbl FROM l$iters),
       |arcs AS (SELECT s.lbl AS slbl, d.lbl AS dlbl FROM cedges e
       |  JOIN lab s ON e.src = s.node JOIN lab d ON e.dst = d.node),
       |twom AS (SELECT CAST(count(*) AS HUGEINT) AS m2 FROM cedges),
       |pc AS (SELECT slbl AS community,
       |    CAST(count(*) AS BIGINT) AS tot_deg,
       |    CAST(sum(CASE WHEN slbl = dlbl THEN 1 ELSE 0 END) AS BIGINT)
       |      AS in_arcs
       |  FROM arcs GROUP BY 1),
       |nn AS (SELECT lbl AS community, count(*) AS n_nodes
       |  FROM lab GROUP BY 1)
       |SELECT pc.community, nn.n_nodes, pc.in_arcs, pc.tot_deg,
       |  CAST((1000000::HUGEINT * pc.in_arcs) // twom.m2
       |    - (1000000::HUGEINT * pc.tot_deg * pc.tot_deg)
       |      // (twom.m2 * twom.m2) AS BIGINT) AS q_ppm
       |FROM pc JOIN nn USING (community) CROSS JOIN twom""".stripMargin

  /** Unrolled power-iteration oracle for q_pagerank: one CTE per round,
    * truncating integer division per edge then per damping step —
    * exactly [[graft.graph.GraphOps.pageRank]]'s fixed-point contract. */
  /** Shared trade-graph prefix: distinct supplier↔part arcs, degrees,
    * degree-annotated edge relation `e`. */
  // edges/deg are referenced once per unrolled round by every consumer
  // (walks, LPA, pagerank): MATERIALIZED, or DuckDB's default CTE
  // inlining re-derives the lineitem pair scan per reference — at sf0.1
  // the inlined walk oracle spilled >80 GB of temp and died
  val tradeGraphCte: String =
    """pairs AS MATERIALIZED (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
      |edges AS MATERIALIZED (SELECT s * 2 AS src, p * 2 + 1 AS dst FROM pairs
      |          UNION ALL SELECT p * 2 + 1 AS src, s * 2 AS dst FROM pairs),
      |deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
      |e AS (SELECT edges.src, dst, outdeg FROM edges JOIN deg USING (src))""".stripMargin

  val pageRankFinal: String =
    """SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END AS node_type,
      |  node // 2 AS node_id, r AS rank_fp""".stripMargin

  /** TextRank oracle: DF-gated stopword filter, filtered-sequence
    * bigram pairs, then the SAME unrolled PageRank rounds as
    * [[pageRankSql]] against the word graph (node ids are words). */
  def textRankSql(iters: Int, k: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""tr$i AS (SELECT dst AS node,
         |  CAST(150000000000 + (85 * sum(r // outdeg)) // 100 AS BIGINT) AS r
         |  FROM we JOIN tr${i - 1} ON we.src = tr${i - 1}.node
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (SELECT doc_id,
       |    CAST(unnest(range(1, len(l) + 1)) - 1 AS BIGINT) AS pos,
       |    unnest(l) AS tok
       |  FROM (SELECT doc_id, string_split(text, ' ') AS l
       |        FROM documents)),
       |nd AS (SELECT count(*) AS n_docs FROM documents),
       |stopw AS (SELECT tok FROM (
       |    SELECT tok, count(*) AS dfq
       |    FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY 1)
       |  CROSS JOIN nd WHERE dfq >= n_docs * 0.8),
       |kept AS (SELECT doc_id, pos, tok FROM toks
       |  WHERE tok NOT IN (SELECT tok FROM stopw)),
       |bi AS (SELECT tok, lag(tok) OVER (PARTITION BY doc_id
       |    ORDER BY pos) AS prev FROM kept),
       |und AS (SELECT DISTINCT least(prev, tok) AS a,
       |    greatest(prev, tok) AS b
       |  FROM bi WHERE prev IS NOT NULL AND prev <> tok),
       |wedges AS MATERIALIZED (SELECT a AS src, b AS dst FROM und
       |  UNION ALL SELECT b, a FROM und),
       |wdeg AS MATERIALIZED (SELECT src, count(*) AS outdeg
       |  FROM wedges GROUP BY 1),
       |we AS (SELECT wedges.src, dst, outdeg
       |  FROM wedges JOIN wdeg USING (src)),
       |tr0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) AS r
       |  FROM wdeg),
       |$rounds
       |SELECT node AS word, r AS rank_fp FROM tr$iters
       |ORDER BY r DESC, node LIMIT $k""".stripMargin
  }

  def pageRankSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (SELECT dst AS node,
         |  CAST(150000000000 + (85 * sum(r // outdeg)) // 100 AS BIGINT) AS r
         |  FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $tradeGraphCte,
       |r0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) AS r FROM deg),
       |$rounds
       |$pageRankFinal FROM r$iters""".stripMargin
  }

  /** BFS oracle: the textbook recursive-CTE form — enumerate every
    * (node, dist ≤ maxDepth) walk endpoint with set-dedup on the pair
    * (UNION, so the recursion terminates on the cyclic graph), then
    * min(dist) per node IS the BFS level. The Spark side's
    * level-synchronous frontier loop must agree exactly. */
  def bfsSql(nation: String, maxDepth: Int): String =
    s"""WITH RECURSIVE $tradeGraphCte,
       |src_nodes AS (SELECT s_suppkey * 2 AS node FROM supplier
       |  JOIN nation ON s_nationkey = n_nationkey AND n_name = '$nation'),
       |bfs(node, dist) AS (
       |  SELECT node, 0 FROM src_nodes
       |  UNION
       |  SELECT e2.dst, bfs.dist + 1 FROM bfs
       |  JOIN edges e2 ON bfs.node = e2.src
       |  WHERE bfs.dist < $maxDepth)
       |SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END
       |    AS node_type,
       |  node // 2 AS node_id, CAST(min(dist) AS BIGINT) AS dist
       |FROM bfs GROUP BY 1, 2""".stripMargin

  /** SSSP oracle: the FULL Bellman-Ford relaxation recurrence, one
    * min-merge CTE per round — d_r = min(d_{r−1}, relax(d_{r−1})). The
    * Spark side's frontier variant provably computes the same d_r (see
    * [[graft.graph.GraphOps.qSsspWeighted]]); both sides are pure
    * min-plus long arithmetic, so the match is bit-exact. */
  def ssspSql(nation: String, maxRounds: Int): String = {
    val rounds = (1 to maxRounds).map { i =>
      s"""sd$i AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
         |  SELECT node, dist FROM sd${i - 1}
         |  UNION ALL
         |  SELECT w.dst AS node, d.dist + w.w AS dist
         |  FROM wedges w JOIN sd${i - 1} d ON w.src = d.node) u$i
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH wpairs AS MATERIALIZED (SELECT l_suppkey AS s, l_partkey AS p,
       |    CAST(min(l_quantity) AS BIGINT) AS w FROM lineitem GROUP BY 1, 2),
       |wedges AS MATERIALIZED (SELECT s * 2 AS src, p * 2 + 1 AS dst, w
       |  FROM wpairs
       |  UNION ALL SELECT p * 2 + 1, s * 2, w FROM wpairs),
       |sd0 AS (SELECT s_suppkey * 2 AS node, CAST(0 AS BIGINT) AS dist
       |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |    AND n_name = '$nation'),
       |$rounds
       |SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END
       |    AS node_type,
       |  node // 2 AS node_id, dist FROM sd$maxRounds""".stripMargin
  }

  /** HyperBall oracle: seed registers via the same md5 bucket/rank
    * derivation (bit-smear bitlen — see q_hll_distinct), then `radius`
    * unrolled max-merge rounds along the trade-graph arcs, then the
    * per-node HLL estimate rounded to 1e-4 and summed as integers. */
  /** Shared HyperBall CTE prefix: registers, `radius` max-merge rounds,
    * and per-node ball estimates `pe0..peR (node, est_e4)`. */
  def hyperBallCtes(radius: Int): String = {
    val rounds = (1 to radius).map { i =>
      s"""hb$i AS MATERIALIZED (SELECT node, bucket, max(mj) AS mj FROM (
         |  SELECT node, bucket, mj FROM hb${i - 1}
         |  UNION ALL
         |  SELECT e2.dst AS node, s.bucket, s.mj
         |  FROM edges e2 JOIN hb${i - 1} s ON e2.src = s.node)
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val ests = (0 to radius).map { r =>
      s"""z$r AS (SELECT node,
         |    sum((1::BIGINT << (61 - mj))::HUGEINT)
         |      + (256 - count(*))::HUGEINT * 2305843009213693952::HUGEINT AS zs,
         |    256 - count(*) AS v0
         |  FROM hb$r GROUP BY 1),
         |pe$r AS (SELECT node,
         |    CAST(floor((CASE WHEN est_raw <= 640.0 AND v0 > 0
         |        THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE) / v0)
         |        ELSE est_raw END) * 10000 + 0.5) AS BIGINT) AS est_e4
         |  FROM (SELECT node,
         |      CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE)/CAST(256.0 AS DOUBLE))
         |        * CAST(65536.0 AS DOUBLE) * CAST(2305843009213693952.0 AS DOUBLE)
         |        / CAST(zs AS DOUBLE) AS est_raw, v0
         |    FROM z$r))""".stripMargin
    }.mkString(",\n")
    s"""$tradeGraphCte,
       |n0 AS (SELECT DISTINCT src AS node FROM edges),
       |hh AS (SELECT node,
       |    CAST(('0x' || substring(md5('hb:' || CAST(node AS VARCHAR)), 1, 2))::UBIGINT AS INT) AS bucket,
       |    CAST(('0x' || substring(md5('hb:' || CAST(node AS VARCHAR)), 3, 15))::UBIGINT AS BIGINT) AS v
       |  FROM n0),
       |sm1 AS (SELECT node, bucket, v | (v >> 1) AS x FROM hh),
       |sm2 AS (SELECT node, bucket, x | (x >> 2) AS x FROM sm1),
       |sm3 AS (SELECT node, bucket, x | (x >> 4) AS x FROM sm2),
       |sm4 AS (SELECT node, bucket, x | (x >> 8) AS x FROM sm3),
       |sm5 AS (SELECT node, bucket, x | (x >> 16) AS x FROM sm4),
       |sm6 AS (SELECT node, bucket, x | (x >> 32) AS x FROM sm5),
       |hb0 AS (SELECT node, bucket, 61 - bit_count(x) AS mj FROM sm6),
       |$rounds,
       |$ests""".stripMargin
  }

  def hyperBallSql(radius: Int): String = {
    val unions = (0 to radius).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS r, count(*) AS n_nodes,
         |  CAST(sum(est_e4) AS BIGINT) AS nf_e4 FROM pe$r""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH ${hyperBallCtes(radius)}
       |$unions""".stripMargin
  }

  /** Effective-diameter oracle: the same neighborhood function from the
    * replayed HyperBall rounds, then the smallest 90%-crossing radius
    * with the linear shell interpolation in 1e-4 fixed point (all
    * divisions non-negative, so `//` matches Spark's `div`). */
  def effectiveDiameterSql(radius: Int): String = {
    val unions = (0 to radius).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS r, CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(sum(est_e4) AS BIGINT) AS nf_e4 FROM pe$r""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH ${hyperBallCtes(radius)},
       |nf AS ($unions),
       |tgt AS (SELECT nf_e4 AS nf_max FROM nf WHERE r = $radius),
       |lagd AS (SELECT r, n_nodes, nf_e4,
       |    lag(nf_e4) OVER (ORDER BY r) AS nf_prev
       |  FROM nf),
       |hit AS (SELECT l.*, t.nf_max FROM lagd l CROSS JOIN tgt t
       |  WHERE l.nf_e4 * 10 >= t.nf_max * 9
       |  ORDER BY l.r LIMIT 1)
       |SELECT r AS r_eff, n_nodes, nf_e4 AS nf_r, nf_max,
       |  CAST(CASE WHEN r = 0 THEN 0
       |    ELSE (r - 1) * 10000 + (nf_max * 9 - nf_prev * 10) * 10000
       |      // ((nf_e4 - nf_prev) * 10) END AS BIGINT) AS d_eff_e4
       |FROM hit""".stripMargin
  }

  /** HITS oracle: unrolled mutual-reinforcement rounds with the same
    * L∞ renormalization (HUGEINT cross-multiply // max — exactly the
    * Spark side's decimal(38,0) div). */
  def hitsSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""ar$i AS MATERIALIZED (SELECT p, CAST(sum(h) AS BIGINT) AS raw
         |  FROM pairs JOIN h${i - 1} USING (s) GROUP BY 1),
         |a$i AS MATERIALIZED (SELECT p,
         |    CAST(raw::HUGEINT * 1000000 // (SELECT max(raw) FROM ar$i)
         |      AS BIGINT) AS a
         |  FROM ar$i),
         |hr$i AS MATERIALIZED (SELECT s, CAST(sum(a) AS BIGINT) AS raw
         |  FROM pairs JOIN a$i USING (p) GROUP BY 1),
         |h$i AS MATERIALIZED (SELECT s,
         |    CAST(raw::HUGEINT * 1000000 // (SELECT max(raw) FROM hr$i)
         |      AS BIGINT) AS h
         |  FROM hr$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
       |h0 AS (SELECT DISTINCT s, CAST(1000000 AS BIGINT) AS h FROM pairs),
       |$rounds
       |SELECT 'hub' AS role, s AS node_id, h AS score_ppm FROM h$iters
       |UNION ALL
       |SELECT 'authority' AS role, p AS node_id, a AS score_ppm
       |FROM a$iters""".stripMargin
  }

  /** Harmonic centrality oracle: the same per-node ball estimates,
    * shell differences CLAMPED at 0 (the HLL estimate can dip at the
    * linear-counting crossover even though registers are monotone —
    * and `//` vs `div` disagree on negatives) then divided by the
    * shell radius. */
  def harmonicCentralitySql(radius: Int, k: Int): String = {
    val joins = (1 to radius)
      .map(r => s"JOIN pe$r p$r USING (node)").mkString(" ")
    val h = (1 to radius)
      .map(r => s"greatest(p$r.est_e4 - p${r - 1}.est_e4, 0) // $r")
      .mkString(" + ")
    s"""WITH ${hyperBallCtes(radius)},
       |hc AS (SELECT node, $h AS harmonic_e4 FROM pe0 p0 $joins)
       |SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END
       |    AS node_type,
       |  node // 2 AS node_id, CAST(harmonic_e4 AS BIGINT) AS harmonic_e4
       |FROM hc ORDER BY harmonic_e4 DESC, node LIMIT $k""".stripMargin
  }

  /** FK-integrity oracle: per edge, distinct child keys left-joined to
    * distinct parent keys; orphans are the null-parent rows. */
  val fkCheckSql: String = {
    def edge(name: String, ct: String, ck: String,
        pt: String, pk: String): String =
      s"""SELECT '$name' AS fk_edge,
         |  count(*) AS n_child_keys,
         |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
         |FROM (SELECT DISTINCT $ck AS k FROM $ct WHERE $ck IS NOT NULL) c
         |LEFT JOIN (SELECT DISTINCT $pk AS k FROM $pt) p USING (k)""".stripMargin
    Seq(
      edge("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      edge("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      edge("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      edge("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      edge("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      edge("supplier.nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      edge("nation.regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
      .mkString("\nUNION ALL ")
  }

  /** Schema-profile oracle: one block per lineitem column, extrema on
    * the native column rendered canonically (cents / dates / varchar). */
  val schemaProfileSql: String = {
    def block(c: String, kind: String): String = {
      val (mn, mx) = kind match {
        case "cents" =>
          (s"CAST(CAST(floor(min($c) * 100 + 0.5) AS BIGINT) AS VARCHAR)",
            s"CAST(CAST(floor(max($c) * 100 + 0.5) AS BIGINT) AS VARCHAR)")
        case "date" =>
          (s"strftime(min($c), '%Y-%m-%d')", s"strftime(max($c), '%Y-%m-%d')")
        case _ => (s"CAST(min($c) AS VARCHAR)", s"CAST(max($c) AS VARCHAR)")
      }
      s"""SELECT '$c' AS col_name,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  $mn AS min_s, $mx AS max_s
         |FROM lineitem""".stripMargin
    }
    Seq("l_orderkey" -> "", "l_partkey" -> "", "l_suppkey" -> "",
      "l_linenumber" -> "", "l_quantity" -> "cents",
      "l_extendedprice" -> "cents", "l_discount" -> "cents",
      "l_tax" -> "cents", "l_returnflag" -> "", "l_linestatus" -> "",
      "l_shipdate" -> "date")
      .map { case (c, k) => block(c, k) }.mkString("\nUNION ALL ")
  }

  /** RRF quality-ensemble CTE chain (classifier training + perplexity +
    * stopword heuristic + per-language rank fusion) — ends at
    * `ens (doc_id, lang, r_heur, r_ppl, r_clf, rrf_ppm)`, so
    * [[corpusBuildV4Oracle]] can compose it. */
  def qualityEnsembleCte(dims: Int, epochs: Int): String =
    s"""${qualityClassifierCte(dims, epochs)},
       |cnt AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t, CAST(count(*) AS DOUBLE) AS v FROM cnt),
       |pp AS (SELECT doc_id,
       |    round(avg(-ln(CAST(cnt + 1 AS DOUBLE) / (t + v))), 4) AS nll
       |  FROM toks JOIN cnt USING (tok) CROSS JOIN tot GROUP BY 1),
       |heur AS (SELECT doc_id, lang,
       |    (CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS BIGINT) * 1000000)
       |      // CAST(len(string_split(text, ' ')) AS BIGINT) AS stop_ppm
       |  FROM documents),
       |j AS (SELECT h.doc_id, h.lang, h.stop_ppm, pp.nll, sc.z
       |  FROM heur h JOIN pp ON h.doc_id = pp.doc_id
       |  JOIN sc ON h.doc_id = sc.doc_id),
       |r AS (SELECT doc_id, lang,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY stop_ppm, doc_id) AS BIGINT) AS r_heur,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY nll, doc_id) AS BIGINT) AS r_ppl,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY z DESC, doc_id) AS BIGINT) AS r_clf
       |  FROM j),
       |ens AS (SELECT doc_id, lang, r_heur, r_ppl, r_clf,
       |  CAST(1000000 // (60 + r_heur) + 1000000 // (60 + r_ppl)
       |    + 1000000 // (60 + r_clf) AS BIGINT) AS rrf_ppm
       |FROM r)""".stripMargin

  def qualityEnsembleSql(dims: Int, epochs: Int): String =
    s"""WITH ${qualityEnsembleCte(dims, epochs)}
       |SELECT doc_id, lang, r_heur, r_ppl, r_clf, rrf_ppm FROM ens""".stripMargin

  /** The v4 capstone's survivor chain (ensemble gate → setsim
    * pairwise-survivor dedup → phrase decontamination) as CTEs ending in
    * `surv(doc_id, lang, n_chars)` — ONE definition composed by both the
    * v4 split census and the v5 privacy-gated release. Shingle/phrase
    * CTEs use fresh names (the classifier chain already owns `toks`). */
  val corpusSurvivorCtes: String =
    s"""${qualityEnsembleCte(64, 4)},
       |gated AS (SELECT doc_id, lang, n_chars FROM (
       |    SELECT e.doc_id, e.lang, d.n_chars,
       |      CAST(row_number() OVER (PARTITION BY e.lang
       |        ORDER BY e.rrf_ppm DESC, e.doc_id) AS BIGINT) AS qrn,
       |      count(*) OVER (PARTITION BY e.lang) AS n_l
       |    FROM ens e JOIN documents d ON e.doc_id = d.doc_id)
       |  WHERE qrn * 1000 <= n_l * 600 + 999),
       |tl4 AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |sh4 AS (SELECT doc_id, unnest(list_distinct(list_transform(
       |         range(1, greatest(len(l) - 2, 1)),
       |         i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))) AS sh
       |       FROM tl4),
       |sz4 AS (SELECT doc_id, count(*) AS sz FROM sh4 GROUP BY 1),
       |pr4 AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |        FROM sh4 a JOIN sh4 b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |        GROUP BY 1, 2),
       |sp AS (SELECT d1, d2 FROM pr4
       |  JOIN sz4 s1 ON d1 = s1.doc_id JOIN sz4 s2 ON d2 = s2.doc_id
       |  WHERE 5 * inter >= 3 * (s1.sz + s2.sz - inter)),
       |losers AS (SELECT DISTINCT
       |    CASE WHEN ea.rrf_ppm < eb.rrf_ppm THEN d1
       |         WHEN eb.rrf_ppm < ea.rrf_ppm THEN d2
       |         ELSE greatest(d1, d2) END AS doc_id
       |  FROM sp JOIN ens ea ON d1 = ea.doc_id JOIN ens eb ON d2 = eb.doc_id),
       |t4 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
       |    generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents),
       |cont AS (SELECT DISTINCT a.doc_id
       |  FROM t4 a JOIN t4 b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |  WHERE a.tok = 'hash' AND b.tok = 'join'),
       |surv AS (SELECT g.doc_id, g.lang, g.n_chars FROM gated g
       |  WHERE g.doc_id NOT IN (SELECT doc_id FROM losers)
       |    AND g.doc_id NOT IN (SELECT doc_id FROM cont))""".stripMargin

  /** Capstone v4: the survivor chain censused by split, replaying
    * [[graft.pipeline.TrainingData.qCorpusBuildV4]] stage for stage. */
  val corpusBuildV4Oracle: String =
    s"""WITH $corpusSurvivorCtes,
       |bk AS (SELECT doc_id,
       |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
       |          AS BIGINT) AS bucket
       |      FROM documents)
       |SELECT CASE WHEN bk.bucket < 80 THEN 'train'
       |            WHEN bk.bucket < 90 THEN 'val' ELSE 'test' END AS split,
       |  s.lang, count(*) AS n_docs, CAST(sum(s.n_chars) AS BIGINT) AS n_chars
       |FROM surv s JOIN bk ON s.doc_id = bk.doc_id
       |GROUP BY 1, 2""".stripMargin

  /** Capstone v5: the survivor release through the privacy gates —
    * per-lang k-anonymity census over (source × length-bucket) classes
    * plus the deterministic ε-DP noised count. */
  val corpusBuildV5Oracle: String =
    s"""WITH $corpusSurvivorCtes,
       |cls AS (SELECT s.lang, d.source, s.n_chars // 256 AS len_bucket,
       |    CAST(count(*) AS BIGINT) AS sz
       |  FROM surv s JOIN documents d ON s.doc_id = d.doc_id
       |  GROUP BY 1, 2, 3),
       |k AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_classes,
       |    CAST(sum(sz) AS BIGINT) AS n_docs,
       |    min(sz) AS min_class_size,
       |    CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS n_risky
       |  FROM cls GROUP BY 1),
       |uu AS (SELECT k.*,
       |    ('0x' || substring(md5('graft-dp:' || lang), 1, 13))
       |      ::UBIGINT::DOUBLE / 4503599627370496.0 AS u
       |  FROM k)
       |SELECT lang, n_docs,
       |  n_docs + CAST(floor(-10.0 * sign(u - 0.5)
       |    * ln(greatest(1.0 - 2.0 * abs(u - 0.5), 1e-15)) + 0.5)
       |    AS BIGINT) AS n_noisy,
       |  n_classes, min_class_size, n_risky,
       |  CAST(n_risky * 1000000 // n_docs AS BIGINT) AS risk_ppm
       |FROM uu""".stripMargin

  /** Weighted-PageRank oracle: lineitem multiplicities as edge weights,
    * contribution `(r·w) // W(u)` per arc — the same truncating
    * fixed-point discipline, unrolled per round. */
  def pageRankWeightedSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""wr$i AS (SELECT dst AS node,
         |  CAST(150000000000 + (85 * sum((r * w) // wtot)) // 100 AS BIGINT) AS r
         |  FROM we JOIN wr${i - 1} ON we.src = wr${i - 1}.node GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH wpairs AS MATERIALIZED (SELECT l_suppkey AS s, l_partkey AS p,
       |    count(*) AS w
       |  FROM lineitem GROUP BY 1, 2),
       |wedges AS MATERIALIZED (SELECT s * 2 AS src, p * 2 + 1 AS dst, w FROM wpairs
       |  UNION ALL SELECT p * 2 + 1 AS src, s * 2 AS dst, w FROM wpairs),
       |wdeg AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS wtot
       |  FROM wedges GROUP BY 1),
       |we AS (SELECT wedges.src, dst, w, wtot FROM wedges JOIN wdeg USING (src)),
       |wr0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) AS r FROM wdeg),
       |$rounds
       |$pageRankFinal FROM wr$iters""".stripMargin
  }

  /** Warm-started delta-PageRank oracle (see GraphOps.qPageRankDelta):
    * base rounds over the pre-cutoff subgraph (its own degrees), then a
    * coalesce warm-start over the full node set, then delta rounds over
    * the full graph — every step the same truncating fixed-point
    * arithmetic as q_pagerank's oracle. */
  def pageRankDeltaSql(baseIters: Int, deltaIters: Int): String = {
    val cutoff = graft.graph.GraphOps.DeltaCutoff
    val baseRounds = (1 to baseIters).map { i =>
      s"""b$i AS MATERIALIZED (SELECT dst AS node,
         |  CAST(150000000000 + (85 * sum(r // outdeg)) // 100 AS BIGINT) AS r
         |  FROM be JOIN b${i - 1} ON be.src = b${i - 1}.node GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val deltaRounds = (1 to deltaIters).map { i =>
      s"""d$i AS MATERIALIZED (SELECT dst AS node,
         |  CAST(150000000000 + (85 * sum(r // outdeg)) // 100 AS BIGINT) AS r
         |  FROM e JOIN d${i - 1} ON e.src = d${i - 1}.node GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $tradeGraphCte,
       |bpairs AS MATERIALIZED (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
       |  FROM lineitem WHERE l_shipdate < '$cutoff'),
       |bedges AS MATERIALIZED (SELECT s * 2 AS src, p * 2 + 1 AS dst FROM bpairs
       |  UNION ALL SELECT p * 2 + 1 AS src, s * 2 AS dst FROM bpairs),
       |bdeg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM bedges GROUP BY 1),
       |be AS (SELECT bedges.src, dst, outdeg FROM bedges JOIN bdeg USING (src)),
       |b0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) AS r FROM bdeg),
       |$baseRounds,
       |d0 AS (SELECT deg.src AS node,
       |  CAST(coalesce(b$baseIters.r, 1000000000000) AS BIGINT) AS r
       |  FROM deg LEFT JOIN b$baseIters ON deg.src = b$baseIters.node),
       |$deltaRounds
       |$pageRankFinal FROM d$deltaIters""".stripMargin
  }

  /** Personalized-PageRank oracle: teleport rows only for the seed set,
    * sparse rank relation per round — mirrors
    * [[graft.graph.GraphOps.personalizedPageRank]] exactly. */
  def pprSql(iters: Int, nation: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (SELECT node, CAST(sum(v) AS BIGINT) AS r FROM (
         |  SELECT dst AS node, (85 * sum(r // outdeg)) // 100 AS v
         |  FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node GROUP BY dst
         |  UNION ALL SELECT node, 150000000000 FROM seeds) u$i GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $tradeGraphCte,
       |seeds AS (SELECT s_suppkey * 2 AS node FROM supplier
       |          WHERE s_nationkey = $nation),
       |r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM seeds),
       |$rounds
       |$pageRankFinal FROM r$iters""".stripMargin
  }

  /** Unrolled oracle for q_pagerank_dangling: DIRECTED supplier→part
    * graph (parts are sinks), dangling mass redistributed uniformly each
    * round, and the residual stop expressed as per-round FREEZING — round
    * i keeps r(i-1) verbatim once max|r(i-1) − r(i-2)| < eps, and frozen
    * rounds stay frozen (their residual is 0), so the full unrolling
    * equals the implementation's early-stopped result at whatever round
    * the data converges. Mirrors
    * [[graft.graph.GraphOps.pageRankDangling]] exactly. */
  def pageRankDanglingSql(eps: Long, maxIters: Int): String = {
    // every CTE MATERIALIZED: each round is referenced by up to four
    // later CTEs, and default CTE inlining makes the 40-round unrolling
    // grow multiplicatively (measured: DuckDB exhausts file handles on
    // the exploded parquet scans before finishing planning)
    val rounds = (1 to maxIters).map { i =>
      val step =
        s"""d$i AS MATERIALIZED (SELECT COALESCE(sum(r), 0) AS dm FROM r${i - 1}
           |  WHERE node NOT IN (SELECT src FROM deg)),
           |s$i AS MATERIALIZED (SELECT n.node,
           |  CAST(150000000000 + (85 * (COALESCE(c.sc, 0) +
           |    (SELECT dm FROM d$i) // (SELECT n FROM nc))) // 100 AS BIGINT) AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT dst AS node, sum(r // outdeg) AS sc
           |    FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node GROUP BY 1) c
           |  ON n.node = c.node)""".stripMargin
      if (i == 1) step + ",\nr1 AS MATERIALIZED (SELECT * FROM s1)"
      else step +
        s""",
           |res$i AS MATERIALIZED (SELECT max(abs(a.r - b.r)) AS m
           |  FROM r${i - 1} a JOIN r${i - 2} b ON a.node = b.node),
           |r$i AS MATERIALIZED (SELECT s.node, CASE WHEN (SELECT m FROM res$i) < $eps
           |    THEN p.r ELSE s.r END AS r
           |  FROM s$i s JOIN r${i - 1} p ON s.node = p.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
       |edges AS MATERIALIZED (SELECT s * 2 AS src, p * 2 + 1 AS dst FROM pairs),
       |deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
       |e AS MATERIALIZED (SELECT edges.src, dst, outdeg FROM edges JOIN deg USING (src)),
       |nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |nc AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
       |r0 AS MATERIALIZED (SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM nodes),
       |$rounds
       |$pageRankFinal FROM r$maxIters""".stripMargin
  }

  /** Unrolled full-batch-GD CTE chain for q_quality_classifier: one
    * (score, error, gradient, weight-update) CTE block per epoch, hard
    * sigmoid, sign-safe truncating divisions — replays
    * [[graft.pipeline.QualityClassifier]]'s fixed-point training
    * bit-exactly. Ends at `sc` (doc_id, z = final fixed-point logit) so
    * [[corpusBuildV3Oracle]] can compose it; `lab` carries the labels. */
  def qualityClassifierCte(dims: Int, epochs: Int): String = {
    val S = graft.pipeline.QualityClassifier.S
    def sdiv(a: String, b: String) =
      s"(CASE WHEN $a >= 0 THEN ($a) // $b ELSE -((-($a)) // $b) END)"
    val rounds = (1 to epochs).map { i =>
      s"""z$i AS MATERIALIZED (SELECT f.doc_id, sum(f.x * w.w) AS z
         |  FROM fx f JOIN w${i - 1} w USING (dim) GROUP BY 1),
         |e$i AS MATERIALIZED (SELECT z.doc_id,
         |  greatest(0, least($S, ${S / 2} + ${sdiv("z.z", "4")})) - l.y * $S AS err
         |  FROM z$i z JOIN lab l USING (doc_id)),
         |g$i AS MATERIALIZED (SELECT f.dim, sum(e.err * f.x) AS s
         |  FROM fx f JOIN e$i e USING (doc_id) GROUP BY 1),
         |w$i AS MATERIALIZED (SELECT w.dim,
         |  CAST(w.w - ${sdiv(sdiv("COALESCE(g.s, 0)", "(SELECT n FROM nn)"), "4")} AS BIGINT) AS w
         |  FROM w${i - 1} w LEFT JOIN g$i g USING (dim))""".stripMargin
    }.mkString(",\n")
    s"""toks AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |fx AS MATERIALIZED (
       |  SELECT doc_id, dim, CAST(sum(sgn) AS BIGINT) AS x FROM (
       |    SELECT doc_id,
       |      CAST(('0x' || substr(md5('qc:' || tok), 1, 2))::UBIGINT % $dims AS BIGINT) AS dim,
       |      CASE WHEN ('0x' || substr(md5('qc:' || tok), 3, 1))::UBIGINT % 2 = 0
       |           THEN 1 ELSE -1 END AS sgn
       |    FROM toks) GROUP BY 1, 2
       |  UNION ALL
       |  SELECT doc_id, CAST($dims AS BIGINT), CAST(1 AS BIGINT) FROM documents),
       |lab AS MATERIALIZED (SELECT doc_id,
       |  CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM documents),
       |w0 AS MATERIALIZED (SELECT CAST(t.d AS BIGINT) AS dim, CAST(0 AS BIGINT) AS w
       |  FROM range(0, ${dims + 1}) t(d)),
       |$rounds,
       |sc AS (SELECT f.doc_id, sum(f.x * w.w) AS z
       |  FROM fx f JOIN w$epochs w USING (dim) GROUP BY 1)""".stripMargin
  }

  def qualityClassifierSql(dims: Int, epochs: Int): String =
    s"""WITH ${qualityClassifierCte(dims, epochs)}
       |SELECT sc.doc_id, CAST(l.y AS BIGINT) AS label,
       |  CAST(sc.z AS BIGINT) AS score_fp, sc.z >= 0 AS keep
       |FROM sc JOIN lab l USING (doc_id)""".stripMargin

  /** Exact ROC AUC over the trained scorer's score histogram — the
    * q_mann_whitney 2U algebra (ties half-credited, all integer). */
  def aucSql(dims: Int, epochs: Int): String =
    s"""WITH ${qualityClassifierCte(dims, epochs)},
       |scored AS (SELECT CAST(sc.z AS BIGINT) AS score_fp,
       |    CAST(l.y AS BIGINT) AS label
       |  FROM sc JOIN lab l USING (doc_id)),
       |h AS (SELECT score_fp, CAST(sum(label) AS BIGINT) AS np,
       |    CAST(sum(1 - label) AS BIGINT) AS nn
       |  FROM scored GROUP BY 1),
       |c AS (SELECT np, nn, COALESCE(sum(nn) OVER (ORDER BY score_fp
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumnn
       |  FROM h)
       |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       |  CAST(sum(nn) AS BIGINT) AS n_neg,
       |  CAST(sum(2::HUGEINT * np * cumnn + np::HUGEINT * nn) AS BIGINT)
       |    AS auc_x2,
       |  CAST(sum(2::HUGEINT * np * cumnn + np::HUGEINT * nn) * 500000
       |    // (sum(np)::HUGEINT * sum(nn)) AS BIGINT) AS auc_ppm
       |FROM c""".stripMargin

  /** Calibration census over the trained scorer (see
    * QualityClassifier.qCalibration): hard-sigmoid ppm probabilities,
    * 10 equal-width bins, exact truncating-ppm confidence vs observed
    * rate per bin (p >= 0, so `//` here equals Spark's `div`). */
  def calibrationSql(dims: Int, epochs: Int): String = {
    val S = graft.pipeline.QualityClassifier.S
    val sdiv = s"(CASE WHEN sc.z >= 0 THEN (sc.z) // 4 ELSE -((-(sc.z)) // 4) END)"
    s"""WITH ${qualityClassifierCte(dims, epochs)},
       |pp AS (SELECT l.y,
       |    CAST(greatest(0, least($S, ${S / 2} + $sdiv)) AS BIGINT) AS p
       |  FROM sc JOIN lab l USING (doc_id))
       |SELECT CAST(least(9, p // 100000) AS BIGINT) AS bin, count(*) AS n_docs,
       |  CAST(CAST(sum(p) AS BIGINT) // count(*) AS BIGINT) AS conf_ppm,
       |  CAST((1000000 * CAST(sum(y) AS BIGINT)) // count(*) AS BIGINT) AS acc_ppm,
       |  CAST(abs(CAST(sum(p) AS BIGINT) // count(*)
       |       - (1000000 * CAST(sum(y) AS BIGINT)) // count(*)) AS BIGINT) AS gap_ppm
       |FROM pp GROUP BY 1""".stripMargin
  }

  def pass4(x: String): String =
    s"chr(97 + CAST(($x) // 17576 AS INT) % 26) || chr(97 + CAST(($x) // 676 AS INT) % 26) || " +
      s"chr(97 + CAST(($x) // 26 AS INT) % 26) || chr(97 + CAST(($x) AS INT) % 26)"

  /** Recursive-CTE reachability over the exact-Jaccard pair relation —
    * the shared cluster computation behind q_dedup_clusters,
    * q_dedup_incremental, and q_dedup_keep_best. Ends at the `reach`
    * relation; each consumer appends its own final SELECT. */
  val dedupClustersCte: String =
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
      |edges AS MATERIALIZED (SELECT d1 AS src, d2 AS dst FROM pairs
      |          UNION ALL SELECT d2, d1 FROM pairs),
      |reach(id, r) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT reach.id, edges.dst FROM reach JOIN edges ON reach.r = edges.src)""".stripMargin

  /** Shared by q_dedup_clusters and q_dedup_incremental (the incremental
    * ingest is CONTRACTED to equal the from-scratch result): min reachable
    * id per node = cluster label. */
  val dedupClustersOracle: String =
    dedupClustersCte + "\n" +
      """SELECT id AS doc_id, min(r) AS cluster_id, min(r) = id AS is_keeper
        |FROM reach GROUP BY id""".stripMargin

  /** Same clusters, quality-priority keeper policy: longest member wins,
    * doc_id breaks length ties. */
  val dedupKeepBestOracle: String =
    dedupClustersCte + ",\n" +
      """cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
        |m AS (SELECT cl.cluster_id, cl.doc_id, d.n_chars,
        |        row_number() OVER (PARTITION BY cl.cluster_id
        |                           ORDER BY d.n_chars DESC, cl.doc_id) AS rn,
        |        count(*) OVER (PARTITION BY cl.cluster_id) AS n_members
        |      FROM cl JOIN documents d ON cl.doc_id = d.doc_id)
        |SELECT cluster_id, doc_id AS rep_doc_id, n_chars AS rep_chars,
        |  CAST(n_members AS BIGINT) AS n_members
        |FROM m WHERE rn = 1""".stripMargin

  /** The salted DSIR bucket-weight chain — ends at
    * `dsird (doc_id, n_tokens, dsir_score)`. Shared by q_dsir_weights
    * and [[corpusBuildV3Oracle]]. */
  val dsirWeightsCte: String =
    """wb AS (SELECT doc_id, lang,
      |    CAST(('0x' || substr(md5('dsir:' || tok), 1, 2))::UBIGINT % 64 AS BIGINT) AS bucket
      |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)),
      |bg AS (SELECT bucket, count(*) AS cb FROM wb GROUP BY 1),
      |tg AS (SELECT bucket, count(*) AS ct FROM wb WHERE lang = 'en' GROUP BY 1),
      |w AS (SELECT bucket, ((coalesce(ct, 0) + 1) * 1000000) // (cb + 1) AS w
      |      FROM bg LEFT JOIN tg USING (bucket)),
      |dsird AS (SELECT doc_id, count(*) AS n_tokens, CAST(sum(w) AS BIGINT) AS dsir_score
      |          FROM wb JOIN w USING (bucket) GROUP BY 1)""".stripMargin

  /** Capstone v2: the round-5 stages replayed over the shared cluster
    * CTE — gate, salted cap, dedup keep-lists, decontamination, split. */
  val corpusBuildV2Oracle: String =
    dedupClustersCte + ",\n" +
      """near_losers AS (SELECT id AS doc_id FROM reach GROUP BY id
        |                HAVING min(r) <> id),
        |exact_losers AS (SELECT doc_id FROM (
        |  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep
        |  FROM documents) WHERE doc_id <> keep),
        |gated AS (SELECT doc_id, lang, source, n_chars FROM (
        |    SELECT doc_id, lang, source, n_chars,
        |      CAST(row_number() OVER (PARTITION BY lang
        |        ORDER BY n_chars DESC, doc_id) AS BIGINT) AS grn,
        |      count(*) OVER (PARTITION BY lang) AS n_l
        |    FROM documents)
        |  WHERE grn * 1000 <= n_l * 700 + 999),
        |capped AS (SELECT doc_id, lang, n_chars FROM (
        |    SELECT doc_id, lang, n_chars,
        |      CAST(row_number() OVER (PARTITION BY source
        |        ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS crn
        |    FROM gated)
        |  WHERE crn <= 15),
        |b AS (SELECT doc_id,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
        |          AS BIGINT) AS bucket
        |      FROM documents),
        |esh AS (SELECT DISTINCT sh.sh AS s
        |        FROM sh JOIN b ON sh.doc_id = b.doc_id WHERE b.bucket >= 90),
        |cont AS (SELECT DISTINCT sh.doc_id
        |         FROM sh JOIN b ON sh.doc_id = b.doc_id
        |         JOIN esh ON sh.sh = esh.s
        |         WHERE b.bucket < 80)
        |SELECT CASE WHEN b.bucket < 80 THEN 'train'
        |            WHEN b.bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  c.lang, count(*) AS n_docs, CAST(sum(c.n_chars) AS BIGINT) AS n_chars
        |FROM capped c JOIN b ON c.doc_id = b.doc_id
        |WHERE c.doc_id NOT IN (SELECT doc_id FROM exact_losers)
        |  AND c.doc_id NOT IN (SELECT doc_id FROM near_losers)
        |  AND c.doc_id NOT IN (SELECT doc_id FROM cont)
        |GROUP BY 1, 2""".stripMargin

  /** Capstone v3: the model-driven build — the classifier training CTEs
    * ([[qualityClassifierCte]]), the SemDeDup cluster CTEs
    * ([[ivfTrainCte]] + [[semDedupReachCte]]), and the DSIR weight CTEs
    * ([[dsirWeightsCte]]) composed under one WITH RECURSIVE, then the
    * rank gate / loser drop / salted importance draw / split census —
    * replaying [[graft.pipeline.TrainingData.qCorpusBuildV3]] stage for
    * stage. */
  val corpusBuildV3Oracle: String =
    s"""WITH RECURSIVE ${qualityClassifierCte(64, 4)},
       |$ivfTrainCte,
       |$semDedupReachCte,
       |sem_losers AS (SELECT id AS doc_id FROM reach GROUP BY id
       |               HAVING min(rr) <> id),
       |$dsirWeightsCte,
       |samp AS (SELECT doc_id FROM dsird
       |  WHERE CAST(('0x' || substr(md5('v3samp:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
       |          % 2000000 AS BIGINT) < dsir_score // n_tokens),
       |gated AS (SELECT doc_id, lang, n_chars FROM (
       |    SELECT d.doc_id, d.lang, d.n_chars,
       |      CAST(row_number() OVER (PARTITION BY d.lang
       |        ORDER BY sc.z DESC, d.doc_id) AS BIGINT) AS grn,
       |      count(*) OVER (PARTITION BY d.lang) AS n_l
       |    FROM documents d JOIN sc ON d.doc_id = sc.doc_id)
       |  WHERE grn * 1000 <= n_l * 600 + 999),
       |bk AS (SELECT doc_id,
       |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
       |          AS BIGINT) AS bucket
       |      FROM documents)
       |SELECT CASE WHEN bk.bucket < 80 THEN 'train'
       |            WHEN bk.bucket < 90 THEN 'val' ELSE 'test' END AS split,
       |  g.lang, count(*) AS n_docs, CAST(sum(g.n_chars) AS BIGINT) AS n_chars
       |FROM gated g JOIN bk ON g.doc_id = bk.doc_id
       |WHERE g.doc_id NOT IN (SELECT doc_id FROM sem_losers)
       |  AND g.doc_id IN (SELECT doc_id FROM samp)
       |GROUP BY 1, 2""".stripMargin
}
