package graft.oracles

import graft.oracles.OracleCtes._

/** DuckDB oracle SQL for the graph-analytics family (split from SparkEntry in r11;
  * entries unchanged — SparkEntry.baseOracleSql concatenates the
  * family maps). */
private[graft] object GraphOracles {
  val sql: Map[String, String] = Map(
    "q_louvain" -> louvainSql(graft.graph.GraphOps.LouvainRounds),
    "q_pagerank" -> pageRankSql(5),
    "q_pagerank_seeded" -> pprSql(5, 3),
    "q_pagerank_delta" -> pageRankDeltaSql(5, 2),
    "q_pagerank_dangling" -> pageRankDanglingSql(
      graft.graph.GraphOps.DanglingEps, graft.graph.GraphOps.DanglingMaxIters),
    // copurchaseCte opens the WITH; the reach closure needs RECURSIVE
    "q_influence_spread" ->
      s"""${copurchaseCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |arcs AS (SELECT u AS a, v AS b FROM und
         |  UNION ALL SELECT v, u FROM und),
         |live AS (SELECT a, b FROM arcs
         |  WHERE ('0x' || substring(md5('ic:' || a || ':' || b), 1, 8))
         |    ::UBIGINT % 100 < 30),
         |nl AS (SELECT CAST(count(*) AS BIGINT) AS n_live_arcs FROM live),
         |seeds AS (SELECT node FROM (SELECT u AS node FROM und
         |    UNION SELECT v FROM und) ORDER BY node LIMIT 3),
         |reach(s, v) AS (SELECT node, node FROM seeds
         |  UNION
         |  SELECT r.s, l.b FROM reach r JOIN live l ON r.v = l.a)
         |SELECT s AS seed, CAST(count(*) AS BIGINT) AS n_reached,
         |  nl.n_live_arcs
         |FROM reach CROSS JOIN nl GROUP BY 1, 3 ORDER BY 1""".stripMargin,
    "q_random_walks" -> randomWalkSql(10, 2),
    "q_walk_pairs" -> walkPairsSql(10, 2, graft.graph.GraphOps.PairWindow),
    "q_node_embed" -> nodeEmbedSql(10, 2, graft.graph.GraphOps.PairWindow),
    "q_embed_eval" -> embedEvalSql(10, 2, graft.graph.GraphOps.PairWindow),
    "q_label_prop" -> labelPropSql(graft.graph.GraphOps.LabelPropIters),
    "q_modularity" -> modularitySql(graft.graph.GraphOps.LabelPropIters),
    "q_copurchase" ->
      s"""$copurchaseCte
         |, ic AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
         |         FROM li GROUP BY 1),
         |no AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM li)
         |SELECT e.u, e.v, e.support,
         |  CAST(e.support * no.n AS DOUBLE) / (c1.c * c2.c) AS lift
         |FROM und e CROSS JOIN no
         |JOIN ic c1 ON e.u = c1.l_partkey
         |JOIN ic c2 ON e.v = c2.l_partkey""".stripMargin,
    "q_assoc_rules" ->
      s"""$copurchaseCte
         |, ic AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
         |         FROM li GROUP BY 1),
         |no AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
         |       FROM li),
         |rules AS (SELECT u AS antecedent, v AS consequent, support
         |            FROM und
         |          UNION ALL
         |          SELECT v AS antecedent, u AS consequent, support
         |            FROM und)
         |SELECT r.antecedent, r.consequent, r.support,
         |  CAST((1000000::HUGEINT * r.support) // ca.c AS BIGINT)
         |    AS confidence_ppm,
         |  CAST((1000000::HUGEINT * r.support * no.n)
         |    // (ca.c::HUGEINT * cc.c) AS BIGINT) AS lift_ppm
         |FROM rules r CROSS JOIN no
         |JOIN ic ca ON r.antecedent = ca.l_partkey
         |JOIN ic cc ON r.consequent = cc.l_partkey""".stripMargin,
    // same basket CTE; kNN truncation and rec ranks replay the
    // (score DESC, id) heap-operator total order
    "q_item_cf" ->
      s"""$copurchaseCte
         |, ic AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
         |         FROM li GROUP BY 1),
         |sym AS (SELECT u, v, support FROM und
         |        UNION ALL SELECT v, u, support FROM und),
         |sim AS (SELECT sym.u, sym.v,
         |    CAST((CAST(sym.support AS HUGEINT) * sym.support * 1000000000000)
         |      // (cu.c::HUGEINT * cv.c) AS BIGINT) AS cos2_fp
         |  FROM sym JOIN ic cu ON sym.u = cu.l_partkey
         |  JOIN ic cv ON sym.v = cv.l_partkey),
         |top AS (SELECT u, v, cos2_fp FROM (
         |    SELECT u, v, cos2_fp, row_number() OVER (
         |      PARTITION BY u ORDER BY cos2_fp DESC, v) AS rn FROM sim)
         |  WHERE rn <= 5),
         |own AS (SELECT DISTINCT o.o_custkey AS cust, li.l_partkey AS item
         |        FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
         |        WHERE o.o_custkey < 20),
         |cand AS (SELECT own.cust, t.v AS rec,
         |    CAST(sum(t.cos2_fp) AS BIGINT) AS score_fp
         |  FROM own JOIN top t ON own.item = t.u
         |  LEFT JOIN own o2 ON o2.cust = own.cust AND o2.item = t.v
         |  WHERE o2.item IS NULL
         |  GROUP BY 1, 2)
         |SELECT cust AS c_custkey, rec AS rec_part, score_fp, rnk FROM (
         |  SELECT cust, rec, score_fp, CAST(row_number() OVER (
         |    PARTITION BY cust ORDER BY score_fp DESC, rec) AS BIGINT) AS rnk
         |  FROM cand) WHERE rnk <= 3""".stripMargin,
    "q_luby_mis" -> lubyMisSql(8),
    // directed nation-trade SCCs: at-or-above-mean edge gate (exact
    // integer cross-multiply), recursive-CTE transitive closure,
    // scc id = min mutual-reach node; isolated nations are singletons
    "q_scc_trade" ->
      """WITH RECURSIVE e0 AS (
        |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS n
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY 1, 2),
        |stats AS (SELECT count(*) AS n_pairs, CAST(sum(n) AS BIGINT) AS tot
        |          FROM e0),
        |e AS (SELECT src, dst FROM e0, stats WHERE n * n_pairs >= tot),
        |r(src, dst) AS (
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src),
        |mut AS (SELECT r1.dst AS v, r1.src AS u
        |        FROM r r1 JOIN r r2 ON r1.src = r2.dst AND r1.dst = r2.src),
        |sid AS (SELECT n.n_nationkey AS v,
        |          least(n.n_nationkey, coalesce(min(m.u), n.n_nationkey))
        |            AS scc_id
        |        FROM nation n LEFT JOIN mut m ON m.v = n.n_nationkey
        |        GROUP BY 1),
        |sz AS (SELECT scc_id, count(*) AS scc_size FROM sid GROUP BY 1),
        |outd AS (SELECT src, count(*) AS n_out FROM e GROUP BY 1)
        |SELECT n.n_name AS nation, CAST(s.scc_id AS BIGINT) AS scc_id,
        |  CAST(z.scc_size AS BIGINT) AS scc_size,
        |  CAST(coalesce(o.n_out, 0) AS BIGINT) AS n_out
        |FROM nation n JOIN sid s ON n.n_nationkey = s.v
        |JOIN sz z ON s.scc_id = z.scc_id
        |LEFT JOIN outd o ON n.n_nationkey = o.src""".stripMargin,
    "q_kcore" -> kCoreSql,
    "q_mst" -> mstSql,
    "q_betweenness" -> betweennessSql(8, 20, 12),
    "q_hyperball" -> hyperBallSql(2),
    "q_effective_diameter" -> effectiveDiameterSql(3),
    // reuses tradeGraphCte's degree-annotated arc relation `e` — the
    // encoding/dedup single-source rule of every trade-graph oracle
    "q_assortativity" ->
      s"""WITH $tradeGraphCte,
         |j AS (SELECT CAST(e.outdeg AS BIGINT) AS du,
         |        CAST(d2.outdeg AS BIGINT) AS dv
         |      FROM e JOIN deg d2 ON e.dst = d2.src),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS m,
         |    CAST(sum(du) AS BIGINT) AS sx,
         |    CAST(sum(du * du) AS BIGINT) AS sxx,
         |    CAST(sum(du * dv) AS BIGINT) AS sxy
         |  FROM j)
         |SELECT m AS n_arcs, sx, sxx, sxy,
         |  CAST(m::HUGEINT * sxy - sx::HUGEINT * sx AS BIGINT) AS cov_num,
         |  round(CAST(m::HUGEINT * sxy - sx::HUGEINT * sx AS DOUBLE)
         |    / CAST(m::HUGEINT * sxx - sx::HUGEINT * sx AS DOUBLE), 6)
         |    AS assortativity
         |FROM m""".stripMargin,
    "q_bfs_dist" ->
      bfsSql("NATION_3", graft.graph.GraphOps.BfsMaxDepth),
    "q_sssp" ->
      ssspSql("NATION_3", graft.graph.GraphOps.SsspMaxRounds),
    "q_harmonic_centrality" -> harmonicCentralitySql(2, 20),
    "q_hits" -> hitsSql(graft.graph.GraphOps.HitsIters),
    "q_pagerank_weighted" -> pageRankWeightedSql(5),
    // floor(log2) via bit length — printf('%b') in DuckDB, bin() in
    // Spark — so the bucket never touches an IEEE logarithm
    "q_degree_hist" ->
      """WITH li AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
        |e AS (SELECT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM li
        |      UNION ALL SELECT l_partkey * 2 + 1, l_suppkey * 2 FROM li),
        |d AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        |      FROM e GROUP BY 1)
        |SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END
        |    AS node_type,
        |  CAST(length(printf('%b', deg)) - 1 AS BIGINT) AS bucket,
        |  count(*) AS n_nodes, min(deg) AS min_deg, max(deg) AS max_deg,
        |  CAST(sum(deg) AS BIGINT) AS sum_deg
        |FROM d GROUP BY 1, 2""".stripMargin,
    // RA index in integer ppm: 1e6 // deg(z) per shared neighbor —
    // exact integer semantics, no IEEE accumulation anywhere
    "q_link_predict" ->
      s"""$copurchaseCte
         |, adj AS (SELECT u AS z, v AS n FROM und
         |          UNION ALL SELECT v, u FROM und),
         |dg AS (SELECT z, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
         |adjd AS (SELECT a.z, a.n, d.deg FROM adj a JOIN dg d ON a.z = d.z
         |         WHERE d.deg <= ${graft.graph.GraphOps.LinkPredictMaxDeg}),
         |pr AS (SELECT x.n AS a, y.n AS b, x.deg AS degz
         |       FROM adjd x JOIN adjd y ON x.z = y.z AND x.n < y.n),
         |sc AS (SELECT a, b, count(*) AS cn,
         |         CAST(sum(1000000 // degz) AS BIGINT) AS ra_ppm
         |       FROM pr GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT s.a, s.b, s.cn, s.ra_ppm FROM sc s
         |ANTI JOIN und e ON s.a = e.u AND s.b = e.v""".stripMargin,
    // degree-ordered orientation: okey = deg·2³² + id packs the
    // (degree, id) total order into one comparable scalar in both engines
    "q_triangles" ->
      s"""$copurchaseCte
         |, deg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM
         |          (SELECT u AS n FROM und UNION ALL SELECT v FROM und)
         |          GROUP BY 1),
         |ok AS (SELECT n, deg, deg * 4294967296 + n AS okey FROM deg),
         |ori AS (SELECT CASE WHEN du.okey < dv.okey THEN u ELSE v END AS src,
         |          CASE WHEN du.okey < dv.okey THEN v ELSE u END AS dst,
         |          greatest(du.okey, dv.okey) AS dkey
         |        FROM und JOIN ok du ON u = du.n JOIN ok dv ON v = dv.n),
         |tri AS (SELECT x.src AS a, x.dst AS b, y.dst AS c
         |        FROM ori x JOIN ori y ON x.src = y.src AND x.dkey < y.dkey
         |        JOIN ori z ON z.src = x.dst AND z.dst = y.dst),
         |tcnt AS (SELECT n, CAST(count(*) AS BIGINT) AS triangles FROM
         |         (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
         |          UNION ALL SELECT c FROM tri) GROUP BY 1)
         |SELECT d.n AS node, d.deg, coalesce(t.triangles, 0) AS triangles,
         |  CASE WHEN d.deg >= 2 THEN
         |    CAST(2 * coalesce(t.triangles, 0) AS DOUBLE) / (d.deg * (d.deg - 1))
         |  ELSE CAST(0 AS DOUBLE) END AS clustering
         |FROM deg d LEFT JOIN tcnt t ON d.n = t.n""".stripMargin,
    "q_clustering_global" ->
      s"""$copurchaseCte
         |, deg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM
         |          (SELECT u AS n FROM und UNION ALL SELECT v FROM und)
         |          GROUP BY 1),
         |ok AS (SELECT n, deg, deg * 4294967296 + n AS okey FROM deg),
         |ori AS (SELECT CASE WHEN du.okey < dv.okey THEN u ELSE v END AS src,
         |          CASE WHEN du.okey < dv.okey THEN v ELSE u END AS dst,
         |          greatest(du.okey, dv.okey) AS dkey
         |        FROM und JOIN ok du ON u = du.n JOIN ok dv ON v = dv.n),
         |tri AS (SELECT x.src AS a, x.dst AS b, y.dst AS c
         |        FROM ori x JOIN ori y ON x.src = y.src AND x.dkey < y.dkey
         |        JOIN ori z ON z.src = x.dst AND z.dst = y.dst),
         |tcnt AS (SELECT n, CAST(count(*) AS BIGINT) AS triangles FROM
         |         (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
         |          UNION ALL SELECT c FROM tri) GROUP BY 1),
         |pn AS (SELECT d.deg, coalesce(t.triangles, 0) AS triangles
         |       FROM deg d LEFT JOIN tcnt t ON d.n = t.n)
         |SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(sum(deg) // 2 AS BIGINT) AS n_edges,
         |  CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges,
         |  CAST(sum(triangles) // 3 AS BIGINT) AS n_triangles,
         |  CAST(sum(triangles)::HUGEINT * 1000000
         |    // sum(deg * (deg - 1) // 2) AS BIGINT) AS transitivity_ppm
         |FROM pn""".stripMargin,
  )
}
