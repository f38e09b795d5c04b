package graft.oracles

import graft.oracles.OracleCtes._

/** DuckDB oracle SQL for the LSP/DPC wire-analytics family (split from SparkEntry in r11;
  * entries unchanged — SparkEntry.baseOracleSql concatenates the
  * family maps). */
private[graft] object LspOracles {
  val sql: Map[String, String] = Map(
    "q_dpc_classify" -> (logCte +
      """
        |SELECT CASE substr(payload, 1, 1)
        |    WHEN 'j' THEN 'JOIN_REQ' WHEN 'c' THEN 'CRACK_REQ'
        |    WHEN 'f' THEN 'PASS_FOUND' WHEN 'x' THEN 'PASS_NOTFOUND'
        |    ELSE 'UNKNOWN' END AS msg_type,
        |  count(*) AS n_msgs, count(DISTINCT connid) AS n_conns
        |FROM log GROUP BY 1""".stripMargin),
    "q_dpc_parse" -> (logCte +
      """
        |SELECT connid, seqnum,
        |  string_split(payload, ' ')[2] AS hash,
        |  string_split(payload, ' ')[3] AS lower,
        |  string_split(payload, ' ')[4] AS upper
        |FROM log WHERE substr(payload, 1, 1) = 'c'""".stripMargin),
    "q_ack_project" -> (logCte +
      """
        |SELECT connid, seqnum, '' AS ack_payload FROM log
        |WHERE length(payload) > 0""".stripMargin),
    "q_gap_detect" -> (logCte +
      """,
        |kept AS (SELECT * FROM log WHERE event_id % 7 <> 0),
        |g AS (SELECT connid, seqnum,
        |        lag(seqnum) OVER (PARTITION BY connid ORDER BY seqnum) AS prev_seqnum FROM kept)
        |SELECT connid, prev_seqnum, seqnum, seqnum - prev_seqnum - 1 AS n_lost
        |FROM g WHERE prev_seqnum IS NOT NULL AND seqnum - prev_seqnum > 1""".stripMargin),
    "q_lsp_classify" -> (logCte +
      """
        |SELECT CASE
        |    WHEN connid0 = 0 AND seqnum0 = 0 AND len0 = 0 THEN 'CONN_REQ'
        |    WHEN connid0 <> 0 AND seqnum0 = 0 AND len0 = 0 THEN 'CONN_ACK'
        |    WHEN connid0 <> 0 AND seqnum0 > 0 AND len0 > 0 THEN 'DATA_SEND'
        |    WHEN connid0 <> 0 AND seqnum0 > 0 AND len0 = 0 THEN 'DATA_ACK'
        |    ELSE 'INVALID' END AS msg_type,
        |  count(*) AS n_msgs
        |FROM (SELECT
        |    CASE WHEN payload = 'j' THEN 0 ELSE connid END AS connid0,
        |    CASE WHEN payload = 'j' THEN 0 ELSE seqnum END AS seqnum0,
        |    CASE WHEN payload = 'j' THEN 0 ELSE length(payload) END AS len0
        |  FROM log)
        |GROUP BY 1""".stripMargin),
    "q_lsp_wire_roundtrip" -> (logCte +
      """
        |SELECT connid, seqnum, payload FROM log""".stripMargin),
    // the wire roundtrip is the identity on the log; the evolved fields
    // recompute directly from their source expressions
    "q_proto_evolution" -> (logCte +
      """
        |SELECT event_id, connid, seqnum, payload,
        |  event_id % 3 AS priority, substr(payload, 1, 1) AS tag
        |FROM log""".stripMargin),
    "q_retransmit_detect" -> (logCte +
      """,
        |dup AS (SELECT * FROM log
        |        UNION ALL SELECT * FROM log WHERE event_id % 5 = 0)
        |SELECT connid, seqnum, count(*) - 1 AS n_retransmits
        |FROM dup GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin),
  )
}
