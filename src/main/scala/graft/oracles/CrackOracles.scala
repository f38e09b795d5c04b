package graft.oracles

import graft.oracles.OracleCtes._

/** DuckDB oracle SQL for the keyspace-scan / crack family (split from SparkEntry in r11;
  * entries unchanged — SparkEntry.baseOracleSql concatenates the
  * family maps). */
private[graft] object CrackOracles {
  val sql: Map[String, String] = Map(
    "q_crack_found" -> "SELECT 'abcd' AS pass",
    "q_crack_notfound" -> "SELECT CAST(NULL AS VARCHAR) AS pass WHERE FALSE",
    "q_crack_len5" -> "SELECT 'hello' AS pass",
    "q_crack_chunked" -> "SELECT 'abcd' AS pass",
    "q_crack_sql" -> "SELECT 'abcd' AS pass",
    "q_crack_multilen" -> "SELECT * FROM (VALUES (2, 'ab')) t(len, pass)",
    "q_crack_multi" ->
      """SELECT * FROM (VALUES
        |  ('81fe8bfe87576c3ecb22426f8e57847382917acf', 'abcd'),
        |  ('a94a8fe5ccb19ba61c4c0873d391e987982fbbd3', 'test')) t(hash, pass)""".stripMargin,
    "q_keyspace_roundtrip" ->
      """SELECT i AS id,
        |  chr(97 + CAST(i // 676 AS INT) % 26) || chr(97 + CAST(i // 26 AS INT) % 26) || chr(97 + CAST(i AS INT) % 26) AS pass,
        |  i AS back
        |FROM generate_series(0, 17575) t(i)""".stripMargin,
    "q_keyspace_tile" ->
      s"""WITH t AS (SELECT i, CAST(456976 // 10 AS BIGINT) AS base, CAST(456976 % 10 AS BIGINT) AS rem
         |           FROM generate_series(0, 9) s(i)),
         |b AS (SELECT CAST(i AS BIGINT) AS part_id,
         |             i * base + least(i, rem) AS lo,
         |             (i + 1) * base + least(i + 1, rem) - 1 AS hi FROM t)
         |SELECT part_id, lo, hi, ${pass4("lo")} AS lo_pass, ${pass4("hi")} AS hi_pass FROM b""".stripMargin,
  )
}
