package graft.oracles

import graft.oracles.OracleCtes._

/** DuckDB oracle SQL for the multimodal family (split from SparkEntry in r11;
  * entries unchanged — SparkEntry.baseOracleSql concatenates the
  * family maps). */
private[graft] object MultimodalOracles {
  val sql: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  upper(hex(substring(text, 1, 8))) AS header_hex,
        |  CAST(octet_length(encode(text)) % 64 + 1 AS BIGINT) AS width,
        |  CAST(octet_length(encode(text)) // 64 + 1 AS BIGINT) AS height,
        |  CAST(octet_length(encode(text)) % 7 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,
    "q_media_features" -> {
      val fCols = (0 until 8).map(j =>
        s"round(CAST(CAST(coalesce(sums[${j + 1}], 0) / 255.0 / chunk AS REAL) AS DOUBLE), 6) AS f$j")
        .mkString(",\n        |  ")
      s"""WITH m AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents),
         |s AS (SELECT doc_id, nb, greatest(nb // 8, 1) AS chunk,
         |        list_transform(range(0, 8), j ->
         |          list_sum(list_transform(range(0, nb), i ->
         |            CASE WHEN i % 8 = j THEN ascii(substring(text, CAST(i + 1 AS INT), 1)) ELSE 0 END))) AS sums
         |      FROM m)
         |SELECT doc_id, CAST(nb AS BIGINT) AS n_bytes,
         |  CAST(nb % 64 + 1 AS BIGINT) AS width,
         |  CAST(nb // 64 + 1 AS BIGINT) AS height,
         |  CAST(3 AS BIGINT) AS channels,
         |  $fCols
         |FROM s""".stripMargin
    },
    // real-codec WAV query: the decoded PCM sample view reproduces the
    // source text bytes exactly (WavSynth contract: byte b -> sample
    // (b-128)<<8 -> unsigned high byte b), so the feature buckets replay
    // from ascii(text); metadata is container-derived (RIFF header 44
    // bytes + 2 per sample; width = frame count, mono)
    "q_wav_features" -> {
      val fCols = (0 until 8).map(j =>
        s"round(CAST(CAST(coalesce(sums[${j + 1}], 0) / 255.0 / chunk AS REAL) AS DOUBLE), 6) AS f$j")
        .mkString(",\n        |  ")
      s"""WITH m AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents),
         |s AS (SELECT doc_id, nb, greatest(nb // 8, 1) AS chunk,
         |        list_transform(range(0, 8), j ->
         |          list_sum(list_transform(range(0, nb), i ->
         |            CASE WHEN i % 8 = j THEN ascii(substring(text, CAST(i + 1 AS INT), 1)) ELSE 0 END))) AS sums
         |      FROM m)
         |SELECT doc_id, CAST(44 + 2 * nb AS BIGINT) AS n_bytes,
         |  CAST(nb AS BIGINT) AS width,
         |  CAST(1 AS BIGINT) AS height,
         |  CAST(1 AS BIGINT) AS channels,
         |  $fCols
         |FROM s""".stripMargin
    },
    // 4x4 nearest-neighbor thumbnail over the stub-decoded w x h grid
    "q_media_resize" ->
      """WITH m AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents),
        |d AS (SELECT doc_id, text, nb,
        |        CAST(nb % 64 + 1 AS BIGINT) AS w,
        |        CAST(nb // 64 + 1 AS BIGINT) AS h
        |      FROM m)
        |SELECT doc_id, w AS width, h AS height,
        |  CASE WHEN nb = 0 THEN repeat('00', 16) ELSE
        |    list_reduce(list_transform(range(0, 16), k ->
        |      upper(hex(substring(text,
        |        CAST(greatest(least((k // 4 * h // 4) * w + (k % 4 * w // 4), nb - 1), 0) + 1 AS INT),
        |        1)))), (x, y) -> x || y) END AS thumb_hex
        |FROM d""".stripMargin,
    "q_audio_frames" -> audioFramesSql,
    "q_audio_features" -> audioFeaturesSql,
    "q_frame_sample" ->
      """WITH m AS (SELECT doc_id, text AS b, octet_length(encode(text)) AS nb FROM documents),
        |f AS (SELECT doc_id,
        |        unnest(list_transform(range(0, CAST(nb // 24 AS BIGINT) + 1),
        |          i -> upper(hex(substring(b, CAST(i * 24 + 1 AS INT), 8))))) AS frame_hex,
        |        generate_subscripts(list_transform(range(0, CAST(nb // 24 AS BIGINT) + 1), i -> i), 1) - 1 AS frame_idx
        |      FROM m)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, frame_hex
        |FROM f WHERE length(frame_hex) > 0""".stripMargin,
  )
}
