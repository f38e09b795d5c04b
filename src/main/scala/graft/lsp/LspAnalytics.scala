package graft.lsp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.relational.Tables

/** The LSP/DPC message layer's semantics, re-expressed as relational
  * operators over a message-log DataFrame (SURVEY.md §7.2 step 4).
  *
  * The reference's wire protocol: `LSPMessage{connid, seqnum, payload}`
  * (`lsp.proto:2-6`) carrying ASCII DPC commands `"j"`, `"c <hash> <lower>
  * <upper>"`, `"f <pass>"`, `"x"` (`server.c:103-128`). Here each handler
  * becomes a column expression:
  *   - P8 DPC classifier (`server.c:103-128`) → CASE on first payload char
  *   - P1 command parse (`server.c:372-376`)  → split + getItem
  *   - P10 ACK projection (`lsp_common.c:97-137`) → empty-payload project
  *   - F5/T5 in-order/dedup gate (`lsp_server.c:241-249`) → window lag
  *
  * For driver-verifiable tests the log is derived deterministically from the
  * `events` table (no LSP log exists in the testdata).
  */
object LspAnalytics {

  /** Deterministic synthetic message log derived from `events`:
    * connid = user, seqnum = per-conn arrival order, payload = DPC command
    * chosen by event type (join/crack/found/notfound mirror the reference's
    * four message kinds). */
  def messageLog(spark: SparkSession, dir: String): DataFrame = {
    val byConn = Window.partitionBy("connid").orderBy("ts", "event_id")
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"),
        col("user_id").as("connid"), col("event_type"))
      .withColumn("seqnum", row_number().over(byConn).cast("long"))
      .withColumn("payload",
        when(col("event_type") === "signup", lit("j"))
          .when(col("event_type") === "purchase",
            concat(lit("c "), md5(col("event_id").cast("string")),
              lit(" aaaa zzzz")))
          .when(col("event_type") === "click", lit("f abcd"))
          .when(col("event_type") === "error", lit("x"))
          .otherwise(lit("")))
      .select("event_id", "connid", "seqnum", "payload")
  }

  /** P8: DPC message-type classifier (first payload byte,
    * `server.c:14-20, 103-128`). */
  def dpcMsgType(payload: Column): Column =
    when(substring(payload, 1, 1) === "j", "JOIN_REQ")
      .when(substring(payload, 1, 1) === "c", "CRACK_REQ")
      .when(substring(payload, 1, 1) === "f", "PASS_FOUND")
      .when(substring(payload, 1, 1) === "x", "PASS_NOTFOUND")
      .otherwise("UNKNOWN")

  /** Message-kind census over the log. */
  def qDpcClassify(spark: SparkSession, dir: String): DataFrame =
    messageLog(spark, dir)
      .groupBy(dpcMsgType(col("payload")).as("msg_type"))
      .agg(count(lit(1)).as("n_msgs"),
        countDistinct(col("connid")).as("n_conns"))

  /** P1: positional command parse of `"c <hash> <lower> <upper>"`
    * (`server.c:372-376`, `worker.c:68-72`) — real column extraction, not
    * the reference's in-place strtok. */
  def qDpcParse(spark: SparkSession, dir: String): DataFrame = {
    val parts = split(col("payload"), " ")
    messageLog(spark, dir)
      .filter(substring(col("payload"), 1, 1) === "c")
      .select(
        col("connid"), col("seqnum"),
        parts.getItem(1).as("hash"),
        parts.getItem(2).as("lower"),
        parts.getItem(3).as("upper"))
  }

  /** P10: ACK projection — data messages mapped to their ACKs (same
    * connid+seqnum, empty payload; `lsp_common.c:97-137`). */
  def qAckProject(spark: SparkSession, dir: String): DataFrame =
    messageLog(spark, dir)
      .filter(length(col("payload")) > 0)
      .select(col("connid"), col("seqnum"), lit("").as("ack_payload"))

  /** F5-as-analytics: sequence-gap detection after deterministic packet
    * loss (every 7th message dropped ≅ F9 Bernoulli drop,
    * `lsp_common.c:41-95`). A gap row = the reference's silent-drop branch
    * (`lsp_server.c:241-249`) firing. */
  def qGapDetect(spark: SparkSession, dir: String): DataFrame = {
    val byConn = Window.partitionBy("connid").orderBy("seqnum")
    messageLog(spark, dir)
      .filter(col("event_id") % 7 =!= 0)
      .withColumn("prev_seqnum", lag("seqnum", 1).over(byConn))
      .filter(col("prev_seqnum").isNotNull &&
        col("seqnum") - col("prev_seqnum") > 1)
      .select(col("connid"), col("prev_seqnum"), col("seqnum"),
        (col("seqnum") - col("prev_seqnum") - 1).as("n_lost"))
  }

  /** F9: Bernoulli packet-drop chaos filter (`lsp_common.c:6-35`):
    * drop each row with probability `dropRate`, seeded → reproducible; rows
    * whose `isConnReq` column is true are never dropped (the reference
    * never drops CONN_REQ, `lsp_common.c:80-91`). Test-harness operator. */
  def bernoulliThin(
      df: DataFrame, dropRate: Double, seed: Long,
      protectCol: Option[Column] = None): DataFrame = {
    val keep = rand(seed) >= dropRate
    df.filter(protectCol.fold(keep)(p => p || keep))
  }

  /** T3-as-analytics: retransmit detection over a log with duplicated
    * (connid, seqnum) frames — deterministic dup injection (every 5th
    * message re-sent) stands in for the reference's epoch resend
    * (`lsp_server.c:71-89`). Output: one row per retransmitted seqnum. */
  def qRetransmitDetect(spark: SparkSession, dir: String): DataFrame = {
    val log = messageLog(spark, dir)
    val withDups = log.unionAll(log.filter(col("event_id") % 5 === 0))
    withDups
      .groupBy("connid", "seqnum")
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(col("connid"), col("seqnum"),
        (col("n_copies") - 1).as("n_retransmits"))
  }

  /** P9: LSP message-type classifier on (connid, seqnum, payload length)
    * (`lsp_common.c:149-159`): (0,0,0)→CONN_REQ, (≠0,0,0)→CONN_ACK,
    * (≠0,>0,>0)→DATA_SEND, (≠0,>0,0)→DATA_ACK. */
  def lspMsgType(connid: Column, seqnum: Column, payloadLen: Column): Column =
    when(connid === 0 && seqnum === 0 && payloadLen === 0, "CONN_REQ")
      .when(connid =!= 0 && seqnum === 0 && payloadLen === 0, "CONN_ACK")
      .when(connid =!= 0 && seqnum > 0 && payloadLen > 0, "DATA_SEND")
      .when(connid =!= 0 && seqnum > 0 && payloadLen === 0, "DATA_ACK")
      .otherwise("INVALID")

  /** S4/S5 wire parity: every log row encoded to an LSPMessage protobuf
    * frame and decoded back — the output must be the identity on the log
    * (which is exactly what the oracle asserts). Runs both codec
    * directions inside whole-stage codegen. */
  def qLspWireRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{lsp_decode, lsp_encode}
    messageLog(spark, dir)
      .select(lsp_decode(
        lsp_encode(col("connid"), col("seqnum"), col("payload").cast("binary")))
        .as("m"))
      .select(col("m.connid").as("connid"), col("m.seqnum").as("seqnum"),
        col("m.payload").cast("string").as("payload"))
  }

  /** S4/S5 generalization — schema-driven codec + schema EVOLUTION in one
    * relation: each log row is encoded by an EVOLVED writer (two extra
    * fields: a priority varint and a string tag), then read back by (a)
    * the evolved reader (full fidelity) and (b) the frozen base-schema
    * reader, which must skip the unknown fields and still recover the
    * original message — the forward-compatibility contract protobuf
    * exists for, exercised end-to-end through [[ProtoCodec]]. The oracle
    * asserts both: identity on the base columns and fidelity of the
    * evolved ones. */
  def qProtoEvolution(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{proto_decode, proto_encode}
    val base = "1:connid:uint64,2:seqnum:uint64,3:payload:bytes"
    val evolved = base + ",4:priority:uint64,5:tag:string"
    messageLog(spark, dir)
      .select(col("event_id"),
        proto_encode(
          struct(col("connid"), col("seqnum"), col("payload").cast("binary"),
            (col("event_id") % 3).as("priority"),
            substring(col("payload"), 1, 1).as("tag")),
          evolved).as("frame"))
      .select(col("event_id"),
        proto_decode(col("frame"), base).as("b"),
        proto_decode(col("frame"), evolved).as("e"))
      .select(col("event_id"),
        col("b.connid").as("connid"), col("b.seqnum").as("seqnum"),
        col("b.payload").cast("string").as("payload"),
        col("e.priority").as("priority"), col("e.tag").as("tag"))
  }

  /** LSP classifier census: joins modeled as CONN_REQ (connid 0 sentinel,
    * `lsp_common.c:150-151`), empty payloads as ACKs. */
  def qLspClassify(spark: SparkSession, dir: String): DataFrame =
    messageLog(spark, dir)
      .select(
        when(col("payload") === "j", lit(0L)).otherwise(col("connid"))
          .as("connid0"),
        when(col("payload") === "j", lit(0L)).otherwise(col("seqnum"))
          .as("seqnum0"),
        when(col("payload") === "j", lit(0)).otherwise(length(col("payload")))
          .as("len0"))
      .groupBy(lspMsgType(col("connid0"), col("seqnum0"), col("len0"))
        .as("msg_type"))
      .agg(count(lit(1)).as("n_msgs"))
}
