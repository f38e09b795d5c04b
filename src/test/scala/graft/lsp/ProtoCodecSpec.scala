package graft.lsp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProtoCodecSpec extends SparkSpec {

  private val lspSpec = "1:connid:uint64,2:seqnum:uint64,3:payload:bytes"

  test("round-trip across every supported wire type") {
    import spark.implicits._
    val spec = "1:a:uint64,2:b:sint64,3:c:bool,4:d:double,5:e:float,6:f:string,7:g:bytes"
    val df = Seq((42L, -7L, true, 2.5d, 1.25f, "héllo", Array[Byte](1, 2, 3)))
      .toDF("a", "b", "c", "d", "e", "f", "g")
      .select(graft.functions.proto_encode(
        struct(col("a"), col("b"), col("c"), col("d"), col("e"), col("f"),
          col("g")), spec).as("bin"))
      .select(graft.functions.proto_decode(col("bin"), spec).as("m"))
      .select("m.*")
    val r = df.collect()(0)
    assert(r.getLong(0) === 42L)
    assert(r.getLong(1) === -7L) // zigzag survives negatives
    assert(r.getBoolean(2) === true)
    assert(r.getDouble(3) === 2.5d)
    assert(r.getFloat(4) === 1.25f)
    assert(r.getString(5) === "héllo")
    assert(r.getAs[Array[Byte]](6).toSeq === Seq[Byte](1, 2, 3))
  }

  test("wire-compatible with the specialized LSPMessage codec both ways") {
    import spark.implicits._
    val df = Seq((9L, 4L, "pay".getBytes)).toDF("connid", "seqnum", "payload")
    // generic encode → specialized decode
    val viaGeneric = df.select(graft.functions.lsp_decode(
        graft.functions.proto_encode(
          struct(col("connid"), col("seqnum"), col("payload")), lspSpec)).as("m"))
      .select("m.*").collect()(0)
    assert((viaGeneric.getLong(0), viaGeneric.getLong(1),
      new String(viaGeneric.getAs[Array[Byte]](2))) === ((9L, 4L, "pay")))
    // specialized encode → generic decode
    val viaSpecial = df.select(graft.functions.proto_decode(
        graft.functions.lsp_encode(col("connid"), col("seqnum"), col("payload")),
        lspSpec).as("m"))
      .select("m.*").collect()(0)
    assert((viaSpecial.getLong(0), viaSpecial.getLong(1),
      new String(viaSpecial.getAs[Array[Byte]](2))) === ((9L, 4L, "pay")))
  }

  test("schema evolution: old reader skips new fields, new reader defaults old frames") {
    import spark.implicits._
    val evolved = lspSpec + ",4:priority:uint64,5:tag:string"
    val frames = Seq((3L, 1L, Array[Byte](7), 99L, "hot"))
      .toDF("connid", "seqnum", "payload", "priority", "tag")
      .select(graft.functions.proto_encode(
        struct(col("connid"), col("seqnum"), col("payload"), col("priority"),
          col("tag")), evolved).as("bin"))
    // forward compat: BASE spec reads an EVOLVED frame (fields 4, 5 skipped)
    val base = frames
      .select(graft.functions.proto_decode(col("bin"), lspSpec).as("m"))
      .select("m.*").collect()(0)
    assert((base.getLong(0), base.getLong(1)) === ((3L, 1L)))
    // ...and the specialized reference decoder agrees (unknown-field skip)
    val ref = frames.select(graft.functions.lsp_decode(col("bin")).as("m"))
      .select("m.*").collect()(0)
    assert((ref.getLong(0), ref.getLong(1)) === ((3L, 1L)))
    // backward compat: EVOLVED spec reads a BASE frame (fields 4, 5 default)
    val old = Seq((8L, 2L, Array[Byte](1)))
      .toDF("connid", "seqnum", "payload")
      .select(graft.functions.proto_encode(
        struct(col("connid"), col("seqnum"), col("payload")), lspSpec).as("bin"))
      .select(graft.functions.proto_decode(col("bin"), evolved).as("m"))
      .select("m.*").collect()(0)
    assert((old.getLong(0), old.getLong(1), old.getLong(3), old.getString(4)) ===
      ((8L, 2L, 0L, "")))
  }

  test("malformed buffers decode to NULL, not an exception") {
    import spark.implicits._
    val bad = Seq(
      Array[Byte](0x08, -1), // truncated varint
      Array[Byte](0x1a, 0x7f, 0x01), // length past the end
      Array[Byte](0x0f)) // wire type 7
      .toDF("bin")
      .select(graft.functions.proto_decode(col("bin"), lspSpec).as("m"))
    assert(bad.filter(col("m").isNotNull).count() === 0)
  }

  test("SQL registration: proto_decode/proto_encode work from spark.sql") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      s"""SELECT proto_decode(
         |  proto_encode(struct(CAST(5 AS BIGINT), CAST(2 AS BIGINT),
         |    CAST('x' AS BINARY)), '$lspSpec'), '$lspSpec').connid AS c""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) === 5L)
    // non-literal (column) spec must fail loudly, not mysteriously
    val err = intercept[Exception] {
      spark.sql(
        """SELECT proto_decode(CAST(x AS BINARY), y)
          |FROM VALUES ('a', '1:a:uint64') t(x, y)""".stripMargin).collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal string"))
  }

  test("repeated fields round-trip (packed numeric + per-element strings)") {
    import spark.implicits._
    val spec = "1:ids:uint64[],2:tags:string[],3:w:double[]"
    val df = Seq((Seq(1L, 300L, 7L), Seq("a", "bb"), Seq(0.5, -2.0)))
      .toDF("ids", "tags", "w")
      .select(graft.functions.proto_encode(
        struct(col("ids"), col("tags"), col("w")), spec).as("bin"))
    val r = df.select(graft.functions.proto_decode(col("bin"), spec).as("m"))
      .select("m.*").collect()(0)
    assert(r.getSeq[Long](0) === Seq(1L, 300L, 7L))
    assert(r.getSeq[String](1) === Seq("a", "bb"))
    assert(r.getSeq[Double](2) === Seq(0.5, -2.0))
    // packed layout on the wire: numeric run is ONE length-delimited
    // field (tag 0x0a), not three tags
    val bytes = df.collect()(0).getAs[Array[Byte]](0)
    assert(bytes(0) === 0x0a.toByte)
    // unpacked occurrences of the same field CONCATENATE on decode
    val unpacked = Array[Byte](0x08, 0x05, 0x08, 0x09) // two wire-0 field-1s
    val back = Seq(unpacked).toDF("bin")
      .select(graft.functions.proto_decode(col("bin"), "1:ids:uint64[]").as("m"))
      .select("m.*").collect()(0)
    assert(back.getSeq[Long](0) === Seq(5L, 9L))
  }

  test("nested messages round-trip; absent message decodes NULL") {
    import spark.implicits._
    val spec = "1:id:uint64,2:loc:(1:lat:double,2:lon:double),3:pts:(1:x:sint64)[]"
    val enc = spark.sql(
      s"""SELECT proto_encode(struct(CAST(9 AS BIGINT),
         |  struct(CAST(1.5 AS DOUBLE), CAST(-2.25 AS DOUBLE)),
         |  array(struct(CAST(-4 AS BIGINT)), struct(CAST(11 AS BIGINT)))),
         |  '$spec') AS bin""".stripMargin)
    val r = enc.select(graft.functions.proto_decode(col("bin"), spec).as("m"))
      .select("m.id", "m.loc.lat", "m.loc.lon", "m.pts").collect()(0)
    assert(r.getLong(0) === 9L)
    assert(r.getDouble(1) === 1.5)
    assert(r.getDouble(2) === -2.25)
    assert(r.getSeq[org.apache.spark.sql.Row](3).map(_.getLong(0)) === Seq(-4L, 11L))
    // a frame without field 2: the message is NULL, not a zero-struct
    val noLoc = Seq(Array[Byte](0x08, 0x09)).toDF("bin")
      .select(graft.functions.proto_decode(col("bin"), spec).as("m"))
      .select("m.*").collect()(0)
    assert(noLoc.getLong(0) === 9L)
    assert(noLoc.isNullAt(1))
    assert(noLoc.getSeq[Any](2) === Seq())
  }

  test("null scalar fields fail encode with a typed error, not an NPE") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(Tuple1("x")).toDF("s")
        .select(graft.functions.proto_encode(
          struct(lit(null).cast("string")), "1:s:string"))
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(_.getMessage != null) &&
      chain(err).exists(t => Option(t.getMessage).exists(_.contains("NULL"))),
      s"want a typed NULL-field error, got $err")
    // malformed oversized length varint decodes to NULL, not garbage
    val big = Array[Byte](0x0a, 0x85.toByte, 0x80.toByte, 0x80.toByte,
      0x80.toByte, 0x10, 0x61) // field 1 wire 2, length 2^32+5
    val r = Seq(big).toDF("bin")
      .select(graft.functions.proto_decode(col("bin"), "1:s:string").as("m"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("proto3 merge rule: repeated scalar occurrences keep the last value") {
    import spark.implicits._
    // two occurrences of field 1: 0x08 0x05, 0x08 0x09
    val twice = Seq(Array[Byte](0x08, 0x05, 0x08, 0x09)).toDF("bin")
      .select(graft.functions.proto_decode(col("bin"), "1:v:uint64").as("m"))
      .select("m.*").collect()(0)
    assert(twice.getLong(0) === 9L)
  }
}
