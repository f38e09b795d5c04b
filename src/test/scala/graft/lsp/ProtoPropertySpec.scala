package graft.lsp

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based round-trip and robustness checks for the schema-driven
  * protobuf kernel — pure JVM (no Spark session), so hundreds of
  * generated messages run in milliseconds. */
object ProtoPropertySpec extends Properties("protocodec") {

  private val spec =
    "1:a:uint64,2:b:sint64,3:c:bool,4:d:double,5:e:float,6:f:string," +
      "7:g:bytes,8:ids:uint64[],9:tags:string[],10:loc:(1:x:sint64,2:y:double)"
  private val schema = ProtoCodec.parse(spec)

  private val genStr = Gen.asciiPrintableStr.map(_.take(24))
  private val genBytes = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
    .map(_.take(32).toArray)

  private def row(
      a: Long, b: Long, c: Boolean, d: Double, e: Float, f: String,
      g: Array[Byte], ids: Seq[Long], tags: Seq[String],
      loc: Option[(Long, Double)]): GenericInternalRow =
    new GenericInternalRow(Array[Any](
      a, b, c, d, e, UTF8String.fromString(f), g,
      new GenericArrayData(ids.toArray[Any]),
      new GenericArrayData(tags.map(UTF8String.fromString).toArray[Any]),
      loc.map { case (x, y) =>
        new GenericInternalRow(Array[Any](x, y))
      }.orNull))

  private case class Msg(
      a: Long, b: Long, c: Boolean, d: Double, e: Float, f: String,
      g: Array[Byte], ids: List[Long], tags: List[String])

  private val genMsg: Gen[Msg] = for {
    a <- Gen.chooseNum(0L, Long.MaxValue)
    b <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    c <- Gen.oneOf(true, false)
    d <- Gen.chooseNum(-1e18, 1e18)
    e <- Gen.chooseNum(-1e9f, 1e9f)
    f <- genStr
    g <- genBytes
    ids <- Gen.listOf(Gen.chooseNum(0L, Long.MaxValue)).map(_.take(16))
    tags <- Gen.listOf(genStr).map(_.take(8))
  } yield Msg(a, b, c, d, e, f, g, ids, tags)

  property("encode-decode round-trips every field shape") =
    Prop.forAll(genMsg) {
      case Msg(a, b, c, d, e, f, g, ids, tags) =>
        val loc = if (a % 2 == 0) Some((b / 2, d / 2)) else None
        val in = row(a, b, c, d, e, f, g, ids, tags, loc)
        val out = schema.decode(schema.encode(in))
        (out != null) &&
          out.getLong(0) == a && out.getLong(1) == b &&
          out.getBoolean(2) == c && out.getDouble(3) == d &&
          out.getFloat(4) == e && out.getUTF8String(5).toString == f &&
          java.util.Arrays.equals(out.getBinary(6), g) &&
          toLongs(out.getArray(7)) == ids &&
          toStrs(out.getArray(8)) == tags &&
          (loc match {
            case None => out.isNullAt(9)
            case Some((x, y)) =>
              val st = out.getStruct(9, 2)
              st.getLong(0) == x && st.getDouble(1) == y
          })
    }

  private def toLongs(a: ArrayData): Seq[Long] =
    (0 until a.numElements()).map(a.getLong)
  private def toStrs(a: ArrayData): Seq[String] =
    (0 until a.numElements()).map(a.getUTF8String(_).toString)

  property("decode never throws on arbitrary bytes (null or a row)") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))) { bs =>
      // the malformed-input contract: any byte soup → null or a valid
      // row, never an exception
      schema.decode(bs.toArray) match {
        case null => true
        case r => r.numFields == schema.fields.size
      }
    }

  property("decoding a frame re-encoded from a decode is a fixpoint") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))) { bs =>
      schema.decode(bs.toArray) match {
        case null => Prop.passed
        case r1 =>
          val r2 = schema.decode(schema.encode(r1))
          // a decodable frame's value round-trips exactly
          Prop.?=(java.util.Arrays.toString(schema.encode(r1)),
            java.util.Arrays.toString(schema.encode(r2)))
      }
    }
}
