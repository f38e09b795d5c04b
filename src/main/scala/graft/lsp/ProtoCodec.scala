package graft.lsp

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Schema-DRIVEN protobuf wire codec — the generalization of the
  * hand-specialized [[LspWire]] (S4/S5): where the reference compiles one
  * fixed message (`lsp.pb-c.c:22-55` generated for `LSPMessage{1,2,3}`),
  * this codec takes the message shape as DATA, so an evolved schema (new
  * fields, renamed fields, new message types) is a spec-string change,
  * not a code change.
  *
  * Spec syntax — one clause per field, comma-separated:
  * {{{ "<number>:<name>:<type>[,...]"   e.g. "1:connid:uint64,2:seqnum:uint64,3:payload:bytes" }}}
  * Types: `uint64`/`int64`/`uint32`/`int32` (varint → BIGINT), `sint64`
  * (zigzag varint → BIGINT), `bool` (varint → BOOLEAN), `double`
  * (fixed64), `float` (fixed32), `string`/`bytes` (length-delimited).
  *
  * Decode semantics are proto3's: unknown fields are skipped by wire
  * type (forward compatibility — an old reader handles a new writer),
  * absent fields read as defaults (0 / false / "" / empty — backward
  * compatibility), `null` for a malformed buffer. Repeated occurrences
  * of a scalar field keep the LAST value (proto3 merge rule).
  *
  * Both directions are single-pass, allocation-light kernels usable from
  * whole-stage codegen — at 100 TB the decode sits directly behind the
  * scan (the same hot position `lspmessage__unpack` holds in the
  * reference's receive loop).
  */
object ProtoCodec {

  sealed abstract class PType(val wire: Int, val sqlType: DataType)
  case object PVarint extends PType(0, LongType)   // uint/int 32/64
  case object PZigzag extends PType(0, LongType)   // sint64
  case object PBool extends PType(0, BooleanType)
  case object PDouble extends PType(1, DoubleType) // fixed64
  case object PString extends PType(2, StringType)
  case object PBytes extends PType(2, BinaryType)
  case object PFloat extends PType(5, FloatType)   // fixed32

  final case class Field(number: Int, name: String, ptype: PType)

  /** Parsed message shape. Field order in the spec = struct field order. */
  final case class Schema(fields: Seq[Field]) {
    require(fields.nonEmpty, "proto spec needs at least one field")
    require(fields.map(_.number).distinct.size == fields.size,
      s"duplicate field numbers in ${fields.map(_.number)}")
    require(fields.map(_.name).distinct.size == fields.size,
      s"duplicate field names in ${fields.map(_.name)}")

    val sqlSchema: StructType =
      StructType(fields.map(f => StructField(f.name, f.ptype.sqlType,
        nullable = false)))

    /** slot index by field number; -1 = unknown (skip). */
    private val slotByNumber: Array[Int] = {
      val max = fields.map(_.number).max
      val arr = Array.fill(max + 1)(-1)
      fields.zipWithIndex.foreach { case (f, i) => arr(f.number) = i }
      arr
    }

    private def slot(number: Int): Int =
      if (number >= 0 && number < slotByNumber.length) slotByNumber(number)
      else -1

    /** proto3 defaults — what an absent field reads as. */
    private def defaults: Array[Any] = fields.map { f =>
      (f.ptype match {
        case PVarint | PZigzag => 0L
        case PBool => false
        case PDouble => 0.0
        case PFloat => 0.0f
        case PString => UTF8String.EMPTY_UTF8
        case PBytes => Array.emptyByteArray
      }): Any
    }.toArray

    def decode(bytes: Array[Byte]): InternalRow = {
      val values = defaults
      var i = 0

      def readVarint(): Long = {
        var shift = 0
        var acc = 0L
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          i += 1
          acc |= (b & 0x7fL) << shift
          if ((b & 0x80) == 0) return acc
          shift += 7
          if (shift > 63) throw new IllegalArgumentException("varint too long")
        }
        throw new IllegalArgumentException("truncated varint")
      }
      def readLen(): Int = {
        val len = readVarint().toInt
        if (len < 0 || i + len > bytes.length)
          throw new IllegalArgumentException("bad length")
        len
      }
      // little-endian fixed32/64 starting at i (caller bounds-checked)
      def readFixed(n: Int): Long = {
        var acc = 0L
        var k = 0
        while (k < n) { acc |= (bytes(i + k) & 0xffL) << (8 * k); k += 1 }
        i += n
        acc
      }

      try {
        while (i < bytes.length) {
          val tag = readVarint()
          val number = (tag >>> 3).toInt
          val wire = (tag & 7).toInt
          val s = slot(number)
          val f = if (s >= 0) fields(s) else null
          if (f != null && f.ptype.wire == wire) {
            f.ptype match {
              case PVarint => values(s) = readVarint()
              case PZigzag =>
                val raw = readVarint()
                values(s) = (raw >>> 1) ^ -(raw & 1)
              case PBool => values(s) = readVarint() != 0L
              case PDouble =>
                if (i + 8 > bytes.length)
                  throw new IllegalArgumentException("truncated fixed64")
                values(s) = java.lang.Double.longBitsToDouble(readFixed(8))
              case PFloat =>
                if (i + 4 > bytes.length)
                  throw new IllegalArgumentException("truncated fixed32")
                values(s) = java.lang.Float.intBitsToFloat(readFixed(4).toInt)
              case PString =>
                val len = readLen()
                values(s) = UTF8String.fromBytes(bytes, i, len)
                i += len
              case PBytes =>
                val len = readLen()
                values(s) = java.util.Arrays.copyOfRange(bytes, i, i + len)
                i += len
            }
          } else wire match { // unknown field (or type-drifted): skip
            case 0 => readVarint()
            case 1 =>
              if (i + 8 > bytes.length)
                throw new IllegalArgumentException("truncated fixed64")
              i += 8
            case 2 =>
              // NOT `i += readLen()`: the LHS `i` is read BEFORE readLen()
              // advances it past the length varint, so += would rewind
              val len = readLen()
              i += len
            case 5 =>
              if (i + 4 > bytes.length)
                throw new IllegalArgumentException("truncated fixed32")
              i += 4
            case w => throw new IllegalArgumentException(s"unsupported wire type $w")
          }
        }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
      } catch {
        case _: IllegalArgumentException => null
        case _: ArrayIndexOutOfBoundsException => null
      }
    }

    /** Encode a struct row laid out exactly as [[sqlSchema]]. Emits every
      * field in spec order (the packer style of `lspmessage__pack` —
      * explicit defaults on the wire, so decode-with-defaults is
      * lossless for any value including zeros). */
    def encode(row: InternalRow): Array[Byte] = {
      val out = new ByteArrayOutputStream(32)
      def varint(value: Long): Unit = {
        var v = value
        while ((v & ~0x7fL) != 0) {
          out.write(((v & 0x7f) | 0x80).toInt)
          v >>>= 7
        }
        out.write(v.toInt)
      }
      def fixed(v: Long, n: Int): Unit = {
        var k = 0
        while (k < n) { out.write(((v >>> (8 * k)) & 0xff).toInt); k += 1 }
      }
      fields.zipWithIndex.foreach { case (f, s) =>
        varint((f.number.toLong << 3) | f.ptype.wire)
        f.ptype match {
          case PVarint => varint(row.getLong(s))
          case PZigzag =>
            val v = row.getLong(s)
            varint((v << 1) ^ (v >> 63))
          case PBool => varint(if (row.getBoolean(s)) 1L else 0L)
          case PDouble => fixed(java.lang.Double.doubleToLongBits(row.getDouble(s)), 8)
          case PFloat => fixed(java.lang.Float.floatToIntBits(row.getFloat(s)) & 0xffffffffL, 4)
          case PString =>
            val b = row.getUTF8String(s).getBytes
            varint(b.length.toLong); out.write(b, 0, b.length)
          case PBytes =>
            val b = row.getBinary(s)
            varint(b.length.toLong); out.write(b, 0, b.length)
        }
      }
      out.toByteArray
    }
  }

  def parse(spec: String): Schema = Schema(
    spec.split(',').toIndexedSeq.map { clause =>
      clause.split(':') match {
        case Array(num, name, tpe) =>
          val pt = tpe.trim.toLowerCase match {
            case "uint64" | "int64" | "uint32" | "int32" => PVarint
            case "sint64" | "sint32" => PZigzag
            case "bool" => PBool
            case "double" => PDouble
            case "float" => PFloat
            case "string" => PString
            case "bytes" => PBytes
            case other => throw new IllegalArgumentException(
              s"unknown proto type '$other' in clause '$clause'")
          }
          val n = num.trim.toInt
          require(n >= 1 && n < (1 << 29), s"field number $n out of range")
          Field(n, name.trim, pt)
        case _ => throw new IllegalArgumentException(
          s"bad proto spec clause '$clause' (want number:name:type)")
      }
    })

}

/** `proto_decode(bytes, 'spec')` → typed struct per the spec; NULL on
  * malformed input (the generic `lspmessage__unpack`). */
case class ProtoDecode(child: Expression, spec: String) extends UnaryExpression {

  @transient lazy val schema: ProtoCodec.Schema = ProtoCodec.parse(spec)

  override def dataType: DataType = schema.sqlSchema
  override def nullable: Boolean = true
  override def prettyName: String = "proto_decode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    schema.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val schemaRef = ctx.addReferenceObj("protoSchema", schema,
        classOf[ProtoCodec.Schema].getName)
      val tmp = ctx.freshName("protoDecoded")
      s"""
         |InternalRow $tmp = $schemaRef.decode($b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ProtoDecode =
    copy(child = newChild)
}

/** `proto_encode(struct, 'spec')` → wire bytes (the generic
  * `lspmessage__pack`); the struct's fields must match the spec's order
  * and types. */
case class ProtoEncode(child: Expression, spec: String) extends UnaryExpression {

  @transient lazy val schema: ProtoCodec.Schema = ProtoCodec.parse(spec)

  override def dataType: DataType = BinaryType
  override def prettyName: String = "proto_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // positional: the wire cares about types and order, not struct field
    // names, so `struct(colA, colB, ...)` works without re-aliasing
    case st: StructType if st.fields.map(_.dataType).toSeq ==
      schema.sqlSchema.fields.map(_.dataType).toSeq =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName input must be ${schema.sqlSchema.simpleString}, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    schema.encode(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val schemaRef = ctx.addReferenceObj("protoSchema", schema,
      classOf[ProtoCodec.Schema].getName)
    defineCodeGen(ctx, ev, r => s"$schemaRef.encode($r)")
  }

  override protected def withNewChildInternal(newChild: Expression): ProtoEncode =
    copy(child = newChild)
}
