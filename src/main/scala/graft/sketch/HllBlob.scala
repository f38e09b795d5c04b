package graft.sketch

import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Packed 256-register HLL state as a single 256-byte BINARY value —
  * the shuffle-friendly register representation for sketch ITERATION
  * (HyperBall): the sparse (node, bucket, mj) relation costs one row
  * per register per node per round, so a radius-r sweep shuffles
  * O(r·|V|·256) rows; the blob costs one 256-byte row per node, and the
  * per-arc join fan-out drops from |ball∧256| rows to exactly one.
  * Register merge is elementwise max — associative, commutative,
  * idempotent — so the blob aggregate is a drop-in for the sparse
  * `groupBy(bucket).max(mj)` and produces byte-identical registers
  * (GraphSpec pins blob == sparse; the DuckDB oracle keeps the sparse
  * relational form).
  */
object HllBlob {

  val Registers = 256

  /** One-register seed blob. */
  def seed(bucket: Int, rho: Int): Array[Byte] = {
    val a = new Array[Byte](Registers)
    a(bucket) = rho.toByte
    a
  }

  /** Elementwise max of `b` into `a` (mutates and returns `a`). */
  def mergeInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < Registers) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  /** 2^61-scaled indicator sum Σ 2^(61−mj) over ALL registers (absent
    * register ⇒ mj = 0 ⇒ 2^61) — identical to the sparse aggregate's
    * present-sum + absent-term split. Exact decimal. */
  def zs(blob: Array[Byte]): Decimal = {
    var acc = BigInteger.ZERO
    var i = 0
    while (i < Registers) {
      acc = acc.add(BigInteger.ONE.shiftLeft(61 - blob(i)))
      i += 1
    }
    Decimal(new java.math.BigDecimal(acc), 38, 0)
  }

  /** Zero (never-hit) register count — the linear-counting V. */
  def zeros(blob: Array[Byte]): Int = {
    var n = 0
    var i = 0
    while (i < Registers) {
      if (blob(i) == 0) n += 1
      i += 1
    }
    n
  }
}

/** `hll_seed_blob(bucket, rho)` — the 256-byte blob with one register set. */
case class HllSeedBlob(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_seed_blob"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (INT, INT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(bucket: Any, rho: Any): Any =
    HllBlob.seed(bucket.asInstanceOf[Int], rho.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, r) => s"graft.sketch.HllBlob.seed($b, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllSeedBlob =
    copy(left = newLeft, right = newRight)
}

/** `hll_blob_union(a, b)` — elementwise-max union of two register
  * blobs: the sketch of the UNION of the two underlying sets (the HLL
  * algebra that lets pairwise overlaps come from per-set sketches via
  * inclusion–exclusion, no re-scan of the raw data). */
case class HllBlobUnion(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_blob_union"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, BINARY), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HllBlob.mergeInto(a.asInstanceOf[Array[Byte]].clone(),
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Janino types `($a).clone()` as java.lang.Object (no covariant
    // array clone), so the byte[] overload never matches without the
    // explicit cast — absent it the projection silently falls back to
    // interpreted mode (CodegenGateSpec force-compiles this).
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.sketch.HllBlob.mergeInto((byte[]) ($a).clone(), $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllBlobUnion =
    copy(left = newLeft, right = newRight)
}

/** `hll_blob_zs(blob)` — the exact decimal indicator sum. */
case class HllBlobZs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "hll_blob_zs"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    HllBlob.zs(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sketch.HllBlob.zs($c)")

  override protected def withNewChildInternal(newChild: Expression): HllBlobZs =
    copy(child = newChild)
}

/** `hll_blob_zeros(blob)` — zero-register count. */
case class HllBlobZeros(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hll_blob_zeros"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    HllBlob.zeros(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sketch.HllBlob.zeros($c)")

  override protected def withNewChildInternal(newChild: Expression): HllBlobZeros =
    copy(child = newChild)
}

/** `hll_merge(blob)` — native register-merge aggregate (elementwise max
  * over 256-byte blobs). Partial aggregation applies: the planner
  * splits it into map-side partials + a final merge, exactly like a
  * built-in sketch aggregate, so the exchange carries one blob per
  * (group, mapper) — the property that makes sketch fan-in cheap at
  * 100 TB. Buffer IS the blob (serialize/deserialize are identity). */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](HllBlob.Registers)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer
    else HllBlob.mergeInto(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    HllBlob.mergeInto(buffer, other)

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = newChildren.head)
}
