package graft.sources

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleaving — the multi-dimensional clustering key
  * for lake layout: sorting a table by `z_order(a, b)` makes ROW GROUPS
  * range-bounded in BOTH dimensions at once, so parquet min/max stats
  * prune 2-D range predicates that a single-column sort order can only
  * prune on its leading key. At 100 TB this is the difference between a
  * scan that touches every file for `WHERE a BETWEEN .. AND b BETWEEN ..`
  * and one that skips most row groups (measured in ZOrderSpec against
  * real parquet footers).
  *
  * The interleave is pure bit arithmetic (magic-number bit spreading),
  * deterministic in any engine — the DuckDB oracle recomputes it from
  * shifts and masks.
  */
object ZOrderKernels {

  /** Spread the low 32 bits of `v` so bit k lands at position 2k. */
  def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code of the low 32 bits of (a, b): a's bits at even
    * positions, b's at odd. Negative inputs are masked (callers quantize
    * to non-negative ints; documented at the Column helper). */
  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)

  /** Inverse of [[spread]] (for tests and explain output). */
  def compact(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
    x = (x | (x >> 8)) & 0x0000ffff0000ffffL
    x = (x | (x >> 16)) & 0x00000000ffffffffL
    x
  }
}

/** Hilbert-curve index — the better-locality alternative to the Morton
  * interleave: consecutive Hilbert indices are always MANHATTAN-ADJACENT
  * cells (the Z-curve jumps across the plane at power-of-two
  * boundaries), so equal-size index ranges bound tighter rectangles and
  * parquet min/max stats prune 2-D predicates harder after a
  * hilbert-sort than after a z-sort. This is the clustering key
  * production lakehouses reach for once Z-order's seams show.
  *
  * Fixed 16-bit × 16-bit domain → 32-bit index, the [[ZOrderKernels]]
  * quantization contract. The iterative rotate-and-accumulate transform
  * (the standard xy2d formulation) is pure integer arithmetic —
  * deterministic in any engine; the DuckDB oracle replays it as 16
  * unrolled CASE/bit-op steps.
  */
object HilbertKernels {

  /** Grid side (2^16); coordinates are masked into `[0, N)`. */
  val N: Long = 1L << 16

  /** (x, y) → Hilbert index `d` ∈ [0, 2³²): per bit plane from the top,
    * accumulate the quadrant's curve offset and rotate/reflect the
    * frame so the sub-square is traversed in curve order. */
  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn & (N - 1)
    var y = yIn & (N - 1)
    var d = 0L
    var s = N >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate: reflect within the full grid, then swap axes
      if (ry == 0) {
        if (rx == 1) {
          x = N - 1 - x
          y = N - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse transform (tests + explain output): index → (x, y). */
  def d2xy(dIn: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = dIn & (N * N - 1)
    var s = 1L
    while (s < N) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}

/** `hilbert_index(a, b)` — 32-bit Hilbert index over the low 16 bits of
  * two non-negative integer columns (codegen'd). */
case class HilbertIndexValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertKernels.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.sources.HilbertKernels.xy2d($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexValue =
    copy(left = newLeft, right = newRight)
}

/** `z_order(a, b)` — 64-bit Morton code over the low 32 bits of two
  * non-negative integer columns (codegen'd). */
case class ZOrderValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "z_order"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernels.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.sources.ZOrderKernels.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderValue =
    copy(left = newLeft, right = newRight)
}
