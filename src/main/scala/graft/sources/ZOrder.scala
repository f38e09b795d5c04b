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
