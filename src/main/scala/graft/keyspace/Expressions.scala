package graft.keyspace

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the base-26 keyspace codec — the only
  * custom expressions the crack-parity engine needs (SURVEY.md §2.11, §4.2).
  * Both are codegen'd so the hot scan loop
  * (`Range → NumToPass → sha1 filter`) stays inside whole-stage codegen,
  * avoiding the reference's per-candidate malloc/free anti-pattern
  * (`worker.c:27, 98-100`).
  *
  * Note: inputs must already be (BIGINT, INT) / STRING — the `graft.functions`
  * helpers and SQL builders insert casts (`AbstractDataType` is
  * `private[sql]` in Spark 4, so `ExpectsInputTypes` is unavailable to
  * third-party expressions).
  */

/** `num_to_pass(ordinal, len)` — ordinal → `[a-z]^len` string.
  * Re-expression of `pass_num2char` (`server.c:211-224`). Errors on
  * out-of-range ordinals unless `wrap = true`, which reproduces the
  * reference's silent mod-26^len wrap.
  */
case class NumToPass(left: Expression, right: Expression, wrap: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "num_to_pass"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == IntegerType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BIGINT, INT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(num: Any, len: Any): Any =
    Keyspace.numToPassUTF8(num.asInstanceOf[Long], len.asInstanceOf[Int], wrap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (n, l) => s"graft.keyspace.Keyspace.numToPassUTF8($n, $l, $wrap)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NumToPass =
    copy(left = newLeft, right = newRight)
}

/** `pass_to_num(pass)` — `[a-z]{1,13}` string → ordinal; NULL on invalid
  * input (SQL-friendly analog of `pass_char2num`, `server.c:199-209`).
  */
case class PassToNum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pass_to_num"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${child.dataType.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Keyspace.passToNumBoxed(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("passToNum")
      s"""
         |java.lang.Long $tmp = graft.keyspace.Keyspace.passToNumBoxed($c);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PassToNum =
    copy(child = newChild)
}
