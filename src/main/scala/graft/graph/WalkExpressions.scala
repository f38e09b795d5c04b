package graft.graph

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One-pass random-walk kernel over a driver-collected adjacency.
  *
  * The step-join formulation of a walk pays `steps` SERIAL join stages —
  * the right plan when the graph outgrows memory, pure scheduling
  * latency when it doesn't (the adjacency under [[GraphOps.walkIndex]]'s
  * 64 MB small-graph cap is exactly the collected-artifact size this
  * repo broadcasts everywhere else). This kernel replays the identical
  * hop contract — `md5("$walkId:$step")` first 8 hex chars mod degree
  * over the SORTED neighbor array — in one codegen'd map pass, so the
  * whole multi-step walk is a single narrow stage and the DuckDB
  * unrolled-CTE oracle still matches bit-for-bit.
  *
  * Generalizes the reference's driver-side work fan-out (SURVEY.md §2
  * X2 is n/a as an operator; walks are the data-side analog a graph
  * embedding pipeline needs).
  */
final class WalkKernel(
    adj: java.util.HashMap[java.lang.Long, Array[Long]], steps: Int)
  extends Serializable {

  /** Full walk from `start`: array of visited nodes, index = step.
    * Truncates early (like the join path's inner join) if a node has no
    * neighbors — impossible on an undirected graph, load-bearing on a
    * directed one. */
  def walk(start: Long, walkId: Long): GenericArrayData = {
    val out = new Array[Long](steps + 1)
    out(0) = start
    var cur = start
    var len = 1
    var i = 1
    var alive = true
    while (i <= steps && alive) {
      val nb = adj.get(cur)
      if (nb == null || nb.length == 0) alive = false
      else {
        cur = nb((WalkKernel.hop(walkId, i) % nb.length).toInt)
        out(len) = cur
        len += 1
      }
      i += 1
    }
    if (len == out.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, len))
  }

  override def hashCode(): Int = steps * 31 + adj.size()
  override def equals(o: Any): Boolean = o match {
    case k: WalkKernel => (k eq this)
    case _ => false
  }
}

object WalkKernel {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `parseLong(md5hex("$walkId:$step").take(8), 16)` without the hex
    * string: the first 8 hex chars are the first 4 digest bytes,
    * unsigned big-endian. */
  def hop(walkId: Long, step: Int): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(
      (java.lang.Long.toString(walkId) + ":" + step)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** `walk_seq(node, walk_id)` — the visited-node array of one whole walk
  * (see [[WalkKernel]]). The kernel ships as a `Broadcast` variable —
  * torrented to each executor ONCE — not as a task-binary reference
  * object, which would re-serialize the full adjacency into every
  * stage's task closure (the `Broadcasting large task binary` warning)
  * and make the small-graph cap unraisable. Generated code holds only
  * the broadcast handle; `.value` resolves executor-side. */
case class WalkSequence(left: Expression, right: Expression,
    kernel: org.apache.spark.broadcast.Broadcast[WalkKernel])
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "walk_seq"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(node: Any, walkId: Any): Any =
    kernel.value.walk(node.asInstanceOf[Long], walkId.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcClass = classOf[org.apache.spark.broadcast.Broadcast[_]].getName
    val kClass = classOf[WalkKernel].getName
    val ref = ctx.addReferenceObj("walkKernelBc", kernel, bcClass)
    // resolve .value once per task into a mutable-state slot, not per row
    val local = ctx.addMutableState(kClass, "walkKernel",
      v => s"$v = ($kClass) $ref.value();")
    defineCodeGen(ctx, ev, (n, w) => s"$local.walk($n, $w)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WalkSequence =
    copy(left = newLeft, right = newRight)
}
