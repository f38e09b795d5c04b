package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.keyspace.{NumToPass, PassToNum}
import graft.similarity.FloatVectorDot

/** Spark-native deployment hook: register graft's Catalyst expressions on
  * every session via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — no driver code
  * changes needed on a shared cluster. (Per-session alternative:
  * [[graft.functions.registerAll]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions.arity

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("num_to_pass"),
      new ExpressionInfo(classOf[NumToPass].getName, "num_to_pass"),
      (args: Seq[Expression]) => {
        arity("num_to_pass", 2, args)
        NumToPass(Cast(args(0), LongType), Cast(args(1), IntegerType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("pass_to_num"),
      new ExpressionInfo(classOf[PassToNum].getName, "pass_to_num"),
      (args: Seq[Expression]) => {
        arity("pass_to_num", 1, args)
        PassToNum(Cast(args(0), StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        arity("vec_dot", 2, args)
        FloatVectorDot(args(0), args(1))
      }))
  }
}

object GraftExtensions {
  private[graft] def arity(name: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${args.length}")
}
