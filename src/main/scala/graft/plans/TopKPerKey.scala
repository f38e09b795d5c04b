package graft.plans

import java.util.{PriorityQueue => JPriorityQueue}

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Column, DataFrame, GraftShim}

/** Whole-operator top-k-per-key: for each key group, the k best rows under
  * `order`, with a dense 1-based `rnk` column appended.
  *
  * The Window formulation (`row_number().over(partitionBy(keys).orderBy(
  * order)) <= k`) sorts every input row: even with Spark's inferred
  * `WindowGroupLimit` pruning (3.5+), the plan is local-Sort → partial
  * prune → shuffle → full Sort → final prune → Window → Filter. This
  * operator keeps a bounded heap of k rows per key on the MAP side (a
  * top-k-specific partial aggregate), shuffles only
  * `partitions × keys × k` rows, and merges heaps after the exchange —
  * no sort ever touches more than k rows per key, and the Window pass
  * disappears. The partial/final split is the same one Spark applies to
  * `sum`, which rank functions can't get from the Window operator.
  * Memory per task is `keys_in_partition × k` rows.
  *
  * Implemented as the full custom-operator stack (SURVEY §4.2 option c):
  * logical node → strategy → two physical execs, registered either
  * per-session on first use or cluster-wide via
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * `order` must be a TOTAL order (include an id tiebreak) for
  * deterministic output — the same contract as the Window formulation.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Attribute =
      AttributeReference("rnk", LongType, nullable = false)())
    extends UnaryNode {

  require(k >= 1, s"top-k requires k >= 1, got $k")

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial (map-side) + final (post-shuffle) heap
  * pruning; the Exchange between them is inserted by EnsureRequirements
  * from the final exec's required distribution. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child, rankAttr) =>
      FinalTopKExec(keys, order, k, rankAttr,
        PartialTopKExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap pruning: one pass over the partition, keeping the
  * k best rows per key. */
private[plans] object TopKHeap {
  def prune(
      iter: Iterator[InternalRow],
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      inputAttrs: Seq[Attribute]): mutable.LinkedHashMap[UnsafeRow, JPriorityQueue[UnsafeRow]] = {
    val keyProj = UnsafeProjection.create(keys, inputAttrs)
    val rowProj = UnsafeProjection.create(inputAttrs, inputAttrs)
    val ord = GenerateOrdering.generate(order, inputAttrs)
    // heap head = WORST kept row (reverse ordering), so eviction is O(log k)
    val heapCmp = new java.util.Comparator[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
    }
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, JPriorityQueue[UnsafeRow]]
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      heaps.get(key) match {
        case None =>
          // initial capacity is NOT k: a large rank bound must not
          // allocate k slots per key up front
          val h = new JPriorityQueue[UnsafeRow](math.min(k, 16), heapCmp)
          h.offer(rowProj(row).copy())
          heaps.put(key.copy(), h)
        case Some(h) =>
          if (h.size < k) h.offer(rowProj(row).copy())
          else if (ord.compare(row, h.peek()) < 0) {
            h.poll()
            h.offer(rowProj(row).copy())
          }
      }
    }
    heaps
  }
}

/** Map-side pruning: emits at most `keys-in-partition × k` rows, unranked
  * and in no particular order (the final exec re-ranks). */
case class PartialTopKExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "prunedRows" -> SQLMetrics.createMetric(sparkContext, "rows pruned map-side"))

  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, kk, attrs) = (keys, order, k, child.output)
    val numOutputRows = longMetric("numOutputRows")
    val prunedRows = longMetric("prunedRows")
    child.execute().mapPartitions({ iter =>
      var seen = 0L
      val counted = iter.map { r => seen += 1; r }
      val kept = TopKHeap.prune(counted, ks, os, kk, attrs)
        .valuesIterator.flatMap { h =>
          val out = new Array[InternalRow](h.size)
          var i = 0
          while (!h.isEmpty) { out(i) = h.poll(); i += 1 }
          out.iterator
        }.toArray
      numOutputRows += kept.length
      prunedRows += seen - kept.length
      kept.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)
}

/** Post-shuffle merge: re-prunes the partial survivors per key, sorts each
  * key's k rows, and appends the dense 1-based rank. */
case class FinalTopKExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  // empty keys = GLOBAL top-k: all partial survivors must meet in one
  // place, or each partition would emit its own ranked top-k
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  // the exchange's hash partitioning on `keys` survives this operator
  // (rank is appended, keys untouched) — losing it would force
  // downstream same-key aggregations/joins into a second shuffle
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, kk, attrs) = (keys, order, k, child.output)
    val outTypes = output.map(_.dataType).toArray
    // honor the rank attribute's type: the rewrite rule reuses the
    // original row_number attribute, which is IntegerType
    val rankIsInt = rankAttr.dataType == org.apache.spark.sql.types.IntegerType
    child.execute().mapPartitions({ iter =>
      val ord = GenerateOrdering.generate(os, attrs)
      val proj = UnsafeProjection.create(outTypes)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new JoinedRow
      TopKHeap.prune(iter, ks, os, kk, attrs).valuesIterator.flatMap { h =>
        val rows = new Array[UnsafeRow](h.size)
        var i = 0
        while (!h.isEmpty) { rows(i) = h.poll(); i += 1 }
        java.util.Arrays.sort(rows, ord)
        rows.iterator.zipWithIndex.map { case (r, idx) =>
          rankRow.update(0,
            if (rankIsInt) idx + 1 else (idx + 1).toLong)
          proj(joined(r, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKExec =
    copy(child = newChild)
}

/** Column-level API for the custom operator. */
object TopK {

  /** `df` reduced to the k best rows per `keys` group under `order`
    * (include a tiebreak column for determinism), with a `rnk` column
    * appended. Registers [[TopKStrategy]] on the session on first use. */
  def topKPerKey(
      df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val sortOrders = order.map(c => GraftShim.expressionFor(spark, c) match {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    GraftShim.ofRows(spark,
      TopKPerKey(keys.map(GraftShim.expressionFor(spark, _)), sortOrders, k,
        GraftShim.logicalPlan(df)))
  }
}
