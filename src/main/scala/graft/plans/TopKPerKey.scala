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

/** Which rank function's `<= k` semantics the operator implements.
  *   - [[RowNumberMode]]: exactly k rows per key (ties broken by the
  *     total order) — the bounded-heap path.
  *   - [[RankMode]]: every row whose `rank() <= k` — boundary ties are
  *     ALL kept, so a key can emit more than k rows.
  *   - [[DenseRankMode]]: every row in the first k DISTINCT order-key
  *     groups — per-group row counts are unbounded.
  * Rank/dense-rank memory is bounded by k groups + boundary ties (the
  * same worst case Spark's own sort-based WindowGroupLimit has). */
sealed trait RankMode extends Serializable
case object RowNumberMode extends RankMode
case object RankMode extends RankMode
case object DenseRankMode extends RankMode

/** Whole-operator top-k-per-key: for each key group, the k best rows under
  * `order` (per `mode`'s rank semantics), with a 1-based `rnk` column
  * appended.
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
      AttributeReference("rnk", LongType, nullable = false)(),
    mode: RankMode = RowNumberMode)
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
    case TopKPerKey(keys, order, k, child, rankAttr, mode) =>
      FinalTopKExec(keys, order, k, rankAttr,
        PartialTopKExec(keys, order, k, planLater(child), mode), mode) :: Nil
    case _ => Nil
  }
}

/** Tie-aware pruning for rank()/dense_rank() bounds: per key, groups of
  * order-equal rows in a TreeMap sorted by the order key. Invariants
  * after every insert:
  *   - rank: drop trailing groups once the rows in strictly-better
  *     groups reach k (their rank exceeds k);
  *   - dense_rank: keep at most k groups.
  * One pass, no sort of the input; only the order-KEY comparison runs
  * per row (same generated ordering the heap path uses). */
private[plans] object RankGroups {

  final class KeyGroups(cmp: java.util.Comparator[UnsafeRow], dense: Boolean, k: Int) {
    val groups = new java.util.TreeMap[UnsafeRow, mutable.ArrayBuffer[UnsafeRow]](cmp)
    private var rowsTotal = 0L

    /** `orderKey` may be a TRANSIENT projection buffer — it is copied
      * only if a new group is created; `makeRow` materializes the row
      * copy only on accept. */
    def offer(orderKey: UnsafeRow, makeRow: () => UnsafeRow): Unit = {
      val existing = groups.get(orderKey)
      if (existing != null) { existing += makeRow(); rowsTotal += 1 }
      else {
        // fast reject: a new group sorting after a saturated buffer can
        // never enter (avoids copy + insert-then-evict churn)
        val saturated =
          if (dense) groups.size >= k
          else rowsTotal - sizeOfLast >= k
        if (saturated && cmp.compare(orderKey, groups.lastKey()) >= 0) return
        groups.put(orderKey.copy(), mutable.ArrayBuffer(makeRow()))
        rowsTotal += 1
      }
      if (dense) {
        while (groups.size > k) rowsTotal -= groups.pollLastEntry().getValue.size
      } else {
        while (groups.size > 1 && rowsTotal - sizeOfLast >= k)
          rowsTotal -= groups.pollLastEntry().getValue.size
      }
    }

    private def sizeOfLast: Long =
      if (groups.isEmpty) 0L else groups.lastEntry().getValue.size.toLong

    def rows: Iterator[UnsafeRow] = {
      import scala.jdk.CollectionConverters._
      groups.values().iterator().asScala.flatten
    }

    /** Groups in rank order with their 1-based rank per mode. */
    def ranked: Iterator[(Long, mutable.ArrayBuffer[UnsafeRow])] = {
      import scala.jdk.CollectionConverters._
      var before = 0L
      var dIdx = 0L
      groups.values().iterator().asScala.map { g =>
        val r = if (dense) { dIdx += 1; dIdx } else before + 1
        before += g.size
        (r, g)
      }
    }
  }

  /** Ordering over the PROJECTED order-key row (sort-order children bound
    * positionally, directions preserved). */
  def orderKeyComparator(
      order: Seq[SortOrder]): java.util.Comparator[UnsafeRow] = {
    val bound = order.zipWithIndex.map { case (s, i) =>
      s.copy(child = org.apache.spark.sql.catalyst.expressions.BoundReference(
        i, s.child.dataType, s.child.nullable))
    }
    val ord = GenerateOrdering.generate(bound, Nil)
    new java.util.Comparator[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(a, b)
    }
  }

  def prune(
      iter: Iterator[InternalRow],
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      dense: Boolean,
      inputAttrs: Seq[Attribute]): mutable.LinkedHashMap[UnsafeRow, KeyGroups] = {
    val keyProj = UnsafeProjection.create(keys, inputAttrs)
    val okProj = UnsafeProjection.create(order.map(_.child), inputAttrs)
    val rowProj = UnsafeProjection.create(inputAttrs, inputAttrs)
    val cmp = orderKeyComparator(order)
    val perKey = mutable.LinkedHashMap.empty[UnsafeRow, KeyGroups]
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      val kg = perKey.get(key) match {
        case Some(g) => g
        case None =>
          val g = new KeyGroups(cmp, dense, k)
          perKey.put(key.copy(), g)
          g
      }
      kg.offer(okProj(row), () => rowProj(row).copy())
    }
    perKey
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
    child: SparkPlan,
    mode: RankMode = RowNumberMode)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "prunedRows" -> SQLMetrics.createMetric(sparkContext, "rows pruned map-side"))

  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, kk, attrs, m) = (keys, order, k, child.output, mode)
    val numOutputRows = longMetric("numOutputRows")
    val prunedRows = longMetric("prunedRows")
    child.execute().mapPartitions({ iter =>
      var seen = 0L
      val counted = iter.map { r => seen += 1; r }
      val kept: Array[InternalRow] = m match {
        case RowNumberMode =>
          TopKHeap.prune(counted, ks, os, kk, attrs)
            .valuesIterator.flatMap { h =>
              val out = new Array[InternalRow](h.size)
              var i = 0
              while (!h.isEmpty) { out(i) = h.poll(); i += 1 }
              out.iterator
            }.toArray
        case RankMode | DenseRankMode =>
          RankGroups.prune(counted, ks, os, kk, m == DenseRankMode, attrs)
            .valuesIterator.flatMap(_.rows).toArray
      }
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
    child: SparkPlan,
    mode: RankMode = RowNumberMode)
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
    val (ks, os, kk, attrs, m) = (keys, order, k, child.output, mode)
    val outTypes = output.map(_.dataType).toArray
    // honor the rank attribute's type: the rewrite rule reuses the
    // original window function's attribute, which is IntegerType
    val rankIsInt = rankAttr.dataType == org.apache.spark.sql.types.IntegerType
    child.execute().mapPartitions({ iter =>
      val proj = UnsafeProjection.create(outTypes)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new JoinedRow
      def emit(r: InternalRow, rank: Long): InternalRow = {
        rankRow.update(0, if (rankIsInt) rank.toInt else rank)
        proj(joined(r, rankRow))
      }
      m match {
        case RowNumberMode =>
          val ord = GenerateOrdering.generate(os, attrs)
          TopKHeap.prune(iter, ks, os, kk, attrs).valuesIterator.flatMap { h =>
            val rows = new Array[UnsafeRow](h.size)
            var i = 0
            while (!h.isEmpty) { rows(i) = h.poll(); i += 1 }
            java.util.Arrays.sort(rows, ord)
            rows.iterator.zipWithIndex.map { case (r, idx) =>
              emit(r, idx + 1L)
            }
          }
        case RankMode | DenseRankMode =>
          RankGroups.prune(iter, ks, os, kk, m == DenseRankMode, attrs)
            .valuesIterator.flatMap {
              _.ranked.flatMap { case (rank, group) =>
                group.iterator.map(r => emit(r, rank))
              }
            }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKExec =
    copy(child = newChild)
}

/** Column-level API for the custom operator. */
object TopK {

  /** `df` reduced to the k best rows per `keys` group under `order`, with
    * a `rnk` column appended. `mode` picks the rank semantics:
    * [[RowNumberMode]] (exactly k rows — include a tiebreak column for
    * determinism), [[RankMode]] (`rank() <= k`, boundary ties kept) or
    * [[DenseRankMode]] (first k distinct order values). Registers
    * [[TopKStrategy]] on the session on first use. */
  def topKPerKey(
      df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
      mode: RankMode = RowNumberMode): DataFrame = {
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
        GraftShim.logicalPlan(df), mode = mode))
  }
}
