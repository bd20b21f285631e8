package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator extension showcase: per-key top-k without sorting
  * whole partitions.
  *
  * Spark expresses "top k per key" as row_number() over a window +
  * filter, whose WindowExec SORTS every partition on (keys, order) —
  * at 100 TB that is a full sort of every probe's candidate set just
  * to keep 10 rows. This operator keeps a bounded k-heap per key
  * (memory O(keys·k), time O(n·log k)) after the same hash
  * repartition, and emits rows with their 1-based rank.
  *
  * Wired through the full custom-operator ladder: logical node
  * (TopKPerKeyPlan) → strategy (TopKStrategy, injected via the public
  * spark.experimental.extraStrategies hook at session setup) →
  * physical UnaryExecNode with requiredChildDistribution driving the
  * exchange. Semantics are EXACTLY row_number ≤ k for a total
  * ordering, which TopKSpec asserts against the window formulation.
  */
case class TopKPerKeyPlan(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    maxKeysPerPartition: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(group, order, k, maxKeys, rank, child) =>
      TopKPerKeyExec(group, order, k, maxKeys, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    maxKeysPerPartition: Int,
    rankAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val group = groupExprs
    val order = orderExprs
    val limit = k
    val maxKeys = maxKeysPerPartition
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(group, childOutput)
      val ord: Ordering[InternalRow] = RowOrdering.create(order, childOutput)
      // Children aren't guaranteed to emit UnsafeRow (an interpreted
      // operator whose partitioning already satisfies the required
      // distribution can feed this node directly) — normalize first.
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      // max-heap by ord: head = current worst of the kept k
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = toUnsafe(iter.next())
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // bounded-keys contract, ENFORCED: the heap map is plain
          // on-heap (no TaskMemoryManager accounting, no spill), so an
          // unbounded key domain must fail fast with a clear message,
          // not degrade into an executor OOM mid-task.
          if (heaps.size() >= maxKeys) {
            throw new IllegalStateException(
              s"TopKPerKey: partition exceeded maxKeysPerPartition=$maxKeys distinct keys. " +
                "The per-key heap map is on-heap and not spill-tracked — for unbounded " +
                "high-cardinality keys use the row_number() window formulation (sorts but " +
                "spills), or raise maxKeysPerPartition if the domain is genuinely bounded.")
          }
          heap = new java.util.PriorityQueue[UnsafeRow](limit + 1, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(row.copy())
        } else if (ord.lt(row, heap.peek())) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      // downstream operators require UnsafeRow — normalize the output
      val outProj = UnsafeProjection.create(output, output)
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap { heap =>
        val rows = heap.toArray(new Array[UnsafeRow](heap.size)).sorted(ord)
        rows.iterator.zipWithIndex.map { case (r, i) =>
          rankRow.setLong(0, i + 1L)
          outProj(joined(r, rankRow)): InternalRow
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** DataFrame-level API for the operator. */
object TopK {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}

  /** rows of `df` ranked 1..k per key by `order` — (column, ascending)
    * pairs forming a total order for deterministic results — with a
    * `rank` column appended.
    *
    * Memory: O(distinct keys per partition × k) on-heap, NOT spill-
    * tracked — suited to bounded key domains (brands, probe ids,
    * shards). For unbounded high-cardinality keys prefer the
    * row_number window formulation, which sorts but spills. The
    * contract is enforced: a partition that sees more than
    * `maxKeysPerPartition` distinct keys fails the task with a clear
    * error instead of OOMing the executor. The default (1M keys ×
    * k rows ≈ low hundreds of MB at k≤10) leaves comfortable headroom
    * under a normal executor heap while catching genuinely unbounded
    * domains long before they exhaust it. */
  def perKey(df: DataFrame, keys: Seq[String],
             order: Seq[(String, Boolean)], k: Int,
             maxKeysPerPartition: Int = 1 << 20): DataFrame = {
    val spark = df.sparkSession
    // register the strategy once per session (public hook); synchronized
    // — extraStrategies read-modify-write is not atomic and two threads
    // racing here could drop one registration.
    TopKStrategy.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKStrategy
      }
    }
    val analyzed = df.queryExecution.analyzed
    val resolve = analyzed.output.map(a => a.name -> a).toMap
    val groupExprs = keys.map(resolve(_))
    val orderExprs = order.map { case (name, asc) =>
      SortOrder(resolve(name), if (asc) Ascending else Descending)
    }
    val rank = AttributeReference("rank", LongType, nullable = false)()
    org.apache.spark.sql.GraftFunctions.ofRows(spark,
      TopKPerKeyPlan(groupExprs, orderExprs, k, maxKeysPerPartition, rank, analyzed))
  }
}
