package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension (SURVEY §2 custom-operator preference
  * (c)): per-key top-k as a first-class logical node + planner strategy +
  * physical operator, registered through [[GraftExtensions]].
  *
  * Why not `row_number().over(window) <= k`: the window form SORTS every
  * key's full row set (per-partition sort after the shuffle) just to throw
  * away all but k rows. This operator keeps a bounded k-row heap per key —
  * O(n log k) with O(keys·k) memory instead of an O(n log n) sort with O(n)
  * buffering, and it never materializes a rank column. At 100 TB the
  * difference is a spilled sort versus a streaming pass.
  *
  * Scale contract: the strategy plans a PARTIAL/FINAL pair, exactly like
  * hash aggregation. The partial exec runs the bounded heaps on each
  * map-side partition as-is (no required distribution), so the ONE
  * exchange between partial and final (`ClusteredDistribution(keys)` on
  * the final) carries at most partitions × keys × k rows — top-k composes
  * (top-k of a union = top-k of per-part top-k's), which is what makes the
  * map-side pass sound. At 100 TB the shuffle shrinks from the full
  * aggregate to a few rows per (task, key); neither exec ever asks for a
  * sort.
  *
  * Measured trade-off (sf0.1, ~150k orders, ~10 rows/key, k=2): the
  * codegen'd window form wins (~0.7 s vs ~1.2 s) — this exec runs an
  * interpreted row-at-a-time pipeline (per-row key projection + hash
  * lookup), while tiny per-key sorts are cheap. The crossover is where
  * per-key row sets grow enough that the window's full-partition sort
  * buffers/spills — or where the shuffle itself dominates, which the
  * partial pass now caps. Kept as the library's reference implementation
  * of the whole-operator extension path.
  */
case class TopKPerKeyNode(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]] to [[TopKPerKeyExec]]; injected via
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, child) =>
      // partial (map-side, any distribution) under final (key-clustered):
      // EnsureRequirements inserts the single exchange between them
      TopKPerKeyExec(k, keys, order,
        TopKPerKeyExec(k, keys, order, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-key top-k. Each task scans its (key-clustered) input
  * once, holding at most k rows per key: a max-heap ordered by the SortOrder
  * ("worst kept row" on top) — a new row replaces the heap top iff it sorts
  * strictly before it. Output order within a key is unspecified, exactly
  * like the SQL form before an outer ORDER BY.
  */
case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortExprs = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(sortExprs, childOutput)
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kLocal) heap.enqueue(row.copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            val heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }
}

/** User-facing constructor: `TopKPerKey(df, 2, Seq("o_custkey"),
  * Seq("o_totalprice" -> false, "o_orderkey" -> true))` — top 2 rows per
  * customer by price descending, key ascending tie-break.
  */
object TopKPerKey {
  def apply(df: DataFrame, k: Int, keyCols: Seq[String],
            orderCols: Seq[(String, Boolean)]): DataFrame = {
    val keys = keyCols.map(c => UnresolvedAttribute.quoted(c))
    val order = orderCols.map { case (c, asc) =>
      SortOrder(UnresolvedAttribute.quoted(c), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.GraftBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(k, keys, order, df.queryExecution.analyzed))
  }
}
