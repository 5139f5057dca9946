package graft.catalyst

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k rows per key WITHOUT a window
  * sort — the §2 W2 operator at its 100 TB shape.
  *
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k` shuffles
  * EVERY row to its key's partition and then sorts entire partitions, even
  * though all but k rows per key are discarded. This operator keeps a
  * size-k bounded heap per key on each input partition (map side), ships
  * only the per-partition survivors (≤ k · keys · partitions rows) through
  * the shuffle, and merges heaps on the reduce side — the same
  * partial/final split Spark uses for hash aggregates, applied to top-k.
  * No partition-wide sort ever happens; memory is O(distinct keys × k)
  * ROWS per task, resident with NO spill path — a strictly heavier bound
  * than a hash aggregate's one fixed-size buffer per key (and Spark's
  * object hash aggregate additionally falls back to sort when it grows).
  * That resident set equals the operator's own retained output for the
  * task, so the safe regime is exactly the one top-k exists for:
  * k × keys ≪ input rows. For k large enough that the retained output
  * stops fitting, the spillable window sort is the right plan —
  * [[WindowTopKRule]] declines the rewrite above its cap for that
  * reason.
  *
  * The stack demonstrates every extension tier: a resolved logical node
  * ([[TopKPerKeyNode]]), a planner strategy ([[TopKStrategy]]) that emits
  * the partial/final pair, and a physical operator ([[TopKPerKeyExec]])
  * whose distribution requirement lets EnsureRequirements insert the one
  * key-hash exchange. Registered via `SparkSessionExtensions`
  * (`injectPlannerStrategy`) or post-hoc through
  * `spark.experimental.extraStrategies` (GraftExtensions.install).
  *
  * Semantics = `row_number` (ties broken by the caller's total order; pass
  * a tiebreaker column exactly as with the window form).
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(keys.nonEmpty, "topKPerKey requires at least one key column")
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKeyNode = copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child) =>
      val partial =
        TopKPerKeyExec(keys, order, k, None, planLater(child))
      TopKPerKeyExec(keys, order, k, Some(rankAttr), partial) :: Nil
    case _ => Nil
  }
}

/** Physical bounded-heap top-k per key.
  *
  * `rankAttr = None` → partial mode: no required distribution, emits
  * surviving child rows unchanged (each input partition's per-key top-k —
  * a superset of the global top-k, since the global best k for a key are
  * each locally best wherever they sit).
  * `rankAttr = Some(_)` → final mode: requires clustering on `keys` (the
  * planner inserts the hash exchange), re-heaps the survivors, and emits
  * each key's rows in order with a 1-based LongType rank appended.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  private def isFinal = rankAttr.isDefined

  override def output: Seq[Attribute] =
    if (isFinal) child.output :+ rankAttr.get else child.output

  override def producedAttributes: AttributeSet =
    AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (isFinal) ClusteredDistribution(keys) :: Nil
    else UnspecifiedDistribution :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val outputAttrs = output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val fin = isFinal
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // buffered rows must own their memory: child rows are reused buffers
      val toUnsafe = UnsafeProjection.create(
        childOutput.map(_.asInstanceOf[Expression]), childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap under ord: head = worst retained row, evicted first
      val heaps = new java.util.HashMap[
        UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // initial capacity stays SMALL: PriorityQueue grows on demand,
          // and eagerly sizing to `limit` allocates a k-element array per
          // key — a row_number <= 50M filter rewritten here by
          // WindowTopKRule would OOM on its first row otherwise
          heap = new java.util.PriorityQueue[InternalRow](
            math.min(limit, 16), ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(toUnsafe(row).copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(toUnsafe(row).copy())
        }
      }
      import scala.jdk.CollectionConverters._
      // consumers expect UnsafeRow (e.g. SparkPlan.getByteArrayRdd); the
      // projection's reuse of its buffer honors the operator row contract
      val outProj = UnsafeProjection.create(
        outputAttrs.map(_.asInstanceOf[Expression]), outputAttrs)
      val rank = new GenericInternalRow(1)
      val joined = new JoinedRow
      heaps.values().iterator().asScala.flatMap { heap =>
        // polls come worst-first (head of the reverse-ordered queue), so
        // filling from the back yields ascending `ord` = rank order
        val arr = new Array[InternalRow](heap.size)
        var i = heap.size - 1
        while (i >= 0) { arr(i) = heap.poll(); i -= 1 }
        if (!fin) arr.iterator
        else arr.iterator.zipWithIndex.map { case (r, idx) =>
          rank.setLong(0, (idx + 1).toLong)
          outProj(joined(r, rank)): InternalRow
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)
}
