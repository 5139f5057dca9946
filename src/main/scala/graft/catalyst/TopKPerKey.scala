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
  * ROWS per task — and since r13 the PARTIAL side is hard-capped at
  * [[TopKPerKeyExec.PartialBufferRows]] retained rows: past the budget
  * it stops growing and passes rows through to the shuffle unaggregated
  * (sound — the partial's contract is a superset of the global top-k),
  * so a near-unique-key input degrades to a plain shuffle instead of an
  * executor OOM. The FINAL side's resident set equals its own output —
  * the operator's result — so the safe regime is exactly the one top-k
  * exists for: k × keys ≪ input rows. For k large enough that the
  * retained output stops fitting, the spillable window sort is the
  * right plan — [[WindowTopKRule]] declines the rewrite above its cap
  * for that reason.
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
      // float-key canonicalization at the one choke point every
      // construction path goes through (r13): WindowTopKRule replaces
      // the Window BEFORE NormalizeFloatingNumbers' batch on the
      // injectOptimizerRule path (and that rule does not recognize this
      // node), so without this a nested -0.0/0.0 or non-canonical-NaN
      // partition key byte-compares as TWO groups with independent
      // ranks. Normalizing here keeps the exec's key projection AND the
      // ClusteredDistribution the exchange hashes on consistent.
      val nKeys = keys.map(
        org.apache.spark.sql.graft.GraftSql.normalizeFloats)
      val partial =
        TopKPerKeyExec(nKeys, order, k, None, planLater(child))
      TopKPerKeyExec(nKeys, order, k, Some(rankAttr), partial) :: Nil
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
    val budget = TopKPerKeyExec.PartialBufferRows
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // buffered rows must own their memory: child rows are reused buffers
      val toUnsafe = UnsafeProjection.create(
        childOutput.map(_.asInstanceOf[Expression]), childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap under ord: head = worst retained row, evicted first
      val heaps = new java.util.HashMap[
        UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      // PARTIAL-mode memory bound (r13): the resident set is O(keys × k)
      // ROWS with no spill path, and nothing at plan time bounds the key
      // cardinality — a near-unique-key dedup idiom rewritten here used
      // to hold essentially the whole input partition on-heap where the
      // window sort would have spilled. Past `budget` buffered rows the
      // partial STOPS GROWING: rows that would need new memory pass
      // straight through to the shuffle (emitting extra candidate rows
      // is always sound — the partial's contract is a SUPERSET of each
      // key's global top-k; the final exec re-heaps), while full heaps
      // keep REPLACING (replacement frees what it drops, and an evicted
      // row is locally dominated by k better rows of its key — provably
      // not in the global top-k, safe to discard). Final mode takes no
      // budget: its resident set equals its own output, the operator's
      // result — if that doesn't fit a task, top-k was the wrong query
      // shape regardless, and a pass-through there would break ranks.
      var buffered = 0L
      var passThrough: InternalRow = null
      // a NEW key retains more than its rows: the copied UnsafeRow key,
      // the PriorityQueue object (+16-slot initial array), and the
      // HashMap entry — ~250-300 bytes, i.e. ~3 row-equivalents at the
      // ~100 B/row the budget is calibrated for. On near-unique-key
      // input (every key holds 1 row) uncounted key overhead made real
      // retained heap ~3-4x the budget's estimate, so each new key is
      // CHARGED against the same budget its rows draw from (r14,
      // ADVICE) — the cap is now a bound on retained bytes, not just
      // heap rows.
      val keyCharge = TopKPerKeyExec.PartialKeyChargeRows
      def offer(row: InternalRow): Unit = {
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (!fin && buffered >= budget) { passThrough = row; return }
          // initial capacity stays SMALL: PriorityQueue grows on demand,
          // and eagerly sizing to `limit` allocates a k-element array per
          // key — a row_number <= 50M filter rewritten here by
          // WindowTopKRule would OOM on its first row otherwise
          heap = new java.util.PriorityQueue[InternalRow](
            math.min(limit, 16), ord.reverse)
          heaps.put(key.copy(), heap)
          if (!fin) buffered += keyCharge
        }
        if (heap.size < limit) {
          if (!fin && buffered >= budget) { passThrough = row; return }
          heap.add(toUnsafe(row).copy())
          buffered += 1
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(toUnsafe(row).copy())
        }
      }
      import scala.jdk.CollectionConverters._
      // consumers expect UnsafeRow (e.g. SparkPlan.getByteArrayRdd); the
      // projection's reuse of its buffer honors the operator row
      // contract. Final-mode-only machinery is LAZY (r13): the partial
      // hot path never pays the projection codegen or the rank/joined
      // allocations it cannot use.
      lazy val outProj = UnsafeProjection.create(
        outputAttrs.map(_.asInstanceOf[Expression]), outputAttrs)
      lazy val rank = new GenericInternalRow(1)
      lazy val joined = new JoinedRow
      def drained: Iterator[InternalRow] =
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
      // two-phase iterator: drain the input (emitting pass-through rows
      // as they occur — they are reused child buffers, serialized by the
      // consumer before the next hasNext), then the surviving heaps
      new Iterator[InternalRow] {
        private var tail: Iterator[InternalRow] = null
        override def hasNext: Boolean = {
          if (passThrough != null) return true
          while (tail == null && iter.hasNext) {
            offer(iter.next())
            if (passThrough != null) return true
          }
          if (tail == null) tail = drained
          tail.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          if (passThrough != null) {
            val r = passThrough
            passThrough = null
            r
          } else tail.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)
}

object TopKPerKeyExec {
  /** Partial-mode retained-memory cap in ROW-EQUIVALENT units (see the
    * doExecute comment): past this budget the partial stops growing and
    * passes new-memory rows through to the shuffle unaggregated —
    * trading shuffle volume for a hard memory bound, the same
    * fall-back-when-big philosophy as Spark's object-hash-aggregate
    * sort fallback. Each buffered row costs 1 unit and each DISTINCT
    * KEY costs [[PartialKeyChargeRows]] units (key copy + heap object +
    * map entry), so at ~100 bytes/unit the bound is ~100 MB of task
    * heap even on near-unique-key input where per-key overhead
    * dominates. Tests shrink it via reflection-free package access. */
  @volatile private[graft] var PartialBufferRows: Long = 1L << 20

  /** Budget units charged per distinct key (see [[PartialBufferRows]]):
    * copied UnsafeRow key + PriorityQueue with its 16-slot initial
    * array + HashMap entry ≈ 250-300 bytes ≈ 3 row-equivalents. */
  private[graft] val PartialKeyChargeRows: Long = 3L
}
