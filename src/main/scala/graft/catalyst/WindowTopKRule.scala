package graft.catalyst

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Rewrites the universal SQL top-k-per-key idiom
  *
  *   SELECT ... FROM (SELECT ..., row_number() OVER
  *     (PARTITION BY keys ORDER BY ord) AS rn FROM t) WHERE rn <= k
  *
  * into [[TopKPerKeyNode]], the bounded-heap operator that ships only
  * per-partition survivors through the shuffle instead of sorting whole
  * partitions to then discard all but k rows per key (see TopKPerKey's
  * scaladoc for the cost model). Users keep writing the standard window
  * form — plans silently get the scalable operator, the same contract as
  * [[LevenshteinBandRule]].
  *
  * Fires only on the exact shape it can prove: a Filter DIRECTLY over a
  * Window whose ONLY window expression is a bare `row_number()` with
  * non-empty partition and order specs, where the whole filter condition
  * is a `rn (<|<=|=1) literal` / reversed comparison on that attribute.
  * The rank column keeps its name, exprId, and IntegerType, so downstream
  * references and schemas are untouched.
  */
object WindowTopKRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), name)),
          partitionSpec, orderSpec, child, _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      val rn = alias.toAttribute
      extractK(cond, rn) match {
        case Some(k) if k >= 1 =>
          // Spark's own InferWindowGroupLimit usually fires first and
          // plants a sort-based WindowGroupLimit prefilter under the
          // Window; the bounded heap subsumes it, so strip it rather
          // than sorting every partition just to feed the heap
          val source = child match {
            case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
            case other => other
          }
          val rank64 = AttributeReference(
            s"__graft_rank64_$name", LongType, nullable = false)()
          val node =
            TopKPerKeyNode(partitionSpec, orderSpec, k, rank64, source)
          Project(
            source.output :+
              Alias(Cast(rank64, IntegerType), name)(exprId = rn.exprId),
            node)
        case _ => f
      }
  }

  /** Above this k the rewrite is declined: TopKPerKeyExec holds k row
    * copies per key — k × distinct-keys-per-task rows TOTAL, resident
    * with no spill path (the exec's scaladoc spells out why that equals
    * its own retained output) — while Spark's native window exec sorts
    * externally and CAN spill. The cap bounds only the per-key factor
    * (the keys factor is unknowable at plan time, with or without
    * stats), so it is set where the trade is still safely favorable:
    * 64k rows × a few hundred bytes ≈ 20 MB per hot key, and a task
    * would need hundreds of heavy keys at the cap before the heaps
    * rival one spilled sort run. Real top-k idioms sit at k ≤ a few
    * thousand; a larger literal keeps the spillable sort plan. (r12:
    * was 1M, whose justification sized ONE hot key and ignored the keys
    * factor.) */
  private val MaxRewriteK = 1 << 16

  /** The k for which `cond` is exactly "rank in 1..k", if provable.
    * Strict comparisons compute k-1 in Long first — `rn < Int.MinValue`
    * must prove k = negative (unsatisfiable, left alone), not wrap to
    * top-Int.MaxValue. */
  private def extractK(cond: Expression, rn: Attribute): Option[Int] =
    (cond match {
      case LessThanOrEqual(a: Attribute, IntLit(k))
        if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, IntLit(k))
        if a.semanticEquals(rn) => Some(math.max(k.toLong - 1L, -1L).toInt)
      case GreaterThanOrEqual(IntLit(k), a: Attribute)
        if a.semanticEquals(rn) => Some(k)
      case GreaterThan(IntLit(k), a: Attribute)
        if a.semanticEquals(rn) => Some(math.max(k.toLong - 1L, -1L).toInt)
      // rn = 1 is top-1; rn = k for k > 1 keeps rows BELOW k out of the
      // result, which top-k alone cannot express — not rewritten
      case EqualTo(a: Attribute, IntLit(1))
        if a.semanticEquals(rn) => Some(1)
      case EqualTo(IntLit(1), a: Attribute)
        if a.semanticEquals(rn) => Some(1)
      case _ => None
    }).filter(_ <= MaxRewriteK)

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType) if v <= Int.MaxValue && v >= 0 =>
        Some(v.toInt)
      case _ => None
    }
  }
}
