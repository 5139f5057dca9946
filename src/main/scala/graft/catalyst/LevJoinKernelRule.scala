package graft.catalyst

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.GraftSql
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Optimizer rewrite: a LARGE×LARGE inner OR LEFT OUTER join whose whole
  * condition is `levenshtein(a, b) <= d` (raw, or already rewritten to
  * the banded form by [[LevenshteinBandRule]]) is re-planned through the
  * similarity-join kernel chooser — the same cost-based routing
  * `graft.ops.SimilarityJoin.autoInnerJoin` gives library callers, now
  * applied to raw `spark.sql` text. Without this, Spark plans the theta
  * join as a nested-loop join: fine at the reference's 64-row broadcast
  * scale (which this rule deliberately leaves alone), catastrophic for a
  * corpus-sized pair, where the banded-predicate rewrite alone still
  * evaluates |L|·|R| length checks.
  *
  * Mechanics: the join children are wrapped back into Datasets, the
  * length histograms drive [[graft.ops.SimilarityJoin.chooseChunked]]
  * (sampled above [[HistSampleBytes]]), the winning kernel builds the
  * replacement pipeline, and its OPTIMIZED plan is spliced in behind a
  * Project that restores the original output attribute ids. Both kernels
  * are proven lossless vs the naive theta join (the `q_similarity_*_full`
  * hash checks), so results — including row multiplicity and null-key
  * drops — are identical by construction.
  *
  * Firing conditions (anything else leaves the plan untouched):
  *   - inner or left outer join (the latter is the reference's
  *     `stringdist_left_join` shape — kernel matches plus null-padded
  *     unmatched left rows, via SimilarityJoin.autoLeftJoin; left joins
  *     additionally need disjoint column names across the sides, or the
  *     kernel refuses and the rule falls back), condition is EXACTLY
  *     the lev-threshold predicate
  *     (extra conjuncts: not rewritten — composing them soundly with the
  *     kernels' internal joins is future work);
  *   - both operands are string attributes, one per side, each name
  *     unambiguous on its side (the kernels resolve columns by name);
  *   - BOTH children's stats exceed `spark.graft.levJoinKernel.minSideBytes`
  *     (default 8 MiB) — below that the broadcast nested-loop plan with
  *     the banded predicate is already the right plan;
  *   - `spark.graft.levJoinKernel.enabled` (default true).
  *
  * The rewrite runs Spark jobs during optimization (the histogram
  * aggregates — the same jobs autoInnerJoin runs — plus the chunked
  * kernel's distinct-length collect). Those jobs run once per DISTINCT
  * (child plans, keys, distance): the optimized kernel plan is cached
  * under the children's canonicalized form, so re-optimizations of the
  * same join — `.explain()` then `.count()`, or Datasets derived from
  * one joined frame — splice the cached subtree without re-running
  * anything. (A canonically-equal cached subtree is self-contained and
  * computes the same data; only the id-restoring Project is rebuilt per
  * call site.) The rewritten plan contains no lev join condition, so
  * the fixed-point batch cannot re-fire. Any failure inside the rewrite
  * logs and returns the original join — the rule never fails a query. */
object LevJoinKernelRule extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.levJoinKernel.enabled"
  val MinSideBytesKey = "spark.graft.levJoinKernel.minSideBytes"
  val DefaultMinSideBytes: Long = 8L * 1024 * 1024

  /** Above this estimated side size the histograms are computed on a 1%
    * seeded sample (SimilarityJoin.lengthHistogram scales counts back). */
  val HistSampleBytes: Long = 1L * 1024 * 1024 * 1024

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spark = SparkSession.getActiveSession.orNull
    if (spark == null ||
        !spark.conf.get(EnabledKey, "true").toBoolean) return plan
    val minBytes = spark.conf.get(MinSideBytesKey,
      DefaultMinSideBytes.toString).toLong
    plan.transformUp {
      case j @ Join(l, r, jt @ (Inner | LeftOuter), Some(cond), _) =>
        // match the predicate shape FIRST (pure pattern match) so plan
        // stats are only computed for actual lev theta joins
        extract(cond).flatMap { case (a, b, d) =>
          sideKeys(l, r, a, b).filter(_ => bothLarge(l, r, minBytes))
            .map { case (lKey, rKey) =>
              try rewrite(spark, j, l, r, lKey, rKey, d, jt == LeftOuter)
              catch {
                case e: Exception =>
                  logWarning(
                    s"graft lev-join kernel rewrite failed, keeping the " +
                      s"nested-loop plan: ${e.getMessage}")
                  j
              }
            }
        }.getOrElse(j)
    }
  }

  private def bothLarge(l: LogicalPlan, r: LogicalPlan,
                        minBytes: Long): Boolean =
    l.stats.sizeInBytes >= minBytes && r.stats.sizeInBytes >= minBytes

  /** The lev-threshold predicate, raw or banded. Returns (a, b, d) for
    * `lev(a, b) <= d` semantics. */
  private def extract(cond: Expression)
      : Option[(Expression, Expression, Int)] = cond match {
    case LessThanOrEqual(lev @ Levenshtein(a, b, None),
        Literal(d: Int, IntegerType)) if d >= 0 && lev.deterministic =>
      Some((a, b, d))
    case GreaterThanOrEqual(Literal(d: Int, IntegerType),
        lev @ Levenshtein(a, b, None)) if d >= 0 && lev.deterministic =>
      Some((a, b, d))
    case LessThan(lev @ Levenshtein(a, b, None),
        Literal(d: Int, IntegerType)) if d > 0 && lev.deterministic =>
      Some((a, b, d - 1))
    case GreaterThan(Literal(d: Int, IntegerType),
        lev @ Levenshtein(a, b, None)) if d > 0 && lev.deterministic =>
      Some((a, b, d - 1))
    // LevenshteinBandRule's output: lenDiff <= d AND bounded-lev >= 0
    case And(
        LessThanOrEqual(Abs(Subtract(Length(a1), Length(b1), _), _),
          Literal(d1: Int, IntegerType)),
        GreaterThanOrEqual(
          lev @ Levenshtein(a2, b2, Some(Literal(d2: Int, IntegerType))),
          Literal(0, IntegerType)))
        if d1 == d2 && a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
          lev.deterministic =>
      Some((a2, b2, d2))
    case _ => None
  }

  /** Resolve the operands to one unambiguous string attribute per side;
    * order-normalized to (leftKey, rightKey) — lev is symmetric. */
  private def sideKeys(l: LogicalPlan, r: LogicalPlan,
                       a: Expression, b: Expression)
      : Option[(String, String)] = (a, b) match {
    case (ar: AttributeReference, br: AttributeReference)
        if ar.dataType == StringType && br.dataType == StringType =>
      def on(p: LogicalPlan, x: AttributeReference) =
        p.outputSet.contains(x) && p.output.count(_.name == x.name) == 1
      if (on(l, ar) && on(r, br)) Some((ar.name, br.name))
      else if (on(l, br) && on(r, ar)) Some((br.name, ar.name))
      else None
    case _ => None
  }

  /** Optimized kernel plans keyed by (canonicalized children, keys, d) —
    * bounded, access-ordered. Guards the histogram/collect jobs against
    * re-optimization of the same join (explain + action, derived
    * Datasets). */
  private val planCache =
    new java.util.LinkedHashMap[(LogicalPlan, LogicalPlan, String, String,
        Int, Boolean), LogicalPlan](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(LogicalPlan, LogicalPlan, String, String,
            Int, Boolean), LogicalPlan]): Boolean = size() > 16
    }

  private def rewrite(spark: SparkSession, j: Join,
                      l: LogicalPlan, r: LogicalPlan,
                      lKey: String, rKey: String, d: Int,
                      leftOuter: Boolean): LogicalPlan = {
    import graft.ops.SimilarityJoin
    val cacheKey = (l.canonicalized, r.canonicalized, lKey, rKey, d,
      leftOuter)
    val kernelPlan = planCache.synchronized {
      Option(planCache.get(cacheKey))
    }.getOrElse {
      val leftDF = GraftSql.ofRows(spark, l)
      val rightDF = GraftSql.ofRows(spark, r)
      def frac(p: LogicalPlan): Double =
        if (p.stats.sizeInBytes > HistSampleBytes) 0.01 else 1.0
      val histL = SimilarityJoin.lengthHistogram(leftDF, lKey, frac(l))
      val histR = SimilarityJoin.lengthHistogram(rightDF, rKey, frac(r))
      val distCol = "__graft_sql_lev_dist"
      val inner =
        if (SimilarityJoin.chooseChunked(histL, histR, d))
          SimilarityJoin.chunkedInnerJoin(leftDF, rightDF, lKey, rKey, d,
            distCol)
        else
          SimilarityJoin.blockedInnerJoin(leftDF, rightDF, lKey, rKey, d,
            distCol)
      // left outer: kernel matches + null-padded unmatched left rows
      // (SimilarityJoin.leftify semantics via autoLeftJoin's contract —
      // disjoint-name require throws into the fallback catch above)
      val kernelDF =
        if (leftOuter) SimilarityJoin.leftifyInner(inner, leftDF, rightDF,
          lKey, distCol)
        else inner
      // splice the kernel's OPTIMIZED plan: an analyzed-only subtree would
      // skip optimizer batches that already ran on the outer plan (e.g.
      // Deduplicate→Aggregate), leaving operators the planner can't place
      val built = kernelDF.queryExecution.optimizedPlan
      planCache.synchronized { planCache.put(cacheKey, built) }
      built
    }
    // kernel output contract: [left columns..., right columns..., dist];
    // restore the join's attribute ids positionally and drop the dist
    require(kernelPlan.output.size == j.output.size + 1,
      s"kernel output ${kernelPlan.output.size} != join output " +
        s"${j.output.size} + dist")
    val aliases = j.output.zip(kernelPlan.output).map { case (orig, neu) =>
      Alias(neu, orig.name)(exprId = orig.exprId,
        qualifier = orig.qualifier)
    }
    logInfo(s"graft lev-join kernel rewrite: $lKey ~ $rKey d=$d " +
      s"${if (leftOuter) "(left outer) " else ""}-> " +
      s"${if (kernelPlan.toString.contains("__gci")) "chunked" else "blocked"}")
    Project(aliases, kernelPlan)
  }
}
