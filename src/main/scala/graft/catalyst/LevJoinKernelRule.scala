package graft.catalyst

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.GraftSql
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, Join, LocalLimit, LocalRelation, LogicalPlan, Project, Sample, Tail, Range => LogicalRange}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Optimizer rewrite: a LARGE×LARGE inner OR LEFT OUTER join whose
  * condition contains a `levenshtein(a, b) <= d` conjunct (raw, or already
  * rewritten to the banded form by [[LevenshteinBandRule]]) is re-planned
  * through the similarity-join kernel chooser — the same cost-based routing
  * `graft.ops.SimilarityJoin.autoInnerJoin` gives library callers, now
  * applied to raw `spark.sql` text. Without this, Spark plans the theta
  * join as a nested-loop join: fine at the reference's 64-row broadcast
  * scale (which this rule deliberately leaves alone), catastrophic for a
  * corpus-sized pair, where the banded-predicate rewrite alone still
  * evaluates |L|·|R| length checks.
  *
  * Mechanics: the join children are wrapped back into Datasets (every
  * column positionally renamed to a reserved name, so duplicate or
  * side-overlapping column names — `l.name` vs `r.name` — can never
  * break the kernels' by-name resolution), the length histograms drive
  * [[graft.ops.SimilarityJoin.chooseChunked]] (sampled above
  * [[HistSampleBytesKey]]), the winning kernel builds the replacement
  * pipeline, and its OPTIMIZED plan is spliced in behind a Project that
  * restores the original output attribute ids positionally. Both kernels
  * are proven lossless vs the naive theta join (the `q_similarity_*_full`
  * hash checks), so results — including row multiplicity and null-key
  * drops — are identical by construction.
  *
  * COMPOSITE conditions (`lev(a,b) <= d AND <residual conjuncts>`) are
  * supported: the lev conjunct routes through the kernel and the residual
  * is applied as a `Filter` over the kernel's match set — sound because
  * the kernel emits exactly the naive join's qualifying pairs, so
  * filtering them by the remaining conjuncts reproduces the composite
  * inner join. For LEFT OUTER the residual-filtered matches are
  * re-leftified on FULL-ROW identity (null-safe equality over every left
  * column): value-keyed padding would be wrong once the residual can
  * distinguish two left rows that share a key value. A redundant
  * length-band conjunct over the same operands (the other half of
  * [[LevenshteinBandRule]]'s output) is recognized and dropped rather
  * than kept as residual.
  *
  * Firing conditions (anything else leaves the plan untouched):
  *   - inner or left outer join (the latter is the reference's
  *     `stringdist_left_join` shape — kernel matches plus null-padded
  *     unmatched left rows);
  *   - some conjunct of the condition is the lev-threshold predicate;
  *     every OTHER conjunct (the residual) must be deterministic,
  *     subquery-free, and reference only the join children; none may be
  *     an equi-join conjunct between the sides (`l.id = r.id AND
  *     lev(...) <= d` already plans as a near-linear hash/sort-merge
  *     join with a post-join lev filter — nothing to rescue, and the
  *     kernel would materialize ALL lev-close pairs ignoring the key);
  *   - both child subtrees are fully deterministic (the rewrite
  *     re-executes them; a nondeterministic column would take different
  *     values per execution and break the LEFT padding's full-row
  *     identity);
  *   - both lev operands are string attributes, one per side, each name
  *     unambiguous on its side (the kernels resolve the KEY by name; all
  *     other columns ride through positionally);
  *   - neither side is streaming, BOTH children's stats exceed
  *     `spark.graft.levJoinKernel.minSideBytes` (default 8 MiB), and
  *     neither side's size is the stats-less `spark.sql.defaultSizeInBytes`
  *     sentinel (Long.MaxValue by default) — a stats-less source would
  *     otherwise "exceed" any floor and pay the histogram jobs on tiny
  *     data, and a streaming side would re-attempt (and fail) the rewrite
  *     every micro-batch;
  *   - `spark.graft.levJoinKernel.enabled` (default true).
  *
  * The rewrite runs Spark jobs during optimization (the histogram
  * aggregates — the same jobs autoInnerJoin runs — plus the chunked
  * kernel's distinct-length collect). Those jobs run once per DISTINCT
  * (child plans, keys, distance, join type): the optimized kernel plan is
  * cached under the children's canonicalized form, so re-optimizations of
  * the same join — `.explain()` then `.count()`, or Datasets derived from
  * one joined frame — splice the cached subtree without re-running
  * anything. Two cache-safety rules:
  *   - caching is SKIPPED when any leaf is a catalog-backed relation
  *     (canonicalization normalizes away file/stats detail, so a catalog
  *     table re-read after an INSERT in the same JVM would be
  *     canonically equal to its pre-INSERT plan and splice a stale
  *     kernel — the chunked kernel bakes the collected distinct-length
  *     set into literal combo tables). Path-based reads are safe: a
  *     fresh FileIndex breaks canonical equality;
  *   - every cache HIT splices a RE-INSTANCED copy (all internal expr
  *     ids freshly generated via [[reinstance]]), so two canonically
  *     equal join sites in ONE query (self-join arms, a union of two
  *     identical lev joins) never share attribute ids across plan
  *     branches — post-analysis rules assume globally unique ids.
  * The rewritten plan contains no lev join condition, so the fixed-point
  * batch cannot re-fire. Any failure inside the rewrite logs and returns
  * the original join — the rule never fails a query. */
object LevJoinKernelRule extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.levJoinKernel.enabled"
  val MinSideBytesKey = "spark.graft.levJoinKernel.minSideBytes"
  val DefaultMinSideBytes: Long = 8L * 1024 * 1024

  /** Above this estimated side size the histograms are computed on a 1%
    * seeded sample (SimilarityJoin.lengthHistogram scales counts back).
    * Caveat, documented rather than hidden: on a corpus whose lengths are
    * near-UNIQUE per row (the blocked kernel's home turf), a 1% sample
    * scaled back up concentrates mass on the sampled lengths and biases
    * the chooser toward the chunked kernel. That is the SAFE direction —
    * chunked is near-linear everywhere while blocked is quadratic on
    * concentrated lengths, so a misroute costs a small constant factor
    * (PERF.md measured ≤ 3.6×), never the quadratic blowup. */
  val HistSampleBytesKey = "spark.graft.levJoinKernel.histSampleBytes"
  val DefaultHistSampleBytes: Long = 1L * 1024 * 1024 * 1024

  /** Kernel working column; inputs cannot carry it (they are positionally
    * renamed to `gsql_*` before the kernel ever sees them). */
  private val DistCol = "__graft_sql_lev_dist"

  /** Re-entrancy guard: [[buildKernel]] optimizes the kernel plan it just
    * built, and that nested optimization runs THIS rule again. The
    * kernel's own verify filter (`lev(a, b, d) >= 0`) gets pushed into
    * its internal join's condition by PushPredicateThroughJoin, which the
    * conjunct-based [[extractWithResidual]] would happily match — firing
    * the rule on its own output, recursively, with nested histogram jobs
    * at every level. Never rewrite while a rewrite is in flight. */
  /** Distinct not-quite-boolean enabled-flag values already warned about
    * (once per value per JVM — apply() runs for every plan, so an
    * unconditional warning would spam every query's log). */
  private val warnedFlagValues =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private val inRewrite = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  /** Working-column prefixes of graft's similarity kernels (the blocked
    * kernel's `__graft_len_band`, the chunked kernel's `__g*` hash
    * columns, this rule's own `gsql_*` renames). A join whose child
    * carries one IS a kernel's internal join — same pushed-filter trap as
    * [[inRewrite]], but reachable at TOP level when a library caller
    * (SimilarityJoin.blockedInnerJoin et al.) builds the kernel and the
    * rule then optimizes the user's query around it: re-kerneling an
    * already-kerneled join would re-run histogram jobs and kernel a
    * band-exploded side. Leave kernel plans alone. */
  private def noKernelCols(l: LogicalPlan, r: LogicalPlan): Boolean =
    (l.output.iterator ++ r.output.iterator).forall(a =>
      !a.name.startsWith("__g") && !a.name.startsWith("gsql_"))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spark = SparkSession.getActiveSession.orNull
    // a malformed enabled flag ("1", "yes") must not fail the query —
    // apply() runs for EVERY plan in the session, so a bare .toBoolean
    // here would fail every query, violating the rule's never-fails
    // invariant the byteStringAsBytes parse below already upholds.
    // Anything that is not exactly true/false (ignoring case) counts as
    // enabled, the default — but SILENTLY enabling on "0"/"no"/"off"
    // would invert a user's intent with no signal, so each distinct odd
    // value gets one warning (r13, ADVICE).
    val rawFlag = spark match { case null => "true"
                                case s => s.conf.get(EnabledKey, "true").trim }
    val enabled = !"false".equalsIgnoreCase(rawFlag)
    if (enabled && !"true".equalsIgnoreCase(rawFlag) &&
        warnedFlagValues.add(rawFlag))
      logWarning(s"$EnabledKey is set to '$rawFlag', which is neither " +
        "'true' nor 'false' — treating it as ENABLED (the default). If " +
        "the intent was to disable the lev-join kernel rewrite, set it " +
        "to exactly 'false'.")
    if (spark == null || inRewrite.get() || !enabled) return plan
    // accept "8388608" or "8m" (byteStringAsBytes parses both); a bad
    // value must not fail the query — fall back to the default floor
    val minBytes = try {
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get(MinSideBytesKey, DefaultMinSideBytes.toString))
    } catch { case _: Exception => DefaultMinSideBytes }
    plan.transformUp {
      case j @ Join(l, r, jt @ (Inner | LeftOuter), Some(cond), _)
          if noKernelCols(l, r) =>
        // match the predicate shape FIRST (pure pattern match) so plan
        // stats are only computed for actual lev theta joins
        extractWithResidual(cond).flatMap { case (a, b, d, residual) =>
          sideKeys(l, r, a, b)
            .filter(_ => residualOk(j, residual))
            .filter(_ => noEquiConjunct(l, r, residual))
            .filter(_ => deterministicPlans(l, r))
            .filter(_ => bothLarge(spark, l, r, minBytes))
            .map { case (lKey, rKey) =>
              inRewrite.set(true)
              try rewrite(spark, j, l, r, lKey, rKey, d, jt == LeftOuter,
                residual)
              catch {
                case e: Exception =>
                  logWarning(
                    s"graft lev-join kernel rewrite failed, keeping the " +
                      s"nested-loop plan: ${e.getMessage}")
                  j
              } finally inRewrite.set(false)
            }
        }.getOrElse(j)
    }
  }

  private def bothLarge(spark: SparkSession, l: LogicalPlan, r: LogicalPlan,
                        minBytes: Long): Boolean = {
    if (l.isStreaming || r.isStreaming) return false
    // defaultSizeInBytes is a bytesConf: "10g" is as legal as "1234567".
    // byteStringAsBytes accepts both forms; a parse failure must keep the
    // original join (the rule never fails a query), so fall back to the
    // Long.MaxValue sentinel rather than letting the exception escape
    // this filter chain (it runs OUTSIDE rewrite()'s try/catch).
    val sentinel = BigInt(try {
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(spark.conf
        .get("spark.sql.defaultSizeInBytes", Long.MaxValue.toString))
    } catch { case _: Exception => Long.MaxValue })
    def ok(p: LogicalPlan): Boolean = {
      val s = p.stats.sizeInBytes
      // check the LEAVES for the stats-less sentinel too: an operator
      // above a stats-less source (Project over LogicalRDD) scales the
      // sentinel by a width ratio, producing a huge-but-not-equal value
      // that would otherwise sail past the equality check and pay
      // histogram jobs on a tiny in-memory frame
      s >= minBytes && s != sentinel &&
        p.collectLeaves().forall(_.stats.sizeInBytes != sentinel)
    }
    ok(l) && ok(r)
  }

  /** A rewrite re-executes the children (the kernel references the left
    * side twice for LEFT OUTER padding, and the residual composition a
    * third time): sound only when each subtree produces the SAME row
    * set every execution. Two ways that fails: a nondeterministic
    * EXPRESSION (uuid(), rand() — different values per run break the
    * full-row-identity anti join), and a nondeterministic OPERATOR —
    * LIMIT without a defining sort and SAMPLE select a
    * task-completion-order-dependent subset, so two executions can
    * return different rows outright. */
  private def deterministicPlans(l: LogicalPlan, r: LogicalPlan): Boolean =
    Seq(l, r).forall(p => !p.exists {
      case _: GlobalLimit | _: LocalLimit | _: Sample | _: Tail => true
      case node => node.expressions.exists(e => !e.deterministic)
    })

  /** If the residual contains an equi-join conjunct between the sides
    * (`l.id = r.id AND lev(...) <= d`), Spark already plans a near-linear
    * hash/sort-merge join on the equi key with the lev predicate as a
    * post-join filter — there is no nested-loop catastrophe to prevent,
    * and the kernel would be strictly worse (it materializes ALL
    * lev-close pairs ignoring the equi key, plus planning-time jobs).
    * Leave those joins to the planner. */
  private def noEquiConjunct(l: LogicalPlan, r: LogicalPlan,
                             residual: Seq[Expression]): Boolean = {
    def splitsAcross(x: Expression, y: Expression): Boolean =
      x.references.nonEmpty && y.references.nonEmpty &&
        ((canEvaluate(x, l) && canEvaluate(y, r)) ||
          (canEvaluate(x, r) && canEvaluate(y, l)))
    !residual.exists {
      case EqualTo(x, y) => splitsAcross(x, y)
      case EqualNullSafe(x, y) => splitsAcross(x, y)
      case _ => false
    }
  }

  // ---------- condition decomposition ----------

  /** One conjunct's lev-threshold shape, raw or bounded-DP. Returns
    * (a, b, d) for `lev(a, b) <= d` semantics. */
  private def levConjunct(c: Expression)
      : Option[(Expression, Expression, Int)] = c match {
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
    // LevenshteinBandRule's bounded-DP half: lev(a, b, d) >= 0 <=> lev <= d
    case GreaterThanOrEqual(
        lev @ Levenshtein(a, b, Some(Literal(d: Int, IntegerType))),
        Literal(0, IntegerType)) if d >= 0 && lev.deterministic =>
      Some((a, b, d))
    case _ => None
  }

  /** A redundant `abs(len(a) - len(b)) <= d` conjunct over the SAME
    * operands — the prefilter half of LevenshteinBandRule's output, always
    * true for kernel matches, so it is dropped instead of kept residual. */
  private def isLenBand(c: Expression, a: Expression, b: Expression,
                        d: Int): Boolean = c match {
    case LessThanOrEqual(Abs(Subtract(Length(x), Length(y), _), _),
        Literal(dd: Int, IntegerType)) =>
      dd == d && ((x.semanticEquals(a) && y.semanticEquals(b)) ||
        (x.semanticEquals(b) && y.semanticEquals(a)))
    case _ => false
  }

  /** Decompose the join condition: the first lev-threshold conjunct (plus
    * its redundant length band, dropped) and everything else as residual. */
  private def extractWithResidual(cond: Expression)
      : Option[(Expression, Expression, Int, Seq[Expression])] = {
    val cs = splitConjunctivePredicates(cond)
    cs.iterator.map(c => (c, levConjunct(c))).collectFirst {
      case (c, Some((a, b, d))) =>
        (a, b, d, cs.filterNot(x => (x eq c) || isLenBand(x, a, b, d)))
    }
  }

  /** Residual conjuncts the Filter composition is sound for: deterministic
    * (a nondeterministic predicate's evaluation count is semantics),
    * subquery-free (post-optimization subquery splicing would skip the
    * rewrite batches that already ran), and resolved against the join
    * children only. */
  private def residualOk(j: Join, residual: Seq[Expression]): Boolean = {
    lazy val childAttrs = AttributeSet(j.children.flatMap(_.output))
    residual.forall(e => e.deterministic &&
      !e.exists(_.isInstanceOf[PlanExpression[_]]) &&
      e.references.subsetOf(childAttrs))
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

  // ---------- plan cache ----------

  /** Optimized kernel plans keyed by (canonicalized children, keys, d,
    * leftified) — bounded, access-ordered. Guards the histogram/collect
    * jobs against re-optimization of the same join (explain + action,
    * derived Datasets). Only canonically STABLE sources are cached — see
    * [[cacheSafe]]. */
  private val planCache =
    new java.util.LinkedHashMap[(LogicalPlan, LogicalPlan, String, String,
        Int, Boolean), LogicalPlan](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(LogicalPlan, LogicalPlan, String, String,
            Int, Boolean), LogicalPlan]): Boolean = size() > 16
    }

  /** A child plan is safe to key a cache entry on only if canonical
    * equality implies equal DATA: path-based file relations re-resolve to
    * a fresh FileIndex on data change (breaking equality), and
    * local/range relations carry their data in the plan. Catalog-backed
    * relations (Hive/metastore tables, v2 catalogs) canonicalize away the
    * detail that would distinguish a table from its post-INSERT self, so
    * they rebuild every optimization instead of caching. */
  private def cacheSafe(p: LogicalPlan): Boolean =
    p.collectLeaves().forall {
      case lr: LogicalRelation => lr.catalogTable.isEmpty
      case _: LocalRelation => true
      case _: LogicalRange => true
      case _ => false
    }

  /** Fresh expr ids for EVERY attribute produced inside the subtree
    * (consistently: each old id maps to one new id), so a cached kernel
    * spliced at a second canonically-equal join site cannot duplicate
    * attribute ids across plan branches. References into the subtree's
    * own children are rewritten with them; the subtree is self-contained,
    * so no outside reference can dangle. */
  private[catalyst] def reinstance(plan: LogicalPlan): LogicalPlan = {
    val ids = new java.util.HashMap[ExprId, ExprId]()
    def fresh(id: ExprId): ExprId =
      ids.computeIfAbsent(id, _ => NamedExpression.newExprId)
    plan.transformUp { case node =>
      node.transformExpressionsUp {
        case ar: AttributeReference => ar.withExprId(fresh(ar.exprId))
        case al: Alias =>
          Alias(al.child, al.name)(fresh(al.exprId), al.qualifier,
            al.explicitMetadata, al.nonInheritableMetadataKeys)
        // AggregateExpression carries its own resultId (the id its
        // resultAttribute binds under); without remapping it, two spliced
        // copies of one cached kernel would share agg result ids across
        // branches even though every AttributeReference was freshened.
        case ae: aggregate.AggregateExpression =>
          ae.copy(resultId = fresh(ae.resultId))
      }
    }
  }

  /** Cached (or freshly built) kernel plan for (l ⋈ r, keys, d):
    * `leftified = false` → inner matches [left cols…, right cols…, dist];
    * `leftified = true`  → matches plus null-padded unmatched left rows
    * (value-keyed — only sound when the FULL join condition is the lev
    * predicate). Cache hits splice a re-instanced copy. */
  private def kernelPlan(spark: SparkSession, l: LogicalPlan, r: LogicalPlan,
                         lKey: String, rKey: String, d: Int,
                         leftified: Boolean): LogicalPlan = {
    if (!cacheSafe(l) || !cacheSafe(r))
      return buildKernel(spark, l, r, lKey, rKey, d, leftified)
    val key = (l.canonicalized, r.canonicalized, lKey, rKey, d, leftified)
    planCache.synchronized(Option(planCache.get(key))) match {
      case Some(p) => reinstance(p)
      case None =>
        val built = buildKernel(spark, l, r, lKey, rKey, d, leftified)
        planCache.synchronized(planCache.put(key, built))
        built
    }
  }

  // ---------- kernel construction ----------

  /** Positionally rename every column to `<prefix><i>` (duplicate- and
    * overlap-proof; toDF is positional so within-side duplicate names are
    * fine) and return the key's new name. */
  private def renamed(df: DataFrame, prefix: String, key: String)
      : (DataFrame, String) = {
    val ki = df.columns.indexWhere(_ == key)
    (df.toDF(df.columns.indices.map(i => s"$prefix$i"): _*), s"$prefix$ki")
  }

  private def buildKernel(spark: SparkSession, l: LogicalPlan,
                          r: LogicalPlan, lKey: String, rKey: String,
                          d: Int, leftified: Boolean): LogicalPlan = {
    import graft.ops.SimilarityJoin
    val (lDF, lk) = renamed(GraftSql.ofRows(spark, l), "gsql_l", lKey)
    val (rDF, rk) = renamed(GraftSql.ofRows(spark, r), "gsql_r", rKey)
    // bytes-string tolerant for the same reason as minSideBytes: "1g"
    // must route to sampling, not (via rewrite's catch) kill the kernel
    val sampleBytes = try {
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get(HistSampleBytesKey, DefaultHistSampleBytes.toString))
    } catch { case _: Exception => DefaultHistSampleBytes }
    def frac(p: LogicalPlan): Double =
      if (p.stats.sizeInBytes > sampleBytes) 0.01 else 1.0
    val histL = SimilarityJoin.lengthHistogram(lDF, lk, frac(l))
    val histR = SimilarityJoin.lengthHistogram(rDF, rk, frac(r))
    val inner =
      if (SimilarityJoin.chooseChunked(histL, histR, d))
        SimilarityJoin.chunkedInnerJoin(lDF, rDF, lk, rk, d, DistCol)
      else
        SimilarityJoin.blockedInnerJoin(lDF, rDF, lk, rk, d, DistCol)
    val out =
      if (leftified) SimilarityJoin.leftifyInner(inner, lDF, rDF, lk, DistCol)
      else inner
    // splice the kernel's OPTIMIZED plan: an analyzed-only subtree would
    // skip optimizer batches that already ran on the outer plan (e.g.
    // Deduplicate→Aggregate), leaving operators the planner can't place
    out.queryExecution.optimizedPlan
  }

  // ---------- rewrite assembly ----------

  private def rewrite(spark: SparkSession, j: Join,
                      l: LogicalPlan, r: LogicalPlan,
                      lKey: String, rKey: String, d: Int,
                      leftOuter: Boolean,
                      residual: Seq[Expression]): LogicalPlan = {
    // kernel/result output contract: [left columns..., right columns...]
    // (+ trailing dist for kernel outputs); restore the join's attribute
    // ids positionally and drop the dist
    def restore(plan: LogicalPlan): Project = {
      require(plan.output.size == j.output.size ||
        plan.output.size == j.output.size + 1,
        s"kernel output ${plan.output.size} != join output " +
          s"${j.output.size} (+ dist)")
      Project(j.output.zip(plan.output).map { case (orig, neu) =>
        Alias(neu, orig.name)(exprId = orig.exprId,
          qualifier = orig.qualifier)
      }, plan)
    }
    val result: LogicalPlan =
      if (!leftOuter) {
        val restored = restore(
          kernelPlan(spark, l, r, lKey, rKey, d, leftified = false))
        // residual conjuncts filter the kernel's exact match set — the
        // composite inner join by construction
        if (residual.isEmpty) restored
        else Filter(residual.reduce(And), restored)
      } else if (residual.isEmpty) {
        restore(kernelPlan(spark, l, r, lKey, rKey, d, leftified = true))
      } else {
        val inner = restore(
          kernelPlan(spark, l, r, lKey, rKey, d, leftified = false))
        restore(leftOuterResidual(spark, j, l, inner, residual))
      }
    logInfo(s"graft lev-join kernel rewrite: $lKey ~ $rKey d=$d " +
      s"${if (leftOuter) "(left outer) " else ""}" +
      s"${if (residual.nonEmpty) s"+${residual.size} residual " else ""}-> " +
      s"${if (result.toString.contains("__gci")) "chunked" else "blocked"}")
    result
  }

  /** LEFT OUTER with residual conjuncts: matches = residual-filtered
    * kernel pairs; unmatched = left rows with NO surviving pair, found by
    * FULL-ROW null-safe anti join (value-keyed padding would break here —
    * the residual can distinguish two left rows sharing a key value;
    * full-row identity is sound because identical rows have identical
    * deterministic join behavior, and it preserves duplicate-row
    * multiplicity exactly like SQL). Each reuse of a subtree is
    * re-instanced so no attribute id appears in two plan branches. */
  private def leftOuterResidual(spark: SparkSession, j: Join,
                                l: LogicalPlan, restoredInner: LogicalPlan,
                                residual: Seq[Expression]): LogicalPlan = {
    import org.apache.spark.sql.functions.lit
    val nL = l.output.size
    val matchesDF = GraftSql.ofRows(spark,
      Filter(residual.reduce(And), restoredInner))
    // second use of the match set: fresh ids, selected positionally
    val mlPlan = reinstance(matchesDF.queryExecution.analyzed)
    val matchedLeft = GraftSql.ofRows(spark, mlPlan)
      .select(mlPlan.output.take(nL).zipWithIndex.map { case (a, i) =>
        GraftSql.column(a).as(s"gsql_ml_$i") }: _*)
      .distinct()
    // third use of the LEFT child (it already occurs inside the kernel):
    // fresh ids again, so the union's two branches stay id-disjoint
    val lFresh = reinstance(l)
    val leftDF = GraftSql.ofRows(spark, lFresh)
    val antiCond = lFresh.output.zipWithIndex.map { case (a, i) =>
      GraftSql.column(a) <=> matchedLeft(s"gsql_ml_$i") }.reduce(_ && _)
    val unmatched = leftDF.join(matchedLeft, antiCond, "left_anti")
    val padded = unmatched.select(
      lFresh.output.map(a => GraftSql.column(a)) ++
        j.output.drop(nL).zipWithIndex.map { case (a, i) =>
          lit(null).cast(a.dataType).as(s"gsql_pad_$i") }: _*)
    matchesDF.union(padded).queryExecution.optimizedPlan
  }
}
