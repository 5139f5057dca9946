package graft.catalyst

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Engine extensions: the banded-Levenshtein optimizer rule and the native
  * `cosine_sim` expression.
  *
  * Production path: `--conf spark.sql.extensions=graft.catalyst.GraftExtensions`
  * (bound at session construction). For an already-running session use
  * `GraftExtensions.install(spark)`, which registers the same pieces via
  * `experimental.extraOptimizations` and the session function registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => LevenshteinBandRule)
    ext.injectOptimizerRule(_ => LevJoinKernelRule)
    ext.injectOptimizerRule(_ => WindowTopKRule)
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectFunction(GraftExtensions.bloomAggDescriptor)
    ext.injectFunction(GraftExtensions.mightContainDescriptor)
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}

object GraftExtensions {

  // Spark ships bloom-filter build/probe expressions for its own runtime
  // row-level filtering but does not register them as SQL functions; graft
  // exposes them so pipelines can build the classic semi-join prefilter
  // (build a bloom over the small side's keys, cheap-probe the 100 TB side
  // before the real join). Input is a LONG (hash keys with xxhash64 first).
  private val bloomAggDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_filter_agg"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "bloom_filter_agg"),
    (children: Seq[Expression]) => {
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      children match {
        case Seq(c) => new BloomFilterAggregate(c)
        case Seq(c, est) => new BloomFilterAggregate(c, est)
        case Seq(c, est, bits) => new BloomFilterAggregate(c, est, bits)
        case _ => throw new IllegalArgumentException(
          "bloom_filter_agg(col[, estItems[, numBits]])")
      }
    })

  private val mightContainDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("might_contain"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "might_contain"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "might_contain takes exactly 2 arguments")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        children.head, children(1))
    })

  private val cosineSimDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "cosine_sim takes exactly 2 arguments")
      // numeric arrays (float, int, ...) are accepted via an explicit cast
      val cast = children.map(c => Cast(c, ArrayType(DoubleType)))
      CosineSimilarity(cast.head, cast(1))
    })

  /** Idempotent post-hoc installation on a live session — including one
    * built with `spark.sql.extensions=graft.catalyst.GraftExtensions`
    * (the production path): rules injected there are NOT visible in
    * `experimental.extraOptimizations`, so without the registry-based
    * guard a harness main calling install() would append the rules and
    * strategy a second time and every query would pay double
    * optimizer/planner passes. The function registry IS populated by
    * both paths, so it is the reliable marker. */
  def install(spark: SparkSession): Unit = synchronized {
    if (isInstalled(spark)) return
    if (!spark.experimental.extraOptimizations.contains(LevenshteinBandRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LevenshteinBandRule
    if (!spark.experimental.extraOptimizations.contains(LevJoinKernelRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LevJoinKernelRule
    if (!spark.experimental.extraOptimizations.contains(WindowTopKRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ WindowTopKRule
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val registry = spark.sessionState.functionRegistry
    Seq(cosineSimDescriptor, bloomAggDescriptor, mightContainDescriptor)
      .foreach { d =>
        if (!registry.functionExists(d._1))
          registry.registerFunction(d._1, d._2, d._3)
      }
  }

  def isInstalled(spark: SparkSession): Boolean =
    spark.sessionState.functionRegistry
      .functionExists(FunctionIdentifier("cosine_sim"))

  /** Column API for the native expression (requires install). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}
