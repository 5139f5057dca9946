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
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}

object GraftExtensions {

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

  /** Idempotent post-hoc installation on a live session. */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(LevenshteinBandRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LevenshteinBandRule
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier("cosine_sim")))
      registry.registerFunction(cosineSimDescriptor._1,
        cosineSimDescriptor._2, cosineSimDescriptor._3)
  }

  def isInstalled(spark: SparkSession): Boolean =
    spark.sessionState.functionRegistry
      .functionExists(FunctionIdentifier("cosine_sim"))

  /** Column API for the native expression (requires install). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}
