package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native cosine similarity over two `array<double>` columns.
  *
  * The built-in composition (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * is semantically identical but runs the lambda interpreter per element —
  * outside whole-stage codegen. This expression generates a tight Java loop
  * (one pass, three accumulators), which matters when similarity search
  * scores millions of candidate pairs. Element order is ascending-index on
  * both paths, so results are bit-identical to the HOF form.
  *
  * Registration (with an input cast for float arrays) lives in
  * `GraftExtensions`; Spark 4 keeps `AbstractDataType` private[sql], so the
  * implicit-cast traits are unavailable to external expressions and the
  * builder casts explicitly instead.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires array<double> inputs, got $l and $r")
    }

  // Edge semantics REPLICATE the HOF form exactly, in its evaluation
  // order, so the `cosineFor` implementation switch can never change
  // query results: a null ELEMENT on either side poisons that side's
  // norm -> NULL (even against a zero-norm other side: null * 0 is
  // null); else a ZERO NORM on either side -> 0.0, including ragged
  // lengths (the HOF's `when(d === 0, 0.0)` fires before the padded
  // dot is looked at); else ragged lengths -> NULL (zip_with pads with
  // null and poisons the dot); else dot / d.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nA = x.numElements(); val nB = y.numElements()
    var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < nA) {
      if (x.isNullAt(i)) return null
      val xi = x.getDouble(i); nx += xi * xi; i += 1
    }
    i = 0
    while (i < nB) {
      if (y.isNullAt(i)) return null
      val yi = y.getDouble(i); ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) return 0.0
    if (nA != nB) return null
    var dot = 0.0
    i = 0
    while (i < nA) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // mirrors nullSafeEval: null element -> NULL; zero norm (either
      // side, any lengths) -> 0.0; ragged -> NULL; else dot / d
      val i = ctx.freshName("i")
      val nA = ctx.freshName("nA")
      val nB = ctx.freshName("nB")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $nA = $a.numElements();
         |int $nB = $b.numElements();
         |double $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $nA && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; }
         |  else { double $xi = $a.getDouble($i); $nx += $xi * $xi; }
         |}
         |for (int $i = 0; $i < $nB && !${ev.isNull}; $i++) {
         |  if ($b.isNullAt($i)) { ${ev.isNull} = true; }
         |  else { double $yi = $b.getDouble($i); $ny += $yi * $yi; }
         |}
         |if (!${ev.isNull}) {
         |  if ($nx == 0.0 || $ny == 0.0) {
         |    ${ev.value} = 0.0;
         |  } else if ($nA != $nB) {
         |    ${ev.isNull} = true;
         |  } else {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $nA; $i++) {
         |      $dot += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |    ${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
         |  }
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
