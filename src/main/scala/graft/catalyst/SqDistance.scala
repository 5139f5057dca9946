package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native squared-L2 distance over two `array<double>` columns (r17).
  *
  * Replaces the HOF composition
  * `aggregate(zip_with(s, c, (x,y) => (x-y)*(x-y)), 0d, (a,x) => a+x)`,
  * which runs the lambda interpreter per ELEMENT and allocates the
  * zipped array per evaluation — measured as the dominant executor CPU
  * of the IVF cell assignment and the PQ encode/lookup builds, where
  * every corpus row evaluates nlist (or m·ksub) distances. Same
  * CosineSimilarity rationale: a tight generated loop with ascending-
  * index accumulation — the identical IEEE op order to the HOF's left
  * fold — so results are BIT-IDENTICAL (the ANN oracles bit-replay this
  * exact fold; LlmSpec pins the regime parity).
  *
  * Edge semantics replicate the HOF form exactly: `zip_with` pads the
  * shorter side with nulls and the padded product poisons the sum, so
  * ANY length mismatch → NULL; a NULL element on either side → NULL;
  * two empty arrays → 0.0 (the fold's zero); NULL input array → NULL. */
case class SqDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "sq_dist"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq_dist requires array<double> inputs, got $l and $r")
    }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else {
         |      double $d = $a.getDouble($i) - $b.getDouble($i);
         |      $acc += $d * $d;
         |    }
         |  }
         |  ${ev.value} = $acc;
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
