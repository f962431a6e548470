package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen twins of [[graft.functions.VectorFunctions.dot]] and
  * [[graft.functions.VectorFunctions.l2sq]]: Spark evaluates
  * higher-order-function lambdas interpreted, one closure call per
  * element, so the HOF folds fall out of whole-stage codegen on
  * exactly the paths that scan every embedding (k-means assignment,
  * LSH bucketing). These expressions keep the identical
  * index-ascending single-accumulator fold — bit-for-bit the HOF and
  * DuckDB `list_reduce` result — inside generated code.
  *
  * Edge semantics match the HOF twins (asserted in SimilaritySpec):
  * length mismatch → NULL, any NULL element → NULL.
  */
abstract class VectorFold extends BinaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  /** Java source for one term given element names xi, yi. */
  protected def termJava(xi: String, yi: String): String
  /** Scala evaluation of one term. */
  protected def termEval(xi: Double, yi: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += termEval(x.getDouble(i), y.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $acc += ${termJava(xi, yi)};
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })
}

/** sum_i a[i]*b[i] (left fold, index order). */
case class DotFold(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "dot_fold"
  override protected def termJava(xi: String, yi: String): String = s"$xi * $yi"
  override protected def termEval(xi: Double, yi: Double): Double = xi * yi
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** sum_i (a[i]-b[i])^2 (left fold, index order). */
case class L2SqFold(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "l2sq_fold"
  override protected def termJava(xi: String, yi: String): String =
    s"($xi - $yi) * ($xi - $yi)"
  override protected def termEval(xi: Double, yi: Double): Double = (xi - yi) * (xi - yi)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
