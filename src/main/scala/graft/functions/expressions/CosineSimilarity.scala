package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns, with whole-stage codegen — the
  * custom-Expression tier of the extension ladder (compose built-ins →
  * custom Expression → custom plan): the higher-order-function
  * formulation in [[graft.functions.VectorFunctions.cosine]] evaluates
  * its lambdas interpreted per element, which is the difference
  * between scanning 100 TB of embeddings inside one codegen stage and
  * falling out of it.
  *
  * Accumulation order (single pass, three independent accumulators,
  * index-ascending) matches the explicit left folds used by the DuckDB
  * oracles bit-for-bit.
  *
  * Edge semantics (deliberate, matching the HOF twin exactly):
  * mismatched lengths → NULL (`zip_with` pads the shorter side with
  * nulls, which poisons the whole fold), any NULL element → NULL
  * (lambda arithmetic on null is null), and a zero vector yields NaN
  * (0/0) — which both Spark and DuckDB order as the largest double.
  * Callers ranking descending should pre-filter zero/degenerate
  * vectors.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  // NULL is produced for well-typed inputs (length mismatch / null
  // element), not only for null children.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Session registration for graft's native expressions. */
object GraftFunctions {
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "dot_fold" -> (exprs => DotFold(exprs(0), exprs(1))),
    "l2sq_fold" -> (exprs => L2SqFold(exprs(0), exprs(1))),
    // aggregate builders return the bare AggregateFunction — the
    // analyzer wraps it in an AggregateExpression at resolution
    "bitmap_distinct" -> (exprs => BitmapDistinct(exprs(0))),
    // generator (UDTF) — the analyzer lifts it into a Generate node
    "word_ngrams" -> (exprs => WordNGrams(exprs(0), exprs(1))),
    // fixed-point kernels for deterministic primitive-long sums
    "fixed18" -> (exprs => Fixed18(exprs(0))),
    "fixed_combine" -> (exprs => FixedCombine(exprs(0), exprs(1), exprs(2))))

  /** Imperative registration (any existing session). Idempotent: a
    * name already present (from a prior call or [[GraftExtensions]]
    * injection) is left alone — re-registering is not only wasted work,
    * it spams every executor log with SimpleFunctionRegistry "function
    * replaced" warnings (one per call site per query). Contract: the
    * graft function names (`cosine_sim`, `dot_fold`, `l2sq_fold`) are
    * reserved in sessions that use this library — an application that
    * registers its OWN function under one of these names first will
    * keep it (we deliberately never clobber an existing registration;
    * use [[GraftExtensions]] at session build time to guarantee the
    * graft definitions). */
  def register(spark: SparkSession): Unit = builders.foreach { case (name, b) =>
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier(name)))
      registry.createOrReplaceTempFunction(name, b, "scala_udf")
  }
}

/** `SparkSessionExtensions` hook:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.expressions.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[CosineSimilarity].getName, name), b))
    }
    e.injectOptimizerRule(_ => graft.plans.ThresholdedLevenshtein)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
