package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Custom Catalyst expression tier (SURVEY.md §4.2 / §7.3): a fused
  * cosine-similarity kernel over two `array<float>` columns.
  *
  * Why an Expression and not a UDF: `doGenCode` emits a tight Java loop
  * into the enclosing WholeStageCodegen stage — no boxing, no
  * per-row closure dispatch, no serialization of the array into Scala
  * objects. The HOF formulation (`aggregate(zip_with(...))`) allocates
  * two intermediate arrays per row; this kernel allocates nothing.
  *
  * Determinism: the loop accumulates dot/norms LEFT-TO-RIGHT in double —
  * the exact fold order of the HOF version and of DuckDB's
  * `list_reduce`, so swapping this in preserves oracle hash-parity
  * (asserted in VectorExprSpec).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // NULL semantics match the HOF formulation exactly (required for the
  // FuseCosineHof rewrite to be sound): length mismatch or any null
  // element yields NULL — zip_with pads the shorter array with nulls,
  // which nulls the product, the fold, and the division.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, dot, na, nb, i) = (ctx.freshName("n"), ctx.freshName("dot"),
        ctx.freshName("na"), ctx.freshName("nb"), ctx.freshName("i"))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else {
         |      double xv = (double) $a.getFloat($i);
         |      double yv = (double) $b.getFloat($i);
         |      $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Idempotent session-registry registration, shared by every custom
  * function: query builders call register defensively, so a 50-query
  * session would otherwise re-register (and WARN) once per query. */
object Registry {
  def registerOnce(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}

object VectorExpressions {
  /** Register `cosine_sim` into a session's function registry (U2). */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "cosine_sim",
      exprs => CosineSim(exprs(0), exprs(1)))
}

/** SparkSessionExtensions entry point — the (c)-tier registration path:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions` wires the custom
  * function into every session without touching user code. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => FuseCosineHof)
    e.injectOptimizerRule(_ => GuardLevenshtein)
  }
}
