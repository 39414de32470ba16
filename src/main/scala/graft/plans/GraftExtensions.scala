package graft.plans

import graft.functions.{CosineSimilarity, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Session-extension entry point: installs graft's native expressions into
  * the function registry at session build time (`.withExtensions(new
  * GraftExtensions)`) and adds a custom optimizer rule — the same
  * `SparkSessionExtensions` mechanism a packaged deployment of this engine
  * would ship, instead of per-query `register()` calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    e.injectOptimizerRule(_ => SelfCosineRule)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

/** Optimizer rule: `cosine_similarity(x, x)` is 1.0 for any non-null,
  * non-zero vector. Replaces the 3-accumulator O(d) loop with a
  * short-circuiting `exists(x, e != 0)` guard (first non-zero element
  * wins) that preserves the expression's null semantics: null input →
  * null, all-zero vector → null (zero denominator), otherwise 1.0.
  * Demonstrates the `Rule[LogicalPlan]` extension tier — Hive's analog is
  * the ql/optimizer rewrite family (e.g. ConstantPropagate). Assumes
  * non-null array elements, same as the expression it rewrites. */
object SelfCosineRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.semanticEquals(b) && a.deterministic =>
        val elemType = a.dataType match {
          case ArrayType(t, _) => t
          case t => t
        }
        val zero = elemType match {
          case FloatType => Literal(0.0f)
          case _ => Literal(0.0)
        }
        val x = NamedLambdaVariable("x", elemType, nullable = true)
        val nonZero = ArrayExists(a, LambdaFunction(Not(EqualTo(x, zero)), Seq(x)))
        If(EqualTo(nonZero, Literal(true)),
          Literal(1.0), Literal.create(null, DoubleType))
    }
}
