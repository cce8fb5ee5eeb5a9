package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dense-vector dot product — the
  * hot inner loop of the similarity tier (SURVEY §2 c5–c7).
  *
  * Spark's `aggregate`/`zip_with` higher-order functions evaluate
  * interpreted (lambda tree-walk per element, outside whole-stage
  * codegen); this expression generates a tight primitive loop instead.
  * The sum is strictly left-to-right in doubles, bit-identical to the
  * HOF spelling and to DuckDB's list_sum-over-list_transform oracle
  * (SURVEY §6).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += x.getDouble(i) * y.getDouble(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sum of squares in one traversal — what `graft_dot(a, a)` means.
  * Produced by the GraftOptimizations optimizer rule rather than
  * written by hand, demonstrating `Rule[LogicalPlan]` injection; the
  * fold order matches DotProduct exactly so the rewrite is
  * value-preserving bit-for-bit. */
case class SelfDot(child: Expression) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_self_dot"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var sum = 0.0
    var i = 0
    while (i < x.numElements()) { val v = x.getDouble(i); sum += v * v; i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val v = ctx.freshName("v")
      s"""
         |double $sum = 0.0;
         |for (int $i = 0; $i < $x.numElements(); $i++) {
         |  double $v = $x.getDouble($i);
         |  $sum += $v * $v;
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Optimizer rule: `graft_dot(a, a)` → `graft_self_dot(a)` — one
  * array traversal instead of two synchronized ones. Injected via
  * SparkSessionExtensions.injectOptimizerRule; fires on every
  * norm computation in the similarity tier. */
object RewriteSelfDot extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.transformAllExpressions {
      case DotProduct(a, b) if a.semanticEquals(b) && a.deterministic => SelfDot(a)
    }
}

object VectorExpressions {
  /** Column API for DotProduct. Inputs must already be array<double>
    * (VectorFns.dot casts). Uses Spark 4's public classic
    * Column↔Expression bridge. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
