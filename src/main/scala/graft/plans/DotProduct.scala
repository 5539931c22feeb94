package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, BinaryExpression, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: ordered-fold dot product of two
  * array<double> columns.
  *
  * Semantically identical to `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * — the binary64 left fold in index order that both engines share
  * (DuckDB: `list_reduce(list_prepend(0.0, list_transform(...)))`), so
  * swapping it in changes NOTHING about results, only cost: one
  * codegen'd primitive loop per row instead of two materialized
  * intermediate arrays (zip_with, transform) plus per-element
  * higher-order-function lambda dispatch. This is the hot loop of
  * every similarity-search and embedding-dedup operator (SURVEY §2.10
  * preference order: built-ins > native Expression > UDF — here the
  * built-in composition allocates 2 arrays per pair, which at 100 TB
  * of candidate pairs is the dominant GC load).
  *
  * Null semantics mirror the fold it replaces: NULL if either array is
  * NULL, if lengths differ (zip_with pads with NULL, poisoning the
  * fold), or if any element is NULL.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(DoubleType, true) || left.dataType == ArrayType(DoubleType, false))
      if (right.dataType == ArrayType(DoubleType, true) || right.dataType == ArrayType(DoubleType, false))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"dot_product right side: ${right.dataType}")
    else TypeCheckResult.TypeCheckFailure(s"dot_product left side: ${left.dataType}")

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getDouble(i) * b.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object DotProduct {
  /** Column-API form. */
  def dot_product(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      DotProduct(org.apache.spark.sql.graft.ColumnBridge.expr(a),
        org.apache.spark.sql.graft.ColumnBridge.expr(b)))

  /** Optimizer rule: rewrite the idiomatic composed dot product
    * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)`
    * into the native DotProduct expression. Users (and our own older
    * call sites) writing the composed form get the codegen'd primitive
    * loop for free. The match is deliberately strict about value
    * semantics: double-array inputs only, a bit-exact +0.0 seed (a
    * -0.0 seed changes the empty-array result), a bare x*y multiply
    * and acc+v merge (either operand order — IEEE multiply and add
    * are commutative), and an identity finish lambda. Anything else
    * is left alone. */
  object RewriteRule extends Rule[LogicalPlan] {
    private def isDoubleArray(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    private def varIds(args: Seq[NamedLambdaVariable]): Set[Long] =
      args.map(_.exprId.id).toSet
    private def bothAreVars(l: Expression, r: Expression, ids: Set[Long]): Boolean =
      (l, r) match {
        case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
          lv.exprId.id != rv.exprId.id &&
            ids(lv.exprId.id) && ids(rv.exprId.id)
        case _ => false
      }
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case ArrayAggregate(
            zw @ ZipWith(left, right,
              LambdaFunction(m: Multiply, margs, _)),
            Literal(zero: Double, DoubleType),
            LambdaFunction(a: Add, aargs, _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(farg: NamedLambdaVariable), _))
          if java.lang.Double.doubleToRawLongBits(zero) == 0L &&
            isDoubleArray(left.dataType) && isDoubleArray(right.dataType) &&
            margs.forall(_.isInstanceOf[NamedLambdaVariable]) &&
            aargs.forall(_.isInstanceOf[NamedLambdaVariable]) &&
            bothAreVars(m.left, m.right,
              varIds(margs.map(_.asInstanceOf[NamedLambdaVariable]))) &&
            bothAreVars(a.left, a.right,
              varIds(aargs.map(_.asInstanceOf[NamedLambdaVariable]))) &&
            fin.exprId == farg.exprId =>
          DotProduct(left, right)
      }
  }

  val fnDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        s"dot_product expects exactly 2 arguments, got ${exprs.length}")
      DotProduct(exprs.head, exprs(1))
    })
}
