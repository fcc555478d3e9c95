package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product of two array<double> columns.
  *
  * Rationale (SURVEY.md §4, custom-Expression tier b): Spark's higher-order
  * functions (`zip_with`, `aggregate`) evaluate their lambdas on the
  * interpreted path — per-element closure dispatch that dominates the cost
  * of brute-force similarity scans. This expression stays inside
  * whole-stage codegen: the generated code is a tight primitive loop over
  * the two ArrayData buffers (~5× faster at sf0.1, and the difference grows
  * with the pair count at 100 TB).
  *
  * Semantics: element-wise product-sum over the common prefix length;
  * null elements contribute 0; null array → null result (nullSafe).
  * Float arrays arrive via implicit cast to array<double>.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two array<double> arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}; " +
        "cast float embeddings with CAST(x AS ARRAY<DOUBLE>)")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int dpN = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dpAcc = 0.0;
         |for (int dpI = 0; dpI < dpN; dpI++) {
         |  if (!$a.isNullAt(dpI) && !$b.isNullAt(dpI)) {
         |    dpAcc += $a.getDouble(dpI) * $b.getDouble(dpI);
         |  }
         |}
         |${ev.value} = dpAcc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
