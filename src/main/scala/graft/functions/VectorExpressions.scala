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

/** Native codegen'd constant-matrix × vector product: out[r] = Σ_i
  * M[r][i] · v[i], the whole rotation/projection as ONE expression.
  *
  * Rationale: composing `array(dotProduct × rows)` works semantically but
  * each DotProduct child carries its row as a `CreateArray` of literals —
  * at 64×64 that is 4096 literal nodes, the projection blows the codegen
  * method-size budget, and the whole stage falls back to interpreted
  * evaluation (~90 ns/multiply measured at q138). Here the matrix ships
  * ONCE as a flat `double[]` reference object and the generated code is
  * two tight primitive loops — per-row cost is rows·cols fused
  * multiply-adds, which is what a 10^11-row rotation needs.
  *
  * Semantics match the composed form exactly (same left-to-right
  * accumulation per output row — oracle-parity critical): null elements
  * contribute 0, inputs shorter than `cols` are zero-extended, null
  * array → null.
  */
case class MatVecProduct(child: Expression, matrix: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val rows = matrix.length
  private val cols = if (rows == 0) 0 else matrix(0).length
  require(rows > 0 && cols > 0 && matrix.forall(_.length == cols),
    "mat_vec matrix must be non-empty and rectangular")

  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](rows * cols)
    var r = 0
    while (r < rows) {
      System.arraycopy(matrix(r), 0, f, r * cols, cols)
      r += 1
    }
    f
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec expects array<double>, got ${other.catalogString}; " +
        "cast float embeddings with CAST(x AS ARRAY<DOUBLE>)")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "mat_vec"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), cols)
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      var acc = 0.0
      val off = r * cols
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) acc += flat(off + i) * a.getDouble(i)
        i += 1
      }
      out(r) = acc
      r += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("mvMat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |int mvN = java.lang.Math.min($a.numElements(), $cols);
         |double[] mvOut = new double[$rows];
         |for (int mvR = 0; mvR < $rows; mvR++) {
         |  double mvAcc = 0.0;
         |  int mvOff = mvR * $cols;
         |  for (int mvI = 0; mvI < mvN; mvI++) {
         |    if (!$a.isNullAt(mvI)) {
         |      mvAcc += $mat[mvOff + mvI] * $a.getDouble(mvI);
         |    }
         |  }
         |  mvOut[mvR] = mvAcc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(mvOut);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecProduct =
    copy(child = newChild)
}
