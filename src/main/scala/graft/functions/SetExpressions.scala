package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |A ∩ B| for two SORTED array<bigint> columns, as a linear two-pointer
  * merge — no hash-set build, no result-array allocation.
  *
  * Rationale (SURVEY.md §4 tier b): pairwise set-similarity verification
  * (jaccard = |∩| / (|A|+|B|−|∩|)) only needs the intersection COUNT, but
  * `size(array_intersect(a, b))` materializes the intersection array and
  * builds a hash set per pair. Sorting each side once per document row
  * (`sort_array` in the projection) amortizes to nothing; the per-pair merge
  * is then allocation-free and codegen'd.
  *
  * PRECONDITION: both inputs sorted ascending (duplicates allowed — counted
  * as set intersection, each common value once).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two array<bigint>, got ${l.catalogString} / ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var n = 0
    val na = a.numElements()
    val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) {
        n += 1
        val v = x
        while (i < na && a.getLong(i) == v) i += 1
        while (j < nb && b.getLong(j) == v) j += 1
      } else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int siNa = $a.numElements();
         |int siNb = $b.numElements();
         |int siI = 0; int siJ = 0; int siN = 0;
         |while (siI < siNa && siJ < siNb) {
         |  long siX = $a.getLong(siI);
         |  long siY = $b.getLong(siJ);
         |  if (siX == siY) {
         |    siN++;
         |    while (siI < siNa && $a.getLong(siI) == siX) siI++;
         |    while (siJ < siNb && $b.getLong(siJ) == siX) siJ++;
         |  } else if (siX < siY) { siI++; } else { siJ++; }
         |}
         |${ev.value} = siN;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
