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
      // freshName, NOT fixed identifiers: a plan evaluating this
      // expression twice in one codegen scope (e.g. the jaccard value and
      // a pushed-down threshold filter on it) generated two `int siNa`
      // declarations — a Janino CompileException that silently dropped
      // the whole stage to the interpreter on every LSH verify join
      val na = ctx.freshName("siNa"); val nb = ctx.freshName("siNb")
      val i = ctx.freshName("siI"); val j = ctx.freshName("siJ")
      val n = ctx.freshName("siN")
      val x = ctx.freshName("siX"); val y = ctx.freshName("siY")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) {
         |    $n++;
         |    while ($i < $na && $a.getLong($i) == $x) $i++;
         |    while ($j < $nb && $b.getLong($j) == $x) $j++;
         |  } else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
