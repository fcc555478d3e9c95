package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Winkler 1990 — public record-linkage
  * classic), pinned to the semantics DuckDB's
  * `jaro_winkler_similarity` implements (the maxbachmann/jaro_winkler
  * formulation) so the two engines agree to within one ulp (probed:
  * bit-identical on 15/16 pinned cases, one last-ulp divergence from
  * DuckDB's internal cutoff path — JaroWinklerSpec):
  *
  *   - either string empty → 0.0 (including both empty);
  *   - match window = max(len1, len2)/2 − 1, floored at 0;
  *   - transpositions = (mismatches among matched sequences) / 2 with
  *     INTEGER division (a 3-cycle counts 1, not 1.5 — probed against
  *     DuckDB: jaro('abcdefgh','bcadefgh') = 0.958333…, the int-div
  *     value);
  *   - jaro = (m/len1 + m/len2 + (m − t)/m) / 3, in that operation
  *     order;
  *   - Winkler boost only when jaro > 0.7 (strict): + p·0.1·(1 − jaro)
  *     with p = common prefix capped at 4.
  *
  * Comparison is per UTF-8 BYTE, exactly as DuckDB compares — the
  * UTF8String operands' backing bytes are walked directly, so accented
  * or CJK names agree with the oracle too, not just ASCII (on ASCII a
  * byte and a code unit coincide). Rounding to 6 decimals before any
  * threshold/rank compare is still required — the engines' double `/`
  * sequences can differ in the last ulp.
  */
object JaroWinklerImpl {

  def similarity(a: UTF8String, b: UTF8String): Double =
    simBytes(a.getBytes, b.getBytes)

  /** Test/probe entry point over JVM strings; delegates to the one
    * byte-level core so the semantics cannot drift.
    */
  def sim(s1: String, s2: String): Double =
    simBytes(s1.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      s2.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def simBytes(s1: Array[Byte], s2: Array[Byte]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val matched2 = new Array[Boolean](l2)
    val matched1 = new Array[Boolean](l1)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s1(i) == s2(j)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched sequences in order
    var k = 0
    var mism = 0
    i = 0
    while (i < l1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1(i) != s2(k)) mism += 1
        k += 1
      }
      i += 1
    }
    val t = mism / 2
    val jaro = (m / l1.toDouble + m / l2.toDouble +
      (m - t) / m.toDouble) / 3.0
    if (jaro > 0.7) {
      val cap = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < cap && s1(p) == s2(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** Codegen'd binary expression over two string columns. The algorithm
  * lives in [[JaroWinklerImpl]] as a static call (Levenshtein's own
  * pattern — `UTF8String.levenshteinDistance` is likewise a library
  * call from generated code), so the expression stays inside
  * whole-stage codegen without inlining a 60-line loop per call site.
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects two string arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)
}
