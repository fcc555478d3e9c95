package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over a pre-hashed shingle array.
  *
  * Input: array<long> of non-negative 31-bit shingle hashes. Output:
  * array<long> of length `numPerm`, slot j = min over shingles of
  * (a_j·h + b_j) mod p, p = 2^31−1 (sentinel p for empty docs). The
  * modulus deliberately matches the 31-bit hash domain (Dedup.MersennePrime)
  * — an earlier 2^61−1 modulus left the family piecewise-monotone and
  * flooded LSH with false candidates (see Dedup.permutationParams).
  *
  * Why a custom expression (SURVEY.md §4 tier b): the equivalent
  * `zip_with(aArr, bArr, (a,b) → array_min(transform(hs, …)))` formulation
  * runs numPerm×|shingles| interpreted lambda calls per row — ~6 s for
  * 5000×64×100 at sf0.1. This doGenCode emits the two-level primitive loop
  * (~0.2 s), and the same ratio holds per-split at 100 TB.
  *
  * The permutation parameters are embedded as reference objects; both a_j
  * and h are < 2^31 so a_j·h never overflows a signed long.
  */
case class MinHashSignature(child: Expression, as: Array[Long], bs: Array[Long])
    extends UnaryExpression {

  private val P = 2147483647L // 2^31-1

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint> of shingle hashes, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = new Array[Long](as.length)
    var j = 0
    while (j < as.length) {
      var minV = P
      var i = 0
      while (i < n) {
        if (!hs.isNullAt(i)) {
          val v = (as(j) * hs.getLong(i) + bs(j)) % P
          if (v < minV) minV = v
        }
        i += 1
      }
      sig(j) = minV
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    val arrayDataCls = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, hs => {
      // freshName, NOT fixed identifiers (the SortedIntersectCount
      // lesson): two instances in one codegen scope must not redeclare
      val n = ctx.freshName("mhN"); val sg = ctx.freshName("mhSig")
      val jj = ctx.freshName("mhJ"); val mn = ctx.freshName("mhMin")
      val ii = ctx.freshName("mhI"); val v = ctx.freshName("mhV")
      s"""
         |int $n = $hs.numElements();
         |long[] $sg = new long[$asRef.length];
         |for (int $jj = 0; $jj < $asRef.length; $jj++) {
         |  long $mn = ${P}L;
         |  for (int $ii = 0; $ii < $n; $ii++) {
         |    if (!$hs.isNullAt($ii)) {
         |      long $v = ($asRef[$jj] * $hs.getLong($ii) + $bsRef[$jj]) % ${P}L;
         |      if ($v < $mn) $mn = $v;
         |    }
         |  }
         |  $sg[$jj] = $mn;
         |}
         |${ev.value} = new $arrayDataCls($sg);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
