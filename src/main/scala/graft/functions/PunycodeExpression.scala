package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IDN → ASCII (punycode) host encoding — RFC 3490 ToASCII per label
  * via the JDK's `java.net.IDN` (public, deterministic, no new
  * dependency). Scope, documented precisely:
  *
  *   - ASCII-only hosts return UNCHANGED by an O(n) byte scan — the
  *     overwhelming crawl majority never pays the codec (and already-
  *     punycoded `xn--` labels pass through byte-identical, which is
  *     what makes `bücher.example` and `XN--BCHER-KVA.example` — after
  *     the canonicalizer's lowercase — one dedup key);
  *   - non-ASCII hosts run `IDN.toASCII` with default flags (nameprep
  *     mapping + punycode per label);
  *   - anything `IDN.toASCII` rejects (overlong labels, stray
  *     bidi/control codepoints) returns the input unchanged —
  *     garbage-in-garbage-out, the canonicalizer's posture everywhere
  *     (a crawl's host column is never clean, and a dedup KEY must
  *     never fail the job).
  *
  * The callers' SQL oracles cannot run a punycode codec; fixtures pin
  * specific host constants instead (the Spark side still computes them
  * through this expression — a wrong encoding fails the compare).
  */
object PunycodeImpl {

  def toAscii(host: UTF8String): UTF8String = {
    val bytes = host.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) host
    else try {
      UTF8String.fromString(java.net.IDN.toASCII(host.toString))
    } catch { case _: IllegalArgumentException => host }
  }
}

/** Codegen'd unary expression: punycode-encode a host string (see
  * [[PunycodeImpl]] for the exact scope). Static-call pattern like
  * [[JaroWinklerSimilarity]] — stays inside whole-stage codegen.
  */
case class PunycodeHost(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"punycode_host expects a string argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = StringType

  override def prettyName: String = "punycode_host"

  override def nullSafeEval(h: Any): Any =
    PunycodeImpl.toAscii(h.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h =>
      s"graft.functions.PunycodeImpl.toAscii($h)")

  override protected def withNewChildInternal(
      newChild: Expression): PunycodeHost = copy(child = newChild)
}
