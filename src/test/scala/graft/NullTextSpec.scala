package graft

import org.apache.spark.sql.functions._

import graft.functions._
import graft.ops.{Dedup, TextAnalysis}

/** The testdata tables carry no NULLs, so the oracle gate never exercises
  * them — this spec pins what the text operators actually do when a 100 TB
  * corpus inevitably contains null text.
  */
class NullTextSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, Some("hello world hello")),
    (2L, None),
    (3L, Some("other text here"))
  ).toDF("doc_id", "text")

  test("tokens/cleanText/fingerprint propagate null (no throw, no phantom tokens)") {
    val r = docs.select(col("doc_id"),
      tokens(col("text")).as("t"),
      TextAnalysis.cleanText(col("text")).as("c"),
      TextAnalysis.fingerprint(col("text")).as("f"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(2L).isNullAt(1) && r(2L).isNullAt(2) && r(2L).isNullAt(3))
    assert(!r(1L).isNullAt(1) && r(1L).getSeq[String](1).nonEmpty)
  }

  test("explode-based ops silently drop null-text docs (documented shape)") {
    // explode(null array) emits no rows — null docs vanish from token-level
    // aggregates rather than erroring; callers wanting them must coalesce
    val tf = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 1)
    assert(tf.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("tf-idf N counts ALL docs, including token-free ones (idf = ln(N/df))") {
    // 3 docs, one null text: every term here has df = 1, so
    // idf = ln(3/1) — a tf-derived N would give ln(2/1) and diverge from
    // the standard definition (and the q81 oracle, whose n CTE counts
    // documents, not token-bearing documents)
    val tf = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 1: top term "hello" tf=2 → 2·ln(3)
    assert(tf(1L) == math.round(2 * math.log(3.0) * 1e6) / 1e6)
    assert(tf(3L) == math.round(math.log(3.0) * 1e6) / 1e6)
  }

  test("normalized dedup groups all null texts into one survivor") {
    val withNulls = docs.unionByName(Seq((4L, Option.empty[String])).toDF("doc_id", "text"))
    val kept = Dedup.exact(
      withNulls.withColumn("__k", Dedup.normalizeText(col("text"))),
      Seq("__k"), "doc_id")
    // rows 2 and 4 share the null key: only the min-id survivor remains
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }
}
