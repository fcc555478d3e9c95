package graft

import org.apache.spark.sql.functions._

import graft.functions.shingleHashes
import graft.ops.Dedup

/** Statistical gate on the MinHash-LSH hash family: the measured candidate
  * rate on planted-similarity corpora must track the S-curve
  * P(candidate) = 1 − (1 − s^r)^b. This is the test class that catches a
  * degenerate permutation family immediately — the negative control below
  * re-creates the original 2^61−1-modulus bug (modulus ≫ hash domain keeps
  * a·x+b piecewise-monotone in x, so unrelated docs share band minima) and
  * asserts the same measurement REJECTS it.
  */
class LshPropertySpec extends SparkSpec {
  import spark.implicits._

  private val bands = 16
  private val rowsPerBand = 4
  private val numPerm = bands * rowsPerBand

  /** nPairs disjoint-vocabulary doc pairs, each sharing `m` of `n` tokens:
    * pairwise jaccard within a pair = m/(2n−m); across pairs = 0.
    * Token ORDER is irrelevant to shingleK=1 signatures (set semantics).
    */
  private def plantedPairs(nPairs: Int, n: Int, m: Int) = {
    val rows = (0 until nPairs).flatMap { p =>
      val shared = (0 until m).map(j => s"p${p}_s$j")
      val aOnly = (0 until n - m).map(j => s"p${p}_a$j")
      val bOnly = (0 until n - m).map(j => s"p${p}_b$j")
      Seq((2L * p, (shared ++ aOnly).mkString(" ")),
        (2L * p + 1, (shared ++ bOnly).mkString(" ")))
    }
    rows.toDF("doc_id", "text")
  }

  private def theoryRate(s: Double): Double =
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)

  /** Fraction of planted pairs (2p, 2p+1) surfaced as LSH candidates. */
  private def measuredRate(cands: org.apache.spark.sql.DataFrame, nPairs: Int): Double = {
    val hits = cands
      .filter(col("id_b") === col("id_a") + 1 && col("id_a") % 2 === 0)
      .count()
    hits.toDouble / nPairs
  }

  test("candidate rate tracks 1-(1-s^r)^b across the S-curve") {
    val nPairs = 200
    val n = 40
    // m/(2n-m) = s  ⇒  m = 2ns/(1+s)
    for ((m, tol) <- Seq((13, 0.10), (27, 0.15), (38, 0.05))) {
      val s = m.toDouble / (2 * n - m)
      val docs = plantedPairs(nPairs, n, m)
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text",
        shingleK = 1, numPerm = numPerm)
      val rate = measuredRate(
        Dedup.lshCandidates(sigs, "doc_id", bands, rowsPerBand), nPairs)
      val expected = theoryRate(s)
      assert(math.abs(rate - expected) <= tol,
        f"s=$s%.3f measured=$rate%.3f theory=$expected%.3f tol=$tol")
    }
  }

  test("corpus gap property: no sf0.01 document pair has 2-shingle jaccard in (0.3, 0.9)") {
    // The q33/q38/q60 oracles are EXACT all-pairs jaccard while the Spark
    // side is LSH-recall-bounded; their equality relies on this corpus
    // property (every true near-dup pair ≥ 0.9, nothing else above 0.3 —
    // where recall at r=4, b=16 is 1 to ~4e-8). If the generator changes,
    // this test fails with a diagnostic instead of an opaque oracle
    // mismatch. 500 docs → 125k pairs: exact all-pairs is cheap here.
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val sh = docs.select(col("doc_id"),
      sort_array(shingleHashes(col("text"), 2)).as("sh"))
      .withColumn("n", size(col("sh")))
    val inter = graft.functions.sortedIntersectCount(col("a.sh"), col("b.sh")).cast("double")
    val unionSize = (col("a.n") + col("b.n")).cast("double") - inter
    val pairs = sh.alias("a")
      .join(sh.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .select(when(unionSize === 0, lit(0.0)).otherwise(inter / unionSize).as("j"))
    val inGap = pairs.filter(col("j") > 0.3 && col("j") < 0.9).count()
    assert(inGap == 0,
      s"$inGap document pairs have jaccard in (0.3, 0.9) — the exact-oracle-" +
        "equals-LSH assumption of q33/q38/q60 no longer holds on this corpus")
    assert(pairs.filter(col("j") >= 0.9).count() > 0) // planted near-dups exist
  }

  test("negative control: the degenerate 2^61-1-modulus family is rejected") {
    // Reimplements the broken family the fix in Dedup.permutationParams
    // removed: same (a, b) params and 31-bit shingle hashes, but modulus
    // 2^61−1 ≫ the hash domain — a·x+b (< 2^62) never wraps, so every
    // "permutation" is monotone in x and each signature slot is a linear
    // function of the doc's single minimum shingle hash. The candidate rate
    // then collapses to P(min hash falls in the shared tokens) = s itself,
    // nowhere near the S-curve at low similarity (s≈0.19 vs theory ≈2.3%).
    val P61 = (1L << 61) - 1
    val nPairs = 200
    val docs = plantedPairs(nPairs, n = 40, m = 13)
    val params = Dedup.permutationParams(numPerm)
    val hs = transform(shingleHashes(col("text"), 1),
      h => pmod(h, lit(Dedup.HashDomain)))
    val brokenSig = array(params.map { case (a, b) =>
      array_min(transform(hs, x => (lit(a) * x + lit(b)) % lit(P61)))
    }: _*)
    val sigs = docs.select(col("doc_id"), brokenSig.as("sig"))
    val rate = measuredRate(
      Dedup.lshCandidates(sigs, "doc_id", bands, rowsPerBand), nPairs)
    val expected = theoryRate(13.0 / (80 - 13))
    // the healthy family passes the ±0.10 gate above; the broken one lands
    // near s ≈ 0.19 — far outside it
    assert(rate > expected + 0.08,
      f"broken family unexpectedly healthy: measured=$rate%.3f theory=$expected%.3f")
  }
}
