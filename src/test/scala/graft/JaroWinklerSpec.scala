package graft

import org.apache.spark.sql.functions._

import graft.functions.{jaroWinkler, JaroWinklerImpl}
import graft.ops.Dedup

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // values probed from DuckDB jaro_winkler_similarity (the oracle
  // engine) — the expression must reproduce them bit-for-bit on ASCII
  val pinned: Seq[(String, String, Double)] = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dwayne", "duane", 0.84),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("", "", 0.0),
    ("a", "", 0.0),
    ("a", "a", 1.0),
    ("ab", "ba", 0.0),
    ("abcd", "abcd", 1.0),
    ("ab", "a", 0.8500000000000001),
    ("abcdef", "abdcef", 0.9555555555555556),
    ("red plate", "red ring", 0.6481481481481481),
    ("small widget", "small ring", 0.8933333333333334),
    ("CRATE", "TRACE", 0.7333333333333334),
    // jaro lands a hair above 0.7 → boost applies (strict >)
    ("x", "xxxxxxxxxx", 0.7300000000000001),
    ("aa", "aaaa", 0.8666666666666667),
    // 3-cycle transposition: INTEGER halving (0.9583…, not 0.9375);
    // no boost (prefix 0)
    ("abcdefgh", "bcadefgh", 0.9583333333333334))

  test("JaroWinklerImpl matches DuckDB's values to <= 1 ulp") {
    // bit-identical on 15 of 16 probes; dwayne/duane differs in the
    // LAST ULP only (DuckDB's jw-internal jaro path rounds one ulp
    // below its own jaro_similarity SQL function there — probed; no
    // textbook operation order reproduces both, so 1 ulp is the honest
    // contract and round-to-6-before-compare covers it)
    for ((a, b, want) <- pinned) {
      val got = JaroWinklerImpl.sim(a, b)
      val ulps = math.abs(
        java.lang.Double.doubleToLongBits(got) -
          java.lang.Double.doubleToLongBits(want))
      assert(ulps <= 1, s"sim($a, $b): got $got want $want ($ulps ulps)")
      // rounded to 6 decimals — the cross-engine compare contract — the
      // values are identical
      assert(math.rint(got * 1e6) / 1e6 == math.rint(want * 1e6) / 1e6,
        s"sim($a, $b) rounds differently: $got vs $want")
      assert(JaroWinklerImpl.sim(b, a) == got, s"symmetry ($a, $b)")
    }
  }

  test("the column expression evaluates and survives codegen") {
    val df = pinned.toDF("a", "b", "want")
    val bad = df
      .withColumn("got", jaroWinkler(col("a"), col("b")))
      .filter(round(col("got"), 6) =!= round(col("want"), 6))
      .count()
    assert(bad == 0)
    // null-safe: null input → null output
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b")).as("jw"))
      .collect()
    assert(n(0).isNullAt(0))
  }

  test("jaroWinklerPairs: first-token blocking bounds candidates, threshold filters") {
    val df = Seq(
      "red plate", "red ring", "red plates",
      "blue plate", "   ", null.asInstanceOf[String])
      .toDF("nm")
    val got = Dedup.jaroWinklerPairs(df, "nm", threshold = 0.9)
      .as[(String, String, Double)].collect().toSet
    // only same-block (first token "red") candidates are compared:
    // red plate/red plates is the single >= 0.9 survivor; blue plate
    // never pairs with red plate despite high similarity (blocked out)
    assert(got.map(p => (p._1, p._2)) == Set(("red plate", "red plates")))
    assert(got.forall(_._3 >= 0.9))
  }
}
