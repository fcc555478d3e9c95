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

  test("jaroWinklerPairs: blocking bounds candidates, threshold filters") {
    val df = Seq(
      "red plate", "red ring", "red plates",
      "blue plate", "   ", null.asInstanceOf[String])
      .toDF("nm")
    val got = Dedup.jaroWinklerPairs(df, "nm", threshold = 0.9)
      .as[(String, String, Double)].collect().toSet
    // only same-block candidates are compared: red plate/red plates
    // share both the first-token and the prefix-2×len-band key and are
    // the single >= 0.9 survivor; blue plate never pairs with red plate
    // despite high similarity (prefix "bl" ≠ "re", token "blue" ≠ "red")
    assert(got.map(p => (p._1, p._2)) == Set(("red plate", "red plates")))
    assert(got.forall(_._3 >= 0.9))
  }

  test("jaroWinklerPairs: prefix-2×len-band key recovers first-token edits") {
    // the single first-token key would block these apart (tokens
    // "johnson" vs "jonhson"); the stacked prefix-2 ("jo") × length-band
    // key unions them back into candidacy
    val df = Seq("johnson smith", "jonhson smith", "zzz unrelated").toDF("nm")
    val got = Dedup.jaroWinklerPairs(df, "nm", threshold = 0.9)
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    assert(got == Set(("johnson smith", "jonhson smith")), s"got $got")
  }

  test("jaroWinklerPairs: hot-block cap binds deterministically") {
    // 20 names all sharing first token, prefix-2, and length band: both
    // keys produce the same hot block. With maxBlock = 3 each block
    // keeps the 3 lexicographically-smallest names, so the only pairs
    // are among those 3 (cap = the bucketPairs sorted-prefix discipline)
    val df = (10 to 29).map(i => s"aa b$i").toDF("nm")
    val capped = Dedup.jaroWinklerPairs(df, "nm", threshold = 0.0,
      maxBlock = 3)
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    assert(capped == Set(
      ("aa b10", "aa b11"), ("aa b10", "aa b12"), ("aa b11", "aa b12")),
      s"got $capped")
    val uncapped = Dedup.jaroWinklerPairs(df, "nm", threshold = 0.0)
    assert(uncapped.count() == 20L * 19 / 2)
  }

  test("byte-level core matches DuckDB on non-ASCII (multi-byte) strings") {
    // é is 2 bytes in UTF-8: DuckDB's per-byte walk sees 'caf<c3><a9>'
    // (5 symbols) — probed: jaro_winkler_similarity('café', 'cafe') =
    // 0.8483333333333334, NOT the per-UTF-16-char value 0.8833…; the
    // byte core must reproduce the probed values exactly
    assert(JaroWinklerImpl.sim("café", "cafe") == 0.8483333333333334,
      s"got ${JaroWinklerImpl.sim("café", "cafe")}")
    assert(JaroWinklerImpl.sim("über", "uber") == 0.7833333333333333,
      s"got ${JaroWinklerImpl.sim("über", "uber")}")
    assert(JaroWinklerImpl.sim("naïve", "naive") == 0.8577777777777779,
      s"got ${JaroWinklerImpl.sim("naïve", "naive")}")
    // identical multi-byte strings are still exact 1.0
    assert(JaroWinklerImpl.sim("café", "café") == 1.0)
  }
}
