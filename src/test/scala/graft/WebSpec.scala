package graft

import org.apache.spark.sql.functions._
import graft.ops.Web

class WebSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Web.canonicalizeUrl(col("url"))).as[String]
      .collect().toSeq

  test("canonicalizeUrl rule table: case, default port, trailing slash, " +
    "fragment, tracking params, param order") {
    val table = Seq(
      // scheme + host lowercase, path case preserved
      "HTTP://ExAmple.COM/A/B" -> "http://example.com/A/B",
      // default ports stripped, non-default kept
      "http://example.com:80/x" -> "http://example.com/x",
      "https://example.com:443/x" -> "https://example.com/x",
      "https://example.com:444/x" -> "https://example.com:444/x",
      "http://example.com:443/x" -> "http://example.com:443/x",
      // trailing slashes stripped (root included)
      "https://example.com/" -> "https://example.com",
      "https://example.com/a///" -> "https://example.com/a",
      // fragment dropped
      "https://example.com/a#sec-2" -> "https://example.com/a",
      // tracking params dropped, emptied query drops its '?'
      "https://example.com/a?utm_source=x&utm_medium=y&gclid=1"
        -> "https://example.com/a",
      // surviving params sorted; ref/fbclid/msclkid dropped
      "https://example.com/a?z=9&fbclid=f&a=1&ref=r&msclkid=m"
        -> "https://example.com/a?a=1&z=9",
      // a non-tracking param whose VALUE merely contains utm survives
      "https://example.com/a?q=utm_test" -> "https://example.com/a?q=utm_test",
      // empty query string
      "https://example.com/a?" -> "https://example.com/a",
      // www is part of the canonical URL (siteOf strips it, not this)
      "https://WWW.Example.com/a" -> "https://www.example.com/a",
      // unreserved percent-escapes decode (both hex cases); the decoded
      // form then rides the rest of the chain (param sort here)
      "https://example.com/%7Euser" -> "https://example.com/~user",
      "https://example.com/%7euser" -> "https://example.com/~user",
      "https://example.com/%64oc%73/%41?b=%32&a=%31"
        -> "https://example.com/docs/A?a=1&b=2",
      // RESERVED escapes are kept: %2F (/), %3F (?), %26 (&), %3D (=),
      // %25 (%) would change URL structure if decoded
      "https://example.com/a%2Fb?q=x%26y%3D1&p=%252F"
        -> "https://example.com/a%2Fb?p=%252F&q=x%26y%3D1",
      // a decoded digit never re-triggers: %2541 is %25 + "41", and the
      // kept %25 does not recombine with the 4 into a new escape
      "https://example.com/a%2541" -> "https://example.com/a%2541")
    val got = canon(table.map(_._1): _*)
    table.map(_._2).zip(got).zip(table.map(_._1)).foreach {
      case ((want, g), in) => assert(g == want, s"$in -> $g, want $want")
    }
  }

  test("canonicalizeUrl rule table: dot-segment resolution and IDN " +
    "punycode hosts") {
    val table = Seq(
      // /./ drops, /seg/../ pops — RFC 3986 §5.2.4
      "https://example.com/a/./b" -> "https://example.com/a/b",
      "https://example.com/a/../b" -> "https://example.com/b",
      "https://example.com/x/../docs/./1?b=2&a=1"
        -> "https://example.com/docs/1?a=1&b=2",
      // chains resolve level by level up to the depth bound
      "https://example.com/a/b/c/../../../d" -> "https://example.com/d",
      "https://example.com/a/b/../c/../d" -> "https://example.com/a/d",
      // a root-level .. pops NOTHING (RFC: ignored), alone or chained
      "https://example.com/../a" -> "https://example.com/a",
      "https://example.com/../../a" -> "https://example.com/a",
      // trailing /. and /.. (directory forms; trailing slash then strips)
      "https://example.com/a/b/." -> "https://example.com/a/b",
      "https://example.com/a/b/.." -> "https://example.com/a",
      // dotted SEGMENTS are ordinary names, not operators
      "https://example.com/a.b/c" -> "https://example.com/a.b/c",
      "https://example.com/.well-known/x"
        -> "https://example.com/.well-known/x",
      "https://example.com/a.../b" -> "https://example.com/a.../b",
      "https://example.com/..a/b" -> "https://example.com/..a/b",
      // a "..a" segment pops like any other name
      "https://example.com/..a/../b" -> "https://example.com/b",
      // IDN host → punycode; the pre-encoded spelling is the SAME key
      "https://bücher.example/a" -> "https://xn--bcher-kva.example/a",
      "https://XN--BCHER-KVA.Example/a"
        -> "https://xn--bcher-kva.example/a",
      // the JDK codec agrees with the fixture's pinned constant
      "https://BÜCHER.example/a" -> "https://xn--bcher-kva.example/a",
      // ASCII hosts never pay the codec (passthrough, incl. xn--)
      "https://example.com/a" -> "https://example.com/a")
    val got = canon(table.map(_._1): _*)
    table.map(_._2).zip(got).zip(table.map(_._1)).foreach {
      case ((want, g), in) => assert(g == want, s"$in -> $g, want $want")
    }
    // the pinned oracle constant IS what the real codec computes
    assert(java.net.IDN.toASCII("bücher.example")
      == "xn--bcher-kva.example")
  }

  test("siteOf strips one leading www and the port; hostCensus counts " +
    "duplicate fetches per site") {
    val df = Seq(
      (1L, "https://www.a.com:443/x"),
      (2L, "https://a.com/x/"), // same page modulo www — different site key? no: site a.com for both
      (3L, "https://b.com/y?utm_source=z"),
      (4L, "https://b.com/y"),
      (5L, "https://b.com/z")).toDF("doc_id", "url")
    val sites = df.select(Web.siteOf(col("url"))).as[String].collect()
    assert(sites.toSeq == Seq("a.com", "a.com", "b.com", "b.com", "b.com"))
    val census = Web.hostCensus(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // a.com: urls differ only by www → canonical still differs (www is
    // kept in the URL), so 2 pages / 2 canonical
    assert(census("a.com") == ((2L, 2L, 0L)))
    // b.com: the tracking-param variant collapses → 3 pages, 2 canonical
    assert(census("b.com") == ((3L, 2L, 333333L)))
  }

  test("extractMainContent: boilerplate nav/menu/footer dropped, body " +
    "kept; the link-density cut is integer-exact at the boundary") {
    val page = "<html><body>" +
      "<nav><a href=/>Home</a> <a href=/a>About</a></nav>" +
      "<h1>Short heading</h1>" + // 13 chars < 25 → dropped
      "<p>The quick brown fox jumps over the lazy dog near the bank " +
      "of the river.</p>" + // long, zero links → kept
      "<p>Read the <a href=/d>full documentation</a> for the longer " +
      "story about everything here.</p>" + // anchored but low density → kept
      "<div><a href=/x>Link one list</a> <a href=/y>Link two list</a>" +
      "</div>" + // pure links → dropped
      "</body></html>"
    val got = Seq(page).toDF("html")
      .select(Web.extractMainContent(col("html"))).as[String].head()
    assert(got == "The quick brown fox jumps over the lazy dog near " +
      "the bank of the river. Read the full documentation for the " +
      "longer story about everything here.", got)
    // boundary around 3·linkChars < visChars with 28 non-anchor chars
    // ("Copyright 2026 Example Corp "): anchor L gives vis = 28 + L, so
    // keep ⟺ 2L < 28 ⟺ L ≤ 13; L = 14 is EXACT equality (42 = 42) and
    // the strict < drops it — the tie goes to boilerplate
    def densityCase(anchor: String) = Seq(
      s"<p>Copyright 2026 Example Corp <a href=/t>$anchor</a></p>")
      .toDF("html")
      .select(size(Web.mainContentBlocks(col("html"))).as("n"))
      .head().getInt(0)
    assert(densityCase("Terms of Service") == 0) // L=16: 48 > 44
    assert(densityCase("Terms of Servi") == 0)   // L=14: 42 = 42, strict
    assert(densityCase("Terms of Ser") == 1)     // L=12: 36 < 40
  }

  test("urlDedup groups only true canonical collisions and keeps the " +
    "lowest id as representative") {
    val df = Seq(
      (10L, "HTTPS://Example.com:443/p?b=2&a=1#f"),
      (11L, "https://example.com/p?a=1&b=2"),
      (12L, "https://example.com/p?a=1&b=3"),
      (13L, "https://example.com/q/"),
      (14L, "https://example.com/q")).toDF("doc_id", "url")
    val got = Web.urlDedup(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "https://example.com/p?a=1&b=2" -> ((2L, 10L)),
      "https://example.com/q" -> ((2L, 13L))))
  }
}
