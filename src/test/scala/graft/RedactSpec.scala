package graft

import org.apache.spark.sql.functions._
import graft.ops.Redact

class RedactSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(text: String): (Int, Int, Int, String) = {
    val r = Redact.scrub(Seq((1L, text)).toDF("doc_id", "text"), "text")
      .select("n_emails", "n_ips", "n_phones", "redacted").head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))
  }

  test("scrub redacts and counts each PII class") {
    val (e, i, p, red) = scrubOne(
      "mail a.b-c%d@ex-ample.co.uk ip 192.168.0.1 call 555-123-4567 done")
    assert((e, i, p) == (1, 1, 1))
    assert(red == "mail <EMAIL> ip <IP> call <PHONE> done")
  }

  test("clean text passes through unchanged with zero counts") {
    val (e, i, p, red) = scrubOne("just plain words 12 34")
    assert((e, i, p) == (0, 0, 0))
    assert(red == "just plain words 12 34")
  }

  test("sequential order: an email consuming a dotted-quad is not recounted as IP") {
    // the local part 1.2.3.4 is legal email syntax; the email pass claims
    // the whole token, so the IP pass must see nothing
    val (e, i, _, red) = scrubOne("from 1.2.3.4@host.org sent")
    assert(e == 1 && i == 0)
    assert(red == "from <EMAIL> sent")
  }

  test("word boundaries: digit runs inside longer tokens do not match") {
    val (_, i, p, red) = scrubOne("v1.2.3.4567 build 555-123-45678x")
    // 1.2.3.4567 fails the \b..{1,3}\b quad; 555-123-45678 exceeds \d{4}\b
    assert(i == 0 && p == 0)
    assert(red == "v1.2.3.4567 build 555-123-45678x")
  }

  test("multiple hits of one class all count and all redact") {
    val (e, _, _, red) = scrubOne("a@b.co then c@d.org")
    assert(e == 2)
    assert(red == "<EMAIL> then <EMAIL>")
  }

  test("piiSummary rolls up incidence and redacted size") {
    val df = Seq(
      (1L, "x a@b.co y"),
      (2L, "no pii here"),
      (3L, "ip 10.0.0.1 and 10.0.0.2")).toDF("doc_id", "text")
    val r = Redact.piiSummary(df).head()
    assert(r.getLong(0) == 3)           // n_docs
    assert(r.getLong(1) == 1)           // docs_with_email
    assert(r.getLong(2) == 1)           // docs_with_ip
    assert(r.getLong(3) == 0)           // docs_with_phone
    assert(r.getLong(4) == 3)           // total_hits
  }

  test("null text yields null counts, not a crash") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "a@b.co"))
      .toDF("doc_id", "text")
    val out = Redact.scrub(df, "text").orderBy("doc_id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("n_emails")))
    assert(out(1).getInt(out(1).fieldIndex("n_emails")) == 1)
  }

  test("piiBySource: per-source incidence ppm and density per Mchar") {
    import spark.implicits._
    // source a: 2 docs, 1 with 2 hits; source b: 1 clean doc
    val df = Seq(
      ("a", "contact x@y.com or 10.0.0.1 ok"), // 30 chars, 2 hits
      ("a", "clean words here"),               // 16 chars
      ("b", "nothing to see")                  // 14 chars
    ).toDF("source", "text")
    val got = Redact.piiBySource(df)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 2L, 1L, 500000L, 2L,
      1000000L * 2L / 46L))) // 2 hits over 46 input chars
    assert(got("b") == (("b", 1L, 0L, 0L, 0L, 0L)))
  }

  test("kAnonymityReport: per-threshold violating groups/rows and " +
    "suppression ppm over the QI group sizes") {
    // QI groups: a ×1, b ×3, c ×6 → 3 groups, 10 rows
    val df = (Seq.fill(1)("a") ++ Seq.fill(3)("b") ++ Seq.fill(6)("c"))
      .zipWithIndex.map { case (g, i) => (g, i) }.toDF("g", "i")
      .select(col("g"))
    val got = Redact.kAnonymityReport(df, Seq("g"), thresholds = Seq(2, 5))
      .collect().map(r => r.getAs[Int]("k_threshold") ->
        ((r.getAs[Long]("n_groups"), r.getAs[Long]("violating_groups"),
          r.getAs[Long]("n_rows"), r.getAs[Long]("violating_rows"),
          r.getAs[Long]("suppression_ppm")))).toMap
    assert(got(2) == ((3L, 1L, 10L, 1L, 100000L)))
    assert(got(5) == ((3L, 2L, 10L, 4L, 400000L)))
  }

  test("generalizationLadder: chosen = smallest level with zero " +
    "violations; coarsest-level fallback when none protects") {
    // one category, values 5 and 15, width 10, k=2: level 0 splits them
    // (both singletons violate), level 1 (width 20) merges them (k=2)
    val df = Seq(("g", 5L), ("g", 15L)).toDF("cat", "v")
    val got = Redact.generalizationLadder(df, Seq("cat"), "v",
      baseWidth = 10, levels = 2, k = 2)
      .collect().map(r => r.getAs[Int]("level") ->
        ((r.getAs[Long]("bucket_width"), r.getAs[Long]("n_groups"),
          r.getAs[Long]("violating_groups"), r.getAs[Long]("violating_rows"),
          r.getAs[Long]("suppression_ppm"), r.getAs[Int]("chosen")))).toMap
    assert(got(0) == ((10L, 2L, 2L, 2L, 1000000L, 0)))
    assert(got(1) == ((20L, 1L, 0L, 0L, 0L, 1)))
    assert(got(2) == ((40L, 1L, 0L, 0L, 0L, 0))) // level 1 already wins
    // a lone row can never reach k=2 — fallback to the coarsest level
    val lone = Redact.generalizationLadder(
      Seq(("g", 5L)).toDF("cat", "v"), Seq("cat"), "v",
      baseWidth = 10, levels = 2, k = 2)
      .collect().map(r => r.getAs[Int]("level") -> r.getAs[Int]("chosen"))
      .toMap
    assert(lone == Map(0 -> 0, 1 -> 0, 2 -> 1))
  }

  test("lDiversityReport: per-threshold groups spanning fewer than l " +
    "distinct sensitive values, suppression ppm over rows") {
    // group a: 3 rows all x (l=1); b: x,y (l=2); c: x,y,z,z (l=3)
    val df = (Seq.fill(3)(("a", "x")) ++ Seq(("b", "x"), ("b", "y")) ++
      Seq(("c", "x"), ("c", "y"), ("c", "z"), ("c", "z")))
      .toDF("g", "s")
    val got = Redact.lDiversityReport(df, Seq("g"), "s",
      thresholds = Seq(2, 3))
      .collect().map(r => r.getAs[Int]("l_threshold") ->
        ((r.getAs[Long]("n_groups"), r.getAs[Long]("violating_groups"),
          r.getAs[Long]("n_rows"), r.getAs[Long]("violating_rows"),
          r.getAs[Long]("suppression_ppm")))).toMap
    assert(got(2) == ((3L, 1L, 9L, 3L, 333333L)))
    assert(got(3) == ((3L, 2L, 9L, 5L, 555555L)))
  }

  test("lDiversityReport: null sensitive rows count toward group size " +
    "but never as a distinct value") {
    val df = Seq(("a", "x"), ("a", null), ("a", "x")).toDF("g", "s")
    val got = Redact.lDiversityReport(df, Seq("g"), "s",
      thresholds = Seq(2)).head()
    // group size is all 3 rows; diversity is 1 (null is unknown, not a
    // second value) → the group violates l=2 with all its rows
    assert(got.getAs[Long]("n_rows") == 3L)
    assert(got.getAs[Long]("violating_groups") == 1L)
    assert(got.getAs[Long]("violating_rows") == 3L)
  }

  test("kAnonymityFromCells counts null-sensitive rows in group sizes, " +
    "matching the batch kAnonymityReport") {
    // group a: 2 rows (one null-sensitive) — a cells path that dropped
    // nulls would understate a's size as 1 and flag it at k=2
    val df = Seq(("a", "x"), ("a", null), ("b", "y"))
      .toDF("g", "s")
    val fromCells = Redact.kAnonymityFromCells(
      Redact.sensitiveCells(df, Seq("g"), "s"), Seq("g"),
      thresholds = Seq(2)).head()
    val batch = Redact.kAnonymityReport(df.select(col("g")), Seq("g"),
      thresholds = Seq(2)).head()
    assert(fromCells.toSeq == batch.toSeq)
    assert(fromCells.getAs[Long]("n_rows") == 3L)
    assert(fromCells.getAs[Long]("violating_groups") == 1L) // only b
  }

  test("tClosenessReport: null sensitive rows are not part of the " +
    "distribution — TV equals the null-free corpus") {
    val base = Seq.fill(3)(("a", "x")) ++ Seq(("b", "x"), ("b", "y"))
    val withNulls = base ++ Seq(("a", null), ("b", null))
    def tv(rows: Seq[(String, String)]) =
      Redact.tClosenessReport(rows.toDF("g", "s"), Seq("g"), "s",
        tPpmThresholds = Seq(250000)).head()
    val (clean, dirty) = (tv(base), tv(withNulls))
    assert(dirty.getAs[Long]("max_tv_ppm")
      == clean.getAs[Long]("max_tv_ppm"))
    assert(dirty.getAs[Long]("n_rows") == clean.getAs[Long]("n_rows"))
  }

  test("releaseGateReport: null-text docs are excluded from the ppm " +
    "denominator (consistent with the blocklist census family)") {
    val df = Seq(
      ("a", "en", 10L, "mail a@b.co"),
      ("a", "en", 11L, null.asInstanceOf[String])
    ).toDF("source", "lang", "n_chars", "text")
    val got = Redact.releaseGateReport(df, Seq("bad phrase")).head()
    // 1 real doc, 1 PII doc → 1000000 ppm; counting the null doc as a
    // clean denominator row would dilute it to 500000
    assert(got.getAs[Long]("n_docs") == 1L)
    assert(got.getAs[Long]("pii_docs_ppm") == 1000000L)
  }

  test("tClosenessReport: exact total-variation ppm per group, " +
    "per-threshold violation census and corpus max") {
    // global: x=4, y=1, N=5
    // group a = {x,x,x}: TV = ½(|1−0.8| + |0−0.2|) = 0.2 → 200000 ppm
    // group b = {x,y}:   TV = ½(|0.5−0.8| + |0.5−0.2|) = 0.3 → 300000
    val df = (Seq.fill(3)(("a", "x")) ++ Seq(("b", "x"), ("b", "y")))
      .toDF("g", "s")
    val got = Redact.tClosenessReport(df, Seq("g"), "s",
      tPpmThresholds = Seq(250000, 500000))
      .collect().map(r => r.getAs[Int]("t_ppm_threshold") ->
        ((r.getAs[Long]("n_groups"), r.getAs[Long]("violating_groups"),
          r.getAs[Long]("n_rows"), r.getAs[Long]("violating_rows"),
          r.getAs[Long]("max_tv_ppm")))).toMap
    assert(got(250000) == ((2L, 1L, 5L, 2L, 300000L)))
    assert(got(500000) == ((2L, 0L, 5L, 0L, 300000L)))
  }

  test("releaseGateReport: each gate independently fails a source; a " +
    "clean source passes all four") {
    val df = Seq(
      // source a: one bucket of 4, two langs, clean text
      ("a", "en", 10L, "clean words"), ("a", "en", 11L, "clean words"),
      ("a", "fr", 12L, "clean words"), ("a", "fr", 13L, "clean words"),
      // source b: two singleton buckets (min k = 1), one lang,
      // one PII doc, one blocklisted doc
      ("b", "en", 10L, "mail a@b.co"), ("b", "en", 300L, "a bad phrase")
    ).toDF("source", "lang", "n_chars", "text")
    val got = Redact.releaseGateReport(df, Seq("bad phrase"),
      maxPiiPpm = 500000L, maxBlockedPpm = 0L, minGroupK = 2L,
      minLangs = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("pii_docs_ppm"),
          r.getAs[Long]("blocked_docs_ppm"), r.getAs[Long]("min_group_k"),
          r.getAs[Long]("distinct_langs"), r.getAs[Int]("release_ok"))))
      .toMap
    assert(got("a") == ((4L, 0L, 0L, 4L, 2L, 1)))
    assert(got("b") == ((2L, 500000L, 500000L, 1L, 1L, 0)))
  }

  test("tClosenessReport: a group matching the global distribution " +
    "has zero TV; a single-group corpus is trivially 0-close") {
    val df = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("a", "y"))
      .toDF("g", "s")
    val got = Redact.tClosenessReport(df, Seq("g"), "s",
      tPpmThresholds = Seq(100000)).head()
    assert(got.getAs[Long]("max_tv_ppm") == 0L)
    assert(got.getAs[Long]("violating_groups") == 0L)
  }
}
