package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis
import graft.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: trim, split, drop empties") {
    val got = Seq("  a b   c  ", "", "   ").toDF("t")
      .select(tokens(col("t")).as("toks"), tokenCount(col("t")).as("n"))
      .as[(Seq[String], Int)].collect().toSeq
    assert(got(0) == (Seq("a", "b", "c"), 3))
    assert(got(1)._2 == 0)
    assert(got(2)._2 == 0)
  }

  test("word shingles") {
    val got = Seq("a b c d").toDF("t")
      .select(wordShingles(col("t"), 3).as("s")).as[Seq[String]].collect().head
    assert(got.toSet == Set("a b c", "b c d"))
  }

  test("jaccard of token sets") {
    val got = Seq(("a b c", "b c d")).toDF("x", "y")
      .select(jaccard(split(col("x"), " "), split(col("y"), " ")).as("j"))
      .as[Double].collect().head
    assert(math.abs(got - 0.5) < 1e-15) // |{b,c}| / |{a,b,c,d}|
  }

  test("quality score fields on a hand row") {
    val df = Seq((1L, "the cat, the hat!")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(df).collect().head
    assert(r.getAs[Double]("n_tokens") == 4.0)
    // non-space chars = 14, tokens 4 → 3.5
    assert(r.getAs[Double]("mean_token_len") == 3.5)
    // distinct tokens {the, cat,, hat!}; only "the" is a stopword → 1/4
    assert(r.getAs[Double]("stopword_ratio") == 0.25)
    // 2 punct chars of 17 total
    assert(math.abs(r.getAs[Double]("punct_ratio") - 2.0 / 17.0) < 1e-15)
  }

  test("language id picks marker-rich language; cjk short-circuits; und fallback") {
    val df = Seq(
      (1L, "the cat and the dog is with the house"),
      (2L, "le chat et la maison est une belle"),
      (3L, "der hund und die katze ist mit ein"),
      (4L, "el gato y los perros es con para"),
      (5L, "你好 世界"),
      (6L, "zzz qqq www")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.languageId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(2L) == "fr")
    assert(got(3L) == "de")
    assert(got(4L) == "es")
    assert(got(5L) == "zh")
    assert(got(6L) == "und")
  }

  test("fingerprint: deterministic, order-sensitive") {
    val df = Seq(("a b c"), ("c b a"), ("a b c")).toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("f")).as[Long].collect()
    assert(df(0) == df(2))
    assert(df(0) != df(1))
  }

  test("winnowing: shared run of ≥ w+k-1 tokens shares a fingerprint; short docs get one") {
    import org.apache.spark.sql.functions.xxhash64
    val k = 3; val w = 4
    val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens = w+k-1
    val df = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight $shared nine ten"),
      (3L, "totally unrelated words everywhere around here always"),
      (4L, "tiny doc") // < k tokens → empty fingerprint set
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
      TextAnalysis.winnowFingerprints(col("text"), k, w, h => xxhash64(h)).as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    assert((fps(1L).toSet intersect fps(2L).toSet).nonEmpty) // overlap guarantee
    assert((fps(1L).toSet intersect fps(3L).toSet).isEmpty)
    assert(fps(4L).isEmpty)
    // mid-size doc (k ≤ tokens, shingles ≤ w) collapses to a single min
    val one = Seq((5L, "a b c d")).toDF("doc_id", "text")
      .select(TextAnalysis.winnowFingerprints(col("text"), k, w, h => xxhash64(h)).as("f"))
      .as[Seq[Long]].collect().head
    assert(one.length == 1)
  }

  test("unigram LM: rare-token doc scores higher; uniform corpus scores ln(V)") {
    // 4 docs over a 2-token vocab with counts 6:2 → p = 0.75 / 0.25
    val docs = Seq(
      (1L, "a a a"), (2L, "a a a"), (3L, "b b"), (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramCrossEntropy(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!got.contains(4L)) // empty doc → no row
    val r6 = (x: Double) => math.rint(x * 1e6) / 1e6
    assert(got(1L) == ((3L, r6(-math.log(6.0 / 8)))))
    assert(got(3L) == ((2L, r6(-math.log(2.0 / 8)))))
    assert(got(3L)._2 > got(1L)._2) // the rare-token doc is more surprising
  }

  test("chunking: boundary counts, overlap, short/exact/empty docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // n=10 > size → 2 chunks
      (2L, "a b c"),   // n < size → 1 chunk
      (3L, "a b c d"), // n == size → 1 chunk
      (4L, "")         // empty → 0 chunks
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(docs, size = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getString(3)))).toMap
    // doc 1: n=10, nChunks = 1 + ceil(6/3) = 3
    assert(got.keySet == Set((1L, 0), (1L, 1), (1L, 2), (2L, 0), (3L, 0)))
    assert(got((1L, 0))._2 == "t1 t2 t3 t4")
    assert(got((1L, 1))._2 == "t4 t5 t6 t7") // overlap of size-stride = 1 token
    assert(got((1L, 2))._2 == "t7 t8 t9 t10")
    assert(got((2L, 0)) == ((3, "a b c")))
    assert(got((3L, 0)) == ((4, "a b c d")))
  }

  test("cdcChunks: content-defined boundaries are shift-robust; chunks partition the tokens") {
    val docs = Tables.documents(spark, sf0001).limit(100)
    def chunks(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.cdcChunks(d, divisor = 16)
    // chunks partition the token stream: counts conserve, indexes dense
    val base = chunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val tokTotals = docs
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val perDoc = base.groupBy(_._1)
    perDoc.foreach { case (id, cs) =>
      assert(cs.map(_._3).sum == tokTotals(id), s"doc $id token conservation")
      assert(cs.map(_._2).sorted.toSeq == cs.indices.map(_.toLong), s"doc $id dense idx")
    }
    // the CDC property: prepend one token → only chunk 0 changes; every
    // chunk AFTER the first boundary keeps its text (and hash) verbatim.
    // (Fixed-stride chunking shifts every window — that's q95's tier.)
    val shifted = chunks(docs.withColumn("text",
      concat(lit("zzprefix "), col("text")))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val shiftedByDoc = shifted.groupBy(_._1)
    perDoc.foreach { case (id, cs) =>
      if (cs.length > 1) { // docs with at least one boundary
        val origTail = cs.filter(_._2 >= 1L).map(c => (c._2, c._4)).toSet
        val newTail = shiftedByDoc(id).filter(_._2 >= 1L)
          .map(c => (c._2, c._3)).toSet
        assert(newTail == origTail, s"doc $id tail chunks not shift-stable")
      }
    }
    assert(perDoc.exists(_._2.length > 1), "fixture never hit a boundary")
  }

  test("text cleaning: html stripped, email/url redacted, whitespace collapsed") {
    val got = Seq(
      "Contact <b>us</b> at  bob.smith+x@example.co.uk   today",
      "see https://ex.com/a?b=1 and http://y.org\tnow",
      "  already clean  ").toDF("t")
      .select(TextAnalysis.cleanText(col("t")).as("c")).as[String].collect()
    assert(got(0) == "Contact us at <email> today")
    assert(got(1) == "see <url> and <url> now")
    assert(got(2) == "already clean")
  }

  test("sequence packing property: pack totals bounded by budget + largest doc") {
    val budget = 256
    val packed = TextAnalysis.packSequences(
      Tables.documents(spark, "/root/testdata/sf0.001"), budgetTokens = budget)
    val packs = packed.groupBy("lang", "shard", "pack_id")
      .agg(sum(col("n_tokens")).as("total"), max(col("n_tokens")).as("largest"),
        count(lit(1)).as("n_docs")).collect()
    assert(packs.nonEmpty)
    packs.foreach { r =>
      val total = r.getAs[Long]("total"); val largest = r.getAs[Int]("largest")
      // block packing admits at most one doc past each budget boundary
      assert(total < budget + largest,
        s"pack ${r.mkString(",")} exceeds budget+largest")
    }
  }

  test("sequence packing: budget cut points, over-budget doc isolated") {
    // single shard, budget 5; token counts 3,3,7,2 → cum_before 0,3,6,13
    // → packs 0,0,1,2: the 7-token doc exceeds the budget and lands alone
    val docs = Seq(
      (0L, "en", "a b c"), (4L, "en", "d e f"),
      (8L, "en", "g h i j k l m"), (12L, "en", "n o")
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.packSequences(docs, budgetTokens = 5, nShards = 1)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 4L -> 0L, 8L -> 1L, 12L -> 2L))
  }

  test("contamination: shared ≥ w+k-1 token run flags; disjoint and short docs don't") {
    val k = 3; val w = 4
    val quoted = "the quick brown fox jumps over the lazy dog today" // 10 tokens
    val corpus = Seq((1L, s"header text $quoted trailing words here")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"unrelated prefix $quoted suffix"), // quotes a ≥6-token run
      (11L, "completely different content with no shared runs at all"),
      (12L, "so tiny") // < k tokens → no fingerprints
    ).toDF("doc_id", "text")
    val got = TextAnalysis.contaminationFlags(batch, corpus, "doc_id", "text",
      k, w, shingleHash = h => xxhash64(h))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(10L -> 1, 11L -> 0, 12L -> 0))
  }

  test("repetitionStats: degenerate repeats flag, empty/1-token docs don't throw") {
    val docs = Seq(
      (1L, "a a a b"),        // dup = 1 - 2/4 = .5; bigrams: "a a"×2,"a b" → top 2/3
      (2L, "w x y z"),        // all distinct → dup 0, top bigram 1/3
      (3L, "solo"),           // 1 token → no bigrams → top 0
      (4L, "")                // empty → 0 tokens, both fracs 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs,
      dupTokenMax = 0.45, topBigramMax = 0.5).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getInt(1) == 4 &&
      got(1L).getDouble(2) == 0.5 && got(1L).getDouble(3) == 0.666667 &&
      got(1L).getInt(4) == 1)
    assert(got(2L).getDouble(2) == 0.0 && got(2L).getDouble(3) == 0.333333 &&
      got(2L).getInt(4) == 0)
    assert(got(3L).getInt(1) == 1 && got(3L).getDouble(3) == 0.0 &&
      got(3L).getInt(4) == 0)
    assert(got(4L).getInt(1) == 0 && got(4L).getDouble(2) == 0.0 &&
      got(4L).getDouble(3) == 0.0 && got(4L).getInt(4) == 0)
  }

  test("ensureContaminationIndex builds once per session, probe matches inline") {
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.filter(col("doc_id") < 50)
    val batch = docs.filter(col("doc_id") >= 50 && col("doc_id") < 80)
    val dir = java.nio.file.Files.createTempDirectory("graft_ens_cont").toString
    val name = "ensure_contam_test"
    def ensure() = TextAnalysis.ensureContaminationIndex(corpus, name, dir,
      "doc_id", "text", k = 5, w = 8, shingleHash = md5Hash31)
    assert(ensure())  // first call in the session builds
    assert(!ensure()) // second call skips — the catalog already has it
    val indexed = TextAnalysis.contaminationFlagsIndexed(batch, name,
      "doc_id", "text", k = 5, w = 8, shingleHash = md5Hash31)
      .as[(Long, Int)].collect().toMap
    val inline = TextAnalysis.contaminationFlags(batch, corpus,
      "doc_id", "text", k = 5, w = 8, shingleHash = md5Hash31)
      .as[(Long, Int)].collect().toMap
    assert(indexed == inline)
    spark.sql(s"DROP TABLE $name")
    assert(ensure()) // a fresh catalog (new session) would rebuild
  }

  test("appendToContaminationIndex converges to the full build and is idempotent") {
    val docs = Tables.documents(spark, sf0001)
    val benchA = docs.filter(col("doc_id") < 30)
    val benchB = docs.filter(col("doc_id") >= 30 && col("doc_id") < 60)
    val batch = docs.filter(col("doc_id") >= 60 && col("doc_id") < 120)
    def flags(name: String) = TextAnalysis
      .contaminationFlagsIndexed(batch, name, "doc_id", "text",
        k = 5, w = 8, shingleHash = md5Hash31)
      .as[(Long, Int)].collect().toMap
    val dirI = java.nio.file.Files.createTempDirectory("graft_ci_inc").toString
    TextAnalysis.buildContaminationIndex(benchA, "contam_inc", dirI,
      "doc_id", "text", k = 5, w = 8, shingleHash = md5Hash31)
    TextAnalysis.appendToContaminationIndex(spark, "contam_inc", benchB,
      "doc_id", "text", k = 5, w = 8, shingleHash = md5Hash31)
    val dirF = java.nio.file.Files.createTempDirectory("graft_ci_full").toString
    TextAnalysis.buildContaminationIndex(benchA.unionAll(benchB),
      "contam_full", dirF, "doc_id", "text", k = 5, w = 8,
      shingleHash = md5Hash31)
    assert(flags("contam_inc") == flags("contam_full"))
    // re-appending the same slice adds nothing (anti-join dedup)
    val before = spark.table("contam_inc").count()
    TextAnalysis.appendToContaminationIndex(spark, "contam_inc", benchB,
      "doc_id", "text", k = 5, w = 8, shingleHash = md5Hash31)
    assert(spark.table("contam_inc").count() == before)
    spark.sql("DROP TABLE contam_inc"); spark.sql("DROP TABLE contam_full")
  }

  test("deleteFromContaminationIndex: orphaned fingerprints leave, " +
    "fingerprints a remaining doc still sponsors stay") {
    val uniqueText = "zq alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda unique sentinel phrase never shared anywhere"
    val sharedText = "the benchmark answer is exactly forty two and the " +
      "question remains deeply unknown to every careful reader here"
    val corpus = Seq(
      (1L, uniqueText),              // forgotten, sole sponsor of its fps
      (2L, sharedText),              // forgotten...
      (3L, sharedText),              // ...but doc 3 remains and sponsors
      (4L, "completely different filler content about spark plans and " +
        "parquet footers with nothing in common with the others")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ct_del").toString
    TextAnalysis.buildContaminationIndex(corpus, "del_ct", dir,
      "doc_id", "text", k = 5, w = 8, shingleHash = md5Hash31)
    TextAnalysis.deleteFromContaminationIndex(spark, "del_ct", dir,
      forgotten = corpus.filter(col("doc_id") <= 2L),
      remaining = corpus.filter(col("doc_id") >= 3L),
      k = 5, w = 8, shingleHash = md5Hash31)
    val probe = Seq((10L, uniqueText), (11L, sharedText))
      .toDF("doc_id", "text")
    val flags = TextAnalysis.contaminationFlagsIndexed(probe, "del_ct",
      "doc_id", "text", k = 5, w = 8, shingleHash = md5Hash31)
      .as[(Long, Int)].collect().toMap
    assert(flags(10L) == 0, "doc 1's orphaned fps must be forgotten")
    assert(flags(11L) == 1, "doc 3 still sponsors the shared fps")
    spark.sql("DROP TABLE IF EXISTS del_ct")
  }

  test("tf-idf top terms: corpus-wide terms score 0, rare terms rank first") {
    // "common" is in every doc → idf = ln(1) = 0; each doc's distinctive
    // term must outrank it despite lower tf
    val docs = Seq(
      (1L, "common common common apple"),
      (2L, "common common banana banana"),
      (3L, "common cherry")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 1)
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(top == Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
    // df=1 term in a 3-doc corpus: tf * ln(3); banana has tf=2
    val banana = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 1)
      .as[(Long, String, Double)].collect().find(_._1 == 2L).get._3
    assert(math.abs(banana - math.rint(2 * math.log(3.0) * 1e6) / 1e6) < 1e-9)
  }

  test("tf-idf / unigram LM leave no cache entries behind (checkpoint, not persist)") {
    // the materialized tf relation is a localCheckpoint — self-releasing
    // executor state, NOT a CacheManager entry that a long-lived session
    // would accumulate across operator calls
    val docs = Tables.documents(spark, sf0001)
    TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 2).collect()
    TextAnalysis.unigramCrossEntropy(docs).collect()
    assert(org.apache.spark.sql.graftbridge.ColumnBridge.cacheManagerIsEmpty(spark))
  }

  test("bigram LM: hand-computed conditional cross-entropy; <2-token docs drop") {
    // corpus: d1="a b c", d2="a b b", d3="z" (no bigrams → no row)
    //   c2: "a b"→2, "b c"→1, "b b"→1;  prefix c1: a→2, b→2
    //   d1 = [ (ln2−ln2) + (ln2−ln1) ] / 2 = ln2/2;  d2 identical
    val docs = Seq((1L, "a b c"), (2L, "a b b"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramCrossEntropy(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set(1L, 2L))
    val expected = math.rint(math.log(2.0) / 2 * 1e6) / 1e6
    assert(out(1L) == ((2L, expected)))
    assert(out(2L) == ((2L, expected)))
    // checkpoint-based materialization must not leak cache entries either
    assert(org.apache.spark.sql.graftbridge.ColumnBridge.cacheManagerIsEmpty(spark))
  }

  test("qualityLogistic: probabilities in (0,1), keep consistent with threshold") {
    val docs = Tables.documents(spark, sf0001)
    val out = TextAnalysis.qualityLogistic(docs).as[(Long, Double, Int)].collect()
    assert(out.length == docs.count())
    assert(out.forall { case (_, p, _) => p > 0.0 && p < 1.0 })
    assert(out.forall { case (_, p, k) => k == (if (p >= 0.5) 1 else 0) })
    // frozen weights must separate the corpus non-trivially at this SF
    val kept = out.count(_._3 == 1)
    assert(kept > 0 && kept < out.length)
  }

  test("bm25Rank: hand-computed scores on a 3-doc fixture; tf saturation " +
    "and length normalization behave") {
    // N=3, avgdl=(2+4+0)/3=2; term 'cat': df=2
    val docs = Seq(
      (1L, "cat cat"), // tf=2, dl=2
      (2L, "cat dog dog dog"), // tf=1, dl=4
      (3L, "   ") // token-free: counts toward N, never scores
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Rank(docs, Seq("cat"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val k1 = 1.2; val b = 0.75
    val idf = math.log(1.0 + (3.0 - 2 + 0.5) / (2 + 0.5))
    def s(tf: Double, dl: Double) =
      BigDecimal(idf * (tf * (k1 + 1)) /
        (tf + k1 * (1 - b + b * dl / 2.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq((1L, s(2, 2)), (2L, s(1, 4))),
      s"got ${out.toSeq}")
    // doc 1 wins: higher tf AND equal-to-shorter length
    assert(out.head._1 == 1L && out.head._2 > out(1)._2)
  }

  test("bm25Rank rejects empty and duplicate queries") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25Rank(docs, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25Rank(docs, Seq("a", "a"))
    }
  }

  test("sourceQualityGate keeps whole good sources, drops whole bad ones") {
    // srcA: stopword-rich prose (high prob); srcB: punctuation soup (low)
    val docs = Seq(
      (1L, "the cat and the dog went to the house in the garden", "srcA"),
      (2L, "it is a fine day and the sun is out in the sky", "srcA"),
      (3L, ".,;: !!! ,,, ... ;;; !!! ??? ., ., .,", "srcB"),
      (4L, ":::: !!!! ???? ;;;; ,,,, .... :::: !!!!", "srcB")
    ).toDF("doc_id", "text", "source")
    val kept = TextAnalysis.sourceQualityGate(docs, "source", minMean = 0.5)
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    assert(kept == Set((1L, "srcA"), (2L, "srcA")))
    // per-doc probs survive into the output and match qualityLogistic
    val probs = TextAnalysis.sourceQualityGate(docs, "source", minMean = 0.5)
      .select("doc_id", "quality_prob").as[(Long, Double)].collect().toMap
    val ref = TextAnalysis.qualityLogistic(docs)
      .select("doc_id", "quality_prob").as[(Long, Double)].collect().toMap
    assert(probs == ref.view.filterKeys(Set(1L, 2L)).toMap)
  }

  test("bpeTrainMerges: frequency-weighted merges, learned symbols chain") {
    // "abab" ×3, "abc" ×2 → pairs: (a,b) 3·2+2=8, (b,a) 3, (b,c) 2.
    // Round 1 merges (a,b) → sequences ab ab / ab c.
    // Round 2 pairs: (ab,ab) 3, (ab,c) 2 → merges (ab,ab) — a LEARNED
    // symbol on both sides.
    val docs = Seq((1L, "abab abab abab abc abc")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrainMerges(docs, rounds = 2)
      .orderBy("merge_round")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 8L), (2, "ab", "ab", 3L)))
  }

  test("bpeTrainMerges: greedy run semantics — aaaa merges to two aa, aaa to one") {
    // "aaaa": pairs (a,a)×3; "aaa": ×2 → round 1 pair count 5, merge
    // (a,a). Round 2: "aaaa"→(aa,aa) count 1; "aaa"→(aa,a) count 1 —
    // greedy left-to-right, no overlap: tie breaks (aa,a) < (aa,aa)
    val docs = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrainMerges(docs, rounds = 2)
      .orderBy("merge_round")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "a", 5L), (2, "aa", "a", 1L)))
  }

  test("bpeTrainMerges throws when rounds exceed merge capacity") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    intercept[IllegalStateException] {
      TextAnalysis.bpeTrainMerges(docs, rounds = 3)
    }
  }

  test("lexicalDiversity: hand-computed TTR/hapax/entropy; token-free docs drop") {
    val df = Seq(
      (1L, "a a b c"),      // 4 tokens, 3 types, hapax {b, c}
      (2L, "x x x x"),      // degenerate: 1 type, 0 hapax, entropy 0
      (3L, "   ")           // token-free → absent
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.lexicalDiversity(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L))
    val r1 = rows(1L)
    assert(r1.getAs[Long]("n_tokens") == 4L)
    assert(r1.getAs[Long]("n_types") == 3L)
    assert(r1.getAs[Long]("n_hapax") == 2L)
    assert(r1.getAs[Double]("ttr") == 0.75)
    assert(r1.getAs[Double]("hapax_ratio") == 0.666667)
    // H = ln 4 − (2·ln 2)/4 = 1.0397207708399179 → round 6
    assert(r1.getAs[Double]("word_entropy") == 1.039721)
    val r2 = rows(2L)
    assert(r2.getAs[Double]("ttr") == 0.25)
    assert(r2.getAs[Double]("hapax_ratio") == 0.0)
    assert(r2.getAs[Double]("word_entropy") == 0.0)
  }

  test("zipfFit: exact power-law fixture recovers slope −1; head cut binds") {
    // counts c(r) = 1200/r for ranks 1..6: ln c = ln 1200 − 1·ln r, an
    // EXACT linear relation → slope −1, r² 1 up to rounding
    val words = (1 to 6).flatMap { r =>
      Seq.fill(1200 / r)(s"w$r")
    }
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val fit = TextAnalysis.zipfFit(df, topRanks = 500).collect().head
    assert(fit.getAs[Long]("n_ranks") == 6L)
    assert(fit.getAs[Double]("zipf_slope") == -1.0)
    assert(fit.getAs[Double]("r2") == 1.0)
    // intercept = ln 1200 = 7.0900768… → round 6
    assert(fit.getAs[Double]("zipf_intercept") == 7.090077)
    // the head cut bounds the regression to the requested top ranks
    val cut = TextAnalysis.zipfFit(df, topRanks = 3).collect().head
    assert(cut.getAs[Long]("n_ranks") == 3L)
  }

  test("dataCard: dup rate, integer-exact means, lang mode, token-free docs") {
    val df = Seq(
      (1L, "a a b c", "en", "A"),  // entropy 1.039721, ttr 0.75
      (2L, "a a b c", "en", "A"),  // exact duplicate text
      (3L, "   ", "fr", "A"),      // token-free: counts, no diversity
      (4L, "x y", "de", "B")
    ).toDF("doc_id", "text", "lang", "source")
    val rows = TextAnalysis.dataCard(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = rows("A")
    assert(a.getAs[Long]("n_docs") == 3L)
    assert(a.getAs[Long]("total_tokens") == 8L)
    // 3 docs, 2 distinct texts → 10^6·1 DIV 3
    assert(a.getAs[Long]("dup_ppm") == 333333L)
    // means over the 2 token-bearing docs only (identical docs)
    assert(a.getAs[Double]("mean_entropy") == 1.039721)
    assert(a.getAs[Double]("mean_ttr") == 0.75)
    assert(a.getAs[String]("top_lang") == "en") // 2×en beats 1×fr
    val b = rows("B")
    assert(b.getAs[Long]("dup_ppm") == 0L)
    assert(b.getAs[Double]("mean_ttr") == 1.0)
  }

  test("langIdEvaluation derives p/r/F1 from integer confusion counts") {
    val docs = Seq(
      ("the cat and the dog", "en"), // pred en — hit
      ("le chat et la maison est", "fr"), // pred fr — hit
      ("der hund ist mit heute", "de"), // pred de — hit
      ("xyz qwerty asdf", "en")) // no markers → pred und; en recall drops
      .toDF("text", "lang")
    val rows = TextAnalysis.langIdEvaluation(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // 'und' is prediction-only: still gets a row, with zero-filled metrics
    assert(rows.keySet == Set("en", "fr", "de", "und"))
    val en = rows("en")
    assert(en.getAs[Long]("n_true") == 2L)
    assert(en.getAs[Long]("n_pred") == 1L)
    assert(en.getAs[Long]("n_correct") == 1L)
    assert(en.getAs[Double]("precision") == 1.0)
    assert(en.getAs[Double]("recall") == 0.5)
    assert(en.getAs[Double]("f1") == 0.666667) // 2·1/(2+1), rounded 6
    val und = rows("und")
    assert(und.getAs[Long]("n_true") == 0L)
    assert(und.getAs[Long]("n_pred") == 1L)
    assert(und.getAs[Double]("precision") == 0.0)
    assert(und.getAs[Double]("recall") == 0.0)
    assert(und.getAs[Double]("f1") == 0.0)
    assert(rows("fr").getAs[Double]("f1") == 1.0)
    assert(rows("de").getAs[Double]("f1") == 1.0)
  }

  test("sourceDivergence: zero for identical sources, ln2 for disjoint") {
    val docs = Seq(
      ("a", "x y z x"), ("b", "x y z x"), // identical distributions
      ("c", "p q r s")) // disjoint vocabulary
      .toDF("source", "text")
    val rows = TextAnalysis.sourceDivergence(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_terms"), r.getAs[Double]("js_divergence"))).toMap
    assert(rows(("a", "b")) == ((3L, 0.0)))
    // fully disjoint supports: JS = ln 2 (within the nano snap)
    assert(math.abs(rows(("a", "c"))._2 - math.log(2.0)) < 1e-5)
    assert(rows(("a", "c"))._1 == 7L) // 3 + 4 distinct terms
    // symmetric by construction: only canonical (a < b) pairs emitted
    assert(rows.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("bucketed sourceDivergence only understates and keeps the ordering") {
    val docs = Seq(
      ("a", "x y z x w v u t"), ("b", "x y z x w v u t"), // identical
      ("c", "p q r s pp qq rr ss")) // disjoint vocabulary
      .toDF("source", "text")
    def js(buckets: Int) = TextAnalysis.sourceDivergence(docs,
        buckets = buckets).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("js_divergence")).toMap
    val exact = js(0)
    val sketch = js(16)
    // identical distributions stay identical under ANY support folding
    assert(sketch(("a", "b")) == 0.0)
    // data-processing inequality: merging support cells never raises JS
    // (nano-snap slack only)
    Seq(("a", "c"), ("b", "c")).foreach { k =>
      assert(sketch(k) <= exact(k) + 1e-6, s"$k: ${sketch(k)} > ${exact(k)}")
    }
    // the redundant pair still ranks strictly below the additive pairs
    assert(sketch(("a", "c")) > sketch(("a", "b")))
  }

  test("persisted BM25 index: tier-equivalent to inline, ensure skips rebuild") {
    val docs = Tables.documents(spark, sf0001)
    val built = TextAnalysis.ensureBm25Index(docs, "bm25_spec",
      "/tmp/graft_bm25/spec")
    // second ensure in the same session is a no-op
    assert(!TextAnalysis.ensureBm25Index(docs, "bm25_spec",
      "/tmp/graft_bm25/spec"))
    val inline = TextAnalysis.bm25Rank(docs,
        Seq("dup", "vector", "scan"), topK = 20).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val indexed = TextAnalysis.bm25SearchIndexed(spark, "bm25_spec",
        Seq("dup", "vector", "scan"), topK = 20).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(indexed.nonEmpty && indexed == inline) // order AND scores
  }

  test("retrievalMetrics: hand-checked MRR, P@k, recall, nDCG") {
    // ranking: ids 1..4 by score; relevant = {2, 4, 99} (99 unranked)
    val ranking = Seq((1L, 4.0), (2L, 3.0), (3L, 2.0), (4L, 1.0))
      .toDF("doc_id", "bm25")
    val relevant = Seq(2L, 4L, 99L).toDF("doc_id")
    val m = TextAnalysis.retrievalMetrics(ranking, relevant, k = 3)
      .collect().head
    assert(m.getAs[Long]("n_relevant") == 3L)
    assert(m.getAs[Double]("mrr") == 0.5) // first relevant at rank 2
    // top-3 holds ONE relevant (rank 2) → P@3 = 1/3
    assert(m.getAs[Double]("precision_at_k") == 0.333333)
    // same cutoff for recall: one of 3 relevants inside the top-3 (the
    // relevant at rank 4 counts toward NEITHER precision nor recall)
    assert(m.getAs[Double]("recall_at_k") == 0.333333)
    // DCG = 1/log2(3); IDCG = 1/log2(2) + 1/log2(3) + 1/log2(4)
    val dcg = 1.0 / (math.log(3.0) / math.log(2.0))
    val idcg = 1.0 + 1.0 / (math.log(3.0) / math.log(2.0)) + 0.5
    assert(math.abs(m.getAs[Double]("ndcg_at_k") - dcg / idcg) < 1e-5)
  }

  test("BM25 index append and delete converge to the fresh-build search") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf0001)
    val half = docs.filter(col("doc_id") < 250)
    val rest = docs.filter(col("doc_id") >= 250)
    val terms = Seq("dup", "vector", "scan")
    def search(name: String) = TextAnalysis
      .bm25SearchIndexed(spark, name, terms, topK = 20).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    // build on half, append the rest → identical to a full fresh build
    TextAnalysis.buildBm25Index(half, "bm25_inc", "/tmp/graft_bm25/inc")
    TextAnalysis.appendToBm25Index(spark, "bm25_inc",
      "/tmp/graft_bm25/inc", rest)
    TextAnalysis.buildBm25Index(docs, "bm25_full", "/tmp/graft_bm25/full")
    assert(search("bm25_inc") == search("bm25_full"))
    // replay idempotence: re-appending the ingested slice writes nothing
    // — postings/docstats row counts, the meta row, and search all hold
    def state() = (spark.table("bm25_inc_postings").count(),
      spark.table("bm25_inc_docstats").count(),
      spark.table("bm25_inc_meta").collect().toSeq)
    val before = state()
    TextAnalysis.appendToBm25Index(spark, "bm25_inc",
      "/tmp/graft_bm25/inc", rest)
    assert(state() == before)
    assert(search("bm25_inc") == search("bm25_full"))
    // compaction collapses the append generations; results untouched
    def nFiles = new java.io.File("/tmp/graft_bm25/inc/postings")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val filesBefore = nFiles
    TextAnalysis.compactBm25Index(spark, "bm25_inc", "/tmp/graft_bm25/inc")
    assert(nFiles < filesBefore, s"$nFiles !< $filesBefore")
    assert(search("bm25_inc") == search("bm25_full"))
    // delete the appended half again → identical to the half-only build
    TextAnalysis.deleteFromBm25Index(spark, "bm25_inc",
      "/tmp/graft_bm25/inc",
      rest.select("doc_id").collect().map(_.getLong(0)).toSeq)
    TextAnalysis.buildBm25Index(half, "bm25_half", "/tmp/graft_bm25/half")
    assert(search("bm25_inc") == search("bm25_half"))
  }

  test("calibrationBins: equal-width bins, top edge folds into the last bin") {
    val scored = Seq(
      (1L, 0.05, 0), (2L, 0.15, 0),
      (3L, 0.95, 1), (4L, 1.0, 1), (5L, 0.98, 0) // p=1.0 must land in bin 9
    ).toDF("doc_id", "p", "y")
    val got = TextAnalysis.calibrationBins(scored, "p", "y")
      .select("bucket", "n_docs", "mean_prob", "pos_rate", "calib_gap")
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == Set(0, 1, 9))
    assert(got(0) == ((1L, 0.05, 0.0, 0.05)))
    assert(got(1) == ((1L, 0.15, 0.0, 0.15)))
    assert(got(9) == ((3L, 0.976667, 0.666667, 0.31)))
  }

  test("rocPrReport: hand-computed AUC/Gini/AP/best-F1 with tied scores") {
    // P=3, N=4; U (pairwise, ties=0.5) = 8.5 -> AUC 17/24, Gini 5/12;
    // tie-block AP = (1/2 + 2/3 + 1/2)/3; best F1 ties at 0.8 and 0.5 ->
    // larger threshold wins
    val scored = Seq(
      (0.9, 1), (0.9, 0), (0.8, 1), (0.5, 0), (0.5, 1), (0.5, 0), (0.2, 0)
    ).toDF("p", "y")
    val r = TextAnalysis.rocPrReport(scored, "p", "y")
      .select("n_pos", "n_neg", "auc", "gini", "avg_precision",
        "best_f1", "best_f1_threshold")
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().head
    assert(r == ((3L, 4L, 0.708333, 0.416667, 0.555556, 0.666667, 0.8)))
  }

  test("rocPrReport: single-class input yields NULL rank metrics") {
    val scored = Seq((0.9, 1), (0.2, 1)).toDF("p", "y")
    val r = TextAnalysis.rocPrReport(scored, "p", "y").collect().head
    assert(r.getAs[Long]("n_neg") == 0L)
    assert(r.isNullAt(r.fieldIndex("auc")))
    assert(r.isNullAt(r.fieldIndex("gini")))
    assert(r.getAs[Double]("avg_precision") == 1.0)
  }

  test("readability: hand-computed Flesch, fragment counts one sentence, " +
    "vowelless tokens still get one syllable") {
    val docs = Seq(
      // 4 words, 2 sentences, syllables: the=1, cat=1, sat=1, here=2 -> 5
      (1L, "The cat sat. Here?"),
      // no sentence punctuation -> 1 sentence; "xyz" clamps to 1 syllable
      (2L, "xyz ok"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((4L, 2L, 5L)))
    // 206.835 - 1.015*(4/2) - 84.6*(5/4) = 99.055
    assert(r1.getAs[Double]("flesch") == 99.055)
    val r2 = got(2L)
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3)) == ((2L, 1L, 2L)))
    val r3 = got(3L)
    assert(r3.getLong(1) == 0L && r3.isNullAt(r3.fieldIndex("flesch")))
  }

  test("noveltyCurve: first batch all-new, repeats don't recount, " +
    "batch math and ppm exact") {
    // shingleK=1, batchSize=2: batch 0 = docs 0,1 tokens {a,b,c};
    // batch 1 = docs 2,3 tokens {b,c,d} -> new {d}: 1 of 3 present
    val docs = Seq(
      (0L, "a b"), (1L, "b c"), (2L, "b c"), (3L, "c d")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.noveltyCurve(docs, shingleK = 1, batchSize = 2L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 3L, 3L, 3L, 1000000L),
      (1L, 3L, 1L, 4L, 333333L)))
  }

  test("distinctiveTerms: a source's marker token tops its list with " +
    "positive z; shared filler does not") {
    val docs = Seq(
      ("a", "zebra zebra zebra common common"),
      ("a", "zebra common common"),
      ("b", "common common common filler filler"),
      ("b", "filler common filler")
    ).toDF("source", "text")
    val got = TextAnalysis.distinctiveTerms(docs, k = 2)
      .collect()
      .groupBy(_.getAs[String]("source"))
      .view.mapValues(_.sortBy(-_.getAs[Double]("z_score"))
        .map(r => r.getAs[String]("term") -> r.getAs[Double]("z_score")))
      .toMap
    assert(got("a").head._1 == "zebra" && got("a").head._2 > 0.0)
    assert(got("b").head._1 == "filler" && got("b").head._2 > 0.0)
    // the shared token is nobody's most-distinctive term
    assert(got.values.forall(_.head._1 != "common"))
  }

  test("featureMutualInfo: perfectly-informative feature scores ln 2, " +
    "constant feature scores 0") {
    // f1 = 0..9 with y = (f1 >= 5): bins are singletons, MI = ln 2;
    // f2 constant: hi == lo collapses to one bin, MI = 0
    val df = (0 to 9).map(i => (i.toDouble, 7.0, if (i >= 5) 1 else 0))
      .toDF("f1", "f2", "y")
    val got = TextAnalysis.featureMutualInfo(df, Seq("f1", "f2"), "y")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("f1") == ((10L, 0L, 0.693147)))
    assert(got("f2") == ((10L, 0L, 0.0)))
  }

  test("featureMutualInfo: NULL/NaN feature values are excluded from " +
    "the bin counts and reported as n_null (no silent bias)") {
    // f1: 6 observed values perfectly split by y + 2 null + 2 NaN rows;
    // MI over the OBSERVED rows is exactly ln 2 — a phantom null bin
    // would have dragged it down. f2: all-null feature stays visible.
    val rows: Seq[(java.lang.Double, java.lang.Double, Int)] = Seq(
      (0.0, null, 0), (1.0, null, 0), (2.0, null, 0),
      (7.0, null, 1), (8.0, null, 1), (9.0, null, 1),
      (null, null, 0), (null, null, 1),
      (Double.NaN, null, 0), (Double.NaN, null, 1))
    val df = rows.toDF("f1", "f2", "y")
    val got = TextAnalysis.featureMutualInfo(df, Seq("f1", "f2"), "y")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("f1") == ((6L, 4L, 0.693147)), s"got ${got("f1")}")
    assert(got("f2") == ((0L, 10L, 0.0)), s"got ${got("f2")}")
  }

  test("classifierGovernanceReport: composes ROC metrics with " +
    "hand-computed ECE in one row") {
    val scored = Seq(
      (0.9, 1), (0.9, 0), (0.8, 1), (0.5, 0), (0.5, 1), (0.5, 0), (0.2, 0)
    ).toDF("p", "y")
    val r = TextAnalysis.classifierGovernanceReport(scored, "p", "y")
      .collect().head
    assert(r.getAs[Long]("n_docs") == 7L)
    // bins: b9 gap 0.4 (n2), b8 gap 0.2 (n1), b5 gap 0.166667 (n3),
    // b2 gap 0.2 (n1) -> (0.8+0.2+0.500001+0.2)/7
    assert(r.getAs[Double]("ece") == 0.242857)
    assert(r.getAs[Double]("auc") == 0.708333) // same input as the roc test
    assert(r.getAs[Double]("best_f1_threshold") == 0.8)
  }

  test("prCurve: per-threshold confusion counts over tie blocks") {
    val scored = Seq(
      (0.9, 1), (0.9, 0), (0.8, 1), (0.5, 0), (0.5, 1), (0.5, 0), (0.2, 0)
    ).toDF("p", "y")
    val got = TextAnalysis.prCurve(scored, "p", "y")
      .select("threshold", "n_pred", "tp", "precision", "recall", "f1")
      .as[(Double, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.size == 4)
    assert(got(0.9) == ((0.9, 2L, 1L, 0.5, 0.333333, 0.4)))
    assert(got(0.8) == ((0.8, 3L, 2L, 0.666667, 0.666667, 0.666667)))
    assert(got(0.5) == ((0.5, 6L, 3L, 0.5, 1.0, 0.666667)))
    assert(got(0.2) == ((0.2, 7L, 3L, 0.428571, 1.0, 0.6)))
  }

  test("referenceCrossEntropy: add-one smoothing over the reference " +
    "vocabulary; OOV tokens hit the unknown slot and the tripwire count") {
    // ref corpus: tokens {a: 2, b: 1} → T = 3, V = 2, denom = 6
    val ref = Seq((1L, "a a b")).toDF("doc_id", "text")
    val tgt = Seq(
      (10L, "a c"),      // a seen (cnt 2), c OOV
      (11L, "b b"),      // all seen
      (12L, "z"),        // all OOV
      (13L, "   ")       // no tokens → no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.referenceCrossEntropy(ref, tgt)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("oov_tokens"),
          r.getAs[Double]("ref_cross_entropy")))).toMap
    assert(got.size == 3)
    def ce(logs: Seq[Double]): Double =
      BigDecimal(math.log(6.0) - logs.sum / logs.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 10: ln6 − (ln(2+1) + ln(0+1))/2
    assert(got(10L) == ((2L, 1L, ce(Seq(math.log(3.0), 0.0)))))
    // doc 11: ln6 − ln(1+1)
    assert(got(11L) == ((2L, 0L, ce(Seq(math.log(2.0), math.log(2.0))))))
    // doc 12: pure unknown mass — the worst score: ln6 − ln1
    assert(got(12L) == ((1L, 1L, ce(Seq(0.0)))))
    // monotone: more OOV ⇒ higher cross-entropy
    assert(got(12L)._3 > got(10L)._3 && got(10L)._3 > got(11L)._3)
  }

  test("perceptronTrain: exact integer weight trajectory; a 0-error " +
    "round is a fixed point emitted, not skipped") {
    // A: y=+1, x=(1, 2); B: y=-1, x=(1, -3)
    // round 1: w=(0,0) -> both margins 0 <= 0 -> dw = (1,2) + (-1,3) = (0,5)
    // round 2: A margin 10 > 0, B margin 15 > 0 -> 0 errors, w unchanged
    val df = Seq((1L, 1L, 2L), (-1L, 1L, -3L)).toDF("y", "x0", "x1")
    val got = TextAnalysis.perceptronTrain(df, "y", Seq("x0", "x1"),
      rounds = 3).orderBy("round").collect()
      .map(r => (r.getInt(0), r.getAs[Long]("n_errors"),
        r.getAs[Long]("w_0"), r.getAs[Long]("w_1")))
    assert(got.toSeq == Seq(
      (1, 2L, 0L, 5L),
      (2, 0L, 0L, 5L),
      (3, 0L, 0L, 5L)))
  }

  test("blocklistPerDoc: case-insensitive non-overlapping counts, worst " +
    "phrase by (hits, lexicographic), null worst when clean") {
    val df = Seq(
      (1L, "the Big Table has a big table and a slow scan"),
      (2L, "nothing bad here"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.blocklistPerDoc(df,
      Seq("big table", "slow scan", "quantum leap"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_hits"), r.getAs[Long]("n_phrases_hit"),
          r.getAs[String]("worst_phrase"), r.getAs[Boolean]("flagged"))))
      .toMap
    assert(got(1L) == ((3L, 2L, "big table", true)))
    assert(got(2L) == ((0L, 0L, null, false)))
    assert(!got.contains(3L)) // null text excluded up front
  }

  test("blocklistPerDoc worst-phrase tie-break: equal hits pick the " +
    "lexicographically first phrase") {
    val df = Seq((1L, "slow scan then big table")).toDF("doc_id", "text")
    val got = TextAnalysis.blocklistPerDoc(df,
      Seq("slow scan", "big table")).head()
    assert(got.getAs[String]("worst_phrase") == "big table")
  }

  test("blocklistCensus: per-phrase docs/hits rollup keeps zero-hit " +
    "phrases and reports integer ppm incidence") {
    val df = Seq(
      (1L, "big table big table"),
      (2L, "slow scan"),
      (3L, "big table"),
      (4L, "clean")).toDF("doc_id", "text")
    val got = TextAnalysis.blocklistCensus(df,
      Seq("big table", "slow scan", "quantum leap"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("docs_hit"), r.getAs[Long]("total_hits"),
          r.getAs[Long]("docs_hit_ppm")))).toMap
    assert(got("big table") == ((2L, 3L, 500000L)))
    assert(got("slow scan") == ((1L, 1L, 250000L)))
    assert(got("quantum leap") == ((0L, 0L, 0L)))
  }

  test("blocklistScanAC equals the expression tier on border-free " +
    "phrases (sparse per-(doc, phrase) hit rows)") {
    val phrases = Seq("big table", "slow scan", "fast merge")
    val df = Seq(
      (1L, "big table big table slow scan"),
      (2L, "Fast Merge and fast merge and more"),
      (3L, "no hits at all"),
      (4L, "slow scanfast merge")).toDF("doc_id", "text")
    val exprTier = df.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(TextAnalysis.blocklistHits(col("text"), phrases)).as("h"))
      .select(col("doc_id"), col("h.phrase"), col("h.hits"))
      .filter(col("hits") > 0)
      .as[(Long, String, Long)].collect().toSet
    val acTier = TextAnalysis.blocklistScanAC(df, phrases)
      .as[(Long, String, Long)].collect().toSet
    assert(acTier == exprTier && acTier.nonEmpty)
    assert(acTier.contains((4L, "slow scan", 1L))) // match across the glue
  }

  test("blocklistScanAC: overlapping occurrences count (bordered " +
    "pattern), suffix patterns all fire") {
    import spark.implicits._
    // "aa" in "aaaa": ends at 1,2,3 -> 3 overlapping (replace tier: 2)
    val aa = TextAnalysis.blocklistScanAC(
      Seq((1L, "aaaa")).toDF("doc_id", "text"), Seq("aa")).head()
    assert(aa.getAs[Long]("hits") == 3L)
    // classic AC sanity: "ushers" fires he, she, hers once each
    val got = TextAnalysis.blocklistScanAC(
      Seq((1L, "ushers")).toDF("doc_id", "text"), Seq("he", "she", "hers"))
      .as[(Long, String, Long)].collect()
      .map(t => t._2 -> t._3).toMap
    assert(got == Map("he" -> 1L, "she" -> 1L, "hers" -> 1L))
  }

  test("blocklist tiers reject phrase lists that collide after " +
    "lowercasing (double-count hazard) in every entry point") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    val colliding = Seq("Bad Phrase", "bad phrase")
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistHits(col("text"), colliding)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistScanAC(df, colliding)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistCensusAC(df, colliding)
    }
    // distinct-after-lowering lists still pass and match case-blind
    val ok = TextAnalysis.blocklistScanAC(
      Seq((1L, "A Bad Phrase")).toDF("doc_id", "text"), Seq("BAD PHRASE"))
      .head()
    assert(ok.getAs[String]("phrase") == "bad phrase" &&
      ok.getAs[Long]("hits") == 1L)
  }

  test("driver-side phrase lowering is locale-independent: a phrase " +
    "with 'I' matches under a Turkish default locale") {
    import spark.implicits._
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
    try {
      // "tr".toLowerCase would give dotless ı for 'I' and never match
      // Spark's locale-independent lower(); Locale.ROOT keeps 'i'
      val got = TextAnalysis.blocklistScanAC(
        Seq((1L, "filtered input")).toDF("doc_id", "text"),
        Seq("FILTERED INPUT")).count()
      assert(got == 1L)
      val exprTier = Seq((1L, "filtered input")).toDF("doc_id", "text")
        .select(explode(
          TextAnalysis.blocklistHits(col("text"), Seq("FILTERED INPUT")))
          .as("h"))
        .select(col("h.hits")).head().getLong(0)
      assert(exprTier == 1L)
    } finally java.util.Locale.setDefault(prev)
  }

  /** Independent plain-Scala replay of the integer power-iteration
    * recursion over the windowed-PPMI matrix (maps and BigInt loops, no
    * Spark) — the q300/q316 test discipline.
    */
  private def ppmiPowerReplay(docs: Seq[String], window: Int,
                              minCount: Long, rounds: Int)
      : Map[String, Long] = {
    val pairs = docs.flatMap { t =>
      val tk = t.trim.split("\\s+").filter(_.nonEmpty)
      for {
        i <- tk.indices
        j <- (i + 1) until math.min(i + window + 1, tk.length)
      } yield if (tk(i) <= tk(j)) (tk(i), tk(j)) else (tk(j), tk(i))
    }
    val n = pairs.size.toDouble
    val cnt = pairs.groupBy(identity).map { case (k, v) => k -> v.size }
    val marg = pairs.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size }
    val w = cnt.filter(_._2 >= minCount).flatMap { case ((a, b), c) =>
      val ppmi = math.max(0.0,
        BigDecimal(math.log(c * n / (marg(a).toDouble * marg(b))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      if (ppmi > 0.0) {
        val wi = BigDecimal(ppmi * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        if (a == b) Seq((a, b, wi)) else Seq((a, b, wi), (b, a, wi))
      } else Nil
    }.toSeq
    val vocab = w.map(_._1).distinct
    var v = vocab.map(_ -> 1000000L).toMap
    for (_ <- 1 to rounds) {
      val u = vocab.map { x =>
        x -> w.collect { case (`x`, y, wi) => BigInt(wi) * v(y) }.sum
      }.toMap
      val mx = u.values.max
      v = vocab.map(x =>
        x -> (u(x) * 1000000 / (if (mx > 0) mx else 1)).toLong).toMap
    }
    v
  }

  test("ppmiPowerIteration replays the integer recursion exactly; " +
    "minCount prunes filler vocabulary and the iterate stays " +
    "max-normalized") {
    import spark.implicits._
    // two disconnected collocation clusters ({x,y} tight 3-node-ish
    // component with self-loops, {p,q} a bare pair) made RARE relative
    // to the corpus by unique-token filler docs (PPMI rewards
    // above-independence co-occurrence, so frequency-dominant tokens
    // would score ~0 — the first draft of this fixture learned that);
    // filler pairs occur once each and fall to minCount
    val docs = Seq.fill(4)("x y x y") ++ Seq.fill(2)("p q") ++
      (0 until 30).map(i => s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis
      .ppmiPowerIteration(df, window = 2, minCount = 2, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = ppmiPowerReplay(docs, window = 2, minCount = 2, rounds = 3)
    assert(got.nonEmpty && got == expect, s"got=$got expect=$expect")
    assert(got.keySet == Set("x", "y", "p", "q"),
      s"minCount must prune the filler vocab: ${got.keySet}")
    assert(got.values.max == 1000000L) // max-normalized each round
    // within each disconnected component the two endpoints of the
    // symmetric pair converge to equal scores
    assert(got("p") == got("q"))
  }

  /** Plain-Scala replay of the interpolated-KN trigram recursion —
    * maps and doubles, same parenthesization as the column expression.
    */
  private def knReplay(docs: Seq[(Long, String)], d: Double = 0.75)
      : Map[Long, (Long, Double)] = {
    def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val tris = docs.flatMap { case (id, t) =>
      toks(t).sliding(3).filter(_.size == 3)
        .map(w => (id, (w(0), w(1), w(2)))) }
    val bis = docs.flatMap { case (_, t) =>
      toks(t).sliding(2).filter(_.size == 2).map(w => (w(0), w(1))) }
    val c3 = tris.map(_._2).groupBy(identity).map { case (k, v) => k -> v.size }
    val l12 = c3.toSeq.groupBy { case ((a, b, _), _) => (a, b) }
      .map { case (k, v) => k -> ((v.map(_._2).sum, v.size)) }
    val cb = bis.groupBy(identity).map { case (k, v) => k -> v.size }
    val l2 = cb.toSeq.groupBy(_._1._1)
      .map { case (k, v) => k -> ((v.map(_._2).sum, v.size)) }
    val cont3 = cb.toSeq.groupBy(_._1._2).map { case (k, v) => k -> v.size }
    val n1pdd = cb.size
    def lnp(tri: (String, String, String)): Double = {
      val (w1, w2, w3) = tri
      val (c12dot, n1p12) = l12((w1, w2))
      val (c2dot, n1p2) = l2(w2)
      math.log(
        math.max(c3(tri) - d, 0.0) / c12dot +
          (d * n1p12 / c12dot) * (
            math.max(cb((w2, w3)) - d, 0.0) / c2dot +
              (d * n1p2 / c2dot) * (cont3(w3).toDouble / n1pdd)))
    }
    tris.groupBy(_._1).map { case (id, g) =>
      val tf = g.map(_._2).groupBy(identity).map { case (k, v) => k -> v.size }
      val n = tf.values.sum.toLong
      val s = tf.map { case (tri, f) => f * lnp(tri) }.sum
      id -> ((n, BigDecimal(-s / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
  }

  test("trigramKnCrossEntropy: plain-Scala KN replay; both tiers order " +
    "repetitive < diverse and the trigram tier separates them harder") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "a b c a b c a b c a b c a b c"), // repetitive
      (2L, "q w e r t y u i o p z x j k l"), // all-unique
      (3L, "a b c q w e a b c r t y"),
      (4L, "the cat sat the cat ran the cat hid"))
    val df = fixture.toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.trigramKnCrossEntropy(df)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    val expect = knReplay(fixture)
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, (n, ce)) =>
      assert(n == expect(id)._1)
      assert(math.abs(ce - expect(id)._2) < 1e-9,
        s"doc $id: got $ce want ${expect(id)._2}")
    }
    val t = got.view.mapValues(_._2).toMap
    val b = graft.ops.TextAnalysis.bigramCrossEntropy(df)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // THE reason smoothing exists: the unsmoothed in-corpus bigram ML
    // gives every singleton bigram p = c2/c1 = 1 → an all-unique doc
    // scores ~zero entropy and the ordering INVERTS; the discounted
    // interpolated tier keeps repetitive < diverse
    assert(t(1L) < t(2L),
      s"KN must order repetitive < diverse: ${t(1L)} vs ${t(2L)}")
    assert(b(2L) < b(1L),
      s"fixture must exhibit the unsmoothed inversion: ${b(2L)} vs ${b(1L)}")
  }

  test("refTrigramKnCrossEntropy: every backoff rung behaves — seen " +
    "< prefix-backoff < fully-OOV entropy; unseen counts exact") {
    import spark.implicits._
    val reference = Seq(
      (0L, "the cat sat on the mat and the cat ran off"),
      (2L, "the dog sat on the rug and the dog ran off"))
      .toDF("doc_id", "text")
    val target = Seq(
      (1L, "the cat sat on the mat"),   // all trigrams seen
      (3L, "the cat sat on the rug quickly"), // one unseen under a seen prefix
      (5L, "zx qy wv uk tj ri"))        // fully OOV
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis
      .refTrigramKnCrossEntropy(target, reference)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: 4 trigrams, every one in the reference → zero unseen
    assert(got(1L)._1 == 4L && got(1L)._2 == 0L)
    // doc 5: 4 trigrams, all unseen (and every word OOV)
    assert(got(5L)._1 == 4L && got(5L)._2 == 4L)
    // doc 3: four seen trigrams plus "the rug quickly" — unseen but
    // under the SEEN prefix (the, rug), i.e. the reserved-mass rung
    assert(got(3L)._1 == 5L && got(3L)._2 == 1L)
    // entropy ordering: in-distribution < mixed < fully-OOV
    assert(got(1L)._3 < got(3L)._3 && got(3L)._3 < got(5L)._3,
      s"backoff entropy ordering broken: $got")
  }

  test("ngramKnCrossEntropy(order=3) reproduces trigramKnCrossEntropy " +
    "exactly; ref twin likewise — the generalized chain is a strict " +
    "superset of the trigram rung") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c a b c a b c a b c"),
      (2L, "q w e r t y u i o p z x j k l"),
      (3L, "a b c q w e a b c r t y"),
      (4L, "the cat sat the cat ran the cat hid")).toDF("doc_id", "text")
    val tri = graft.ops.TextAnalysis.trigramKnCrossEntropy(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    val gen = graft.ops.TextAnalysis.ngramKnCrossEntropy(docs, order = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(gen == tri, s"order-3 general chain diverged: $gen vs $tri")
    val reference = Seq(
      (0L, "the cat sat on the mat and the cat ran off"),
      (2L, "the dog sat on the rug and the dog ran off"))
      .toDF("doc_id", "text")
    val target = Seq(
      (1L, "the cat sat on the mat"),
      (3L, "the cat sat on the rug quickly"),
      (5L, "zx qy wv uk tj ri")).toDF("doc_id", "text")
    val rtri = graft.ops.TextAnalysis
      .refTrigramKnCrossEntropy(target, reference)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val rgen = graft.ops.TextAnalysis
      .refNgramKnCrossEntropy(target, reference, order = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rgen == rtri, s"order-3 ref chain diverged: $rgen vs $rtri")
  }

  test("order-4/5 cross-corpus KN: backoff entropy ordering " +
    "in-distribution < mixed < fully-OOV holds at every order; unseen " +
    "counts exact") {
    import spark.implicits._
    val reference = Seq(
      (0L, "the quick brown fox jumps over the lazy dog every day"),
      (2L, "the quick red fox runs over the lazy cat every night"))
      .toDF("doc_id", "text")
    val target = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // verbatim span
      (3L, "the quick brown fox sleeps over the lazy dog"), // one novel word
      (5L, "zx qy wv uk tj ri mm nn oo pp")) // fully OOV
      .toDF("doc_id", "text")
    for (order <- Seq(4, 5)) {
      val got = graft.ops.TextAnalysis
        .refNgramKnCrossEntropy(target, reference, order = order)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      // top-order gram counts: doc of m tokens has m-order+1 grams
      assert(got(1L)._1 == 9L - order + 1, s"order $order: $got")
      assert(got(1L)._2 == 0L,
        s"order $order: verbatim span must have zero unseen: $got")
      assert(got(5L)._2 == got(5L)._1,
        s"order $order: fully-OOV doc must be all-unseen: $got")
      assert(got(1L)._3 < got(3L)._3 && got(3L)._3 < got(5L)._3,
        s"order $order: entropy ordering broken: $got")
    }
    // in-corpus: the order-5 chain runs green on the same fixture and
    // keeps the smoothing ordering (repetitive < diverse)
    val docs = Seq(
      (1L, "a b c d e a b c d e a b c d e a b c d e"),
      (2L, "q w e r t y u i o p z x j k l m n b v c"))
      .toDF("doc_id", "text")
    val in5 = graft.ops.TextAnalysis.ngramKnCrossEntropy(docs, order = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(in5(1L) < in5(2L),
      s"order-5 KN must order repetitive < diverse: $in5")
  }

  /** Rank-k replay: the same integer recursion plus Hotelling deflation
    * (c1 = A/B, c2 = c1·s/B, corr = u_p·c2; BigInt `/` truncates toward
    * zero, which is exactly the sign-split DIV both engines compute).
    */
  private def ppmiDirectionsReplay(docs: Seq[String], window: Int,
                                   minCount: Long, rounds: Int, k: Int)
      : Map[(String, Int), Long] = {
    val pairs = docs.flatMap { t =>
      val tk = t.trim.split("\\s+").filter(_.nonEmpty)
      for {
        i <- tk.indices
        j <- (i + 1) until math.min(i + window + 1, tk.length)
      } yield if (tk(i) <= tk(j)) (tk(i), tk(j)) else (tk(j), tk(i))
    }
    val n = pairs.size.toDouble
    val cnt = pairs.groupBy(identity).map { case (kk, v) => kk -> v.size }
    val marg = pairs.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (kk, v) => kk -> v.size }
    val w = cnt.filter(_._2 >= minCount).flatMap { case ((a, b), c) =>
      val ppmi = math.max(0.0,
        BigDecimal(math.log(c * n / (marg(a).toDouble * marg(b))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      if (ppmi > 0.0) {
        val wi = BigDecimal(ppmi * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        if (a == b) Seq((a, b, wi)) else Seq((a, b, wi), (b, a, wi))
      } else Nil
    }.toSeq
    val vocab = w.map(_._1).distinct
    var priors = List.empty[(Map[String, Long], BigInt, BigInt)]
    (1 to k).flatMap { e =>
      var v = vocab.map(_ -> 1000000L).toMap
      for (_ <- 1 to rounds) {
        val u = vocab.map { x =>
          val mv = w.collect { case (`x`, y, wi) => BigInt(wi) * v(y) }.sum
          val defl = priors.map { case (up, a, b) =>
            val s = vocab.map(t => BigInt(up.getOrElse(t, 0L)) * v(t)).sum
            BigInt(up.getOrElse(x, 0L)) * ((a / b) * s / b)
          }.sum
          x -> (mv - defl)
        }.toMap
        val mx = u.values.map(_.abs).max
        v = vocab.map(x =>
          x -> (u(x) * 1000000 / (if (mx > 0) mx else 1)).toLong).toMap
      }
      if (e < k) {
        val a = w.map { case (x, y, wi) =>
          BigInt(wi) * v(x) * v(y) }.sum
        val b = vocab.map(t => BigInt(v(t)) * v(t)).sum
        priors :+= ((v, a, b))
      }
      vocab.map(x => (x, e) -> v(x))
    }.toMap
  }

  test("ppmiTopDirections: bit-exact rank-2 replay; direction 2 lands " +
    "on the deflated second cluster, near-orthogonal to direction 1") {
    import spark.implicits._
    // {x,y} is the dominant collocation cluster, {p,q} the runner-up;
    // deflating direction 1 must hand direction 2 to {p,q}
    val docs = Seq.fill(4)("x y x y") ++ Seq.fill(2)("p q") ++
      (0 until 30).map(i => s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis
      .ppmiTopDirections(df, window = 2, minCount = 2, rounds = 3, k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val expect = ppmiDirectionsReplay(docs, window = 2, minCount = 2,
      rounds = 3, k = 2)
    assert(got == expect, s"got=$got expect=$expect")
    // direction 1 ≡ the single-direction operator (deflation only ever
    // touches e > 1)
    val d1 = graft.ops.TextAnalysis
      .ppmiPowerIteration(df, window = 2, minCount = 2, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d1 == got.collect { case ((t, 1), s) => t -> s })
    // structure: direction 1 peaks on the dominant cluster — which is
    // {p,q}, NOT the frequent {x,y}: PPMI punishes frequency (the
    // NOTES_r18 gotcha), so the rare pair carries the heavier edge —
    // and deflation hands direction 2 to the runner-up {x,y}
    val v1 = got.collect { case ((t, 1), s) => t -> s }
    val v2 = got.collect { case ((t, 2), s) => t -> s }
    assert(Set("p", "q").contains(v1.maxBy(_._2)._1))
    assert(Set("x", "y").contains(v2.maxBy(kv => math.abs(kv._2))._1))
    val dot = v1.keys.map(t => v1(t).toDouble * v2(t)).sum
    val cos = dot / (math.sqrt(v1.values.map(s => s.toDouble * s).sum) *
      math.sqrt(v2.values.map(s => s.toDouble * s).sum))
    assert(math.abs(cos) < 0.1, s"direction 2 not orthogonal: cos=$cos")
  }
}
