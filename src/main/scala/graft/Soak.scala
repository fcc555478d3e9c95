package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Memory-pressure soak over a SCALED-UP corpus — the "would this survive
  * the next order of magnitude" smoke the correctness suite (sf0.01/sf0.1
  * oracles) cannot provide, because no sf1.0 testdata exists in this
  * environment. The scale-up derives strictly from the driver-provided
  * sf tables: each copy k shifts ids into a disjoint range and perturbs
  * content (a per-copy text tag / one embedding dim / a per-copy ts
  * offset), so the scaled corpus is mostly-distinct the way a real 10×
  * corpus would be — NOT ten exact replicas, which would flatter dedup
  * (tiny candidate buckets per copy) and bore ANN (identical cells).
  *
  * Stages are the memory-pressure edges called out for a soak:
  * exact-median ObjectHashAggregate paths, the iterative CC loop's
  * checkpoint accumulation, LSH bucket explosion, IVF build+batch-probe,
  * the packing plan's driver-side capacity histogram, and BM25 index
  * math over the widened vocabulary. Each stage is consumed via a
  * count/hash action and timed; output is one JSON line plus
  * SOAK_r11.json. rc != 0 (any thrown stage) fails the run loudly.
  */
object Soak {

  private def consume(df: DataFrame): Long = df.count()

  /** Task-metric tap for the soak's honesty lane: per-soak-stage spill
    * and peak-execution-memory, straight from Spark's TaskEnd metrics.
    * Listener delivery is async; `snapshot` drains after a short settle
    * — the numbers are diagnostics (is the stage spilling? how close to
    * the executor-memory ceiling?), not timed measurements.
    */
  private final class MetricsTap extends org.apache.spark.scheduler.SparkListener {
    private val memSpill = new java.util.concurrent.atomic.AtomicLong
    private val diskSpill = new java.util.concurrent.atomic.AtomicLong
    private val peakMem = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        peakMem.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
      }
    }
    /** (memSpilled, diskSpilled, maxTaskPeakExecMem) since last reset. */
    def snapshotAndReset(): (Long, Long, Long) = {
      Thread.sleep(300) // settle the async listener bus
      (memSpill.getAndSet(0L), diskSpill.getAndSet(0L),
        peakMem.getAndSet(0L))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SOAK_MULT", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val out = sys.env.getOrElse("SPARK_GRAFT_SOAK_OUT", "SOAK_r12.json")
    // optional stage subset (comma-separated) — the 100× ceiling probe
    // runs only the heaviest stages rather than 9 × 100× wall-clock
    val only = sys.env.get("SPARK_GRAFT_SOAK_STAGES")
      .map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- scaled corpora (id-disjoint copies, content perturbed) --------
    val OFF = 10000000L // id offset per copy — far above any sf's max id
    def copies(k: Int)(f: Int => DataFrame): DataFrame =
      (0 until k).map(f).reduce(_ unionAll _)

    val docs0 = Tables.documents(spark, sfDir)
    val docs = copies(mult) { k =>
      docs0.select((col("doc_id") + lit(k * OFF)).as("doc_id"),
        // per-copy tag keeps copies near-dup-distinct (shingle sets move)
        concat(col("text"), lit(s" soakcopy$k tag$k")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.localCheckpoint(true)

    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val emb = copies(mult) { k =>
      emb0.select((col("vec_id") + lit(k * OFF)).as("vec_id"),
        // perturb dim k%64 so copies land in (mostly) the same cell
        // geometry but are not byte-identical vectors
        transform(col("embedding").cast("array<double>"),
          (v, i) => when(i === lit(k % 64), v + lit(0.001 * (k + 1)))
            .otherwise(v)).as("embedding"))
    }.localCheckpoint(true)

    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val lineitem = copies(mult) { k =>
      li0.select((col("l_orderkey") + lit(k * OFF)).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_extendedprice"))
    }.localCheckpoint(true)

    val ev0 = Tables.events(spark, sfDir)
    val events = copies(mult) { k =>
      ev0.select((col("event_id") + lit(k * OFF)).as("event_id"),
        (col("user_id") + lit(k * OFF)).as("user_id"),
        col("ts"), col("event_type"), col("value"))
    }.localCheckpoint(true)

    val sizes = Map(
      "documents" -> docs.count(), "embeddings" -> emb.count(),
      "lineitem" -> lineitem.count(), "events" -> events.count())

    // ---- stages --------------------------------------------------------
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    val spills = scala.collection.mutable.LinkedHashMap[String, String]()
    val tap = new MetricsTap
    spark.sparkContext.addSparkListener(tap)
    tap.snapshotAndReset() // drop the corpus-build metrics
    def stage(name: String)(body: => Long): Unit = {
      if (only.exists(!_.contains(name))) return // subset probe: skip
      val t0 = System.nanoTime()
      val n = body // any throw aborts the soak loudly — that IS the signal
      results(name) = (System.nanoTime() - t0) / 1e9
      counts(name) = n
      val (ms, ds, pk) = tap.snapshotAndReset()
      spills(name) =
        s"""{"mem_spill_bytes":$ms,"disk_spill_bytes":$ds,"peak_task_exec_mem_bytes":$pk}"""
      System.err.println(f"[soak] $name%-24s ${results(name)}%8.2f s  " +
        f"rows=$n  spill=$ms/$ds  peak=$pk")
    }

    stage("lsh_pairs_cc") {
      // LSH pair mining + iterative CC over the 10× corpus — checkpoint
      // accumulation + bucket-explosion pressure
      val pairs = ops.Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        shingleK = 2, numPerm = 64, bands = 16, threshold = 0.8)
      consume(ops.Dedup.clusterNearDups(pairs))
    }
    stage("exact_median_rollup") {
      // ObjectHashAggregate exact-median path over 10× lineitem rows,
      // one group per part — the percentile buffer pressure edge
      consume(lineitem.groupBy(col("l_partkey"))
        .agg(expr("percentile(l_quantity, 0.5)").as("med"),
          sum(col("l_extendedprice")).as("rev")))
    }
    stage("ivf_build_batch_probe") {
      // IVF over the 10× vector corpus: assignment + a 1%-of-corpus
      // batch probe (candidate join + per-query top-k)
      val centroids = emb.filter(col("vec_id") % 97 === 0)
        .select((col("vec_id") / 97).cast("int").as("cell_id"),
          col("embedding").as("centroid"))
      consume(ops.Similarity.ivfTopKBatch(emb, centroids,
        probeFilter = col("vec_id") % 101 === 0, k = 10, nProbe = 2))
    }
    stage("packing_plan") {
      // complement packing over 10× token counts — the driver-side
      // histogram is O(capacity), NOT O(rows); the soak checks exactly that
      consume(ops.Packing.complementPackingPlan(
        docs.select(graft.functions.tokenCount(col("text")).cast("long")
          .as("n_toks")), "n_toks", capacity = 256))
    }
    stage("bm25_rank") {
      consume(ops.TextAnalysis.bm25Rank(docs,
        queryTerms = Seq("dup", "vector", "scan"), topK = 20))
    }
    stage("pagerank_events") {
      // type-transition graph stays small but the windowed edge
      // derivation runs over 10× events (per-user sort pressure)
      consume(ops.Graph.pageRank(ops.Graph.transitionEdges(events),
        iterations = 10))
    }
    stage("preference_leaderboard") {
      // q301's family over 10× baskets: within-order pairwise
      // comparisons collapse to the matchup relation in one map-side-
      // combined pass; the per-item fold never sees comparison grain
      val items = lineitem
        .groupBy(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity")).as("q"))
      val a = items.select(col("ok"), col("pk").as("pk_a"),
        col("q").as("q_a"))
      val b = items.select(col("ok"), col("pk").as("pk_b"),
        col("q").as("q_b"))
      val cmp = a.join(b, Seq("ok"))
        .filter(col("pk_a") < col("pk_b") && col("q_a") =!= col("q_b"))
        .select(
          when(col("q_a") > col("q_b"), col("pk_a")).otherwise(col("pk_b"))
            .as("winner"),
          when(col("q_a") > col("q_b"), col("pk_b")).otherwise(col("pk_a"))
            .as("loser"))
      consume(ops.Preference.leaderboard(cmp))
    }
    stage("ppmi_windowed") {
      // q304's family over 10× docs: ~window·N array-side pairs,
      // map-side-combined counts, GroupedTopK per word — a corpus-wide
      // stop word is the organic hot key this stage carries
      consume(ops.TextAnalysis.windowedPpmi(docs, window = 4,
        minCount = 5, k = 5))
    }
    stage("blocklist_ac_scan") {
      // q310's family at the size the automaton exists for: ~2,000
      // two-word phrases over 10× docs — ONE Aho–Corasick pass per
      // document where the expression tier would pay ~2,000 replace
      // passes; the census stays |phrases|-sized however many hit
      val words = Seq("key", "agg", "row", "scan", "slow", "fast",
        "table", "value", "part", "hash", "merge", "batch", "spark",
        "line", "sort", "window", "big", "small", "filter", "data",
        "column", "join", "customer", "query", "stream", "group",
        "order", "vector", "the", "a", "supplier", "region", "nation",
        "price", "disc", "tax", "ship", "clerk", "comment", "status",
        "flag", "mode", "container", "brand", "type")
      val phrases = for (w1 <- words; w2 <- words if w1 != w2)
        yield s"$w1 $w2"
      consume(ops.TextAnalysis.blocklistCensusAC(docs, phrases))
    }

    stage("video_neardup_robust") {
      // q322's family over the 10× id space: real MJPEG synthesis,
      // container demux + per-frame decode (map-only, one blob per
      // task) feeding the hash-set-generic LSH pair pipeline with the
      // merge-pinned verify — the decode-bound stage of the media
      // curation loop plus a full trim-copy near-dup mine
      val ids = docs.select(col("doc_id"))
      val base = ops.Multimodal.synthesizeAvi(spark, ids, "doc_id")
      val copies = ops.Multimodal.trimVideoCopies(base,
        idOffset = 600000000L, dropFrames = 2)
      consume(ops.Multimodal.videoNearDupPairs(base.unionByName(copies),
        shingleLen = 2, numPerm = 64, bands = 32, threshold = 0.6))
    }

    stage("url_canonical_dedup") {
      // q318/q319's family over the scaled corpus: the crawl's FIRST
      // dedup pass — canonicalization is one map-only codegen regex
      // projection, the dedup one map-side-combined groupBy on the
      // canonical string; ~10k path space × 5 variants gives real
      // group sizes without a planted hot key
      val p = (col("doc_id") % 9973L).cast("string")
      val url = when(col("doc_id") % 5 === 0,
          concat(lit("HTTPS://WWW.Example.COM:443/docs/"), p))
        .when(col("doc_id") % 5 === 1,
          concat(lit("https://www.example.com/docs/"), p, lit("/")))
        .when(col("doc_id") % 5 === 2,
          concat(lit("https://www.example.com/docs/"), p,
            lit("?utm_source=feed&gclid=z")))
        .when(col("doc_id") % 5 === 3,
          concat(lit("https://www.example.com/docs/"), p,
            lit("?b=2&a=1#top")))
        .otherwise(concat(lit("http://www.example.com:8080/docs/"), p,
          lit("?a=1&b=2")))
      consume(ops.Web.urlDedup(
        docs.select(col("doc_id"), url.as("url"))))
    }

    // ---- skewed stages (VERDICT r11 #4) --------------------------------
    // Volume scaling alone inherits sf0.1's benign key distributions; the
    // scale-killers the bounded-state defenses exist for only appear
    // under SKEW — a boilerplate page duplicated across the crawl, a bot
    // account on a chunk of all baskets, one hyperactive user in the
    // event log. Each stage below plants a deliberately hot key at ~0.2–1%
    // of ALL rows (orders of magnitude above any organic key) and names
    // the defense it exercises; rc 0 means the defense held the stage to
    // bounded state and it completed.

    stage("skew_lsh_hot_bucket") {
      // DEFENSE: LSH bucket cap (maxBucket deterministic prefix — pair
      // expansion Σ|bucket|² stays bounded) + CC star convergence.
      // Every 500th doc becomes the SAME boilerplate text → one ~0.2%-of-
      // corpus LSH bucket in all bands and one giant near-dup star.
      val hotDocs = docs.select(col("doc_id"),
        when(col("doc_id") % 500 === 0,
          lit("the exact same boilerplate navigation footer text " +
            "repeated on every mirror of the site"))
          .otherwise(col("text")).as("text"))
      consume(ops.Dedup.clusterNearDups(
        ops.Dedup.minhashNearDupPairs(hotDocs, "doc_id", "text",
          shingleK = 2, numPerm = 64, bands = 16, threshold = 0.8)))
    }
    stage("skew_copurchase_hot_key") {
      // DEFENSE: the GroupedTopK pre-cut in coOccurrencePairs — the hot
      // customer (1% of ALL basket rows) is cut to its maxPerKey lowest
      // items in a BOUNDED partial-aggregation buffer before any pairing;
      // per-key pair work ≤ C(20, 2) regardless of skew.
      val baskets = lineitem.select(
        when(col("l_orderkey") % 100 === 0, lit(-1L))
          .otherwise(col("l_orderkey")).as("cust"),
        col("l_partkey").as("part"))
      consume(ops.Graph.coOccurrencePairs(baskets, "cust", "part",
        maxPerKey = 20))
    }
    stage("skew_pagerank_hot_user") {
      // DEFENSE: the transition-edge derivation aggregates to
      // |distinct (src, dst)| BEFORE PageRank, so one user owning 1% of
      // all events costs one hot window sort (AQE handles the skewed
      // exchange), never a hot rank partition.
      val hotEvents = events.select(col("event_id"),
        when(col("event_id") % 100 === 0, lit(-1L))
          .otherwise(col("user_id")).as("user_id"),
        col("ts"), col("event_type"), col("value"))
      consume(ops.Graph.pageRank(ops.Graph.transitionEdges(hotEvents),
        iterations = 10))
    }

    val total = results.values.sum
    def jmap(m: collection.Map[String, Any]): String =
      m.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val json = s"""{"metric":"soak","sf":"$sfDir","multiplier":$mult,""" +
      s""""rows":${jmap(sizes)},"stage_sec":${jmap(results)},""" +
      s""""stage_rows":${jmap(counts)},""" +
      s""""stage_memory":${jmap(spills)},"total_sec":$total,"rc":0}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    println(json)
    spark.stop()
  }
}
