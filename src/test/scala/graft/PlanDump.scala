package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: dump formatted physical plans of the headline queries to
  * PLANS.md — reviewable evidence of the plan shapes the library depends
  * on at scale (pushdown, broadcast vs shuffle joins, partial aggregation,
  * TakeOrdered, map-only LSH, the custom GroupedTopK operator).
  *
  *   sbt "Test/runMain graft.PlanDump"
  */
object PlanDump {

  private val picks = Seq(
    "q01_pricing_summary" -> "partial+final hash aggregation (map-side combine)",
    "q03_filter" -> "predicate pushdown into the Parquet scan",
    "q04_regional_revenue" -> "broadcast dimension joins; fact side never shuffles",
    "q09_topk_orders" -> "top-k as TakeOrderedAndProject (no global sort)",
    "q26_minhash_sigs" -> "map-only LSH signatures: zero exchanges",
    "q32_embedding_neardup" -> "block-partitioned exact all-pairs: equi-joins only, no corpus broadcast",
    "q33_minhash_lsh_neardup" -> "full LSH pipeline: sig → banding agg → verify join",
    "q42_shipping_priority" -> "TPC-H Q3 shape: selective broadcast → agg → top-k",
    "q45_grouped_topk" -> "custom GroupedTopK: partial → exchange → final, no window sort",
    "q48_volume_shipping" -> "date-range pushdown + double nation broadcast",
    "q51_sessionization" -> "both window passes share one (user_id) shuffle+sort",
    "q54_winnow_fingerprints" -> "winnowing fingerprints: map-only until the caller groups",
    "q81_tfidf_top_terms" -> "TF-IDF: term-partitioned df join, 1-row N broadcast, GroupedTopK finish",
    "q85_contamination_check" -> "contamination: corpus reduces to fingerprint set, batch semi-joins on it",
    "q86_quantize_int8" -> "int8 quantization: map-only, zero exchanges",
    "q88_range_join" -> "range join: interval→bucket explode, probe equi-join, no nested loop",
    "q96_unigram_lm_score" -> "unigram LM: vocabulary-partitioned join, 1-row total broadcast",
    "q100_training_pipeline" -> "pipeline capstone: clean+gate+dedup+pack stages fuse into one scan",
    "q103_exists_windowed_anti" -> "SQL NOT EXISTS over a windowed subquery: plans as a left-anti join",
    "q104_sql_top1_per_key" -> "SQL row_number top-1: RowNumberTopKRewrite replans the window as GroupedTopK",
    "q107_repetition_flags" -> "repetition filters: (doc,bigram)-keyed two-level aggregate, no corpus-wide hot key",
    "q108_mixture_sample" -> "mixture sampling: domain rates aggregate broadcasts back, corpus gate is map-only",
    "q109_token_budget_trim" -> "budget trim: window only over the (domain,bucket) histogram, kept set broadcast-semi-joins the corpus",
    "q112_pii_redaction" -> "PII scrub: one codegen'd projection over the scan, zero exchanges",
    "q113_bigram_lm_score" -> "bigram LM: checkpointed (doc,bigram,tf) core, one vocabulary-sized score-table join",
    "q116_ewma_daily" -> "EWMA: daily rollup shuffle only, per-key bounded array fold in a projection",
    "q117_fuzzy_name_pairs" -> "fuzzy ED-1 pairs: deletion-key equi-join + levenshtein confirm, no nested loop",
    "q119_pq_codes" -> "PQ encode+ADC: codebook broadcast, per-row argmin projection, zero data shuffle",
    "q120_zorder_key" -> "z-order key: statically-unrolled interleave, single codegen'd projection",
    "q125_ivfpq_residual_topk" -> "residual IVF-PQ: cell-pruned candidates, broadcast codebook + per-cell query residuals, ADC top-k",
    "q126_ivfpq_indexed" -> "persisted IVF-PQ: partition-pruned stored-codes scan, no assign/encode recompute — only the 1-row query lookup touches the corpus",
    "q127_ivfpq_residual_indexed" -> "persisted residual IVF-PQ: the per-query residual subtree is gone — build-time cost, search reads pruned codes",
    "q128_ivf_batch_topk" -> "batch ANN: one corpus assignment, distributed probe routing, single candidate equi-join, GroupedTopK per probe",
    "q129_ivfpq_batch_topk" -> "batch PQ over the persisted index: routing table carries per-(probe,cell) ADC references, one codes scan",
    "q134_chunk_dedup" -> "chunk dedup: checkpointed single-tokenize chunks, hash-keyed partial+final keeper aggregate, in-order reassembly",
    "q138_rotated_pq" -> "rotated PQ: 64 codegen'd dot products rotate in the scan projection, corpus side map-only",
    "q139_ivfpq_refined" -> "refined search: pruned stored-codes shortlist, broadcast semi-join raw fetch, exact re-rank as TakeOrdered",
    "q141_event_funnel" -> "funnel: per-step pushed-down scans, narrow frontier joins, partial-aggregated first-touch minima",
    "q167_rolling_active_users" -> "rolling WAU: explode sits ABOVE the (day,user) dedup aggregate, rolling count is an aggregate not a window",
    "q169_dsir_weights" -> "DSIR: checkpointed (doc,bucket,count) core, bucket-sized lambda table broadcast back, integer scoring aggregate",
    "q172_fuzzy_part_pairs" -> "Jaro-Winkler ER: first-token block equi-join bounds candidates, codegen'd similarity in the verify filter",
    "q173_temperature_mixture" -> "temperature mixture: domain-rate aggregate broadcasts back, corpus gate map-only pre-shuffle",
    "q176_containment_pairs" -> "containment: min-shingle anchor equi-join, sorted-hash intersect verify, no all-pairs scan",
    "q198_cross_source_dups" -> "cross-source dups: text hashes to 60-bit in the scan stage, distinct + pair join shuffle hashes only",
    "q203_quantile_normalize" -> "quantile normalization: ONE source-partitioned exchange serves both the rank and count windows",
    "q204_source_divergence" -> "source JS divergence: single tokenize, vocab-sized pair fan-out, nano-snapped integer sum aggregate",
    "q214_bm25_indexed" -> "persisted BM25: postings scan pruned to the query terms' buckets (SelectedBucketsCount), no corpus re-read",
    "q218_ks_pairs" -> "pairwise KS: count reduction first, pair-keyed cumulative windows over the support, integer cross-products",
    "q242_quality_roc_report" -> "rank-sum AUC: corpus-sized work stops at the distinct-score aggregate; the cumulative window input is the bounded score domain",
    "q245_psi_drift" -> "PSI: reference bin edges broadcast back, map-side binning, window-free — one (groups × bins)-sized aggregate",
    "q253_pack_partners" -> "pack assignment: interval table broadcasts onto the per-length rank, partner map is an (id, id)-keyed join",
    "q259_last_touch_attribution" -> "attribution: ONE per-user carry-forward window (no self-join), channels-sized rollup",
    "q264_corpus_health" -> "corpus health post-fix: all five monitor branches read the ONE checkpointed base — zero FileScans in the composed plan",
    "q271_image_decode_resize" -> "real codec tier: metadata-only needs_resize filter sits UNDER the mapPartitions decode — in-budget blobs never deserialize",
    "q276_incremental_clusters" -> "incremental clusters: batch pairs mined via band-bucket equi-joins, star edges from the stored relation, CC over the union",
    "q281_copurchase_partners" -> "co-occurrence post-fix: GroupedTopKPartial/Final pre-cut bounds per-key state BEFORE the basket collect; pair fan-out ≤ C(maxPerKey,2)",
    "q284_zorder_scan" -> "z-ordered layout read-back: both range predicates pushed into the parquet scan over the clustered table",
    "q285_bloom_lookup" -> "bloom layout read-back: point predicate pushed into the scan; row-group skipping proven footer-level in ZOrderSpec",
    "q286_skew_report" -> "skew report: partial-aggregated key counts, broadcast 1-row totals, TakeOrderedAndProject top-k — no global sort",
    "q288_source_sample" -> "per-group exact-n sample: GroupedTopK bounded buffers on the portable hash — no per-group window sort",
    "q289_systematic_sample" -> "systematic weighted sample: two-level prefix scan (bucket windows + buckets-sized tiny window), broadcast total, integer containment filter — no single-partition corpus sort",
    "q290_video_scene_cuts" -> "scene cuts over decoded MJPEG frames: map-only demux+decode, one (media_id) window for the lag, partial-aggregated rollup",
    "q292_video_dup_groups" -> "video perceptual dedup: map-only frame decode, two partial-aggregated hash aggregations (per-video fingerprint, then dup groups) — no window, no self-join",
    "q295_image_neardup_indexed" -> "aHash index probe: banded equi-join against the bucketed index (read in place), distinct candidates, bit_count Hamming verify — no all-pairs scan",
    "q299_reference_lm_filter" -> "cross-corpus reference LM: vocabulary-sized count build side (broadcast), target text never shuffles, 1-row T+V+1 ride",
    "q300_perceptron_train" -> "perceptron round: ONE partial-aggregated scan (count + d conditional sums) under literal weights — the Lloyd-loop discipline",
    "q301_preference_leaderboard" -> "preference leaderboard: matchup-granular after one map-side-combined pass, both-directions explode off one subtree, partial-aggregated per-item fold",
    "q304_windowed_ppmi" -> "windowed PPMI: array-side pair generation (Generate, no positions self-join), broadcast vocabulary-sized marginal joins, GroupedTopK per word",
    "q305_bitext_mining" -> "bitext mining: block-grid cross-score (no corpus broadcast, no nested loop), GroupedTopK for both kNN directions and both argmax ranks",
    "q306_multimodal_packing" -> "VLM window census: two-level prefix scan, docs explode to exactly their windows, partial-aggregated per-window fold",
    "q307_l_diversity" -> "l-diversity: one corpus groupBy on (QI, sensitive), threshold census over the cell-sized relation, broadcast-exploded thresholds",
    "q308_t_closeness" -> "t-closeness: decimal(38,0) exact TV distance; group totals fall out of the two-level QI aggregate (bounded pair-list state, NO QI-keyed join), only value marginals and the 1-row total broadcast",
    "q309_blocklist_census" -> "blocklist census: text consumed in ONE map-only projection (single scan, n_docs piggybacked on the phrase rollup), |phrases|-sized partial+final aggregate",
    "q310_blocklist_ac" -> "blocklist AC tier: broadcast automaton in mapPartitions (DeserializeToObject span), sparse hits re-aggregate, zero rows rejoin broadcast",
    "q311_integer_kmeans" -> "integer k-means final round: argmin over k literal centroids (zip_with/aggregate folds), one partial-aggregated report fold",
    "q312_release_gate" -> "release gate: ONE corpus scan through a single (source, bucket, lang) aggregation chain — no second branch, langs as bounded set state",
    "q313_kcenter_coreset" -> "k-center: portable-hash pool gate pushed to the scan; per-round argmax is TakeOrdered(1) over the checkpointed pool",
    "q314_image_phash" -> "pHash: map-only codec tier (metadata kind filter before any deserialization), zero exchanges before the output-sized projection",
    "q315_phash_neardup_pairs" -> "pHash near-dup: the generic banded Hamming self-join over renamed lanes — equi-join on (band_id, band_val), distinct candidates, bit_count verify, no all-pairs scan",
    "q316_bradley_terry" -> "Bradley-Terry MM round: matchup-sized aggregate with the items-sized strength relation joined back BROADCAST twice; per-round checkpoints keep the plan linear in rounds",
    "q317_ppmi_power_iteration" -> "PPMI power iteration: edge-list matvec (equi-join + partial-aggregated sum, decimal-exact), 1-row max broadcast renorm, checkpointed per-round iterates",
    "q318_url_canonicalize" -> "URL canonicalization: ONE map-only whole-stage-codegen projection — regexp/split/sort expressions, zero exchanges",
    "q319_url_dedup" -> "URL dedup: map-only canonicalization into one map-side-combined groupBy on the canonical key",
    "q320_audio_spectral_fp" -> "sequency audio fingerprint: map-only codec tier over audio rows only, no exchange before the output-sized projection",
    "q321_audio_spectral_dup_indexed" -> "spectral audio index probe: batch-side decode map-only, equi-join on (spectral_fp, n_samples) against the bucketed index read in place",
    "q322_video_neardup_robust" -> "robust video near-dup: per-frame decode map-only, one groupBy to frame-shingle sets, banded LSH candidates, MERGE-PINNED verify joins (no corpus-derived broadcast)",
    "q323_ppmi_rank2" -> "rank-2 PPMI deflation: edge-list matvec unchanged (equi-join + partial aggregate); deflation is a vocab-sized projection join + 1-row broadcast scalars per round, u*uT never materialized",
    "q324_trigram_kn_lm" -> "interpolated-KN trigram: every level a map-side-combined count aggregate, level joins at n-gram-TYPE granularity, one join back to the doc-granular relation",
    "q325_main_content" -> "main-content extraction: ONE whole-stage-codegen projection (split + per-block regex metrics in a higher-order filter), zero exchange",
    "q326_video_neardup_indexed" -> "incremental video dedup: batch decode map-only; banded candidates equi-join the bucketed sig table read IN PLACE; stored sets side merge-pinned",
    "q327_ref_trigram_kn" -> "cross-corpus KN: reference count tables built once at type granularity; target types LEFT-join them (missing rows are the backoff signal), one join back to the doc-granular relation",
    "q328_video_containment" -> "deep-trim containment: min-shingle anchor join shuffles scalars only (row_number caps, no array across the candidate exchange); arrays fetched once per surviving pair")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb ++= "# Physical plans of headline queries (generated by `sbt \"Test/runMain graft.PlanDump\"`)\n\n"
    sb ++= "Formatted `explain` output at sf0.001 — regenerate after plan-affecting changes.\n"
    sb ++= "The PlanShapeSpec gates assert the load-bearing properties named below.\n"
    for ((name, why) <- picks) {
      val df = SparkEntry.queries(name)(spark, sf)
      sb ++= s"\n## $name — $why\n\n```\n"
      sb ++= df.queryExecution.explainString(FormattedMode).trim
      sb ++= "\n```\n"
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${picks.length} plans)")
    spark.stop()
  }
}
