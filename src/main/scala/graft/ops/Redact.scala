package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — the scrubbing pass a
  * training-data pipeline runs before anything else sees the raw text
  * (emails, phone numbers, IP addresses → typed placeholder tokens).
  *
  * Design notes:
  *  - Pure `regexp_count` / `regexp_replace` column expressions: the whole
  *    operator is a map-only projection inside whole-stage codegen — no
  *    UDF, no shuffle, no state. At 100 TB it runs at scan speed and
  *    composes with any downstream operator without a stage break.
  *  - Every pattern stays inside the regex subset Java (Spark) and RE2
  *    (DuckDB, the oracle engine) evaluate identically: character
  *    classes, bounded repetition, `\b` word boundaries — no lookaround,
  *    no backreferences (NOTES_r2 landmine: RE2 rejects those outright).
  *  - Counts are taken on the SAME intermediate string the corresponding
  *    replace runs on (original → emails removed → IPs removed), so a
  *    substring can never be double-counted by two categories: whatever
  *    the email pass consumed is invisible to the IP pass, exactly like
  *    the sequential redaction itself.
  *
  * Reference scope: the reference (csv2parquet.py / agg.py) has no PII
  * pass — this is part of the §2.11 LLM-pipeline extension surface.
  */
object Redact {

  /** Conservative email shape; `{2,24}` TLD bound keeps RE2 and Java in
    * lockstep on pathological inputs.
    */
  val emailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,24}"

  /** Dotted-quad IPv4 (syntactic — no 0-255 range check, which would need
    * alternations both engines still share, but adds nothing to the
    * redaction demo).
    */
  val ipv4Pattern: String =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** NANP-style 555-867-5309 phone shape. */
  val phonePattern: String =
    "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Adds `n_emails`, `n_ips`, `n_phones` and the fully-redacted text
    * (`outCol`) to `df`. Redaction order: emails → IPs → phones (an email
    * local-part may embed digits-and-dots an IP/phone pattern would
    * otherwise claim).
    */
  def scrub(df: DataFrame, textCol: String = "text",
            outCol: String = "redacted"): DataFrame = {
    val noEmail = regexp_replace(col(textCol), emailPattern, "<EMAIL>")
    df
      .withColumn("n_emails", regexp_count(col(textCol), lit(emailPattern)))
      .withColumn("__no_email", noEmail)
      .withColumn("n_ips", regexp_count(col("__no_email"), lit(ipv4Pattern)))
      .withColumn("__no_ip",
        regexp_replace(col("__no_email"), ipv4Pattern, "<IP>"))
      .withColumn("n_phones", regexp_count(col("__no_ip"), lit(phonePattern)))
      .withColumn(outCol,
        regexp_replace(col("__no_ip"), phonePattern, "<PHONE>"))
      .drop("__no_email", "__no_ip")
  }

  /** Corpus-level PII incidence rollup: documents containing each PII
    * class, total hits, and the redacted-corpus size — the summary a
    * pipeline reports after a scrubbing pass.
    */
  def piiSummary(df: DataFrame, textCol: String = "text"): DataFrame =
    scrub(df, textCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("n_emails") > 0).cast("long")).as("docs_with_email"),
        sum((col("n_ips") > 0).cast("long")).as("docs_with_ip"),
        sum((col("n_phones") > 0).cast("long")).as("docs_with_phone"),
        sum(col("n_emails") + col("n_ips") + col("n_phones")).as("total_hits"),
        sum(length(col("redacted"))).as("redacted_chars"))

  /** Per-source PII exposure census — the governance table a provider
    * review reads ("which supplier ships PII and at what density"):
    * per group, document incidence (any PII class, integer ppm via DIV)
    * and hit density per million characters of the INPUT text. Rides
    * the same map-only [[scrub]] projection; the rollup is a
    * groups-sized aggregate of exact integers.
    */
  def piiBySource(df: DataFrame, srcCol: String = "source",
                  textCol: String = "text"): DataFrame =
    scrub(df, textCol)
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(((col("n_emails") + col("n_ips") + col("n_phones")) > 0)
          .cast("long")).as("docs_with_pii"),
        sum((col("n_emails") + col("n_ips") + col("n_phones"))
          .cast("long")).as("total_hits"),
        sum(length(col(textCol)).cast("long")).as("__chars"))
      .select(col(srcCol), col("n_docs"), col("docs_with_pii"),
        expr("1000000 * docs_with_pii DIV n_docs").as("pii_docs_ppm"),
        col("total_hits"),
        expr("1000000 * total_hits DIV greatest(__chars, 1)")
          .as("hits_per_mchar"))

  /** k-anonymity census over a quasi-identifier tuple — the
    * re-identification audit a release review runs BEFORE shipping a
    * corpus (Sweeney 2002): a row is k-anonymous iff at least k rows
    * share its full quasi-identifier combination, so rows in small QI
    * groups are the re-identifiable ones. For each threshold, reports
    * how many QI groups and rows fall below it and the suppression cost
    * in integer ppm (what you'd have to drop — or generalize — to claim
    * k-anonymity at that level).
    *
    * Shape at 100 TB: ONE groupBy on the QI tuple (map-side combined;
    * the group relation is QI-cardinality-sized, never row-sized), then
    * each threshold is a 1-row aggregate over that small relation —
    * thresholds are a broadcast-exploded constant array, so the group
    * relation is scanned once, not once per threshold. All integers.
    */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String],
                       thresholds: Seq[Int] = Seq(2, 5, 10, 25)): DataFrame = {
    require(qiCols.nonEmpty, "qiCols must be non-empty")
    require(thresholds.nonEmpty && thresholds.forall(_ >= 2) &&
      thresholds.distinct.size == thresholds.size,
      s"thresholds must be distinct and all >= 2: $thresholds")
    val groups = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__k"))
    groups
      .select(col("__k"),
        explode(array(thresholds.map(t => lit(t)): _*)).as("k_threshold"))
      .groupBy(col("k_threshold"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("__k") < col("k_threshold"), 1L).otherwise(0L))
          .as("violating_groups"),
        sum(col("__k")).as("n_rows"),
        sum(when(col("__k") < col("k_threshold"), col("__k")).otherwise(0L))
          .as("violating_rows"))
      .select(col("k_threshold"), col("n_groups"), col("violating_groups"),
        col("n_rows"), col("violating_rows"),
        expr("1000000 * violating_rows DIV n_rows").as("suppression_ppm"))
  }

  /** Global-recoding generalization ladder — the ENFORCEMENT half of
    * [[kAnonymityReport]] (Samarati/Sweeney full-domain generalization):
    * widen the numeric quasi-identifier's bucket by powers of two
    * (level l ⇒ width `baseWidth`·2^l) and, per level, measure what
    * k-anonymity at threshold `k` would still have to suppress. The
    * CHOSEN level is the smallest with zero violating rows — maximal
    * utility under the privacy constraint — falling back to the coarsest
    * level (residual suppression reported as ppm) when even full
    * generalization can't protect every group.
    *
    * Shape at 100 TB: the corpus is scanned ONCE, at the FINEST bucket
    * width (one map-side-combined groupBy → a QI-cardinality-sized
    * relation); every coarser level reaggregates from that small
    * relation, because `n DIV (w·2^l)` = `(n DIV w) DIV 2^l` for
    * non-negative n — buckets nest exactly. Level factors ride as a
    * broadcast-exploded literal array; the chosen level is a 1-row
    * broadcast back over the (levels+1)-row rollup. All integers.
    */
  def generalizationLadder(df: DataFrame, catCols: Seq[String],
                           numCol: String, baseWidth: Int, levels: Int,
                           k: Int): DataFrame = {
    require(baseWidth >= 1 && levels >= 0 && levels <= 32 && k >= 2,
      s"bad params: baseWidth=$baseWidth levels=$levels k=$k")
    val g0 = df
      .groupBy((catCols.map(col) :+
        expr(s"$numCol DIV $baseWidth").as("__b0")): _*)
      .agg(count(lit(1)).as("__k"))
    val factors = explode(array((0 to levels).map(l =>
      struct(lit(l).as("level"), lit(1L << l).as("factor"))): _*)).as("__lf")
    val perLevel = g0
      .select(col("*"), factors)
      .groupBy((catCols.map(col) :+ col("__lf.level").as("level") :+
        expr("__b0 DIV __lf.factor").as("__b")): _*)
      .agg(sum(col("__k")).as("__k"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("__k") < k, 1L).otherwise(0L)).as("violating_groups"),
        sum(col("__k")).as("n_rows"),
        sum(when(col("__k") < k, col("__k")).otherwise(0L))
          .as("violating_rows"))
    val chosenRow = perLevel.agg(
      coalesce(min(when(col("violating_rows") === 0, col("level"))),
        lit(levels)).as("__chosen"))
    perLevel
      .crossJoin(broadcast(chosenRow))
      .select(col("level"),
        expr(s"CAST($baseWidth AS BIGINT) * shiftleft(CAST(1 AS BIGINT), level)")
          .as("bucket_width"),
        col("n_groups"), col("violating_groups"), col("violating_rows"),
        expr("1000000 * violating_rows DIV n_rows").as("suppression_ppm"),
        (col("level") === col("__chosen")).cast("int").as("chosen"))
  }

  /** Per-(QI, sensitive-value) count relation — the shared first pass of
    * [[kAnonymityFromCells]], [[lDiversityReport]] and
    * [[tClosenessReport]], and the COMPLETE mergeable state behind the
    * streaming privacy twin (cell counts sum across batches; every audit
    * below derives from the counts). ONE map-side-combined groupBy over
    * the corpus; everything downstream works on a (QI-cardinality ×
    * sensitive-cardinality)-sized relation, never the row-sized corpus.
    * Rows with a NULL sensitive value are KEPT as their own cell per QI
    * group: k-anonymity group sizes are defined regardless of the
    * sensitive value, so dropping them here would understate __k vs the
    * batch [[kAnonymityReport]]. The distribution audits exclude the
    * null cells themselves — l-diversity's distinct-value count skips
    * them in [[lDiversityFromCells]], and [[tClosenessFromCells]]
    * filters them before the marginals (a null "value" is not a point
    * of the sensitive distribution and would silently join away in the
    * marginal pass otherwise).
    */
  private[graft] def sensitiveCells(df: DataFrame, qiCols: Seq[String],
                                    sensitiveCol: String): DataFrame = {
    require(qiCols.nonEmpty, "qiCols must be non-empty")
    require(!qiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("n_gv"))
  }

  /** k-anonymity census off a [[sensitiveCells]]-shaped relation — the
    * [[kAnonymityReport]] statistic with group sizes reassembled from
    * the cell counts; ONE fold shared by the batch path and the
    * streaming snapshot (StreamingSpec pins multi-batch ≡ one-shot).
    */
  def kAnonymityFromCells(cells: DataFrame, qiCols: Seq[String],
                          thresholds: Seq[Int] = Seq(2, 5, 10, 25))
      : DataFrame = {
    require(thresholds.nonEmpty && thresholds.forall(_ >= 2) &&
      thresholds.distinct.size == thresholds.size,
      s"thresholds must be distinct and all >= 2: $thresholds")
    cells.groupBy(qiCols.map(col): _*)
      .agg(sum(col("n_gv")).as("__k"))
      .select(col("__k"),
        explode(array(thresholds.map(t => lit(t)): _*)).as("k_threshold"))
      .groupBy(col("k_threshold"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("__k") < col("k_threshold"), 1L).otherwise(0L))
          .as("violating_groups"),
        sum(col("__k")).as("n_rows"),
        sum(when(col("__k") < col("k_threshold"), col("__k")).otherwise(0L))
          .as("violating_rows"))
      .select(col("k_threshold"), col("n_groups"), col("violating_groups"),
        col("n_rows"), col("violating_rows"),
        expr("1000000 * violating_rows DIV n_rows").as("suppression_ppm"))
  }

  /** Distinct l-diversity census (Machanavajjhala et al. 2007) — the
    * attribute-disclosure audit k-anonymity misses: a QI group where
    * every row shares one sensitive value re-identifies the attribute
    * even when the group is large. A group is l-diverse iff its rows
    * span at least l DISTINCT sensitive values; per threshold, reports
    * the violating groups/rows and the suppression cost in integer ppm
    * (same report shape as [[kAnonymityReport]], so a release gate can
    * union the two audits).
    *
    * Shape at 100 TB: one corpus groupBy on (QI, sensitive) → cell
    * relation; group sizes and distinct-value counts are a second
    * aggregate OVER THE CELLS (cardinality-sized); thresholds ride a
    * broadcast-exploded literal array. All integers.
    */
  def lDiversityReport(df: DataFrame, qiCols: Seq[String],
                       sensitiveCol: String,
                       thresholds: Seq[Int] = Seq(2, 3, 5)): DataFrame =
    lDiversityFromCells(sensitiveCells(df, qiCols, sensitiveCol), qiCols,
      sensitiveCol, thresholds)

  /** The l-diversity statistic off a [[sensitiveCells]]-shaped relation —
    * ONE fold shared by [[lDiversityReport]] and the streaming snapshot
    * (StreamingSpec pins multi-batch ≡ one-shot). Group sizes (__k) sum
    * EVERY cell, null-sensitive included — group size is defined
    * regardless of the sensitive value — while the diversity count (__l)
    * counts only non-null cells: null is an unknown, not an l-th
    * distinct value (RedactSpec pins both on a null-bearing fixture).
    */
  def lDiversityFromCells(cells: DataFrame, qiCols: Seq[String],
                          sensitiveCol: String,
                          thresholds: Seq[Int] = Seq(2, 3, 5)): DataFrame = {
    require(thresholds.nonEmpty && thresholds.forall(_ >= 2) &&
      thresholds.distinct.size == thresholds.size,
      s"thresholds must be distinct and all >= 2: $thresholds")
    val groups = cells
      .groupBy(qiCols.map(col): _*)
      .agg(count(col(sensitiveCol)).as("__l"), sum(col("n_gv")).as("__k"))
    groups
      .select(col("__l"), col("__k"),
        explode(array(thresholds.map(t => lit(t)): _*)).as("l_threshold"))
      .groupBy(col("l_threshold"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("__l") < col("l_threshold"), 1L).otherwise(0L))
          .as("violating_groups"),
        sum(col("__k")).as("n_rows"),
        sum(when(col("__l") < col("l_threshold"), col("__k")).otherwise(0L))
          .as("violating_rows"))
      .select(col("l_threshold"), col("n_groups"), col("violating_groups"),
        col("n_rows"), col("violating_rows"),
        expr("1000000 * violating_rows DIV n_rows").as("suppression_ppm"))
  }

  /** t-closeness census (Li et al. 2007) — the skew audit l-diversity
    * misses: a group can span many sensitive values yet still leak if
    * its distribution is far from the corpus-wide one. For a categorical
    * sensitive attribute the earth-mover distance is the total-variation
    * distance, TV(g) = ½·Σ_v |n_gv/n_g − n_v/N|, computed here EXACTLY:
    * with the common denominator n_g·N, absent-from-group values
    * contribute (N − Σ_{v∈g} n_v)·n_g, so
    * tv_ppm = 10⁶·(Σ_{v∈g}|n_gv·N − n_v·n_g| + (N − Σ_{v∈g}n_v)·n_g)
    *          DIV (2·n_g·N).
    * Products are decimal(38,0) (DuckDB: HUGEINT) — n_gv·N reaches N²,
    * which overflows int64 past N ≈ 3·10⁹ rows but stays exact in
    * 128-bit far beyond crawl scale (N ≤ 10¹⁴ ⇒ products ≤ 10²⁸). Per
    * threshold, reports groups/rows whose TV exceeds it plus the corpus
    * max — the "how close to compliant" dial.
    *
    * Shape at 100 TB: the corpus groupBy on (QI, sensitive) is the only
    * row-sized pass; the value marginals are a small aggregate of the
    * cell relation joined back broadcast (|values| is small by the
    * audit's premise), while group totals are never a join side — they
    * fall out of the QI-grouped fold itself (see [[tClosenessFromCells]]);
    * thresholds ride a broadcast-exploded literal array. Exact
    * integer/decimal end to end.
    */
  def tClosenessReport(df: DataFrame, qiCols: Seq[String],
                       sensitiveCol: String,
                       tPpmThresholds: Seq[Int] =
                         Seq(100000, 250000, 500000)): DataFrame =
    tClosenessFromCells(sensitiveCells(df, qiCols, sensitiveCol), qiCols,
      sensitiveCol, tPpmThresholds)

  /** The t-closeness statistic off a [[sensitiveCells]]-shaped relation —
    * ONE fold shared by [[tClosenessReport]] and the streaming snapshot
    * (StreamingSpec pins multi-batch ≡ one-shot). Null-sensitive cells
    * (kept by [[sensitiveCells]] for the k-anonymity fold) are excluded
    * up front: a null is not a point of the sensitive distribution.
    *
    * Scale shape: the r13 verdict flagged the previous form's forced
    * `broadcast(groupTotals)` — groupTotals has QI-GROUP cardinality,
    * which at crawl scale with a fine QI (the audit's own sweet spot)
    * reaches 10⁷–10⁸ rows and OOMs the driver. Group totals are now
    * never materialized as a join side at all: one two-level aggregate
    * groups the cells by QI, carrying the per-value (n_gv, n_v) pairs
    * as bounded collect_list state (≤ |sensitive values| per group —
    * the SAME small-|values| premise the broadcast(valueMarginals)
    * already rests on), and the |n_gv·N − n_v·n_g| fold runs as a
    * higher-order `aggregate` once n_g is known. The only broadcasts
    * left are value-cardinality and 1-row (PlanShapeSpec gates the
    * absence of any QI-keyed join).
    */
  def tClosenessFromCells(cells0: DataFrame, qiCols: Seq[String],
                          sensitiveCol: String,
                          tPpmThresholds: Seq[Int] =
                            Seq(100000, 250000, 500000)): DataFrame = {
    require(tPpmThresholds.nonEmpty &&
      tPpmThresholds.forall(t => t >= 0 && t <= 1000000) &&
      tPpmThresholds.distinct.size == tPpmThresholds.size,
      s"thresholds must be distinct ppm in [0, 1000000]: $tPpmThresholds")
    val cells = cells0
      .filter(col(sensitiveCol).isNotNull)
      .withColumn("__n_gv", col("n_gv").cast("decimal(38,0)"))
    val valueMarginals = cells.groupBy(col(sensitiveCol))
      .agg(sum(col("__n_gv")).as("__n_v"))
    val total = valueMarginals.agg(sum(col("__n_v")).as("__N"))
    val tv = cells
      .join(broadcast(valueMarginals), Seq(sensitiveCol))
      .crossJoin(broadcast(total))
      .groupBy(qiCols.map(col): _*)
      .agg(
        sum(col("__n_gv")).as("__n_g"), max(col("__N")).as("__N"),
        sum(col("__n_v")).as("__sv"),
        collect_list(struct(col("__n_gv").as("gv"), col("__n_v").as("nv")))
          .as("__pairs"))
      .withColumn("__s1",
        aggregate(col("__pairs"), lit(0).cast("decimal(38,0)"),
          (acc, p) => acc + abs(p.getField("gv") * col("__N")
            - p.getField("nv") * col("__n_g"))))
      .select(col("__n_g").cast("long").as("__k"),
        expr("""(1000000 * (__s1 + (__N - __sv) * __n_g))
               | DIV (2 * __n_g * __N)""".stripMargin.replace("\n", ""))
          .as("__tv_ppm"))
    tv
      .select(col("__k"), col("__tv_ppm"),
        explode(array(tPpmThresholds.map(t => lit(t)): _*))
          .as("t_ppm_threshold"))
      .groupBy(col("t_ppm_threshold"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("__tv_ppm") > col("t_ppm_threshold"), 1L).otherwise(0L))
          .as("violating_groups"),
        sum(col("__k")).as("n_rows"),
        sum(when(col("__tv_ppm") > col("t_ppm_threshold"), col("__k"))
          .otherwise(0L)).as("violating_rows"),
        max(col("__tv_ppm")).as("max_tv_ppm"))
      .select(col("t_ppm_threshold"), col("n_groups"),
        col("violating_groups"), col("n_rows"), col("violating_rows"),
        col("max_tv_ppm"))
  }

  /** Per-source release-gate scorecard — the capstone that fuses the
    * governance families into ONE text pass: PII incidence (the [[scrub]]
    * chain), blocklist incidence
    * ([[TextAnalysis.blocklistHits]]), the source's worst k-anonymity
    * group over the (source, length-bucket) QI, and its lang diversity,
    * each compared against an explicit gate; `release_ok` = every gate
    * passes. The verdict a data-governance review reads per supplier
    * before a corpus ships.
    *
    * Shape at 100 TB: the corpus is scanned ONCE — PII counts and
    * blocklist hits are map-only projections feeding a single
    * (source, bucket, lang)-grouped map-side-combined aggregate; the
    * per-source rollup, worst-group min, lang count, and gates all work
    * on that cell relation. All integers (ppm via DIV).
    */
  def releaseGateReport(docs: DataFrame, phrases: Seq[String],
                        srcCol: String = "source",
                        langCol: String = "lang",
                        lenCol: String = "n_chars",
                        bucketWidth: Int = 200,
                        textCol: String = "text",
                        maxPiiPpm: Long = 500000L,
                        maxBlockedPpm: Long = 250000L,
                        minGroupK: Long = 4L,
                        minLangs: Long = 5L): DataFrame =
    releaseGateFromCells(
      releaseGateCells(docs, phrases, srcCol, langCol, lenCol, bucketWidth,
        textCol),
      srcCol, langCol, maxPiiPpm, maxBlockedPpm, minGroupK, minLangs)

  /** The (source, length-bucket, lang) cell relation behind
    * [[releaseGateReport]] — doc/PII/blocklist counts at QI grain, the
    * COMPLETE mergeable state for the live release posture (counts sum
    * across batches; the whole scorecard derives from them). ONE
    * text-consuming corpus pass into one map-side-combined aggregate.
    * NULL-text docs are excluded up front so the gate's ppm denominator
    * matches the [[TextAnalysis.blocklistCensus]] family's (which also
    * filters null text) — counting null-text docs as clean would
    * silently dilute the gate ppm on corpora with null text (RedactSpec
    * pins the shared denominator).
    */
  def releaseGateCells(docs: DataFrame, phrases: Seq[String],
                       srcCol: String = "source",
                       langCol: String = "lang",
                       lenCol: String = "n_chars",
                       bucketWidth: Int = 200,
                       textCol: String = "text"): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1: $bucketWidth")
    val nHits = aggregate(
      TextAnalysis.blocklistHits(col(textCol), phrases), lit(0L),
      (acc, x) => acc + x.getField("hits"))
    scrub(docs.filter(col(textCol).isNotNull), textCol)
      .select(col(srcCol), col(langCol),
        expr(s"$lenCol DIV $bucketWidth").as("len_bucket"),
        (coalesce(col("n_emails"), lit(0)) + coalesce(col("n_ips"), lit(0))
          + coalesce(col("n_phones"), lit(0)) > 0).cast("long").as("__pii"),
        (coalesce(nHits, lit(0L)) > 0).cast("long").as("__blocked"))
      .groupBy(col(srcCol), col("len_bucket"), col(langCol))
      .agg(count(lit(1)).as("n_docs_cell"), sum(col("__pii")).as("pii_docs"),
        sum(col("__blocked")).as("blocked_docs"))
  }

  /** The scorecard statistic off a [[releaseGateCells]]-shaped relation —
    * ONE fold shared by the batch report and the streaming snapshot
    * (StreamingSpec pins multi-batch ≡ one-shot). A single aggregation
    * chain (cells → groups → source): no second branch, so the batch
    * path's text scan happens exactly once (PlanShapeSpec gates the
    * single scan); the lang set rides the chain as bounded state
    * (≤ |langs| per group — a low-cardinality sensitive attribute is
    * the audit's own premise).
    */
  def releaseGateFromCells(cells: DataFrame,
                           srcCol: String = "source",
                           langCol: String = "lang",
                           maxPiiPpm: Long = 500000L,
                           maxBlockedPpm: Long = 250000L,
                           minGroupK: Long = 4L,
                           minLangs: Long = 5L): DataFrame = {
    val groups = cells
      .groupBy(col(srcCol), col("len_bucket"))
      .agg(sum(col("n_docs_cell")).as("__k"), sum(col("pii_docs")).as("__p"),
        sum(col("blocked_docs")).as("__b"),
        collect_set(col(langCol)).as("__langs"))
    groups
      .groupBy(col(srcCol))
      .agg(sum(col("__k")).as("n_docs"), min(col("__k")).as("min_group_k"),
        sum(col("__p")).as("__pii"), sum(col("__b")).as("__blocked"),
        size(array_distinct(flatten(collect_list(col("__langs")))))
          .cast("long").as("distinct_langs"))
      .select(col(srcCol), col("n_docs"),
        expr("1000000 * __pii DIV n_docs").as("pii_docs_ppm"),
        expr("1000000 * __blocked DIV n_docs").as("blocked_docs_ppm"),
        col("min_group_k"), col("distinct_langs"))
      .withColumn("release_ok",
        (col("pii_docs_ppm") <= maxPiiPpm &&
          col("blocked_docs_ppm") <= maxBlockedPpm &&
          col("min_group_k") >= minGroupK &&
          col("distinct_langs") >= minLangs).cast("int"))
  }
}
