package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differencing — the pipeline-ops primitive behind incremental
  * corpus updates: given two versions of a keyed table, classify every key
  * as added / removed / changed (content hash differs) / unchanged.
  *
  * Scale shape: each side is reduced to (keys, content-hash) BEFORE the
  * join, so the full-outer shuffle moves a few bytes per row instead of
  * the document payload (the q84/exactByHash discipline — wide columns
  * never shuffle). The join keys are the table's primary key: well-spread,
  * no skew amplification; AQE handles any residual imbalance. Classifying
  * 10^11 rows is one narrow shuffle + a map-side CASE.
  *
  * `hashFn` is pluggable exactly like `fingerprint`'s tokenHash: two-lane
  * xxhash64 in production (collision odds documented at
  * [[Dedup.exactByHash]]); `graft.functions.md5Hash31` where a DuckDB
  * oracle must recompute the hash bit-for-bit.
  */
object Diff {

  def defaultHash(cols: Seq[Column]): Column =
    struct(xxhash64(cols: _*), xxhash64(lit(0x9e3779b9L) +: cols: _*))

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String], compareCols: Seq[String],
                   hashFn: Seq[Column] => Column = defaultHash,
                   includeUnchanged: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty)
    // existence is tracked by a dedicated marker, NOT by hash nullness: a
    // pluggable hashFn may legitimately return NULL (md5 of a NULL text
    // column), and inferring absence from that would misreport a
    // present-on-both-sides key as added/removed
    val o = oldDf.select(keyCols.map(col) ++ Seq(
      hashFn(compareCols.map(col)).as("__oh"), lit(true).as("__oex")): _*)
    val n = newDf.select(keyCols.map(col) ++ Seq(
      hashFn(compareCols.map(col)).as("__nh"), lit(true).as("__nex")): _*)
    val status = when(col("__oex").isNull, "added")
      .when(col("__nex").isNull, "removed")
      // null-safe content compare: NULL hash vs NULL hash = unchanged
      .when(!(col("__oh") <=> col("__nh")), "changed")
      .otherwise("unchanged")
    val res = o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) :+ status.as("status"): _*)
    if (includeUnchanged) res else res.filter(col("status") =!= "unchanged")
  }

  /** Categorical distribution drift between two corpus snapshots — the
    * monitoring primitive a training-data pipeline runs after every
    * ingest: per-category counts and probabilities on each side plus the
    * category's Jensen-Shannon divergence contribution (JS rather than
    * KL: symmetric, and finite when a category exists on only one side).
    * `sum(js_term)` over the output is JSD(v1 ‖ v2) in nats, bounded by
    * ln 2 — alert when it crosses a threshold. For NUMERIC drift, pass a
    * bucketed derivation as `catCol` (e.g. `floor(col/width)` aliased) —
    * the categorical machinery is the histogram comparison.
    *
    * Scale shape: one map-side-combinable count per side (#categories
    * rows each), a categories-sized full-outer join, totals as a 1-row
    * broadcast — the snapshots themselves are never shuffled, only
    * scanned. Probabilities are rounded to 6 BEFORE the JS math and the
    * term after (the round-before-derive discipline), so an independent
    * engine reproduces every row bit-for-bit.
    */
  def distributionDrift(v1: DataFrame, v2: DataFrame,
                        catCol: String): DataFrame =
    distributionDriftFromCounts(
      v1.groupBy(col(catCol)).agg(count(lit(1)).as("n_v1")),
      v2.groupBy(col(catCol)).agg(count(lit(1)).as("n_v2")), catCol)

  /** [[distributionDrift]] from PRE-AGGREGATED per-category counts —
    * the form a streaming monitor stores and re-scores after each
    * micro-batch (category counts are additive across batches, so an
    * upserted snapshot equals the batch aggregation of everything seen;
    * the probability/JS math here is the ONE shared definition). Expects
    * (catCol, n_v1) and (catCol, n_v2).
    */
  def distributionDriftFromCounts(c1: DataFrame, c2: DataFrame,
                                  catCol: String): DataFrame = {
    val joined = c1.join(c2, Seq(catCol), "full_outer")
      .select(col(catCol),
        coalesce(col("n_v1"), lit(0L)).as("n_v1"),
        coalesce(col("n_v2"), lit(0L)).as("n_v2"))
    val totals = joined.agg(sum(col("n_v1")).as("__t1"),
      sum(col("n_v2")).as("__t2"))
    def jsHalf(p: Column, m: Column): Column =
      when(p === 0.0, lit(0.0)).otherwise(lit(0.5) * p * log(p / m))
    val m = (col("p_v1") + col("p_v2")) / 2.0
    joined.crossJoin(broadcast(totals))
      .select(col(catCol), col("n_v1"), col("n_v2"),
        round(col("n_v1") / col("__t1").cast("double"), 6).as("p_v1"),
        round(col("n_v2") / col("__t2").cast("double"), 6).as("p_v2"))
      .withColumn("js_term", round(
        jsHalf(col("p_v1"), m) + jsHalf(col("p_v2"), m), 6))
  }
}
