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
}
