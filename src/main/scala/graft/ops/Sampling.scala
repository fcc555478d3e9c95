package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (north-star
  * extension). `df.sample()` is seed-dependent per partitioning and not
  * reproducible across engines or re-partitionings; hash-gating on a key
  * IS: a row's membership depends only on its key, so samples are stable
  * under re-runs, repartitioning, and incremental appends (the property
  * held-out/eval splits need). Map-only — no shuffle, fully pushdown-
  * friendly.
  */
object Sampling {

  /** Keep rows whose key hashes into the first `percent` buckets of 100.
    * Production flavor: xxhash64 (fast, codegen'd).
    */
  def hashSample(df: DataFrame, keyCol: String, percent: Int,
                 seed: Long = 42L): DataFrame = {
    require(percent >= 0 && percent <= 100, "percent must be in [0, 100]")
    df.filter(pmod(xxhash64(lit(seed), col(keyCol)), lit(100)) < percent)
  }

  /** Oracle-parity flavor: same gating with the portable md5-derived hash
    * (`graft.functions.md5Hash31`) that DuckDB computes identically —
    * used where a cross-engine-reproducible split matters more than speed.
    * The percent may be a per-row Column (stratified rates, e.g. by
    * language) — ONE definition of the gate for both the flat and
    * stratified forms, so the hash/bucket math cannot drift.
    *
    * The rate is range-checked PER ROW (raise_error on a value outside
    * [0, 100]) — the Int overload's require() can't see inside a Column,
    * and a bad stratum rate would otherwise silently yield an empty or
    * full stratum. NULL rates pass through (NULL < gate is NULL → row
    * filtered), matching SQL comparison semantics.
    */
  def hashSamplePortable(df: DataFrame, keyCol: String, percent: Column): DataFrame = {
    val checked = when(percent.isNull || (percent >= 0 && percent <= 100), percent)
      .otherwise(raise_error(concat(
        lit("hashSamplePortable: percent must be in [0, 100], got "),
        percent.cast("string"))).cast("int"))
    df.filter(graft.functions.md5Hash31(col(keyCol).cast("string")) % 100 < checked)
  }

  def hashSamplePortable(df: DataFrame, keyCol: String, percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100, "percent must be in [0, 100]")
    hashSamplePortable(df, keyCol, lit(percent))
  }

  /** Disjoint train/heldout split columns from the same hash — every row
    * gets exactly one label; changing `heldoutPercent` only MOVES the
    * boundary (rows never swap between arbitrary splits on re-runs).
    */
  def splitLabel(keyCol: Column, heldoutPercent: Int, seed: Long = 42L): Column =
    when(pmod(xxhash64(lit(seed), keyCol), lit(100)) < heldoutPercent, "heldout")
      .otherwise("train")

  /** Deterministic weighted sample without replacement (the
    * Efraimidis–Spirakis A-ES scheme): each row gets key u^(1/w) with u a
    * deterministic uniform derived from the portable hash of its id, and
    * the k largest keys are the sample — inclusion probability scales
    * with `weightCol` (importance sampling by quality/length scores).
    * Deterministic twin of the classic randomized reservoir: re-runs,
    * repartitionings, and an independent engine pick the SAME rows.
    * Map-only scoring + TakeOrderedAndProject top-k — no shuffle of the
    * corpus. A non-positive weight gets sentinel key −1 (valid keys live
    * in [0,1]), i.e. sampled only after every positive-weight row — the
    * `when` guard keeps ANSI mode from throwing on 1/0.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val u = (graft.functions.md5Hash31(col(idCol).cast("string")) % 1000003L)
      .cast("double") / 1000003.0
    // rounded BEFORE ranking: pow differs by a last-ulp across libms, and
    // an unrounded rank boundary could select different rows in an
    // independent engine (ties the rounding introduces break on idCol)
    val key = when(col(weightCol) > 0,
      round(pow(u, lit(1.0) / col(weightCol).cast("double")), 9))
      .otherwise(lit(-1.0))
    df.withColumn("__wkey", key)
      .orderBy(desc("__wkey"), col(idCol))
      .limit(k)
      .drop("__wkey")
  }
}
