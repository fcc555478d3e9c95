package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor for per-row-EXPENSIVE passes (r16, guide §2.5
  * "input skew" / §6 input-split sizing).
  *
  * A Parquet file is splittable only at row-group granularity; a small
  * input (one row group) therefore yields ONE scan partition, and any
  * codec/tokenize/explode pass fused onto that scan runs on one core of
  * the whole session. At production scale inputs carry many row groups
  * and this is a no-op; at bench scale it is the difference between 1×
  * and N× parallelism on the dominant map stage.
  *
  * `spread` round-robins the rows across `defaultParallelism` partitions
  * ONLY when the relation currently has fewer partitions — it never
  * shrinks an already-parallel input (the 100 TB case), so the extra
  * exchange exists exactly when it buys parallelism and carries the
  * pre-expansion rows (ids/text), never the expanded/decoded output.
  * Callers must be order-insensitive downstream (every consumer here
  * aggregates, joins, or sorts — the repo-wide determinism discipline).
  */
object Spread {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
