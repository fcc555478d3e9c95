package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling summary (the ANALYZE/data-quality pass of a pipeline):
  * per-column null count, distinct count, and min/max rendered as strings
  * so heterogeneous column types share one output schema.
  *
  * Everything is computed in ONE aggregation pass over the input — a
  * per-column loop of separate jobs would scan the corpus once per column;
  * this shape scans it once total and unpivots the single result row.
  * `count(DISTINCT)` per column is the exact (oracle-checkable) form; at
  * corpus scale swap `exact = false` to profile with HLL++ registers
  * instead of full distinct-key shuffles.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true,
              rsd: Double = 0.05): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c), rsd))
          .as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single summary row: stack(n, name1, nn1, nd1, mn1, mx1, ...)
    // label literal escaped and generated identifiers backtick-quoted, so a
    // column named "order date" or "o'clock" cannot break the parse
    def lbl(c: String) = "'" + c.replace("'", "''") + "'"
    def id(p: String, c: String) = s"`${(p + c).replace("`", "``")}`"
    val stackArgs = cols.map(c =>
      s"${lbl(c)}, ${id("__nn_", c)}, ${id("__nd_", c)}, ${id("__mn_", c)}, ${id("__mx_", c)}")
      .mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_str, max_str)")
  }

  /** Scale-tier profile with an oracle-checkable error gate. The exact
    * multi-column profile above pays RewriteDistinctAggregates' Expand: N
    * `count(DISTINCT)` columns multiply EVERY input row by N through the
    * aggregate. This shape is Expand-free end to end:
    *
    *   - n_nulls / min / max / HLL estimates: the single-pass `profile`
    *     with `exact = false` (approx_count_distinct is a plain aggregate
    *     — no distinct rewrite, no Expand);
    *   - exact n_distinct: unpivot the input to (col_name, value-string)
    *     via `stack` — a Generate producing two SLIM columns map-side, not
    *     a full-row Expand — then ONE two-phase distinct aggregate over
    *     the union;
    *   - nd_ok: the q71-pattern gate |HLL − exact| ≤ max(1, tol·exact),
    *     tol = 3·rsd, so the oracle checks the exact value AND that the
    *     sketch tier is inside its error contract.
    *
    * At corpus scale you run ONLY the `exact = false` branch and trust the
    * HLL contract; the exact branch exists here so the gate itself is
    * driver-checkable. Caveats: the exact branch counts distinct STRING
    * renderings — identical for all practical column types (Spark's
    * double→string is shortest-roundtrip), diverging only on SQL-equal
    * float pairs like -0.0/0.0. And nd_ok is a ~3-sigma PROBABILISTIC
    * gate: Spark's HLL++ is deterministic for a fixed dataset (the current
    * scale factors pass reproducibly), but changing the profiled columns
    * or scale factor can legitimately flip a gate bit on the error tail —
    * that is the gate doing its job, not a correctness bug.
    *
    * `rsd` parameterizes BOTH sides coherently: the sketch precision
    * (threaded into approx_count_distinct) and the 3·rsd gate tolerance.
    */
  def profileChecked(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    val approx = profile(df, cols, exact = false, rsd = rsd)
      .withColumnRenamed("n_distinct", "__nd_est")
    def lbl(c: String) = "'" + c.replace("'", "''") + "'"
    def idq(c: String) = s"`${c.replace("`", "``")}`"
    val stackArgs = cols.map(c => s"${lbl(c)}, CAST(${idq(c)} AS STRING)")
      .mkString(", ")
    val exact = df
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS (col_name, __v)")
      .groupBy(col("col_name"))
      .agg(countDistinct(col("__v")).as("n_distinct"))
    // LEFT join from the approx side: on an empty input the exact branch
    // groups away to zero rows, but profile() (and the oracle's aggregate
    // shape) still emit one row per column — coalesce keeps that parity
    // (n_distinct = 0, and the gate trivially holds at 0 ≤ max(1, ·))
    val nd = coalesce(col("n_distinct"), lit(0L))
    approx.join(exact, Seq("col_name"), "left")
      .select(col("col_name"), col("n_nulls"), nd.as("n_distinct"),
        col("min_str"), col("max_str"),
        (abs(col("__nd_est") - nd).cast("double") <=
          greatest(lit(1.0), nd.cast("double") * (3.0 * rsd)))
          .as("nd_ok"))
  }

  /** Benford first-digit audit (Newcomb 1881 / Benford 1938, public) —
    * the forensic data-quality check: naturally-occurring multiplicative
    * quantities put digit d first with probability log₁₀(1 + 1/d);
    * fabricated, truncated, or unit-mangled columns don't. Per digit
    * 1–9 (all nine rows always present): observed count, observed share
    * in integer ppm (DIV), the Benford expectation in ppm, and the
    * chi-square contribution (o − e)²/e rounded to 6 — one IEEE op
    * order shared with the oracle. Non-positive values are excluded
    * (they have no leading digit). One scan → 9-row aggregate; the
    * digit extraction is a codegen'd string head on the integer
    * rendering, exact for any BIGINT.
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val counts = df
      .select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v") >= 1)
      .select(substring(col("__v").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = counts.agg(sum(col("n_obs")).as("__n"))
    val digits = df.sparkSession.range(1, 10)
      .select(col("id").as("digit"))
    val pexp = log((col("digit") + lit(1.0)) / col("digit")) /
      log(lit(10.0))
    val ne = col("__n").cast("double") * pexp
    val dd = col("n_obs").cast("double") - ne
    digits.join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("__n"))
      .select(col("digit"), col("n_obs"),
        expr("1000000 * n_obs DIV __n").as("obs_ppm"),
        round(lit(1e6) * pexp).cast("long").as("expected_ppm"),
        round(dd * dd / ne, 6).as("chi2_term"))
  }
}
