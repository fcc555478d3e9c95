package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph operators over relational event data (north-star extension;
  * SURVEY.md §2.11): edge derivation from event sequences and weighted
  * PageRank — the classic link-analysis primitive (Page et al. 1999,
  * public), useful in a training-data pipeline for source/domain authority
  * weighting and for ranking entities in interaction graphs.
  *
  * Scale design: the graph lives as two relations — nodes(node) and
  * edges(src, dst, weight) — partitioned by their keys; every iteration is
  * one equi-join + one partial-aggregated groupBy, both shuffling only
  * (id, double) pairs. Nothing graph-sized ever reaches the driver: the
  * per-round dangling mass is a scalar aggregate (the CC-convergence
  * pattern in [[Dedup.clusterNearDups]]).
  */
object Graph {

  /** Directed weighted transition edges between consecutive `typeCol`
    * values per `userCol`, ordered by (`tsCol`, `idCol`) — the id breaks
    * timestamp ties deterministically. One window pass over the event log,
    * then a partial-aggregated count: the edge relation is
    * |distinct (src, dst)|-sized, not event-sized.
    */
  def transitionEdges(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts", idCol: String = "event_id",
                      typeCol: String = "event_type"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .select(col(typeCol).as("dst"), lag(col(typeCol), 1).over(w).as("src"))
      .filter(col("src").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("weight"))
  }

  /** Weighted PageRank with damping over edges(src, dst, weight): rank
    * flows along out-edges proportionally to weight; dangling-node mass is
    * redistributed uniformly. Runs EXACTLY `iterations` rounds — no
    * convergence early-exit, deliberately: the result contract is "the
    * fixed-point iterate after N rounds", which a SQL oracle can replay by
    * unrolling N layers ([[pageRankOracleSql]]); a data-dependent exit
    * would make the unroll depth unknowable.
    *
    * Determinism: ranks are rounded to `roundTo` decimals after every
    * round (and at init), so both engines feed identical inputs into the
    * next round; driver-computed scalars replicate the oracle's IEEE op
    * order — (1 − damping)/n as subtract-then-divide, dm/n as one
    * division — and edge normalization is materialized as weight/outdeg
    * BEFORE multiplying by rank, in both engines.
    *
    * Per-round plan: ranks ⋈ normalized-edges on node = src (both sides
    * keyed, narrow), partial-aggregated sum by dst, left join back to
    * nodes. Each round's result is localCheckpointed and the superseded
    * round released immediately (the [[Similarity.kmeansCentroids]] block
    * hygiene); nodes and the normalized edge relation checkpoint once and
    * release before return.
    */
  def pageRank(edges: DataFrame, iterations: Int = 10, damping: Double = 0.85,
               roundTo: Int = 6): DataFrame =
    pageRankImpl(edges, None, iterations, damping, roundTo)

  /** Personalized PageRank: teleport mass goes to the `sources` node set
    * (first column) instead of uniformly everywhere — "rank nodes by
    * random-walk proximity to these seeds", the standard recommendation /
    * related-entity primitive. Same iteration, dangling rule, rounding,
    * and unrolled-oracle contract as [[pageRank]] (which is the
    * sources = all-nodes special case — one shared implementation, so the
    * two cannot drift).
    */
  def personalizedPageRank(edges: DataFrame, sources: DataFrame,
                           iterations: Int = 10, damping: Double = 0.85,
                           roundTo: Int = 6): DataFrame =
    pageRankImpl(edges, Some(sources), iterations, damping, roundTo)

  private def pageRankImpl(edges: DataFrame, sources: Option[DataFrame],
                           iterations: Int, damping: Double,
                           roundTo: Int): DataFrame = {
    require(iterations >= 1, s"iterations ($iterations) must be >= 1")
    val release = org.apache.spark.sql.graftbridge.ColumnBridge.releaseLocalCheckpoint _
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
    // teleport membership rides the node relation as a flag
    val flagged = (sources match {
      case None => nodes.withColumn("__insrc", lit(true))
      case Some(src) =>
        val set = src.select(col(src.columns.head).as("node")).distinct()
          .withColumn("__f", lit(1))
        nodes.join(set, Seq("node"), "left")
          .select(col("node"), col("__f").isNotNull.as("__insrc"))
    }).localCheckpoint()
    // teleport-set size: the normalizer for init, base, and dangling mass
    val n = flagged.filter(col("__insrc")).count()
    require(n > 0, "pageRank: teleport set is empty — no nodes to rank " +
      "(an empty graph or disjoint source set would divide by zero)")
    val outdeg = edges.groupBy("src").agg(sum(col("weight")).as("__od"))
    val norm = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), (col("weight") / col("__od")).as("__norm"))
      .localCheckpoint()
    // dangling = nodes with no out-edge; their set is iteration-invariant,
    // only their current rank mass changes
    val dangling = flagged.select("node")
      .join(norm.select("src").distinct(),
        col("node") === col("src"), "left_anti")
      .localCheckpoint()
    val base = (1.0 - damping) / n // subtract-then-divide, as the oracle
    def teleport(perMember: Double): Column =
      when(col("__insrc"), lit(perMember)).otherwise(lit(0.0))
    var ranks = flagged
      .select(col("node"), round(teleport(1.0 / n), roundTo).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val dm = ranks.join(dangling, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0))).collect()(0).getDouble(0)
      val contrib = ranks.drop("__insrc")
        .join(norm, col("node") === col("src"))
        .groupBy("dst").agg(sum(col("rank") * col("__norm")).as("__contrib"))
      val next = flagged.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"), col("__insrc"),
          round(teleport(base) + lit(damping) *
            (coalesce(col("__contrib"), lit(0.0)) + teleport(dm / n)),
            roundTo).as("rank"))
        .localCheckpoint()
      release(ranks)
      ranks = next
    }
    release(flagged); release(norm); release(dangling)
    ranks.select("node", "rank")
  }

  /** DuckDB oracle for [[pageRank]] over an `edges(src, dst, w)` CTE:
    * the SAME iteration structure unrolled to `iterations` SQL layers, so
    * both engines execute identical arithmetic round by round (the
    * zorder2Sql single-source-of-truth pattern). Numeric literals are cast
    * to DOUBLE — DuckDB parses bare `0.85` as DECIMAL, whose arithmetic
    * diverges from IEEE doubles. Every CTE is MATERIALIZED: each layer
    * references its predecessor twice (dangling mass + contributions), so
    * inlined CTEs would double the expression tree per layer — a 2^N
    * blowup that hangs the oracle at N = 10.
    */
  def pageRankOracleSql(edgesCte: String, iterations: Int,
                        damping: Double = 0.85, roundTo: Int = 6,
                        sourcesCte: Option[String] = None): String = {
    val d = s"(${damping.toString})::DOUBLE"
    val flagSql = sourcesCte match {
      case None => "TRUE AS insrc"
      case Some(src) =>
        s"(EXISTS (SELECT 1 FROM $src s WHERE s.node = nodes0.node)) AS insrc"
    }
    val header =
      s"""nodes0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM $edgesCte
         |  UNION SELECT DISTINCT dst AS node FROM $edgesCte),
         |nodes AS MATERIALIZED (SELECT nodes0.node, $flagSql FROM nodes0),
         |nn AS MATERIALIZED (
         |  SELECT CAST(count(*) AS BIGINT) AS n FROM nodes WHERE insrc),
         |nrm AS MATERIALIZED (SELECT e.src, e.dst, e.w / o.od AS norm
         |  FROM $edgesCte e
         |  JOIN (SELECT src, sum(w) AS od FROM $edgesCte GROUP BY src) o
         |    USING (src)),
         |r0 AS MATERIALIZED (
         |  SELECT node, round(CASE WHEN insrc THEN (1.0::DOUBLE) / nn.n
         |                          ELSE (0.0)::DOUBLE END, $roundTo) AS rank
         |  FROM nodes CROSS JOIN nn)""".stripMargin
    val layers = (1 to iterations).map { i =>
      val prev = s"r${i - 1}"
      s"""dg$i AS MATERIALIZED (
         |  SELECT coalesce(sum(rank), (0.0)::DOUBLE) AS dm FROM $prev
         |  WHERE node NOT IN (SELECT DISTINCT src FROM nrm)),
         |c$i AS MATERIALIZED (
         |  SELECT e.dst, sum(r.rank * e.norm) AS contrib
         |  FROM $prev r JOIN nrm e ON r.node = e.src GROUP BY e.dst),
         |r$i AS MATERIALIZED (SELECT nodes.node,
         |    round(CASE WHEN insrc THEN (1 - $d) / nn.n
         |               ELSE (0.0)::DOUBLE END + $d *
         |      (coalesce(c.contrib, (0.0)::DOUBLE) +
         |       CASE WHEN insrc THEN dg.dm / nn.n ELSE (0.0)::DOUBLE END),
         |      $roundTo) AS rank
         |  FROM nodes CROSS JOIN nn CROSS JOIN dg$i dg
         |  LEFT JOIN c$i c ON nodes.node = c.dst)""".stripMargin
    }
    (header +: layers).mkString(",\n") +
      s"\nSELECT node, rank FROM r$iterations"
  }
}
