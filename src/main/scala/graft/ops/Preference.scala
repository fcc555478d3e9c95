package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise-preference aggregation — the post-training data shape
  * (reward-model corpora, eval leaderboards): turn raw (winner, loser)
  * comparison records into per-item rankings WITHOUT iterative float
  * fitting. Bradley-Terry/Elo fits are iterative float updates whose ulp
  * drift compounds across rounds (no final rounding recovers it), so the
  * exactly-replayable tier here is the classical voting-theory pair:
  * Copeland score (±1 per dominated/dominating head-to-head matchup) and
  * Borda count (total raw wins) — both pure int64, both standard
  * leaderboard statistics, and at corpus scale both ONE
  * partial-aggregated pass over the comparison log.
  */
object Preference {

  /** Head-to-head matchup table from a (winner, loser) comparison log:
    * one row per unordered item pair with wins in each direction. The
    * pair key is canonicalized (item_a < item_b) so both directions of
    * the same matchup meet in one row.
    *
    * Shape at 100 TB: map-only canonicalization, then ONE groupBy on the
    * pair key — partial aggregation collapses a hot matchup (two models
    * compared millions of times) to one partial per task before the
    * shuffle. Output is matchup-granular (≤ items²/2 rows, usually far
    * fewer), never comparison-granular.
    */
  def matchups(comparisons: DataFrame, winnerCol: String = "winner",
               loserCol: String = "loser"): DataFrame =
    comparisons
      // a self-comparison (winner = loser — a malformed log row) would
      // fabricate an (x, x) matchup whose two exploded sides double-count
      // x's games; drop it at the door instead
      .filter(col(winnerCol) =!= col(loserCol))
      .select(
        least(col(winnerCol), col(loserCol)).as("item_a"),
        greatest(col(winnerCol), col(loserCol)).as("item_b"),
        when(col(winnerCol) <= col(loserCol), 1L).otherwise(0L).as("__wa"),
        when(col(winnerCol) > col(loserCol), 1L).otherwise(0L).as("__wb"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(sum(col("__wa")).as("wins_a"), sum(col("__wb")).as("wins_b"))

  /** Per-item leaderboard over a (winner, loser) comparison log:
    * Copeland score (+1 for every head-to-head matchup the item wins
    * more often than it loses, −1 for every one it loses more often —
    * drawn matchups contribute 0), Borda count (= total wins), games
    * played, and the integer-ppm win rate (1e6·wins DIV games — the
    * integer-DIV discipline, exact in both engines).
    *
    * Shape: [[matchups]] (one pass), then each matchup row explodes to
    * its two sides via a both-directions array (the q281 symmetrize
    * lesson: ONE subtree, no self-union re-execution) and a per-item
    * aggregate. Everything is int64; ties need no float tiebreak.
    */
  def leaderboard(comparisons: DataFrame, winnerCol: String = "winner",
                  loserCol: String = "loser"): DataFrame =
    leaderboardFromMatchups(matchups(comparisons, winnerCol, loserCol))

  /** The per-item fold off an existing [[matchups]] relation — ONE
    * definition shared by the batch query and the streaming snapshot
    * reader ([[graft.streaming.EventStream.leaderboardFromStore]]), so
    * the live leaderboard equals the batch statistic by construction.
    */
  def leaderboardFromMatchups(m: DataFrame): DataFrame = {
    val sides = m.select(explode(array(
      struct(col("item_a").as("item"), col("wins_a").as("w"),
        col("wins_b").as("l")),
      struct(col("item_b").as("item"), col("wins_b").as("w"),
        col("wins_a").as("l")))).as("__s"))
      .select(col("__s.item").as("item"), col("__s.w").as("w"),
        col("__s.l").as("l"))
    sides.groupBy(col("item"))
      .agg(
        count(lit(1)).as("n_matchups"),
        sum(col("w") + col("l")).as("n_games"),
        sum(col("w")).as("n_wins"),
        sum(when(col("w") > col("l"), 1L).when(col("w") < col("l"), -1L)
          .otherwise(0L)).as("copeland"),
        expr("1000000 * sum(w) DIV sum(w + l)").as("win_ppm"))
  }
}
