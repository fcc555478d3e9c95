package graft

import org.apache.spark.sql.functions._
import graft.ops.Preference

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  // 1 beats 2 twice, 2 beats 1 once, 1 beats 3 once, 3 beats 2 once
  private lazy val cmp = Seq(
    (1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L), (3L, 2L)
  ).toDF("winner", "loser")

  test("matchups: canonicalized pair key, directional win counts") {
    val got = Preference.matchups(cmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("wins_a"), r.getAs[Long]("wins_b")))).toMap
    assert(got == Map(
      (1L, 2L) -> ((2L, 1L)),
      (1L, 3L) -> ((1L, 0L)),
      (2L, 3L) -> ((0L, 1L))))
  }

  test("leaderboard: Copeland (+1/-1/0 per matchup), Borda wins, games, " +
    "integer-ppm win rate") {
    val got = Preference.leaderboard(cmp).collect()
      .map(r => r.getAs[Long]("item") ->
        ((r.getAs[Long]("n_matchups"), r.getAs[Long]("n_games"),
          r.getAs[Long]("n_wins"), r.getAs[Long]("copeland"),
          r.getAs[Long]("win_ppm")))).toMap
    // item 1: beats 2 (2-1) and 3 (1-0) → copeland +2, 3/4 wins
    assert(got(1L) == ((2L, 4L, 3L, 2L, 750000L)))
    // item 2: loses both matchups → copeland −2, 1/4 wins
    assert(got(2L) == ((2L, 4L, 1L, -2L, 250000L)))
    // item 3: loses to 1, beats 2 → copeland 0, 1/2 wins
    assert(got(3L) == ((2L, 2L, 1L, 0L, 500000L)))
  }

  test("self-comparisons (winner = loser) are dropped, not fabricated " +
    "into an (x, x) matchup") {
    val dirty = Seq((1L, 2L), (1L, 1L), (2L, 2L)).toDF("winner", "loser")
    val m = Preference.matchups(dirty).collect()
    assert(m.length == 1 &&
      m.head.getLong(0) == 1L && m.head.getLong(1) == 2L)
    val lb = Preference.leaderboard(dirty).collect()
      .map(r => r.getAs[Long]("item") -> r.getAs[Long]("n_games")).toMap
    assert(lb == Map(1L -> 1L, 2L -> 1L))
  }

  test("drawn matchup contributes 0 to Copeland but counts games") {
    val draw = Seq((1L, 2L), (2L, 1L)).toDF("winner", "loser")
    val got = Preference.leaderboard(draw).collect()
      .map(r => r.getAs[Long]("item") ->
        ((r.getAs[Long]("copeland"), r.getAs[Long]("n_games"),
          r.getAs[Long]("win_ppm")))).toMap
    assert(got(1L) == ((0L, 2L, 500000L)))
    assert(got(2L) == ((0L, 2L, 500000L)))
  }
}
