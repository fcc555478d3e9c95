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

  /** Plain-Scala replay of the integer MM recursion — an independent
    * implementation (maps and loops, no Spark) the operator must match
    * exactly, the q300-perceptron test discipline.
    */
  private def btReplay(games: Seq[(Long, Long)], rounds: Int)
      : Map[Long, Long] = {
    val pairs = games.groupBy { case (w, l) =>
      (math.min(w, l), math.max(w, l)) }
      .map { case ((a, b), g) =>
        (a, b, g.count(_._1 == a).toLong, g.count(_._1 == b).toLong) }.toSeq
    val items = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val winsOf = items.map(i => i -> pairs.collect {
      case (a, _, wa, _) if a == i => wa
      case (_, b, _, wb) if b == i => wb }.sum).toMap
    var s = items.map(_ -> 1000000L).toMap
    for (_ <- 1 to rounds) {
      val d = items.map { i =>
        i -> pairs.collect {
          case (a, b, wa, wb) if a == i || b == i =>
            val opp = if (a == i) b else a
            (wa + wb) * 1000000000L / math.max(s(i) + s(opp), 1L)
        }.sum
      }.toMap
      val raw = items.map(i =>
        i -> winsOf(i) * 1000000000L / math.max(d(i), 1L)).toMap
      val mx = raw.values.max
      s = items.map(i => i -> raw(i) * 1000000L / math.max(mx, 1L)).toMap
    }
    s
  }

  test("bradleyTerryFit replays the integer MM recursion exactly and " +
    "orders a transitive tournament consistently with Copeland") {
    // transitive: 1 > 2 > 3, with 1 also beating 3 (no cycles); uneven
    // win counts make the strengths informative beyond the ordering
    val games = Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 3L), (2L, 3L),
      (1L, 3L), (1L, 3L), (2L, 1L), (3L, 2L))
    val df = games.toDF("winner", "loser")
    val got = Preference.bradleyTerryFit(df, rounds = 3).collect()
      .map(r => r.getAs[Long]("item") ->
        ((r.getAs[Long]("strength_micro"), r.getAs[Long]("n_wins"),
          r.getAs[Long]("n_games")))).toMap
    val expect = btReplay(games, rounds = 3)
    assert(got.view.mapValues(_._1).toMap == expect,
      s"got=$got expect=$expect")
    // max-normalization: the strongest item sits exactly at 1e6
    assert(got.values.map(_._1).max == 1000000L)
    // strength order ≡ Copeland order on the transitive fixture
    val cope = Preference.leaderboard(df).collect()
      .map(r => r.getAs[Long]("item") -> r.getAs[Long]("copeland")).toMap
    val byStrength = got.toSeq.sortBy(-_._2._1).map(_._1)
    val byCopeland = cope.toSeq.sortBy(-_._2).map(_._1)
    assert(byStrength == byCopeland, s"$byStrength vs $byCopeland")
    assert(got(1L)._2 == 5L && got(1L)._3 == 6L) // wins/games carried
  }

  test("bradleyTerryFit: a zero-win item pins to strength 0; its games " +
    "still feed opponents' denominators") {
    val games = Seq((1L, 2L), (1L, 2L), (3L, 2L))
    val got = Preference.bradleyTerryFit(games.toDF("winner", "loser"),
      rounds = 2).collect()
      .map(r => r.getAs[Long]("item") -> r.getAs[Long]("strength_micro"))
      .toMap
    assert(got(2L) == 0L)
    assert(got == btReplay(games, rounds = 2))
  }
}
