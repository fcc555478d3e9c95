package graft

import org.apache.spark.sql.functions._

import graft.functions._

class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  /** zipf-ish skewed stream: item i appears 2^(10-i) times, i = 0..9,
    * plus 200 singleton "noise-*" items — the regime Space-Saving is for.
    */
  private def skewed: Seq[String] =
    (0 until 10).flatMap(i => Seq.fill(1 << (10 - i))(s"hh-$i")) ++
      (0 until 200).map(i => s"noise-$i")

  private def trueCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def sketch(xs: Seq[String], parts: Int, capacity: Int, k: Int) =
    xs.toDF("item").repartition(parts)
      .agg(spaceSavingTopK(col("item"), capacity, k).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.count_est"), col("e.count_err"))
      .as[(String, Long, Long)].collect()

  test("under capacity the sketch is exact with zero error, any partitioning") {
    val xs = skewed.filter(_.startsWith("hh-")) // 10 distinct items
    for (parts <- Seq(1, 7)) {
      val got = sketch(xs, parts, capacity = 16, k = 10)
      val truth = trueCounts(xs)
      assert(got.length == 10)
      got.foreach { case (it, est, err) =>
        assert(err == 0L, s"$it err=$err")
        assert(est == truth(it), s"$it est=$est true=${truth(it)}")
      }
    }
  }

  test("eviction regime: guarantees hold across a distributed merge") {
    val xs = skewed
    val n = xs.size.toLong
    val capacity = 32
    val truth = trueCounts(xs)
    for (parts <- Seq(1, 13)) {
      val got = sketch(xs, parts, capacity, k = capacity)
      // every item with true count > n/capacity must be present
      val mustHave = truth.filter(_._2 > n / capacity).keySet
      val present = got.map(_._1).toSet
      assert(mustHave.subsetOf(present),
        s"missing ${mustHave -- present} (parts=$parts)")
      // every reported entry: est >= true >= est - err
      got.foreach { case (it, est, err) =>
        val t = truth.getOrElse(it, 0L)
        assert(est >= t, s"$it est=$est < true=$t")
        assert(est - err <= t, s"$it est-err=${est - err} > true=$t")
      }
    }
  }

  test("top heavy hitters are ranked first despite noise") {
    val got = sketch(skewed, parts = 5, capacity = 64, k = 3).map(_._1).toSeq
    assert(got == Seq("hh-0", "hh-1", "hh-2"))
  }

  test("SQL registration (as GraftExtensions would inject)") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "space_saving_topk",
      exprs => SpaceSavingTopK(exprs.head, 8, 2), "built-in")
    Seq("a", "a", "b", "a", "c").toDF("item").createOrReplaceTempView("ss_items")
    val got = spark.sql(
      """SELECT e.item, e.count_est
        |FROM (SELECT explode(space_saving_topk(item, 8, 2)) AS e
        |      FROM ss_items)""".stripMargin)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 3L), ("b", 1L)))
  }

  test("property: guarantees hold for arbitrary streams, splits, and merge orders") {
    // pure buffer-algebra check (no Spark): random zipf-ish streams split
    // into random partitions, each updated independently, merged in a
    // random order — presence and error-bound guarantees must always hold
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val capacity = 8
    val gen = for {
      n <- Gen.choose(1, 400)
      items <- Gen.listOfN(n, Gen.frequency(
        (8, Gen.choose(0, 3)), // few hot items
        (2, Gen.choose(0, 60))  // long tail
      ).map(i => s"i$i"))
      nParts <- Gen.choose(1, 5)
      parts <- Gen.listOfN(items.size, Gen.choose(0, nParts - 1))
    } yield (items, parts)
    (0 until 300).foreach { seedI =>
      gen.apply(Gen.Parameters.default, Seed(seedI.toLong)).foreach {
        case (items, parts) =>
          val agg = SpaceSavingTopK(
            org.apache.spark.sql.catalyst.expressions.Literal("x"), capacity, capacity)
          val buffers = items.zip(parts).groupBy(_._2).values.map { chunk =>
            val b = agg.createAggregationBuffer()
            chunk.foreach { case (it, _) => b.add(it) }
            b
          }.toList
          // merge in the (arbitrary) groupBy order, seeded differently via fold direction
          val merged =
            if (seedI % 2 == 0) buffers.reduce(agg.merge)
            else buffers.reverse.reduce(agg.merge)
          val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
          val n = items.size.toLong
          val present = merged.entries.keySet
          truth.filter(_._2 > n / capacity).keys.foreach(t =>
            assert(present.contains(t), s"seed=$seedI heavy $t missing"))
          merged.entries.foreach { case (it, (est, err)) =>
            val tr = truth.getOrElse(it, 0L)
            assert(est >= tr && est - err <= tr,
              s"seed=$seedI $it est=$est err=$err true=$tr")
          }
      }
    }
  }

  test("nulls are skipped; k caps the output") {
    val xs = Seq(Some("a"), None, Some("a"), Some("b"), None)
    val got = xs.toDF("item")
      .agg(spaceSavingTopK(col("item"), capacity = 4, k = 1).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.count_est"))
      .as[(String, Long)].collect()
    assert(got.toSeq == Seq(("a", 2L)))
  }
}
