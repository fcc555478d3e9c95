package graft

class EntrySpec extends SparkSpec {

  test("entry (t1 smoke): flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracleSql keys with no query: $unknown")
  }

  test("query results have stable column names matching oracle expectations") {
    // column sets must be identical between Spark result and what the SQL
    // aliases produce — spot-check the aliased aggregates
    val q1 = SparkEntry.queries("q01_pricing_summary")(spark, sf0001)
    assert(q1.columns.toSet == Set("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "avg_qty", "avg_price", "avg_disc",
      "count_order"))
  }

  test("every query has an oracle (zero rows-only checks)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries with no oracle: $missing")
  }

  test("no query emits array/struct/map columns (driver compare cannot sort them)") {
    // round-1 regression guard: the driver's pandas compare crashed on
    // array-typed outputs ('unhashable type: numpy.ndarray'); everything
    // must project to atomic columns
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    SparkEntry.queries.foreach { case (name, fn) =>
      val bad = fn(spark, sf0001).schema.fields.filter(f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => true
        case _ => false
      })
      assert(bad.isEmpty,
        s"$name emits non-atomic columns: ${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    }
  }
}
