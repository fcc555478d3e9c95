package graft

class EntrySpec extends SparkSpec {

  test("entry (t1 smoke): flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs, returns rows, and emits only atomic columns") {
    // one construction+execution per query: rows>0 (t1 smoke contract) AND
    // the driver-compat schema gate (round-1 regression: the driver's
    // pandas compare crashes on array/struct/map outputs)
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      val bad = df.schema.fields.filter(f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => true
        case _ => false
      })
      assert(bad.isEmpty,
        s"$name emits non-atomic columns: ${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
      assert(df.count() > 0, s"$name returned 0 rows")
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

}
