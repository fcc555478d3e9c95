package graft

import java.nio.file.{Files, Paths}

import graft.io.IO

/** Systematic pandas-vs-Spark CSV dtype-inference matrix (SURVEY.md §7
  * hard part (a)): one fixture column per inference edge, each asserted
  * against the Spark type `IO.readCsv` produces, with the documented
  * `pandas.read_csv` dtype alongside. Deviations are deliberate and
  * documented here — this spec is the contract for "silent schema drift on
  * CSV ingest" (the reference's core entry point, `csv2parquet.py:75`).
  *
  * | column     | pandas    | graft readCsv | parity |
  * | int_small  | int64     | long          | yes (IntegerType upcast) |
  * | int_big    | int64     | long          | yes |
  * | int_na     | float64   | long + null   | DEVIATION: pandas has no
  * |            |           |               | nullable int by default and
  * |            |           |               | widens to float64 (1.0, NaN);
  * |            |           |               | we keep typed nulls — values
  * |            |           |               | round-trip exactly, schema is
  * |            |           |               | INT64 not DOUBLE |
  * | float_mix  | float64   | double        | yes |
  * | sci        | float64   | double        | yes (1e3 → 1000.0) |
  * | str_mix    | object    | string        | yes |
  * | bool_cap   | bool      | boolean       | yes (True/False) |
  * | bool_lower | object    | boolean       | DEVIATION: pandas only maps
  * |            |           |               | capitalized True/False;
  * |            |           |               | Spark accepts true/false too |
  * | date_iso   | object    | date          | DEVIATION: Spark 4 infers
  * |            |           |               | DateType for ISO dates where
  * |            |           |               | pandas keeps strings unless
  * |            |           |               | parse_dates is passed |
  * | ws_int     | int64     | long          | yes (skipinitialspace ≙
  * |            |           |               | ignoreLeadingWhiteSpace) |
  */
class CsvInferenceParitySpec extends SparkSpec {

  private val fixture =
    """int_small,int_big,int_na,float_mix,sci,str_mix,bool_cap,bool_lower,date_iso,ws_int
      |1,3000000000,1,1,1e3,1,True,true,2024-01-01, 7
      |2,3000000001,,2.5,2.5,x,False,false,2024-06-30, 8
      |""".stripMargin

  private lazy val types: Map[String, String] = {
    val dir = Files.createTempDirectory("graft_infer").toString
    Files.writeString(Paths.get(s"$dir/m.csv"), fixture)
    IO.readCsv(spark, s"$dir/m.csv")
      .schema.fields.map(f => f.name -> f.dataType.typeName).toMap
  }

  test("integer columns infer as long (pandas int64 parity, incl. >2^31)") {
    assert(types("int_small") == "long")
    assert(types("int_big") == "long")
    assert(types("ws_int") == "long") // leading space stripped before parse
  }

  test("int-with-NA stays a typed long + null (documented deviation)") {
    assert(types("int_na") == "long")
    val dir = Files.createTempDirectory("graft_infer_na").toString
    Files.writeString(Paths.get(s"$dir/m.csv"), fixture)
    val vals = IO.readCsv(spark, s"$dir/m.csv")
      .select("int_na").collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(vals.toSet == Set(Some(1L), None)) // pandas would yield 1.0, NaN
  }

  test("float/scientific/mixed-numeric columns infer as double") {
    assert(types("float_mix") == "double")
    assert(types("sci") == "double")
  }

  test("mixed int/string falls back to string (pandas object parity)") {
    assert(types("str_mix") == "string")
  }

  test("booleans infer as boolean; lowercase acceptance is a documented deviation") {
    assert(types("bool_cap") == "boolean")
    assert(types("bool_lower") == "boolean") // pandas: object
  }

  test("ISO dates infer as DateType (documented deviation from pandas object)") {
    assert(types("date_iso") == "date", types("date_iso"))
  }
}
