package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.config.CodeDef
import graft.functions.{EpiWeek, MapResolver, VariableCompiler}

/** Port of the reference's pipeline_worker/tests/variable_test.py — every
  * predicate method against the {applicable, value} contract, plus the
  * calc-string parser corner cases. Rows are Map[String,String] like the raw
  * ODK form data; a missing key is a missing column.
  */
class VariableCompilerSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  /** demo country config uses epi_week day:0 (demo_config.py:41) */
  private val policy = EpiWeek.StartDay(0)

  private def run(code: CodeDef, row: Map[String, String]): (Boolean, Option[String]) = {
    val df = Seq(Tuple1(row)).toDF("data")
    val c = VariableCompiler.compile(code, new MapResolver(col("data")), policy)
    val out = df.select(c.applicable.as("a"), c.value.cast("string").as("v")).head()
    (out.getBoolean(0), Option(out.getString(1)))
  }

  private def assertPositive(code: CodeDef, row: Map[String, String]): Unit =
    assert(run(code, row)._1, s"expected applicable for $row")
  private def assertNegative(code: CodeDef, row: Map[String, String]): Unit =
    assert(!run(code, row)._1, s"expected not applicable for $row")

  // --- not_null (variable_test.py:29-46) ---
  test("not_null") {
    val code = CodeDef(id = "4", method = "not_null", condition = "None", dbColumn = "index")
    assertPositive(code, Map("index" -> "hei"))
    assertNegative(code, Map("index" -> ""))
    assertNegative(code, Map.empty)
  }

  // --- value (variable_test.py:48-68) ---
  test("value returns the raw value truthy-gated") {
    val code = CodeDef(id = "4", method = "value", condition = "None", dbColumn = "index")
    assert(run(code, Map("index" -> "hei")) === ((true, Some("hei"))))
    assertNegative(code, Map("index" -> ""))
    assertNegative(code, Map.empty)
  }

  test("value with calculation=date ISO-formats") {
    val code = CodeDef(id = "4", method = "value", condition = "None",
      dbColumn = "d", calculation = "date")
    val (a, v) = run(code, Map("d" -> "Apr 17, 2016"))
    assert(a && v.contains("2016-04-17T00:00:00"))
    val (a2, _) = run(code, Map("d" -> "not a date"))
    assert(!a2)
  }

  // --- between (variable_test.py:70-118) ---
  test("between with power and division") {
    val code = CodeDef(id = "4", method = "between", condition = "0,1",
      calculation = "A**2/(B-4)", dbColumn = "A,B")
    assertPositive(code, Map("A" -> "1", "B" -> "6"))   // 1/2 = 0.5
    assertNegative(code, Map("A" -> "2", "B" -> "6"))   // 4/2 = 2
    assertPositive(code, Map("A" -> "2", "B" -> "400")) // ~0.01
    assertNegative(code, Map("A" -> "2", "B" -> "1"))   // negative
    assertNegative(code, Map("A" -> "2"))               // missing column
  }

  test("between with undeclared column fails at compile") {
    val code = CodeDef(id = "4", method = "between", condition = "0,1",
      calculation = "C/(B-4)", dbColumn = "A,B")
    assertThrows[IllegalArgumentException] {
      VariableCompiler.compile(code, new MapResolver(col("data")), policy)
    }
  }

  test("between with Variable.to_date") {
    val code = CodeDef(id = "4", method = "between",
      condition = "1388527200,2019679200", // 2014..2034
      calculation = "Variable.to_date(A)", dbColumn = "A")
    assertPositive(code, Map("A" -> "01-Jan-2016"))
    assertNegative(code, Map("A" -> "01-Jan-2035"))
    assertNegative(code, Map("A" -> "01-Jan-2010"))
  }

  test("between bounds are lower-inclusive upper-exclusive") {
    val code = CodeDef(id = "4", method = "between", condition = "10,20",
      calculation = "A", dbColumn = "A")
    assertPositive(code, Map("A" -> "10"))
    assertNegative(code, Map("A" -> "20"))
    assertPositive(code, Map("A" -> "19.999"))
  }

  // --- calc (variable_test.py:120-164) ---
  test("calc computes and result 0 is applicable") {
    val code = CodeDef(id = "4", method = "calc", condition = "None",
      calculation = "A+B", dbColumn = "A,B")
    assert(run(code, Map("A" -> "1", "B" -> "6")) === ((true, Some("7.0"))))
    assert(run(code, Map("A" -> "2", "B" -> "400")) === ((true, Some("402.0"))))
    val (a, v) = run(code, Map("A" -> "2")) // missing column → not applicable
    assert(!a)
    assert(run(code, Map("A" -> "2", "B" -> "-2")) === ((true, Some("0.0"))))
  }

  test("calc empty string treated as 0") {
    val code = CodeDef(id = "4", method = "calc", condition = "None",
      calculation = "A+B", dbColumn = "A,B")
    assert(run(code, Map("A" -> "3", "B" -> "")) === ((true, Some("3.0"))))
  }

  test("calc division by zero yields 0") {
    val code = CodeDef(id = "4", method = "calc", condition = "None",
      calculation = "A/B", dbColumn = "A,B")
    assert(run(code, Map("A" -> "3", "B" -> "0")) === ((true, Some("0.0"))))
  }

  test("calc with undeclared column fails at compile") {
    val code = CodeDef(id = "4", method = "calc", condition = "None",
      calculation = "A+C", dbColumn = "A,B")
    assertThrows[IllegalArgumentException] {
      VariableCompiler.compile(code, new MapResolver(col("data")), policy)
    }
  }

  // --- match (variable_test.py:166-188) ---
  test("match exact membership") {
    val c1 = CodeDef(id = "4", method = "match", dbColumn = "column1", condition = "A")
    assertPositive(c1, Map("column1" -> "A"))
    assertNegative(c1, Map("column1" -> "B"))
    assertNegative(c1, Map("column1" -> "Aa"))
    val c2 = c1.copy(condition = "A,C")
    assertPositive(c2, Map("column1" -> "A"))
    assertPositive(c2, Map("column1" -> "C"))
    assertNegative(c2, Map("column1" -> "B"))
    assertNegative(c2, Map("column1" -> "Aa"))
  }

  // --- sub_match (variable_test.py:190-215) ---
  test("sub_match matches exact or substring") {
    val c1 = CodeDef(id = "4", method = "sub_match", dbColumn = "column1", condition = "A")
    assertPositive(c1, Map("column1" -> "A"))
    assertPositive(c1, Map("column1" -> "A3"))
    assertNegative(c1, Map("column1" -> "B"))
    val c2 = c1.copy(condition = "A,C")
    assertPositive(c2, Map("column1" -> "A"))
    assertPositive(c2, Map("column1" -> "C"))
    assertPositive(c2, Map("column1" -> "A1"))
    assertPositive(c2, Map("column1" -> "C3"))
    assertNegative(c2, Map("column1" -> "B"))
  }

  // --- and / or (variable_test.py:217-310) ---
  test("and combination") {
    val code = CodeDef(id = "4", method = "match and match",
      dbColumn = "column1;column2", condition = "A;B")
    assertPositive(code, Map("column1" -> "A", "column2" -> "B"))
    assertNegative(code, Map("column1" -> "B", "column2" -> "A"))
    assertNegative(code, Map("column1" -> "Aa", "column2" -> "B"))
    val c2 = code.copy(condition = "A,C;B")
    assertPositive(c2, Map("column1" -> "A", "column2" -> "B"))
    assertPositive(c2, Map("column1" -> "C", "column2" -> "B"))
  }

  test("or combination") {
    val code = CodeDef(id = "4", method = "match or match",
      dbColumn = "column1;column2", condition = "A;B")
    assertPositive(code, Map("column1" -> "A", "column2" -> "B"))
    assertNegative(code, Map("column1" -> "B", "column2" -> "A"))
    assertPositive(code, Map("column1" -> "Aa", "column2" -> "B"))
    assertNegative(code, Map("column1" -> "Aa", "column2" -> "C"))
    val c2 = code.copy(condition = "A,C;B")
    assertPositive(c2, Map("column1" -> "A", "column2" -> "B"))
    assertPositive(c2, Map("column1" -> "C", "column2" -> "D"))
  }

  test("mixed test types") {
    val c1 = CodeDef(id = "4", method = "match and sub_match",
      dbColumn = "column1;column2", condition = "A;B")
    assertPositive(c1, Map("column1" -> "A", "column2" -> "Bb"))
    assertNegative(c1, Map("column1" -> "B", "column2" -> "A"))
    assertNegative(c1, Map("column1" -> "Aa", "column2" -> "B"))

    val c2 = CodeDef(id = "4", method = "match and between",
      dbColumn = "column1;column2", calculation = "None;column2",
      condition = "A;4,9")
    assertPositive(c2, Map("column1" -> "A", "column2" -> "5"))
    assertNegative(c2, Map("column1" -> "A", "column2" -> "3"))
    assertNegative(c2, Map("column1" -> "Aa", "column2" -> "5"))

    val c3 = CodeDef(id = "4", method = "sub_match or not_null",
      dbColumn = "column1;column2", condition = "A;None")
    assertPositive(c3, Map("column1" -> "A", "column2" -> "5"))
    assertPositive(c3, Map("column1" -> "A", "column2" -> ""))
    assertNegative(c3, Map("column1" -> "B", "column2" -> ""))
    assertPositive(c3, Map("column1" -> "Aa", "column2" -> "5"))
  }

  test("unknown method raises") {
    val code = CodeDef(id = "4", method = "no_such_method",
      dbColumn = "column1", condition = "A")
    assertThrows[IllegalArgumentException] {
      VariableCompiler.compile(code, new MapResolver(col("data")), policy)
    }
  }
}
