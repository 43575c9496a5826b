package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The InlineMapExtracts planner rule: literal-key extractions over
  * literal-keyed map adapters must be resolved statically (no CreateMap
  * left in the optimized plan) without changing results — including the
  * cross-projection case where the inlined value expressions reference
  * scan attributes the child projection didn't output (the p2 regression:
  * pass-through attributes must be added, or analysis fails with
  * ATTRIBUTE_NOT_FOUND at execution). */
class InlineMapExtractsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def hasCreateMap(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions.exists(
      _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.CreateMap]))

  // a non-local source so map values reference real scan attributes
  private def src = spark.range(100).select(
    col("id"), (col("id") % 10).as("grp"), (col("id") * 2).as("v"))

  test("cross-projection extraction inlines scan attributes and drops the map") {
    val mapped = src.select(
      map(lit("grp"), col("grp").cast("string"),
        lit("v"), col("v").cast("string")).as("data"))
    val out = mapped.select(
      element_at(col("data"), "grp").cast("long").as("g"),
      element_at(col("data"), "v").cast("long").as("vv"))
    assert(!hasCreateMap(out), "map adapter should be inlined away")
    assert(out.agg(sum("vv")).head().getLong(0) === (0L until 100L).map(_ * 2).sum)
    assert(out.select(countDistinct("g")).head().getLong(0) === 10)
  }

  test("aggregation over a map adapter inlines through the groupBy") {
    val mapped = src.select(
      map(lit("grp"), col("grp").cast("string"),
        lit("v"), col("v").cast("string")).as("data"))
    val out = mapped.groupBy(element_at(col("data"), "grp").as("g"))
      .agg(sum(element_at(col("data"), "v").cast("long")).as("s"))
    assert(!hasCreateMap(out), "map adapter should be inlined away")
    val rows = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("0") === (0L until 100L by 10L).map(_ * 2).sum)
  }

  test("missing literal key folds to null (non-ANSI element_at contract)") {
    val mapped = src.select(map(lit("a"), col("v").cast("string")).as("data"))
    val out = mapped.select(element_at(col("data"), "nope").as("x"))
    assert(!hasCreateMap(out))
    assert(out.filter(col("x").isNotNull).count() === 0)
  }

  test("duplicate literal keys keep the last entry (LAST_WIN)") {
    val mapped = src.select(
      map(lit("k"), lit("first"), lit("k"), lit("second")).as("data"))
    val out = mapped.select(element_at(col("data"), "k").as("x")).distinct()
    assert(out.collect().map(_.getString(0)).toSeq === Seq("second"))
  }

  test("inner-join child maps inline away") {
    val left = src.select(col("id"),
      map(lit("k"), col("id").cast("string")).as("ldata"))
    val right = src.select((col("id") * 3).as("rid"),
      map(lit("v"), col("v").cast("string")).as("rdata"))
    val out = left.join(right, col("id") === col("rid"))
      .select(element_at(col("ldata"), "k").cast("long").as("k"),
        element_at(col("rdata"), "v").cast("long").as("v"))
    assert(!hasCreateMap(out), "both join-side map adapters should inline away")
    // matches: id ∈ {0,3,...,99∩multiples-of-3 under 100 from id*3<100}
    val rows = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet === (0L until 100L by 3L).filter(_ / 3 < 100).toSet)
    rows.foreach { case (k, v) => assert(v === (k / 3) * 2) }
  }

  test("outer-join null-extended side is NOT inlined (stays null-correct)") {
    // the map value has a literal default: inlining it into null-extended
    // rows would yield "d" where the map attribute is null
    val left = src.select(col("id"))
    val right = src.filter(col("id") < 50).select(col("id").as("rid"),
      map(lit("v"), coalesce(col("v").cast("string"), lit("d"))).as("rdata"))
    val out = left.join(right, col("id") === col("rid"), "left")
      .select(col("id"), element_at(col("rdata"), "v").as("x"))
    assert(out.filter(col("id") >= 50 && col("x").isNotNull).count() === 0)
    assert(out.filter(col("id") < 50 && col("x").isNull).count() === 0)
  }

  test("random literal maps + lookups survive the rule (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.forAll
    // random map shapes: duplicate keys, missing lookups, value exprs over
    // scan attributes — results must equal a driver-side model regardless
    // of what the rule inlined or pruned
    val keyGen = Gen.oneOf("k1", "k2", "k3", "k4")
    val entriesGen = Gen.listOfN(4, Gen.zip(keyGen, Gen.choose(0, 3)))
      .suchThat(_.nonEmpty)
    val lookupsGen = Gen.listOfN(3, keyGen)
    val prop = forAll(entriesGen, lookupsGen) { (entries, lookups) =>
      val mapArgs = entries.flatMap { case (k, mult) =>
        Seq(lit(k), (col("id") * mult).cast("string"))
      }
      val mapped = src.select(col("id"), map(mapArgs: _*).as("data"))
      val out = mapped.select(
        col("id") +: lookups.zipWithIndex.map { case (k, i) =>
          element_at(col("data"), k).as(s"v$i")
        }: _*).collect()
      // model: LAST_WIN duplicate keys, null on missing
      val lastWin = entries.toMap // toMap keeps the LAST duplicate
      val ok = out.forall { r =>
        val id = r.getLong(0)
        lookups.zipWithIndex.forall { case (k, i) =>
          val expected = lastWin.get(k).map(m => (id * m).toString)
          Option(r.getString(i + 1)) == expected
        }
      }
      Prop(ok)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("non-literal lookup keys stay correct (rule must not mis-resolve)") {
    // Spark's own SimplifyExtractValueOps may still rewrite this shape;
    // the contract here is purely behavioral
    val mapped = src.select(
      (col("id") % 2).cast("string").as("which"),
      map(lit("0"), lit("even"), lit("1"), lit("odd")).as("data"))
    val out = mapped.select(element_at(col("data"), col("which")).as("x"))
    assert(out.filter(col("x") === "even").count() === 50)
    assert(out.filter(col("x") === "odd").count() === 50)
  }
}
