package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S6 — deterministic fake-data generator (reference
  * util/create_fake_data.py:15-170, seeded at :13): per-field value kinds
  * drawn per row. Instead of a driver-side RNG loop, each cell is a pure
  * function of (seed, row id, field name) via xxhash64 — fully parallel,
  * reproducible at any scale, no rand() state.
  */
object FakeData {

  sealed trait FieldKind
  /** pick one value from the list (create_fake_data "one") */
  final case class OneOf(values: Seq[String]) extends FieldKind
  /** integer in [lo, hi] (create_fake_data "integer") */
  final case class IntRange(lo: Int, hi: Int) extends FieldKind
  /** comma-joined multi-select of up to `max` values ("multiple") */
  final case class MultipleOf(values: Seq[String], max: Int = 3) extends FieldKind
  /** ISO date within the last `days` days of `endDate` ("date") */
  final case class DateWithin(endDate: String, days: Int = 180) extends FieldKind
  /** small patient-id pool, so visit-control collisions occur ("patient_id") */
  final case class PatientId(pool: Int = 200) extends FieldKind

  private def h(seed: Long, fieldName: String): Column =
    pmod(xxhash64(col("__id"), lit(fieldName), lit(seed)), lit(Long.MaxValue))

  private def gen(seed: Long, name: String, kind: FieldKind): Column = kind match {
    case OneOf(vs) =>
      element_at(array(vs.map(lit): _*), (h(seed, name) % vs.size).cast("int") + 1)
    case IntRange(lo, hi) =>
      ((h(seed, name) % (hi - lo + 1)).cast("int") + lo).cast("string")
    case MultipleOf(vs, max) =>
      val n = (h(seed, name + "#n") % max).cast("int") + 1
      concat_ws(",", slice(shuffleDeterministic(vs, seed, name), lit(1), n))
    case DateWithin(end, days) =>
      date_format(date_sub(lit(end).cast("date"),
        (h(seed, name) % days).cast("int")), "yyyy-MM-dd")
    case PatientId(pool) =>
      (h(seed, name) % pool).cast("string")
  }

  /** Deterministic per-row permutation of a small value list. */
  private def shuffleDeterministic(vs: Seq[String], seed: Long, name: String): Column = {
    val keyed = vs.zipWithIndex.map { case (v, i) =>
      struct(pmod(xxhash64(col("__id"), lit(s"$name#$i"), lit(seed)), lit(1000000L)).as("k"),
        lit(v).as("v"))
    }
    transform(array_sort(array(keyed: _*)), e => e.getField("v"))
  }

  /** Generate `n` rows of a form in the canonical `(uuid, data)` shape. */
  def form(spark: SparkSession, formName: String, fields: Map[String, FieldKind],
           n: Int, seed: Long = 1L): DataFrame = {
    val base = spark.range(n).withColumnRenamed("id", "__id")
    base.select(formColumns(formName, fields, seed): _*)
  }

  private def formColumns(formName: String, fields: Map[String, FieldKind],
                          seed: Long): Seq[Column] = {
    val dataEntries = fields.toSeq.sortBy(_._1).map { case (name, kind) =>
      struct(lit(name).as("key"), gen(seed, name, kind).as("value"))
    }
    Seq(
      concat(lit(s"uuid:$formName:"), col("__id").cast("string")).as("uuid"),
      map_from_entries(array(dataEntries: _*)).as("data"))
  }

  /** Streaming flavor of the generator (the reference's fake-data stream
    * mode, util/create_fake_data.py run at 10 rows / 5 min): Spark's rate
    * source supplies monotonically increasing row ids at `rowsPerSecond`,
    * and every field stays the same pure function of (seed, id, name) as
    * the batch generator — so a streamed corpus equals the batch corpus of
    * the same ids, which is what makes end-to-end streaming tests
    * deterministic. */
  def stream(spark: SparkSession, formName: String,
             fields: Map[String, FieldKind], rowsPerSecond: Int,
             seed: Long = 1L): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(col("value").as("__id"))
      .select(formColumns(formName, fields, seed): _*)
}
