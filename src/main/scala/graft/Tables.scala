package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)` and loads its
  * inputs through here so the scan always goes through the parquet datasource
  * (column pruning + predicate pushdown reach the file scan).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Confs every session that touches the testdata needs. Spark 4 refuses
    * TIMESTAMP(NANOS) parquet columns (events.ts) unless they are read as
    * raw nanosecond longs; [[events]] converts back to a timestamp. */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // ToCodes builds maps with insert-order overwrite semantics (the
    // reference's dict.update); map_from_entries must keep the last entry
    "spark.sql.mapKeyDedupPolicy" -> "LAST_WIN",
    // The reference's DSL is permissive Python: float() failure → value kept,
    // ZeroDivision → 0, bad dates → fallthrough. Non-ANSI evaluation (null on
    // bad cast) is the matching contract; hot spots additionally use try_*.
    "spark.sql.ansi.enabled" -> "false",
    // engine planner rules (InlineMapExtracts: kill the map-adapter tax)
    "spark.sql.extensions" -> "graft.plans.GraftExtensions")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  /** `events.ts` has shipped in two physical parquet shapes across testdata
    * generations: TIMESTAMP(NANOS) (arrives as a long under nanosAsLong —
    * truncate to micros exactly like DuckDB, integer `div` since nanos
    * exceed 2^53) and TIMESTAMP(MICROS) without UTC adjustment (arrives as
    * TIMESTAMP_NTZ under Spark 4's NTZ inference). Both normalize to plain
    * TIMESTAMP here; sessions run with UTC session tz, so the NTZ cast is a
    * same-wall-clock relabel and matches DuckDB's naive-timestamp reading. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
