package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-form sources (reference §2.1 S1-S5): everything lands in the canonical
  * form shape `(uuid string, data map<string,string>)` — the Spark analogue
  * of the reference's `(uuid, data JSONB)` form tables (model.py:20-34).
  */
object FormSource {

  /** Collapse a flat (all-string) DataFrame into the canonical form shape.
    * Null cells are dropped from the map (absent key ≡ missing column). */
  def toFormShape(df: DataFrame, uuidField: String = "meta/instanceID"): DataFrame = {
    // ODK columns contain dots (`pt./visit_date`); backtick-quote so col()
    // doesn't parse them as struct field access
    def q(c: String) = col(s"`$c`")
    val entries = df.columns.toSeq.map { c =>
      struct(lit(c).as("key"), q(c).cast("string").as("value"))
    }
    df.select(
      q(uuidField).cast("string").as("uuid"),
      map_from_entries(filter(array(entries: _*), e =>
        e.getField("value").isNotNull)).as("data"))
  }

  /** S1 — CSV scan (util/__init__.py:442-456): header row, everything as
    * string, permissive parsing. Spark's file source handles directories,
    * globs and s3a:// URIs identically, so S2 (S3 download) is the same call. */
  def csv(spark: SparkSession, path: String,
          uuidField: String = "meta/instanceID"): DataFrame =
    toFormShape(
      spark.read
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path),
      uuidField)

  /** S3 scan of driver-style parquet (typed columns → string map). */
  def parquet(spark: SparkSession, path: String, uuidField: String): DataFrame =
    toFormShape(spark.read.parquet(path), uuidField)

  /** S3 — JDBC scan of persistent form tables (util/__init__.py:368-374's
    * 1000-row server-side pages become partitioned JDBC reads). Untested in
    * this environment (no database); the call shape is the standard one. */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: java.util.Properties, partitionColumn: String,
           lowerBound: Long, upperBound: Long, numPartitions: Int = 32,
           uuidField: String = "uuid"): DataFrame =
    toFormShape(
      spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
        numPartitions, props),
      uuidField)

  /** S4/S5 — streaming variants: same canonical shape from a file-source
    * stream (Spark's incremental listing replaces the reference's
    * offset-tracking poll loop, get_data.py:84-92). */
  def csvStream(spark: SparkSession, path: String, schemaFrom: DataFrame,
                uuidField: String = "meta/instanceID"): DataFrame =
    toFormShape(
      spark.readStream
        .option("header", "true")
        .schema(schemaFrom.schema)
        .csv(path),
      uuidField)

  /** Strip ODK group prefixes from the data-map keys:
    * `grp./field` → `field` (the reference's `group./field` convention,
    * util/__init__.py:405-419). Deployments whose rule catalogs address
    * fields WITHOUT prefixes apply this right after the scan so
    * `db_column`s match the exported keys. Ungrouped keys pass through;
    * a collision after stripping keeps the later entry (LAST_WIN map
    * semantics — the reference's dict assignment order). Pure
    * `transform_keys`, no shuffle. */
  def stripGroupPrefixes(df: DataFrame): DataFrame =
    df.withColumn("data",
      transform_keys(col("data"), (k, _) =>
        regexp_replace(k, "^.*?\\./", "")))
}
