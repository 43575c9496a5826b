package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layout for the analytical `data` table at scale.
  *
  * The reference keeps one PostgreSQL table with GIN indexes on the JSONB
  * maps (model.py:125-128). The columnar equivalent: parquet partitioned by
  * `(type, epi_year)` — the two columns every downstream query filters on
  * (docs/source/index.rst:75-77) — with rows sorted by (clinic, date) inside
  * each partition so min/max row-group statistics prune clinic- and
  * time-scoped scans. Map-membership filters (`map_contains_key(variables,…)`)
  * read only the `variables` column thanks to parquet column projection —
  * the layout-level replacement for the GIN index.
  */
object DataWriter {

  def write(data: DataFrame, path: String,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    data
      .repartition(col("type"), col("epi_year"))
      .sortWithinPartitions(col("clinic"), col("date"))
      .write
      .mode(mode)
      .partitionBy("type", "epi_year")
      .parquet(path)

  /** Read back with partition pruning available on type/epi_year. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
