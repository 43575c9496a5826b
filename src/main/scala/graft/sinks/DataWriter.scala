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

  /** Bucketed layout for SHUFFLE-FREE equi-joins on a hot key: both tables
    * hash-bucketed (and sorted) on the join key at write time join with no
    * Exchange and no Sort at read time — at 100 TB this turns the
    * recurring `data ⋈ form_table` uuid joins (alert enrichment,
    * reprocessing upserts) from a full shuffle of both sides into a
    * zip of co-located buckets.
    *
    * Bucketing goes through the session catalog (`saveAsTable` — bucket
    * metadata lives there; a bare parquet path cannot carry it). Size
    * `numBuckets` so one bucket ≈ one task's worth of the BIG table
    * (128-256 MB); both join sides must use the same count. The Exchange
    * is always eliminated; eliminating the read-side Sort additionally
    * needs `spark.sql.legacy.bucketedTableScan.outputOrdering=true`
    * (Spark 3+ stopped propagating bucket sort order by default) and one
    * file per bucket, which the repartition below guarantees. */
  def writeBucketed(data: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    // repartition to ONE file per bucket: Spark exposes a bucket's sort
    // order at read time only when the bucket is a single file (each
    // writing task otherwise emits its own file per bucket), and without
    // that the join keeps its per-partition Sort even though the Exchange
    // is gone
    data.repartition(numBuckets, col(bucketCol))
      .write
      .mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
