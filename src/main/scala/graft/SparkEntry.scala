package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query keys map 1:1 onto SURVEY.md §2's operator inventory; each pack
  * documents which reference operator(s) its entries exercise.
  */
object SparkEntry {

  /** All query packs. Add a pack per operator family as it lands. */
  private val packs: Seq[QueryPack] = Seq(
    Relational,
    EpiQueries,
    PipelineQueries,
    DslQueries,
    TrainingDataQueries
  )

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
