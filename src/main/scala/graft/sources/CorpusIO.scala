package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus interchange — the de-facto format training corpora move in
  * (one JSON document per line, sharded, usually gz/zstd). Thin by design:
  * Spark's json source already does distributed decode; what this adds is
  * the DISCIPLINE a 100 TB ingest needs and ad-hoc `spark.read.json` calls
  * skip:
  *  - schema is EXPLICIT, never inferred (inference is a full extra pass
  *    over the corpus and locks in whatever the first shards happened to
  *    contain);
  *  - malformed lines are DATA, not exceptions: PERMISSIVE mode routes
  *    them to a corrupt-record column and [[readJsonl]] splits good rows
  *    from a dead-letter frame (the FormSource envelope discipline — one
  *    bad line must never kill an ingest);
  *  - writes bound shard sizes via maxRecordsPerFile (downstream loaders
  *    want many same-sized shards, not one skewed file per partition).
  */
object CorpusIO {

  /** The documents-table interchange schema (doc_id, text, lang, source). */
  val DocumentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  private val CorruptCol = "_corrupt_record"

  /** Read JSONL under `path` with an explicit schema. Returns
    * (good rows in schema order, dead letter (raw line)). A line that
    * parses but misses fields stays good with nulls — absent metadata is
    * normal in scraped corpora; only unparseable lines dead-letter. */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType = DocumentSchema): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"$CorruptCol is reserved by readJsonl")
    val withCorrupt = spark.read
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      // the corrupt-column contract needs the raw line materialized before
      // the split, or pruning drops it and every row looks clean
      .cache()
    val good = withCorrupt.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val dead = withCorrupt.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw"))
    (good, dead)
  }

  /** Write `df` as JSONL shards under `path`, each file at most
    * `maxRecordsPerFile` rows; `compression` is any Spark codec name
    * ("gzip", "zstd", "none"). */
  def writeJsonl(df: DataFrame, path: String,
                 maxRecordsPerFile: Long = 500000L,
                 compression: String = "none"): Unit =
    df.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", compression)
      .mode("overwrite")
      .json(path)
}
