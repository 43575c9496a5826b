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
    * normal in scraped corpora; only unparseable lines dead-letter.
    *
    * The two frames are INDEPENDENT lazy reads of the same files — not a
    * cached corrupt-column split: caching the parsed corpus to serve the
    * split would pin a full-corpus cache per call for the session's
    * lifetime (an ingest loop over many shard dirs would accumulate them
    * until executors thrash). Good rows drop malformed lines at the scan;
    * dead letters re-scan as text and keep exactly the non-blank lines
    * `from_json` cannot parse — the same line set PERMISSIVE would have
    * marked corrupt. The corpus pays a second (cheap, projected) pass only
    * if the dead-letter frame is actually consumed. */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType = DocumentSchema): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"$CorruptCol is reserved by readJsonl")
    val good = spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path)
      .select(schema.fieldNames.map(col).toSeq: _*)
    // from_json PERMISSIVE yields a null-FIELDED struct for malformed
    // input, never a null struct — corruption is detected via its
    // corrupt-record column, exactly like the file reader would
    val parsed = from_json(col("value"),
      schema.add(StructField(CorruptCol, StringType)),
      Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> CorruptCol))
    val dead = spark.read.text(path)
      // the json reader skips blank lines entirely — they are not corrupt
      .filter(length(trim(col("value"))) > 0)
      .filter(parsed.getField(CorruptCol).isNotNull)
      .select(col("value").as("raw"))
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

  /** Snapshot delta between two corpus versions (the recrawl/reprocess
    * step: what must downstream recompute?): per document id,
    * `added` (only in the new snapshot), `removed` (only in the old),
    * `changed` (both, content digest differs), `unchanged`.
    *
    * Scale shape: both sides reduce to (id, md5 digest) in narrow
    * scan-side projections — the TEXT never joins — then ONE full-outer
    * equi-join on the id. Two 100 TB snapshots diff at the cost of
    * shuffling two id+16-byte-digest column sets; with both snapshots
    * bucketed by id the exchange disappears entirely.
    *
    * Output: (idCol, status, old_hash, new_hash) — hashes kept so a
    * downstream incremental pass can persist them as its next baseline. */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    def digests(df: DataFrame, hashCol: String) =
      df.select(col(idCol), md5(col(textCol).cast("binary")).as(hashCol))
    digests(oldDocs, "old_hash")
      .join(digests(newDocs, "new_hash"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") =!= col("new_hash"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("old_hash"), col("new_hash"))
  }
}
