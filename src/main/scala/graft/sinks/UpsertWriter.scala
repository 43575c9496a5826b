package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S7 — uuid-keyed upsert sink (reference
  * process_steps/write_to_db.py:38-81: batched `DELETE WHERE uuid IN (…) AND
  * type = t` then bulk INSERT).
  *
  * Parquet has no in-place delete, so the upsert is: read current store,
  * anti-join away rows whose (uuid, type) is being replaced, union the new
  * batch, atomically swap directories. Re-processing a uuid replaces its rows
  * — the reference's exactly-once-ish idempotency contract (§2.7). On a
  * cluster this maps 1:1 onto a Delta/Iceberg MERGE; the anti-join+union
  * formulation is the engine-neutral expression of the same plan.
  */
object UpsertWriter {

  def upsert(spark: SparkSession, batch: DataFrame, path: String,
             keys: Seq[String] = Seq("uuid", "type")): Unit = {
    val dir = new java.io.File(path)
    val exists = dir.exists() && dir.listFiles().exists(_.getName.endsWith(".parquet"))
    val merged =
      if (!exists) batch
      else {
        val current = spark.read.parquet(path)
        val newKeys = batch.select(keys.map(col): _*).distinct()
        current.join(newKeys, keys, "left_anti").unionByName(batch)
      }
    val tmp = path + ".tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    // atomic-ish swap (single-FS); object stores would overwrite in place or MERGE
    val target = new java.io.File(path)
    if (target.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(target)
    }
    new java.io.File(tmp).renameTo(target)
  }

  /** Dead-letter quarantine (reference step_failures, model.py:47-54 +
    * pipeline.py:91-109): malformed records route to a side table instead of
    * failing the batch. `reason` is the failed-validation tag. */
  def quarantine(batch: DataFrame, path: String, reason: String): Unit =
    batch
      .withColumn("error", lit(reason))
      .withColumn("quarantined_at", current_timestamp())
      .write.mode(SaveMode.Append).parquet(path)
}
