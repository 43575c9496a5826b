package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.DataPipeline
import graft.sinks.UpsertWriter

/** Streaming ingest (reference §2.7 / consumer.py:83-97): micro-batches of
  * `{form, data}` envelopes run through the SAME batch pipeline via
  * foreachBatch — this matches the reference exactly, where state lives in
  * the store (PostgreSQL there, the parquet data dir here), not in operator
  * state. Late data naturally re-links and re-alerts because each batch is
  * an upsert into history, mirroring the reference's
  * no-watermark/process-on-arrival discipline.
  */
object StreamingPipeline {

  /** Run a raw-form stream through the batch pipeline, upserting the coded
    * output per micro-batch. `formName` identifies which form the stream
    * carries (the reference's {formId, data} envelope). */
  def start(spark: SparkSession, stream: DataFrame, formName: String,
            cfg: DataPipeline.EngineConfig, dataPath: String,
            disregardedPath: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val result = DataPipeline.process(spark, Map(formName -> batch), cfg)
        UpsertWriter.upsert(spark, result.data, dataPath)
        if (!result.disregarded.isEmpty)
          UpsertWriter.upsert(spark, result.disregarded, disregardedPath)
      }
      .start()

  /** Native streaming variant of the A1 daily-threshold aggregation: windowed
    * count per (clinic, day) with a watermark — for deployments that want
    * push-style alerts instead of the store-recompute discipline. */
  def thresholdAlertStream(coded: DataFrame, varId: String, limit: Int,
                           watermark: String = "7 days"): DataFrame =
    coded
      .filter(map_contains_key(col("variables"), varId))
      .withWatermark("date", watermark)
      .groupBy(col("clinic"), window(col("date"), "1 day"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= limit)
      .select(col("clinic"), col("window.start").as("day"), col("n"))
}
