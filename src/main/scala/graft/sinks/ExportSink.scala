package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** S9 — incremental export sink (reference consul_export.py:85-115: scan the
  * form table from a saved marker, POST each row, checkpoint the marker).
  *
  * Structured Streaming's offset log IS the marker: a file-source stream over
  * the data directory + foreachBatch gives resume-from-checkpoint export with
  * at-least-once delivery — the same contract the reference implements by
  * hand with S3-persisted offsets.
  *
  * The HTTP POST itself is environment-dependent; `post` is injectable and
  * defaults to a collecting stub.
  */
object ExportSink {

  /** Start an incremental export of parquet rows under `dataPath`.
    * `post` runs executor-side per partition batch. */
  def start(spark: SparkSession, dataPath: String, checkpoint: String,
            post: Iterator[Row] => Unit): StreamingQuery = {
    val schema = spark.read.parquet(dataPath).schema
    spark.readStream.schema(schema).parquet(dataPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.foreachPartition(post)
      }
      .start()
  }
}

/** S10/P6 — alert notification sink (reference send_alerts.py:17-31 +
  * util/__init__.py:495-589): individual alerts younger than 7 days render
  * message templates and publish to per-level topics. The HTTP publisher is
  * out of analytic scope (stubbed); filtering, recency gate, topic fan-out
  * and template interpolation are real.
  */
object AlertNotifier {

  final case class Notification(topic: String, uuid: String, message: String)

  /** Individual-alert notifications for a coded `data` DataFrame. */
  def notifications(data: DataFrame, asOf: String,
                    levels: Seq[String] = Seq("clinic", "district", "region", "country")):
      DataFrame = {
    val recent = data
      .filter(element_at(col("variables"), "alert") === "1")
      .filter(element_at(col("variables"), "alert_type") === "individual")
      .filter(col("date") >= date_sub(lit(asOf).cast("date"), 7)) // util/__init__.py:514
    val topics = levels.map { level =>
      struct(
        concat_ws("-", lit(level), col(level).cast("string"),
          element_at(col("variables"), "alert_reason")).as("topic"),
        col("uuid").as("uuid"),
        concat(lit("Alert "), element_at(col("variables"), "alert_reason"),
          lit(" at "), col(level).cast("string"), lit(" on "),
          col("date").cast("date").cast("string")).as("message"))
    }
    recent.select(explode(array(topics: _*)).as("n"))
      .select(col("n.topic"), col("n.uuid"), col("n.message"))
  }
}
