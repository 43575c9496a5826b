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

  /** [[start]] specialised to the reference's row-POST export
    * (consul_export.py:85-115): each exported row serialises to one JSON
    * object and ships via [[HttpPublisher]] — checkpointed resume and
    * at-least-once delivery included. */
  def startJsonHttp(spark: SparkSession, dataPath: String, checkpoint: String,
                    endpoint: String,
                    headers: Map[String, String] = Map.empty): StreamingQuery = {
    val schema = spark.read.parquet(dataPath).schema
    spark.readStream.schema(schema).parquet(dataPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select(to_json(struct(col("*"))).as("body"))
          .foreachPartition { (rows: Iterator[Row]) =>
            HttpPublisher.jsonPoster(endpoint, "POST", headers)(
              rows.map(_.getString(0)))
          }
      }
      .start()
  }
}

/** JSON-over-HTTP publisher — the S10/P6 transport (reference
  * `libs.hermes('/publish', 'PUT', data)` against `HERMES_API_ROOT`,
  * config.py:57-59). Pure JDK (`HttpURLConnection`), so it runs
  * executor-side with a string-only closure and no extra dependency.
  *
  * Delivery contract is AT-LEAST-ONCE, inherited from Spark: a non-2xx
  * response throws, the task retries, and every body in the partition is
  * re-sent — receivers dedup on the body's `id` (the reference's alert id
  * plays the same role). Endpoint and auth are caller-supplied; nothing is
  * read from the environment.
  */
object HttpPublisher {

  /** One partition's worth of JSON bodies → one HTTP request each.
    * Returned closure captures only strings/ints, so it ships to
    * executors. Timeouts are MANDATORY: HttpURLConnection's defaults are
    * infinite, and a half-open endpoint would otherwise hang the task
    * forever instead of failing into the retry path the at-least-once
    * contract depends on. */
  def jsonPoster(endpoint: String, method: String = "PUT",
                 headers: Map[String, String] = Map.empty,
                 connectTimeoutMs: Int = 10000,
                 readTimeoutMs: Int = 60000):
      Iterator[String] => Unit = { bodies =>
    bodies.foreach { body =>
      val conn = new java.net.URL(endpoint).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        conn.setRequestMethod(method)
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/json")
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        val out = conn.getOutputStream
        try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        val code = conn.getResponseCode
        if (code < 200 || code >= 300)
          throw new java.io.IOException(
            s"publish to $endpoint returned HTTP $code")
        // drain the response so the exchange completes cleanly before the
        // connection is torn down (disconnect below opts out of keep-alive
        // deliberately: publishes are batch-bounded, leaked sockets on
        // executors are worse than a handshake per request)
        val in = conn.getInputStream
        try { while (in.read() != -1) () } finally in.close()
      } finally conn.disconnect()
    }
  }
}

/** S10/P6 — alert notification sink (reference send_alerts.py:17-31 +
  * util/__init__.py:495-589): individual alerts younger than 7 days render
  * message templates and publish to per-level topics; one publish per alert
  * carries the full topic list (the reference's single hermes PUT with
  * `topics: [...]`), shipped by [[HttpPublisher]].
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
    // alert_message is LEVEL-FREE (clinic-anchored, like the reference's
    // single text_message per alert) — the one body [[publishBodies]]
    // ships to every topic; `message` stays per-level for per-topic
    // consumers
    val alertMessage = concat(
      lit("Alert "), element_at(col("variables"), "alert_reason"),
      lit(" at clinic "), col("clinic").cast("string"), lit(" on "),
      col("date").cast("date").cast("string"))
    recent.select(explode(array(topics: _*)).as("n"),
        alertMessage.as("alert_message"))
      .select(col("n.topic"), col("n.uuid"), col("n.message"),
        col("alert_message"))
  }

  /** Per-alert publish bodies: the level-exploded notifications fold back
    * to ONE JSON body per alert uuid with the full topic list — the
    * reference's single `/publish` PUT per alert (util/__init__.py:584-589:
    * `{"from": sender, "topics": [...], "id": ..., "message": ...}`).
    * Topic list is sorted for deterministic bodies. The body's message is
    * the LEVEL-FREE `alert_message` (identical across a uuid's rows) —
    * never a per-level `message`, which names one level and would reach
    * every other level's subscribers wrong. Frames without alert_message
    * (pre-assembled notification feeds) fall back to min(message). */
  def publishBodies(notifications: DataFrame, sender: String): DataFrame = {
    val msgCol =
      if (notifications.columns.contains("alert_message")) "alert_message"
      else "message"
    notifications.groupBy(col("uuid"))
      .agg(sort_array(collect_list(col("topic"))).as("topics"),
        min(col(msgCol)).as("message"))
      .select(to_json(struct(
        lit(sender).as("from"), col("topics"),
        col("uuid").as("id"), col("message"))).as("body"))
  }

  /** Publish every notification body over HTTP — executor-side, one
    * request per alert, at-least-once (see [[HttpPublisher]]). */
  def publish(notifications: DataFrame, endpoint: String, sender: String,
              headers: Map[String, String] = Map.empty): Unit =
    publishBodies(notifications, sender)
      .foreachPartition { (rows: Iterator[Row]) =>
        HttpPublisher.jsonPoster(endpoint, "PUT", headers)(
          rows.map(_.getString(0)))
      }
}
