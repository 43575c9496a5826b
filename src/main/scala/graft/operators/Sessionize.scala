package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the standard
  * training-data/analytics operator for turning raw event logs into
  * user-session rows. Uses Spark's native `session_window` (merged in the
  * aggregation layer, streaming-capable with watermarks) rather than a
  * hand-rolled lag/cumsum island computation.
  */
object Sessionize {

  /** Per-(key, session) stats: start, n_events, duration. `gap` like
    * "30 minutes". Works identically over a stream with a watermark. */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               gap: String): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .withColumn("duration_ms",
        unix_millis(col("session_end")) - unix_millis(col("session_start")))
      .select(col(keyCol), col("session_start"), col("session_end"),
        col("n_events"), col("duration_ms"))
}
