package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Session EVENT SEQUENCES — the behavioral-document corpus a
    * sequence model pretrains on: per (key, session), the gap-broken
    * ordered event-type token string plus the session stats. Where
    * [[sessions]] only needs the aggregation layer (native
    * session_window), the sequence needs per-event ORDER, so this runs
    * the lag/cumsum island formulation: ONE per-key sort carries the
    * session break (gap exceeded), the running session id, and the
    * window-ordered token collection ([[AddLinks]]' ordering contract).
    * Ties on the timestamp break on `idCol` — without it the emitted
    * order (and any hash of it) would be partition-layout-dependent.
    *
    * Scale shape: one hash exchange on the key, every window and the
    * final aggregation riding that one sort; linear in events. */
  def sessionSequences(events: DataFrame, keyCol: String, tsCol: String,
                       gap: String, typeCol: String = "event_type",
                       idCol: String = "event_id"): DataFrame = {
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(gap))
    require(gapMs.months == 0,
      s"gap '$gap' must be a fixed-length interval")
    val ms = gapMs.days * 86400000L + gapMs.microseconds / 1000L
    val byTs = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
    val prevTs = lag(col(tsCol), 1).over(byTs)
    val staged = events
      .withColumn("__new", when(prevTs.isNull ||
        unix_millis(col(tsCol)) - unix_millis(prevTs) > ms, 1).otherwise(0))
      .withColumn("__sid", sum(col("__new"))
        .over(byTs.rowsBetween(Window.unboundedPreceding, 0)))
    val wRun = Window.partitionBy(col(keyCol), col("__sid"))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged
      .withColumn("__arr", collect_list(col(typeCol)).over(wRun))
      .groupBy(col(keyCol), col("__sid"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        concat_ws(" ", max(col("__arr"))).as("seq"))
      .select(col(keyCol), col("session_start"), col("session_end"),
        col("n_events"), col("seq"))
  }
}
