package graft.monitoring

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Step-timing instrumentation (reference `step_monitoring` table,
  * model.py:87-94, written per step in process_steps/__init__.py:49-57):
  * a QueryExecutionListener records (action, rows-ish, start, duration) for
  * every completed query execution, queryable as a DataFrame and writable to
  * a monitoring sink.
  */
class StepMonitor extends QueryExecutionListener {
  import StepMonitor.StepRecord

  private val records = new ConcurrentLinkedQueue[StepRecord]()

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit =
    records.add(StepRecord(funcName,
      System.currentTimeMillis() - durationNs / 1000000L,
      durationNs / 1000000L, None))

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit =
    // Option(), not Some(): getMessage is null for bare NPEs and friends
    records.add(StepRecord(funcName, System.currentTimeMillis(), 0L,
      Option(exception.getMessage).orElse(Some(exception.getClass.getName))))

  def snapshot: Seq[StepRecord] = records.asScala.toSeq

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshot.map(r => (r.step, r.startMs, r.durationMs, r.error))
      .toDF("step", "start_ms", "duration_ms", "error")
  }
}

object StepMonitor {
  final case class StepRecord(step: String, startMs: Long, durationMs: Long,
                              error: Option[String])

  /** Install a monitor on the session and return it. */
  def install(spark: SparkSession): StepMonitor = {
    val m = new StepMonitor
    spark.listenerManager.register(m)
    m
  }
}
