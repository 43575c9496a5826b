package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}
import graft.{SparkEntry, Tables}

/** Per-SQL-execution wall-time breakdown of a gate query — where does a
  * multi-stage composed gate (eager checkpoints, guard jobs, the final
  * dump) actually spend its time? Feeds the checkpoint-barrier-collapse
  * planning for `corpus_pipeline` (round-12 candidate list): the gate's
  * cost is a SEQUENCE of executions, so per-query totals can't localize
  * a stage. Warm pass first (codegen/JIT), one timed pass with the
  * listener attached; prints each execution's duration + description.
  *
  * Usage: runMain graft.tools.PipelineProbe [sfDir] [gate] [reps]
  */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("corpus_pipeline")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(): Unit = {
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      spark.catalog.clearCache()
    }
    once() // warm
    val starts = new java.util.concurrent.ConcurrentHashMap[Long, (Long, String)]
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String)]
    val listener = new SparkListener {
      override def onOtherEvent(e: SparkListenerEvent): Unit = e match {
        case s: SparkListenerSQLExecutionStart =>
          starts.put(s.executionId, (s.time, s.description.linesIterator
            .next().take(90)))
        case s: SparkListenerSQLExecutionEnd =>
          Option(starts.get(s.executionId)).foreach { case (t0, desc) =>
            rows.add((s.executionId, s.time - t0, desc))
          }
        case _ =>
      }
    }
    (1 to reps).foreach { r =>
      rows.clear(); starts.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      once()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftListenerBridge
        .waitUntilListenerBusEmpty(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val sorted = rows.asScala.toSeq.sortBy(_._1)
      println(f"PROBE $name rep=$r wall=$wall%.2fs executions=${sorted.size} sumExec=${sorted.map(_._2).sum / 1000.0}%.2fs")
      sorted.foreach { case (id, ms, desc) =>
        println(f"PROBE   #$id%-4d ${ms / 1000.0}%6.2fs  $desc")
      }
    }
    spark.stop()
  }
}
