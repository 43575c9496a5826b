package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.config.InitialVisitDef
import graft.functions.{MapResolver, VariableCompiler}

/** initial_visit_control step (reference
  * pipeline_worker/process_steps/initial_visit_control.py:25-136): for module
  * rows with visit=="new", all records sharing the same non-empty identifier
  * tuple (e.g. patientid + icd_code) keep only the earliest (by visit date)
  * as "new"; every later one is rewritten to "return".
  *
  * The reference does this incrementally — each arriving record queries the
  * form table and re-emits the corrected set, so its output depends on
  * arrival order. We define the batch recompute as the spec (set-based window
  * over the whole form), which is order-insensitive and matches the
  * reference's own step-test assertions.
  *
  * Scale: one shuffle on the identifier keys (window partition); the
  * identifier tuple is high-cardinality (patient × diagnosis), so partitions
  * stay balanced at any data size.
  */
object InitialVisitControl {

  def apply(form: DataFrame, cfg: InitialVisitDef): DataFrame = {
    val r = new MapResolver(col("data"))
    val idCols = cfg.identifierKeys.map(r.get)
    val participates =
      idCols.map(c => c.isNotNull && c =!= "").reduce(_ && _) &&
      r.get(cfg.visitTypeKey) === "new" &&
      r.get(cfg.moduleKey) === cfg.moduleValue

    val w = Window
      .partitionBy(cfg.identifierKeys.map(k =>
        when(participates, r.get(k)).otherwise(col("uuid"))): _*)
      .orderBy(VariableCompiler.parseDate(r.get(cfg.visitDateKey)).asc_nulls_last,
        col("uuid"))

    // non-participating rows are isolated into singleton partitions (keyed by
    // their own uuid) so the window never reorders them
    form.withColumn("__rn", row_number().over(w))
      .withColumn("data",
        when(participates && col("__rn") > 1,
          map_concat(col("data"), map(lit(cfg.visitTypeKey), lit("return"))))
          .otherwise(col("data")))
      .drop("__rn")
  }
}
