package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.config.DataTypeDef
import graft.functions.MapResolver

/** to_data_type step (reference
  * pipeline_worker/process_steps/to_data_type.py:16-49): conditional
  * multicast — each raw record of a form feeds 0..N typed streams. A record
  * belongs to a data type when the form is the type's main form and
  * `row[db_column] == condition` (or the type declares no condition).
  *
  * Rather than the reference's per-record loop, each data type is one
  * filtered projection of the form DataFrame — the scan is shared (Spark
  * reuses the exchange / parquet scan across branches) and each branch's
  * filter pushes down.
  */
object ToDataType {

  /** All typed streams for `form`, tagged with type/type_name columns. */
  def fanOut(form: DataFrame, formName: String,
             types: Seq[DataTypeDef]): Seq[(DataTypeDef, DataFrame)] = {
    val r = new MapResolver(col("data"))
    types.filter(_.form == formName).map { t =>
      val cond = (t.dbColumn, t.condition) match {
        case (Some(c), Some(v)) => r.get(c) === v
        case _                  => lit(true)
      }
      val df = form.filter(cond)
        .withColumn("type", lit(t.name))
        .withColumn("type_name", lit(t.name))
      (t, df)
    }
  }

  /** Tagged union of every stream (the shape the write path consumes). */
  def union(form: DataFrame, formName: String, types: Seq[DataTypeDef]): DataFrame =
    fanOut(form, formName, types).map(_._2).reduce(_.unionByName(_))
}
