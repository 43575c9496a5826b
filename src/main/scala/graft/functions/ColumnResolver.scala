package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Abstraction over "where does a form field live" so the variable compiler
  * works both against schemaless form data (`data: Map[String,String]`, the
  * reference's JSONB column — model.py:28) and against flat typed columns
  * (the TPC-H-shaped gate tables).
  */
trait ColumnResolver {
  /** The field's value as a string column; null when absent. */
  def get(name: String): Column
  /** Whether the field exists for this row (boolean column). The reference
    * distinguishes a *missing* key (→ not applicable) from an empty value
    * (→ 0 in `calc`, fail in `between`) — variable.py:296-313. */
  def exists(name: String): Column
  /** The field parsed through the permissive date ladder. Default inlines
    * the ladder; resolvers backed by a pre-projection override it so the
    * ~10-format ladder is generated (and evaluated) ONCE per column instead
    * of once per referencing code. */
  def dateParsed(name: String): Column = VariableCompiler.parseDate(get(name))
}

/** Form data carried as MapType(String, String) — ODK values are all strings. */
final class MapResolver(data: Column) extends ColumnResolver {
  override def get(name: String): Column = element_at(data, name)
  override def exists(name: String): Column = element_at(data, name).isNotNull
}

/** Flat DataFrame columns; existence is static per schema. Values are cast to
  * string to mirror ODK's everything-is-a-string contract. */
final class FlatResolver(schema: Set[String]) extends ColumnResolver {
  override def get(name: String): Column =
    if (schema(name)) col(name).cast("string") else lit(null).cast("string")
  override def exists(name: String): Column = lit(schema(name))
}

/** Form fields pre-projected into bound attribute columns (`name → attr`).
  * ToCodes projects every distinct referenced column ONCE per row and
  * compiles the catalog against the attributes — interpreted evaluation of a
  * 200-code catalog otherwise repeats the map lookups per code per output.
  * @param dateAttrs columns whose date-parse is ALSO pre-projected
  *        (`name → attr holding parseDate(col)`) */
final class BoundResolver(attrs: Map[String, String],
                          dateAttrs: Map[String, String] = Map.empty)
    extends ColumnResolver {
  override def get(name: String): Column =
    attrs.get(name).map(col).getOrElse(lit(null).cast("string"))
  override def exists(name: String): Column =
    attrs.get(name).map(a => col(a).isNotNull).getOrElse(lit(false))
  override def dateParsed(name: String): Column =
    dateAttrs.get(name).map(col).getOrElse(super.dateParsed(name))
}
