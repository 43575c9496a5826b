package graft.config

/** One row of the AggregationVariables rule catalog ("codes").
  *
  * Mirrors the reference's 23-column table (model.py:175-228) reduced to the
  * fields that drive computation; presentation-only columns (name, source,
  * alert_desc, case_def, …) are omitted.
  *
  * @param id                   string code id written into `variables`
  * @param typ                  data type the code applies to (case/visit/register)
  * @param form                 source form the code reads
  * @param multipleLink         aggregation over linked rows: last/first/count/any/all
  *                             (codes/to_codes.py:217-242); None = main form
  * @param dbColumn             `;`-separated column spec, one entry per method term;
  *                             an entry may be `,`-separated (multi-column calc)
  * @param method               `(match|sub_match|between|value|not_null|calc)
  *                             ((and|or) …)*` (variable.py:29-73)
  * @param condition            `;`-separated condition lists, `,`-separated values
  * @param calculation          arithmetic string for calc/between; "date" for value
  * @param category             categories this code contributes to
  * @param alert / alertType    individual-alert tagging (to_codes.py:292-301)
  * @param disregard            route record to disregarded_data (to_codes.py:302-309)
  * @param calculationGroup     mutual-exclusion group: first hit wins
  * @param calculationPriority  within a priority group, the *lowest* value wins
  */
final case class CodeDef(
    id: String,
    typ: String = "case",
    form: String = "form",
    multipleLink: Option[String] = None,
    dbColumn: String = "",
    method: String = "match",
    condition: String = "",
    calculation: String = "",
    category: Seq[String] = Nil,
    alert: Boolean = false,
    alertType: String = "",
    disregard: Boolean = false,
    calculationGroup: Option[String] = None,
    calculationPriority: Option[Int] = None) {

  /** Per-term column specs: `;`-separated; each either one column or a list. */
  def columnsPerTerm: Seq[Seq[String]] =
    dbColumn.split(";", -1).toSeq.map { entry =>
      if (entry.contains(",")) entry.split(",", -1).toSeq.map(_.trim)
      else Seq(entry)
    }

  /** Per-term condition lists (variable.py:55-63): `,`-split + strip; a list
    * containing "" also matches missing values. */
  def conditionsPerTerm: Seq[Seq[String]] =
    condition.split(";", -1).toSeq.map { entry =>
      if (entry.contains(",")) entry.split(",", -1).toSeq.map(_.trim)
      else Seq(entry)
    }

  def methodTerms: Seq[String] = method.split(" ").toSeq.zipWithIndex.collect {
    case (t, i) if i % 2 == 0 => t
  }

  def boolOps: Seq[String] = method.split(" ").toSeq.zipWithIndex.collect {
    case (t, i) if i % 2 == 1 => t
  }
}
