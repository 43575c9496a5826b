package graft.config

/** Configuration records mirroring the reference's country-config CSV/py
  * structures (country_config/demo_config.py, data_types.csv, demo_links.csv).
  * Loaded once at plan-build time; every operator compiles them into Column
  * expressions — config is code here, never data.
  */

/** One "data type" view over a form (util/data_types.py:5-15,
  * country_config/data_types.csv): a filtered projection of the form that
  * becomes an independent stream (Case / Visit / Register). */
final case class DataTypeDef(
    name: String,                    // e.g. "case"
    form: String,                    // main form, e.g. "demo_case"
    dbColumn: Option[String],        // filter column, None = no condition
    condition: Option[String],
    dateColumn: String,              // event-date column for epi weeks
    varName: String,                 // per-type counter code (e.g. "tot_1")
    multipleRow: Option[String] = None, // repeat-group count column for registers
    /** location resolution: "deviceid" (default, optionally
      * "deviceid:<col>:<prefix>") or "in_geometry$<xcol>,<ycol>"
      * (codes/to_codes.py:104-180) */
    location: String = "deviceid")

/** Record-linkage edge spec (country_config/demo_links.csv,
  * add_links.py:28-157). Methods per column pair: match | lower_match |
  * alert_match. */
final case class LinkDef(
    name: String,
    typ: String,                     // data type this link belongs to
    fromForm: String,
    toForm: String,
    fromColumns: Seq[String],
    toColumns: Seq[String],
    methods: Seq[String],
    orderByColumn: String,
    orderByIsDate: Boolean,
    fromCondition: Option[(String, String)] = None,
    toCondition: Option[(String, String)] = None)

/** initial_visit_control config (demo_config.py:21-30). */
final case class InitialVisitDef(
    form: String,
    identifierKeys: Seq[String],     // e.g. patientid, icd_code
    visitTypeKey: String,            // e.g. intro./visit
    visitDateKey: String,            // e.g. pt./visit_date
    moduleKey: String,               // e.g. intro./module
    moduleValue: String)             // e.g. "ncd"

/** quality_control step config (quality_control.py:14-148). */
final case class QualityControlDef(
    qcCodes: Seq[CodeDef] = Nil,             // type="import" codes
    exclusionUuids: Seq[String] = Nil,       // exclusion-list fixture
    onlyImportAfter: Option[String] = None,  // ISO timestamp lower gate
    importFraction: Option[Double] = None,   // random sampling gate
    approvedDeviceIds: Option[Seq[String]] = None,
    deviceStartDates: Map[String, String] = Map.empty, // deviceid → ISO date
    uuidField: String = "meta/instanceID")

/** Devices dimension (model.py:81-84): registered device ids with their
  * tag lists (JSONB upstream). Joined into the location block during
  * deviceid resolution (codes/to_codes.py:122-127 `tags:
  * devices.get(deviceid)`). */
final case class DeviceDef(
    deviceId: String,
    tags: Seq[String] = Nil)

/** Alert-variable spec for threshold / double-doubling detection
  * (add_multiple_alerts.py). `limits` semantics follow the reference:
  * 2 entries = (daily, weekly); 4 entries = separate hospital limits. */
final case class MultiAlertDef(
    varId: String,
    alertType: String,               // "threshold" | "double"
    limits: Seq[Int])
