package graft.config

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Location dimension (reference model.py:57-78 + the hierarchy-walk loader
  * database_setup.py:283-328): a 5-level tree
  * country → zone → region → district → clinic, with per-clinic deviceids.
  *
  * Denormalized at load time into one row per deviceid carrying the full
  * ancestor chain — the shape the coding step broadcast-joins against
  * (codes/to_codes.py:104-152 resolves clinic/district/region/zone from the
  * deviceid in one lookup).
  */
final case class LocationNode(
    id: Int,
    name: String,
    level: String,               // country | zone | region | district | clinic
    parent: Int,                 // 0 = root
    deviceIds: Seq[String] = Nil,
    clinicType: Option[String] = None,
    caseTypes: Seq[String] = Nil,
    startDate: Option[String] = None,
    population: Option[Long] = None,
    lon: Option[Double] = None,
    lat: Option[Double] = None,
    /** polygon rings as [x, y] vertex pairs (GeoJSON-style; for district
      * nodes used by in_geometry location resolution) */
    rings: Seq[Seq[(Double, Double)]] = Nil)

object Locations {

  final case class DeviceRow(
      deviceid: String, clinic: Int, clinic_type: String,
      case_type: Seq[String], district: Option[Int], region: Option[Int],
      zone: Option[Int], country: Int)

  /** Walk each clinic's parent chain once (config-sized, driver-side). */
  def denormalize(nodes: Seq[LocationNode]): Seq[DeviceRow] = {
    val byId = nodes.map(n => n.id -> n).toMap
    def ancestors(n: LocationNode): Map[String, Int] = {
      var cur = byId.get(n.parent)
      var acc = Map.empty[String, Int]
      while (cur.isDefined) {
        acc += cur.get.level -> cur.get.id
        cur = byId.get(cur.get.parent)
      }
      acc
    }
    for {
      clinic <- nodes if clinic.level == "clinic"
      chain = ancestors(clinic)
      device <- clinic.deviceIds
    } yield DeviceRow(
      deviceid = device,
      clinic = clinic.id,
      clinic_type = clinic.clinicType.orNull,
      case_type = clinic.caseTypes,
      district = chain.get("district"),
      region = chain.get("region"),
      zone = chain.get("zone"),
      country = chain.getOrElse("country", 1))
  }

  /** Broadcast-sized dimension DataFrame keyed by deviceid. */
  def deviceDimension(spark: SparkSession, nodes: Seq[LocationNode]): DataFrame = {
    import spark.implicits._
    denormalize(nodes).toDF()
  }

  final case class DistrictRow(district: Int, region: Option[Int],
                               zone: Option[Int], country: Int,
                               rings: Seq[Seq[Seq[Double]]])

  /** District polygon dimension for in_geometry location resolution
    * (codes/to_codes.py:154-180 scans district areas). Broadcast-sized. */
  def districtDimension(spark: SparkSession, nodes: Seq[LocationNode]): DataFrame = {
    import spark.implicits._
    val byId = nodes.map(n => n.id -> n).toMap
    def levelOf(id: Int, level: String): Option[Int] = {
      var cur = byId.get(id)
      while (cur.isDefined && cur.get.level != level)
        cur = byId.get(cur.get.parent)
      cur.map(_.id)
    }
    nodes.filter(n => n.level == "district" && n.rings.nonEmpty)
      .map(d => DistrictRow(d.id,
        levelOf(d.parent, "region"), levelOf(d.parent, "zone"),
        levelOf(d.parent, "country").getOrElse(1),
        d.rings.map(_.map { case (x, y) => Seq(x, y) })))
      .toDF()
  }

  /** Population rollup (reference database_setup.py:157-166): clinic
    * populations accumulate up the parent chain. Config-sized, driver-side. */
  def populationRollup(nodes: Seq[LocationNode]): Map[Int, Long] = {
    val byId = nodes.map(n => n.id -> n).toMap
    val acc = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    nodes.foreach { n =>
      val pop = n.population.getOrElse(0L)
      var cur: Option[LocationNode] = Some(n)
      while (cur.isDefined) {
        acc(cur.get.id) += pop
        cur = byId.get(cur.get.parent)
      }
    }
    acc.toMap
  }
}
