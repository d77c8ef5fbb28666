package graft.analysis

/** The analysis / datamart query builders (SURVEY §7.1 #8) — pure
  * functions from request parameters to the OTF SQL dialect, plus the
  * tree-cover-loss-by-driver post-aggregation. Semantics mirror the
  * reference byte-for-byte where tests assert generated SQL:
  * `app/routes/analysis/analysis.py:95-156,172-183`,
  * `app/tasks/datamart/land.py:85`,
  * `app/models/pydantic/datamart.py:155-210`,
  * `app/routes/datasets/queries.py:628-651`.
  */
object Builders {

  val AreaDensitySuffixes: Seq[String] = Seq("_ha-1", "_ha_yr-1")

  /** `_get_area_density_name`: suffix-stripped name or "". */
  def areaDensityName(nm: String): String =
    AreaDensitySuffixes.find(nm.endsWith)
      .map(s => nm.dropRight(s.length)).getOrElse("")

  /** `_get_default_layer(dataset, pixel_meaning)`. */
  def defaultLayer(dataset: String, pixelMeaning: String): String = {
    val dn = areaDensityName(pixelMeaning)
    if (pixelMeaning == "is") s"is__$dataset"
    else if (pixelMeaning.contains("date_conf")) s"${dataset}__date"
    else if (dn.nonEmpty) s"${dataset}__$dn"
    else s"${dataset}__$pixelMeaning"
  }

  /** `_get_date_filter`: TCL gets a year comparison, GLAD a quoted
    * date, otherwise none. */
  def dateFilter(date: String, op: String, filterLayers: Seq[String]): Option[String] =
    if (filterLayers.contains("umd_tree_cover_loss__year")) {
      val year = if (date.length == 4) date else date.take(4)
      Some(s"umd_tree_cover_loss__year $op $year")
    } else if (filterLayers.contains("umd_glad_alerts__date")) {
      Some(s"umd_glad_landsat_alerts__date $op '$date'")
    } else None

  /** `_zonal_statistics`'s query assembly, including the ad-hoc TCD
    * threshold translation, `!= 'false'` boolean-layer filters, and
    * the deprecated-layer rewrites (A5). */
  def zonalQuery(sumLayers: Seq[String], groupBy: Seq[String],
                 filters: Seq[String],
                 startDate: Option[String] = None,
                 endDate: Option[String] = None): String = {
    val selectors = sumLayers.map(l => s"sum($l)").mkString(",")
    val groups = groupBy.mkString(",")
    val whereClauses = filters.map { l =>
      if (l.contains("umd_tree_cover_density"))
        s"${l.dropRight(2)}threshold >= ${l.takeRight(2)}"
      else s"$l != 'false'"
    } ++
      startDate.flatMap(d => dateFilter(d, ">=", groupBy ++ filters)) ++
      endDate.flatMap(d => dateFilter(d, "<=", groupBy ++ filters))

    var q = s"select $selectors from data"
    if (whereClauses.nonEmpty) q += s" where ${whereClauses.mkString(" and ")}"
    if (groups.nonEmpty) q += s" group by $groups"

    q.replace("umd_glad_alerts__isoweek", "isoweek(umd_glad_landsat_alerts__date)")
      .replace("umd_glad_alerts__date", "umd_glad_landsat_alerts__date")
      .replace("sum(alert__count)", "count(*)")
  }

  /** `compute_tree_cover_loss_by_driver`'s query (`land.py:85`). */
  def tclByDriverQuery(canopyCover: Int, driverField: String): String =
    "SELECT SUM(area__ha), SUM(gfw_forest_carbon_gross_emissions__Mg_CO2e) " +
      s"FROM data WHERE umd_tree_cover_density_2000__threshold >= $canopyCover " +
      s"GROUP BY umd_tree_cover_loss__year, $driverField"

  /** One (year, driver) result row of the TCL-by-driver query. */
  final case class TclRow(driver: String, lossYear: Int,
                          areaHa: Double, emissionsMg: Double)

  val DefaultDriverValueMap: Map[String, Int] = Map(
    "Unknown" -> 0, "Permanent agriculture" -> 1,
    "Commodity driven deforestation" -> 2, "Shifting agriculture" -> 3,
    "Forestry" -> 4, "Wildfire" -> 5, "Urbanization" -> 6,
    "Other natural disturbances" -> 7)

  /** `TreeCoverLossByDriverResult.from_rows`: the yearly rows pass
    * through; per-driver totals sum in mapped-pixel-value order (the
    * reference sorts by the driver code map, not alphabetically). */
  def tclByDriverTotals(rows: Seq[TclRow],
                        driverValueMap: Map[String, Int] = DefaultDriverValueMap)
      : Seq[(String, Double, Double)] =
    rows.sortBy(r => driverValueMap(r.driver))
      .groupBy(_.driver).toSeq
      .sortBy { case (d, _) => driverValueMap(d) }
      .map { case (d, rs) =>
        (d, rs.map(_.areaHa).sum, rs.map(_.emissionsMg).sum)
      }
}
