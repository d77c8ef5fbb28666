package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

class BuildersSpec extends AnyFunSuite {
  import Builders._

  test("default layer naming rules") {
    assert(defaultLayer("umd_glad_alerts", "date_conf") == "umd_glad_alerts__date")
    assert(defaultLayer("whrc_aboveground_biomass_stock_2000", "Mg_ha-1") ==
      "whrc_aboveground_biomass_stock_2000__Mg")
    assert(defaultLayer("gfw_forest_flux", "Mg_CO2e_ha_yr-1") ==
      "gfw_forest_flux__Mg_CO2e")
    assert(defaultLayer("ifl", "is") == "is__ifl")
    assert(defaultLayer("umd_tree_cover_loss", "year") == "umd_tree_cover_loss__year")
  }

  test("zonal query assembly with TCD translation and bool filters") {
    val q = zonalQuery(
      sumLayers = Seq("area__ha"),
      groupBy = Seq("umd_tree_cover_loss__year"),
      filters = Seq("umd_tree_cover_density_2000__30", "is__ifl_intact_forest_landscapes"))
    assert(q == "select sum(area__ha) from data " +
      "where umd_tree_cover_density_2000__threshold >= 30 " +
      "and is__ifl_intact_forest_landscapes != 'false' " +
      "group by umd_tree_cover_loss__year")
  }

  test("date filters: TCL year vs GLAD date, absent otherwise") {
    assert(dateFilter("2019-05-01", ">=", Seq("umd_tree_cover_loss__year"))
      .contains("umd_tree_cover_loss__year >= 2019"))
    assert(dateFilter("2019", ">=", Seq("umd_tree_cover_loss__year"))
      .contains("umd_tree_cover_loss__year >= 2019"))
    assert(dateFilter("2019-05-01", "<=", Seq("umd_glad_alerts__date"))
      .contains("umd_glad_landsat_alerts__date <= '2019-05-01'"))
    assert(dateFilter("2019-05-01", ">=", Seq("other__layer")).isEmpty)
  }

  test("deprecated rewrites: isoweek, glad rename, alert count") {
    val q = zonalQuery(
      sumLayers = Seq("alert__count"),
      groupBy = Seq("umd_glad_alerts__isoweek"),
      filters = Nil)
    assert(q == "select count(*) from data " +
      "group by isoweek(umd_glad_landsat_alerts__date)")
  }

  test("tcl-by-driver query shape") {
    val q = tclByDriverQuery(30, "tsc_tree_cover_loss_drivers__driver")
    assert(q == "SELECT SUM(area__ha), SUM(gfw_forest_carbon_gross_emissions__Mg_CO2e) " +
      "FROM data WHERE umd_tree_cover_density_2000__threshold >= 30 " +
      "GROUP BY umd_tree_cover_loss__year, tsc_tree_cover_loss_drivers__driver")
  }

  test("tcl-by-driver totals sort by driver code, not alphabetically") {
    val rows = Seq(
      TclRow("Wildfire", 2019, 10.0, 1.0),
      TclRow("Unknown", 2019, 1.0, 0.5),
      TclRow("Wildfire", 2020, 5.0, 2.0),
      TclRow("Forestry", 2020, 2.0, 0.25))
    val totals = tclByDriverTotals(rows)
    assert(totals.map(_._1) == Seq("Unknown", "Forestry", "Wildfire"))
    assert(totals.find(_._1 == "Wildfire").get._2 == 15.0)
    assert(totals.find(_._1 == "Wildfire").get._3 == 3.0)
  }
}
