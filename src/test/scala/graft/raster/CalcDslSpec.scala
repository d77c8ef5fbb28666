package graft.raster

import org.scalatest.funsuite.AnyFunSuite

class CalcDslSpec extends AnyFunSuite {

  test("variable detection") {
    assert(CalcDsl.variables("A % 10000") == Seq("A"))
    assert(CalcDsl.variables("A * 2 + B") == Seq("A", "B"))
    assert(CalcDsl.variables("floor(A / 10000)") == Seq("A"))
    // function names are not variables
    assert(!CalcDsl.variables("floor(A)").contains("F"))
  }

  test("astype translates to CAST") {
    assert(CalcDsl.toSql("floor(A / 10000).astype('uint8')") ==
      "CAST((floor(A / 10000)) AS int)")
    assert(CalcDsl.toSql("(A % 10000).astype(uint16)") ==
      "CAST(((A % 10000)) AS int)")
  }

  test("equality operator translates") {
    assert(CalcDsl.toSql("A == 5") == "A = 5")
  }

  test("single-band compiles to transform") {
    assert(CalcDsl.compileSql("A % 10000", Map("A" -> "px")) ==
      "transform(px, A -> A % 10000)")
  }

  test("two-band compiles to zip_with") {
    assert(CalcDsl.compileSql("A + B", Map("A" -> "pa", "B" -> "pb")) ==
      "zip_with(pa, pb, (A, B) -> A + B)")
  }

  test("three bands rejected") {
    intercept[IllegalArgumentException] {
      CalcDsl.compileSql("A + B + C", Map())
    }
  }

  test("date_conf round-trip: encode(decode(v)) == v") {
    // mirrors the reference's only property test
    // (tests_v2/.../test_query.py:845-864): value = conf*10000 + days
    for (conf <- 1 to 3; days <- Seq(0, 1, 1827, 2999, 9999)) {
      val v = conf * 10000 + days
      val dDays = v % 10000
      val dConf = math.floor(v / 10000.0).toInt
      assert(dConf * 10000 + dDays == v)
      val date = java.time.LocalDate.of(2015, 1, 1).plusDays(dDays)
      val back = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.of(2015, 1, 1), date).toInt
      assert(back == dDays)
    }
  }

  test("grid georeferencing") {
    val g = SyntheticEnv.grid
    assert(g.pixelDeg == 0.01)
    assert(g.tileId(0, 0) == "44N_000E")
    assert(g.tileId(3, 3) == "41N_003E")
    assert(g.lonCenterSql("gx") == "(0.0 + gx * 0.01 + 0.005)")
    assert(g.latCenterSql("gy") == "(44.0 - gy * 0.01 - 0.005)")
  }
}
