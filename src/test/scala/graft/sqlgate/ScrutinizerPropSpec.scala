package graft.sqlgate

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the SQL gate (round-7 verdict ask #6): the 18+
  * golden cases pin the reference's exact strings; this sweeps
  * GENERATED benign single-SELECTs (must pass through byte-exact —
  * the reference's RawStream contract) and hostile mutations of them
  * (must reject with the reference's message), so a regression in the
  * validator fails on queries nobody hand-picked. The security
  * property under test: NO mutation class ever passes. */
class ScrutinizerPropSpec extends AnyFunSuite {

  private val ds = "test_dataset"
  private val v = "v2025"

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  private def ok(sql: String): String = Scrutinizer.scrutinize(ds, v, None, sql)
  private def detail(sql: String): String =
    intercept[SqlGateException](ok(sql)).detail

  // ---------------------------------------------------------- generators

  // a fixed identifier pool keeps generated text inside Catalyst's
  // grammar AND clear of PG value-function keywords ("user", ...)
  private val idents = Seq("x", "y", "qty", "val", "flag", "col_a", "b2")
  private val genIdent: Gen[String] = Gen.oneOf(idents)

  /** Select-list items; includes the quoting edge cases the gate must
    * NOT trip on: an escaped quote, a semicolon inside a literal, and
    * a blocked function NAME inside a literal. */
  private val genItem: Gen[String] = Gen.oneOf(
    genIdent,
    genIdent.map(i => s"count(*) AS cnt_$i"),
    genIdent.map(i => s"sum($i) AS s_$i"),
    genIdent.map(i => s"abs($i) AS a_$i"),
    genIdent.map(i => s"$i + 1 AS p_$i"),
    Gen.zip(genIdent, genIdent).map { case (a, b) => s"coalesce($a, $b) AS c_$a" },
    Gen.const("'it''s' AS lit1"),
    Gen.const("'se;lect' AS lit2"),
    Gen.const("'pg_sleep(1)' AS lit3"),
    Gen.const("1 AS one"))

  private val genPred: Gen[String] = Gen.oneOf(
    genIdent.map(i => s"$i > 5"),
    genIdent.map(i => s"$i IS NOT NULL"),
    genIdent.map(i => s"$i LIKE 'a%'"),
    genIdent.map(i => s"$i IN (1, 2, 3)"),
    genIdent.map(i => s"$i = 'dro;p it''s'"))

  private val genWhere: Gen[String] = Gen.frequency(
    2 -> Gen.const(""),
    2 -> genPred.map(p => s" WHERE $p"),
    1 -> Gen.zip(genPred, Gen.oneOf("AND", "OR"), genPred)
      .map { case (a, op, b) => s" WHERE $a $op $b" })

  private val genTail: Gen[String] = Gen.frequency(
    3 -> Gen.const(""),
    1 -> genIdent.map(i => s" GROUP BY $i"),
    1 -> genIdent.map(i => s" GROUP BY $i HAVING count(*) > 1"),
    1 -> genIdent.map(i => s" ORDER BY $i DESC"),
    1 -> Gen.chooseNum(1, 500).map(n => s" LIMIT $n"),
    1 -> Gen.zip(Gen.chooseNum(1, 500), Gen.chooseNum(0, 50))
      .map { case (l, o) => s" LIMIT $l OFFSET $o" })

  private val genFromTarget: Gen[String] = Gen.oneOf(
    s"$ds.$v", s"$ds.$v AS foo", s"$ds.$v AS t1")

  /** A benign single-SELECT over the declared dataset.version. */
  private val genBenign: Gen[String] = for {
    star <- Gen.frequency(1 -> Gen.const(true), 4 -> Gen.const(false))
    items <- if (star) Gen.const(Seq("*"))
             else Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, genItem))
    from <- genFromTarget
    where <- genWhere
    tail <- genTail
  } yield s"SELECT ${items.distinct.mkString(", ")} FROM $from$where$tail"

  // ---------------------------------------------------------- properties

  test("benign single-SELECTs pass through byte-exact") {
    check("benign", Prop.forAll(genBenign) { sql => ok(sql) == sql })
  }

  test("a second statement is always rejected, wherever it hides") {
    val genPayload = Gen.oneOf("DROP TABLE t", "DELETE FROM t",
      "SELECT 1", "TRUNCATE TABLE t")
    check("multi", Prop.forAll(genBenign, genPayload) { (sql, payload) =>
      detail(s"$sql; $payload") == "Must use exactly one SQL statement." &&
        detail(s"$sql ; $payload;") == "Must use exactly one SQL statement."
    })
  }

  test("non-SELECT statements are always rejected") {
    val genCmd = Gen.oneOf(
      s"DELETE FROM $ds.$v WHERE x = 1",
      s"INSERT INTO $ds.$v VALUES (1)",
      s"UPDATE $ds.$v SET x = 1",
      "DROP TABLE t",
      "CREATE TABLE t (id INT)",
      "TRUNCATE TABLE t")
    check("cmd", Prop.forAll(genCmd) { sql =>
      detail(sql) == "Must use SELECT statements only."
    })
  }

  test("WITH wrapping never sneaks a benign query through") {
    check("with", Prop.forAll(genBenign, genIdent) { (sql, q) =>
      detail(s"WITH $q AS ($sql) SELECT * FROM $q") ==
        "Must not have WITH clause."
    })
  }

  test("blocked functions are rejected in any expression position") {
    val genBad = Gen.oneOf(
      Gen.oneOf(ForbiddenFunctions.names.toSeq),
      genIdent.map(i => s"pg_$i"),
      genIdent.map(i => s"_$i"),
      Gen.const("postgis_version"))
    val genPos = Gen.oneOf("select", "where", "nested")
    check("fn", Prop.forAll(genBad, genPos) { (fn, pos) =>
      val sql = pos match {
        case "select" => s"SELECT $fn(x) AS bad FROM $ds.$v"
        case "where" => s"SELECT x FROM $ds.$v WHERE $fn(x) > 0"
        case _ => s"SELECT abs(1 + $fn(x)) AS bad FROM $ds.$v"
      }
      detail(sql) == "Use of admin, system or private functions is not allowed."
    })
  }

  test("SQL value-function keywords are rejected outside literals") {
    val genVf = Gen.oneOf("current_user", "session_user", "current_date",
      "current_timestamp", "localtime", "localtimestamp", "current_role")
    check("vf", Prop.forAll(genVf, genBenign) { (vf, sql) =>
      // injected as a bare keyword item into an otherwise-benign query
      val mutated = sql.replaceFirst("(?i)^SELECT ", s"SELECT $vf, ")
      detail(mutated) == "Use of sql value functions is not allowed." &&
        // ... but the same token INSIDE a string literal is data
        ok(s"SELECT '$vf' AS lit FROM $ds.$v") ==
          s"SELECT '$vf' AS lit FROM $ds.$v"
    })
  }

  test("FROM-position subqueries and extra tables are always rejected") {
    check("from", Prop.forAll(genBenign, genIdent) { (sql, t) =>
      detail(s"SELECT * FROM ($sql) $t") == "Must not use sub queries." &&
        detail(s"SELECT x FROM $ds.$v, other.$t") ==
          "Must list exactly one table in FROM clause." &&
        detail(s"SELECT x FROM $ds.$v JOIN other.$t ON 1 = 1") ==
          "Unexpected FROM clause structure."
    })
  }

  test("AOI splice preserves the benign prefix and ANDs the filter") {
    val geom = Some("""{"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]}""")
    check("aoi", Prop.forAll(genBenign) { sql =>
      val out = Scrutinizer.scrutinize(ds, v, geom, sql)
      out.contains("st_intersects(geom, st_setsrid(st_geomfromgeojson(") &&
        out.startsWith(sql.takeWhile(_ != ' ')) &&
        // the filter must be INSIDE the where, before any tail keyword
        (!sql.toUpperCase.contains(" ORDER BY") ||
          out.indexOf("st_intersects") < out.toUpperCase.indexOf(" ORDER BY") ||
          out.toUpperCase.indexOf(" ORDER BY") < 0)
    })
  }
}
