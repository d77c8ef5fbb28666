package graft.sqlgate

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests mirroring the reference's 18 scrutinizer cases
  * (`tests_v2/unit/app/routes/datasets/utils/test_query_helpers.py`),
  * same inputs, same outputs / error strings. */
class ScrutinizerSpec extends AnyFunSuite {
  private val ds = "test_dataset"
  private val v = "v2025"

  private def ok(sql: String, dataset: String = ds, version: String = v,
                 geom: Option[String] = None): String =
    Scrutinizer.scrutinize(dataset, version, geom, sql)

  private def err(sql: String, geom: Option[String] = None): String =
    intercept[SqlGateException](ok(sql, geom = geom)).detail

  test("passes through benign queries") {
    val sql = "SELECT * FROM test_dataset.v2025"
    assert(ok(sql) == sql)
  }

  test("passes through benign FROM with AS") {
    val sql = "SELECT * FROM test_dataset.v2025 AS foo"
    assert(ok(sql) == sql)
  }

  test("passes through benign with multiple AS") {
    val sql = "SELECT count(*) AS foo, 1 AS bar FROM test_dataset.v2025"
    assert(ok(sql) == sql)
  }

  test("quotes version and dataset with dots") {
    assert(ok("""SELECT * FROM test."v1.1.1"""", "test", "v.1.1.1") ==
      """SELECT * FROM "test"."v.1.1.1"""")
  }

  // --- dotted-version quoting edge forms (query_helpers.py:269-271,
  // 360-380, 424-437): quote_ident doubles embedded quotes, aliases
  // survive the rewrite (bare aliases gain AS), quoted/schema-qualified
  // FROM targets are consumed whole, clause tails stay intact ---

  test("dotted version preserves an AS alias") {
    assert(ok("SELECT t.a FROM x AS t WHERE t.a > 1", "test", "v1.5") ==
      """SELECT t.a FROM "test"."v1.5" AS t WHERE t.a > 1""")
  }

  test("bare alias gains AS in the rewritten FROM (reference alias_sql)") {
    assert(ok("SELECT t.a FROM test_dataset.v2025 t WHERE t.a > 1") ==
      "SELECT t.a FROM test_dataset.v2025 AS t WHERE t.a > 1")
  }

  test("quoted schema-qualified FROM target is consumed whole") {
    // the reference docstring example (`query_helpers.py:404-407`)
    assert(ok("""SELECT id FROM "mySchema".users WHERE active = true""") ==
      "SELECT id FROM test_dataset.v2025 WHERE active = true")
  }

  test("embedded double quote in the version doubles (quote_ident)") {
    assert(ok("SELECT * FROM x", "test", "v\"1.5") ==
      "SELECT * FROM \"test\".\"v\"\"1.5\"")
  }

  test("dotted version with FETCH/FOR-style tails keeps the tail") {
    assert(ok("SELECT * FROM x ORDER BY a OFFSET 5", "test", "v1.1.1") ==
      """SELECT * FROM "test"."v1.1.1" ORDER BY a OFFSET 5""")
  }

  test("quoting triggers on the VERSION only (reference's condition)") {
    // version carries a dot → both parts quote
    assert(ok("SELECT * FROM x", "my.schema", "v1.5") ==
      """SELECT * FROM "my.schema"."v1.5"""")
    // version without a dot → unquoted, even with a dotted dataset
    // (`query_helpers.py:374-377` branches on '.' in version alone)
    assert(ok("SELECT * FROM x", "my.schema", "v2") ==
      "SELECT * FROM my.schema.v2")
  }

  test("only one statement allowed") {
    assert(err("SELECT * FROM test_dataset.v2025; select * from something_else")
      == "Must use exactly one SQL statement.")
  }

  test("only SELECT statements allowed") {
    assert(err("DELETE FROM bar;") == "Must use SELECT statements only.")
  }

  test("must not have a WITH clause") {
    assert(err("WITH t as (select 1) SELECT * FROM version;")
      == "Must not have WITH clause.")
  }

  test("no sql value functions") {
    assert(err("select current_catalog from mytable;")
      == "Use of sql value functions is not allowed.")
  }

  test("only one table allowed") {
    assert(err("SELECT * FROM version, version2;")
      == "Must list exactly one table in FROM clause.")
  }

  test("no sub queries allowed") {
    assert(err("SELECT * FROM (select * from a) as b;")
      == "Must not use sub queries.")
  }

  test("no postgis functions allowed") {
    assert(err("SELECT PostGIS_Full_Version() FROM data;")
      == "Use of admin, system or private functions is not allowed.")
  }

  test("no admin functions allowed") {
    assert(err("SELECT pg_create_restore_point() FROM data;")
      == "Use of admin, system or private functions is not allowed.")
  }

  test("no sys functions allowed") {
    assert(err("SELECT txid_current() from mytable;")
      == "Use of admin, system or private functions is not allowed.")
  }

  test("forbidden functions not allowed") {
    assert(err("SELECT current_setting() FROM mytable;")
      == "Use of admin, system or private functions is not allowed.")
  }

  test("geometry filter with existing WHERE") {
    val geom = """{"type": "Point", "coordinates": [0, 0]}"""
    assert(ok("SELECT * FROM mytable WHERE id = 1", geom = Some(geom)) ==
      """SELECT * FROM test_dataset.v2025 WHERE id = 1 AND st_intersects(geom, st_setsrid(st_geomfromgeojson('{"type":"Point","coordinates":[0,0]}'), 4326))""")
  }

  test("geometry filter without WHERE") {
    val geom = """{"type": "Point", "coordinates": [0, 0]}"""
    assert(ok("SELECT * FROM mytable;", geom = Some(geom)) ==
      """SELECT * FROM test_dataset.v2025 WHERE st_intersects(geom, st_setsrid(st_geomfromgeojson('{"type":"Point","coordinates":[0,0]}'), 4326))""")
  }

  test("gibberish is a syntax error") {
    assert(err("foo;") == """syntax error at or near "foo", at index 0""")
  }

  test("replaces FROM when column and table are aliased") {
    assert(ok("SELECT country AS name FROM table_1_whatever AS fao") ==
      "SELECT country AS name FROM test_dataset.v2025 AS fao")
  }

  // ------- beyond the reference's golden set: semantics worth pinning

  test("geometry filter parenthesizes OR predicates") {
    val geom = """{"type": "Point", "coordinates": [0, 0]}"""
    val out = ok("SELECT * FROM t WHERE a = 1 OR b = 2", geom = Some(geom))
    assert(out.contains("WHERE (a = 1 OR b = 2) AND st_intersects"))
  }

  test("geometry filter lands before GROUP BY tail") {
    val geom = """{"type": "Point", "coordinates": [0, 0]}"""
    val out = ok("SELECT x, count(*) FROM t WHERE y > 0 GROUP BY x",
      geom = Some(geom))
    assert(out ==
      """SELECT x, count(*) FROM test_dataset.v2025 WHERE y > 0 AND st_intersects(geom, st_setsrid(st_geomfromgeojson('{"type":"Point","coordinates":[0,0]}'), 4326)) GROUP BY x""")
  }

  test("ORDER/LIMIT/OFFSET tails survive the FROM rewrite") {
    val sql = "SELECT a FROM t WHERE b = 1 ORDER BY a LIMIT 10 OFFSET 5"
    assert(ok(sql) ==
      "SELECT a FROM test_dataset.v2025 WHERE b = 1 ORDER BY a LIMIT 10 OFFSET 5")
  }

  test("underscore-prefixed functions blocked") {
    assert(err("SELECT _secret_fn(x) FROM t")
      == "Use of admin, system or private functions is not allowed.")
  }

  test("forbidden function nested in expression is caught") {
    assert(err("SELECT 1 + pg_ls_dir('/') FROM t")
      == "Use of admin, system or private functions is not allowed.")
  }

  test("value function not flagged inside string literal") {
    val sql = "SELECT 'current_catalog' AS s FROM test_dataset.v2025"
    assert(ok(sql) == sql)
  }

  test("percent-encoded SQL is decoded") {
    assert(ok("SELECT%20*%20FROM%20test_dataset.v2025")
      == "SELECT * FROM test_dataset.v2025")
  }
}
