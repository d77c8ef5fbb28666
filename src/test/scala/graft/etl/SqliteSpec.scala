package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level checks of the pure-JVM SQLite core. The golden
  * expectations (header layout, varint forms, record encodings) are
  * from the published file format (sqlite.org/fileformat2); the
  * fixture database produced here was additionally validated against
  * stock SQLite 3.40 (`PRAGMA integrity_check` → ok, full row
  * equality via the python3 sqlite3 module) while developing this
  * writer. */
class SqliteSpec extends AnyFunSuite {

  test("varint round-trips the documented forms") {
    val cases = Seq(0L, 1L, 127L, 128L, 300L, 16383L, 16384L,
      (1L << 31) - 1, 1L << 35, (1L << 56) - 1, 1L << 56, Long.MaxValue,
      -1L, Long.MinValue)
    for (v <- cases) {
      val b = Sqlite.varint(v)
      val (back, n) = Sqlite.readVarint(b, 0)
      assert(back == v && n == b.length, s"$v -> ${b.toSeq} -> $back")
    }
    assert(Sqlite.varint(127L).toSeq == Seq(0x7f.toByte))
    assert(Sqlite.varint(128L).toSeq == Seq(0x81.toByte, 0x00.toByte))
    assert(Sqlite.varint(-1L).length == 9)
  }

  test("records round-trip every supported type") {
    val row = Seq(null, 0L, 1L, -5L, 300L, 1234567890123L, 2.5,
      "héllo", Array[Byte](1, 2, 3), true)
    val bytes = Sqlite.record(row)
    val back = Sqlite.readRecord(bytes, 0)
    assert(back(0) == null && back(1) == 0L && back(2) == 1L && back(3) == -5L)
    assert(back(4) == 300L && back(5) == 1234567890123L && back(6) == 2.5)
    assert(back(7) == "héllo")
    assert(back(8).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3))
    assert(back(9) == 1L) // booleans store as integers
  }

  test("database round-trips through a multi-page b-tree") {
    val path = java.nio.file.Files.createTempFile("sq", ".db")
    val rows = (1 to 5000).map(i =>
      Seq[Any](i.toLong, s"name_$i", i * 0.5, if (i % 7 == 0) null else "x" * (i % 40)))
    Sqlite.writeDb(path, Seq(
      Sqlite.TableDef("items",
        "CREATE TABLE items (id INTEGER PRIMARY KEY, name TEXT, score REAL, note TEXT)",
        rows, rowidAlias = Some(0))))
    val db = java.nio.file.Files.readAllBytes(path)
    // header golden bytes
    assert(new String(db, 0, 15, "US-ASCII") == "SQLite format 3" && db(15) == 0)
    assert(((db(16) & 0xff) << 8 | (db(17) & 0xff)) == 1) // 64 KiB pages
    assert(java.nio.ByteBuffer.wrap(db, 68, 4).getInt == 0x47504b47) // "GPKG"
    val back = Sqlite.readTable(db, "items")
    assert(back.length == 5000)
    // rowid aliasing: the id column stores NULL, the rowid carries it
    assert(back.head._1 == 1L && back.head._2.head == null)
    assert(back.last._1 == 5000L)
    assert(back(6)._2(3) == null) // id 7: note null
    assert(back(41)._2(1) == "name_42" && back(41)._2(2) == 21.0)
    // rowids ascend across leaf boundaries (b-tree order)
    assert(back.map(_._1) == (1L to 5000L))
  }

  test("oversized rows are rejected (no overflow pages)") {
    val path = java.nio.file.Files.createTempFile("sq2", ".db")
    val big = "y" * 70000
    val e = intercept[IllegalArgumentException] {
      Sqlite.writeDb(path, Seq(Sqlite.TableDef("t",
        "CREATE TABLE t (v TEXT)", Seq(Seq(big)))))
    }
    assert(e.getMessage.contains("inline payload cap"))
  }
}
