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

  test("unique-constraint indexes write sqlite_autoindex b-trees") {
    // validated against stock SQLite 3.40: integrity_check ok,
    // PRAGMA index_list reports origins pk/u, WHERE lookups on the
    // key columns resolve through these trees
    val path = java.nio.file.Files.createTempFile("sqi", ".db")
    val rows = Seq[Seq[Any]](
      Seq("cherry", 3L, "c"), Seq("apple", 1L, "a"), Seq("banana", 2L, "b"))
    Sqlite.writeDb(path, Seq(
      Sqlite.TableDef("fruit",
        "CREATE TABLE fruit (name TEXT NOT NULL PRIMARY KEY, rank INTEGER UNIQUE, tag TEXT)",
        rows,
        indexes = Seq(
          Sqlite.IndexDef("sqlite_autoindex_fruit_1", Seq(0)),
          Sqlite.IndexDef("sqlite_autoindex_fruit_2", Seq(1))))))
    val db = java.nio.file.Files.readAllBytes(path)
    // sqlite_master carries the two index rows with sql NULL (the
    // autoindex rule) right after their table
    val master = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      val nCells = ((db(103) & 0xff) << 8) | (db(104) & 0xff)
      for (i <- 0 until nCells) {
        val off = ((db(108 + 2 * i) & 0xff) << 8) | (db(109 + 2 * i) & 0xff)
        val (_, n0) = Sqlite.readVarint(db, off)
        val (_, n1) = Sqlite.readVarint(db, off + n0)
        out += Sqlite.readRecord(db, off + n0 + n1)
      }
      out.toSeq
    }
    assert(master.map(r => (r(0), r(1))) == Seq(
      ("table", "fruit"),
      ("index", "sqlite_autoindex_fruit_1"),
      ("index", "sqlite_autoindex_fruit_2")))
    master.drop(1).foreach(r => assert(r(4) == null, r))
    // each index root is a single 0x0A leaf whose key records sort by
    // BINARY collation and end with the rowid
    def indexEntries(name: String): Seq[Seq[Any]] = {
      val root = master.collectFirst {
        case r if r(1) == name => r(3).asInstanceOf[Long].toInt
      }.get
      val base = (root - 1) * Sqlite.PageSize
      assert((db(base) & 0xff) == 0x0a, s"page type of $name")
      val nCells = ((db(base + 3) & 0xff) << 8) | (db(base + 4) & 0xff)
      (0 until nCells).map { i =>
        val off = base +
          (((db(base + 8 + 2 * i) & 0xff) << 8) | (db(base + 9 + 2 * i) & 0xff))
        val (_, n0) = Sqlite.readVarint(db, off)
        Sqlite.readRecord(db, off + n0)
      }
    }
    // names sort lexically; rowids follow the original row order
    assert(indexEntries("sqlite_autoindex_fruit_1") == Seq(
      Seq("apple", 2L), Seq("banana", 3L), Seq("cherry", 1L)))
    assert(indexEntries("sqlite_autoindex_fruit_2") == Seq(
      Seq(1L, 2L), Seq(2L, 3L), Seq(3L, 1L)))
    // duplicate keys are refused (UNIQUE semantics)
    val e = intercept[IllegalArgumentException] {
      Sqlite.writeDb(java.nio.file.Files.createTempFile("sqd", ".db"), Seq(
        Sqlite.TableDef("t", "CREATE TABLE t (v TEXT PRIMARY KEY)",
          Seq(Seq("x"), Seq("x")),
          indexes = Seq(Sqlite.IndexDef("sqlite_autoindex_t_1", Seq(0))))))
    }
    assert(e.getMessage.contains("duplicate key"))
  }

  test("cyclic b-tree pages fail cleanly instead of unbounded recursion") {
    // build a valid single-table db, then corrupt the table's root
    // into an interior page whose rightmost child is ITSELF — the
    // walk must raise a catchable error, not StackOverflowError
    val path = java.nio.file.Files.createTempFile("sqc", ".db")
    Sqlite.writeDb(path, Seq(Sqlite.TableDef("t",
      "CREATE TABLE t (v TEXT)", Seq(Seq("x")))))
    val db = java.nio.file.Files.readAllBytes(path)
    val rootBase = (2 - 1) * Sqlite.PageSize // table root is page 2
    db(rootBase) = 0x05.toByte // interior
    db(rootBase + 3) = 0; db(rootBase + 4) = 0 // no cells
    val bb = java.nio.ByteBuffer.wrap(db)
    bb.putInt(rootBase + 8, 2) // rightmost child = page 2 (itself)
    val e = intercept[IllegalArgumentException](Sqlite.readTable(db, "t"))
    assert(e.getMessage.contains("cyclic"), e.getMessage)
    // an out-of-range child pointer is equally clean
    bb.putInt(rootBase + 8, 9999)
    val e2 = intercept[IllegalArgumentException](Sqlite.readTable(db, "t"))
    assert(e2.getMessage.contains("outside"), e2.getMessage)
  }

  test("payloads past the inline threshold spill to overflow chains and read back") {
    val path = java.nio.file.Files.createTempFile("sq2", ".db")
    // mixed sizes around every boundary: X = 65501 (inline max),
    // one-overflow-page, multi-page chains, interleaved small rows
    def blob(n: Int, seed: Int): Array[Byte] = {
      var s = seed.toLong
      Array.fill(n) {
        s = s * 6364136223846793005L + 1442695040888963407L
        (s >>> 56).toByte
      }
    }
    val rows: Seq[Seq[Any]] = Seq(
      Seq(1L, "small"),
      Seq(2L, blob(65490, 7)),    // just under X with record header
      Seq(3L, blob(65520, 11)),   // just over: one overflow page
      Seq(4L, "y" * 70000),       // text spill
      Seq(5L, blob(200000, 13)),  // 3-page chain
      Seq(6L, "tail"))
    Sqlite.writeDb(path, Seq(Sqlite.TableDef("t",
      "CREATE TABLE t (id INTEGER PRIMARY KEY, v)", rows,
      rowidAlias = Some(0))))
    val db = java.nio.file.Files.readAllBytes(path)
    val back = Sqlite.readTable(db, "t")
    assert(back.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    def v(i: Int): Any = back(i)._2(1)
    assert(v(0) == "small" && v(5) == "tail")
    assert(v(1).asInstanceOf[Array[Byte]].toSeq ==
      rows(1)(1).asInstanceOf[Array[Byte]].toSeq)
    assert(v(2).asInstanceOf[Array[Byte]].toSeq ==
      rows(2)(1).asInstanceOf[Array[Byte]].toSeq)
    assert(v(3) == "y" * 70000)
    assert(v(4).asInstanceOf[Array[Byte]].toSeq ==
      rows(4)(1).asInstanceOf[Array[Byte]].toSeq)
    // the db size header counts the overflow pages too
    val pages = java.nio.ByteBuffer.wrap(db, 28, 4).getInt
    assert(pages.toLong * Sqlite.PageSize == db.length, s"$pages pages")
    // a corrupt chain fails cleanly, not endlessly: truncating the
    // file leaves a chain pointer past EOF → targeted require
    val short = java.util.Arrays.copyOfRange(db, 0, db.length - Sqlite.PageSize)
    intercept[IllegalArgumentException](Sqlite.readTable(short, "t"))
  }

  test("corrupt overflow metadata fails with targeted errors, no blind allocation") {
    // one spilled row: pages are [1: master][2: overflow][3: leaf]
    val path = java.nio.file.Files.createTempFile("sq3", ".db")
    Sqlite.writeDb(path, Seq(Sqlite.TableDef("t",
      "CREATE TABLE t (v TEXT)", Seq(Seq("y" * 70000)))))
    val db = java.nio.file.Files.readAllBytes(path)
    val leafBase = 2 * Sqlite.PageSize
    assert((db(leafBase) & 0xff) == 0x0d, "expected the leaf on page 3")
    val cellOff = leafBase +
      (((db(leafBase + 8) & 0xff) << 8) | (db(leafBase + 9) & 0xff))
    val (plen, n0) = Sqlite.readVarint(db, cellOff)
    val (_, n1) = Sqlite.readVarint(db, cellOff + n0)
    assert(n0 == 3, s"expected a 3-byte payload-length varint, got $n0")
    // 1. declared payload far past EOF: the reject happens BEFORE the
    //    allocation (same 3-byte varint slot, value 2^21-1 > file)
    val huge = db.clone()
    huge(cellOff) = 0xff.toByte
    huge(cellOff + 1) = 0xff.toByte
    huge(cellOff + 2) = 0x7f.toByte
    val e1 = intercept[IllegalArgumentException](Sqlite.readTable(huge, "t"))
    assert(e1.getMessage.contains("exceeds"), e1.getMessage)
    // 2. chain pointer at a page that only PARTIALLY exists (file
    //    extended by a ragged tail): whole-page bound must catch it
    val inline = Sqlite.tableLeafInline(plen, Sqlite.PageSize)
    val ragged = db ++ new Array[Byte](10) // "page 4" starts, 10 B long
    val bb = java.nio.ByteBuffer.wrap(ragged)
    bb.putInt(cellOff + n0 + n1 + inline, 4) // overflow ptr → page 4
    val e2 = intercept[IllegalArgumentException](Sqlite.readTable(ragged, "t"))
    assert(e2.getMessage.contains("outside"), e2.getMessage)
  }

  test("index keys past the spec's index inline maximum are rejected") {
    // X_index = (U-12)*64/255 - 23 = 16422 at U = 65536: a fully
    // inlined key past it would be misparsed by stock SQLite (it
    // expects a K/M split + overflow chain there)
    val path = java.nio.file.Files.createTempFile("sq4", ".db")
    val e = intercept[IllegalArgumentException] {
      Sqlite.writeDb(path, Seq(Sqlite.TableDef("t",
        "CREATE TABLE t (k TEXT PRIMARY KEY)", Seq(Seq("z" * 20000)),
        indexes = Seq(Sqlite.IndexDef("sqlite_autoindex_t_1", Seq(0))))))
    }
    assert(e.getMessage.contains("index inline maximum"), e.getMessage)
  }

  test("overflow spill matches stock SQLite byte layout (golden K/M split)") {
    // the spec formula at U = 65536: X = U-35 = 65501,
    // M = (U-12)*32/255 - 23 = 8199, K = M + (p-M) % (U-4)
    assert(Sqlite.tableLeafInline(65501, 65536) == 65501) // fits whole
    assert(Sqlite.tableLeafInline(65502, 65536) == 8199)  // K > X → M
    assert(Sqlite.tableLeafInline(70005, 65536) == 8199)
    assert(Sqlite.tableLeafInline(8199 + 65532, 65536) == 8199) // K = M
    assert(Sqlite.tableLeafInline(8199 + 2 * 65532, 65536) == 8199)
    assert(Sqlite.tableLeafInline(8199 + 65532 + 100, 65536) == 8299) // K ≤ X
  }
}
