package graft.etl

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** Minimal pure-JVM SQLite 3 database writer + reader — just enough of
  * the public file format (sqlite.org/fileformat2) to build and parse
  * the GeoPackage containers the reference exchanges via ogr2ogr
  * (SURVEY §2.1 S3 vector formats / S12 file exports; no GDAL or
  * SQLite library exists in this build, so the container is written
  * byte-by-byte):
  *
  *   - one file = 64 KiB pages; page 1 carries the 100-byte header and
  *     the `sqlite_master` table b-tree (schema rows);
  *   - each table is a table b-tree (leaf type 0x0D, interior 0x05)
  *     of record cells (varint serial-type header + body);
  *   - TEXT/composite PRIMARY KEY and UNIQUE constraints materialize
  *     as `sqlite_autoindex_*` index b-trees (single leaf, type 0x0A:
  *     key-record cells `(key values…, rowid)` in BINARY-collation
  *     order, `sql` NULL in `sqlite_master` — the autoindex rule);
  *   - table-leaf payloads past the spec's inline threshold spill to
  *     overflow-page chains (4-byte next pointer + data), using the
  *     format's exact K/M split so stock SQLite finds every byte
  *     where it expects it; index leaves keep the inline cap
  *     (constraint keys are short); no freelist, UTF-8 text.
  *
  * Output validates against stock SQLite (`PRAGMA integrity_check` via
  * the driver-side python3 sqlite3 module was used while developing
  * the golden fixtures in `SqliteSpec`).
  */
object Sqlite {

  val PageSize = 65536

  /** The spec's table-leaf inline portion of a payload of `p` bytes
    * (sqlite.org/fileformat2 §B-tree Pages): X = U-35 fits whole;
    * otherwise K = M + (p-M) % (U-4) bytes stay inline when K ≤ X,
    * else the minimum M — the remainder lives on overflow pages. */
  private[etl] def tableLeafInline(p: Long, u: Int): Int = {
    val x = u - 35
    if (p <= x) p.toInt
    else {
      val m = (u - 12) * 32 / 255 - 23
      val k = m + ((p - m) % (u - 4))
      if (k <= x) k.toInt else m
    }
  }

  // ------------------------------------------------------------ varints

  private[etl] def varint(v: Long): Array[Byte] = {
    if (v >= 0 && v <= 127) return Array(v.toByte)
    // up to 9 bytes, big-endian 7-bit groups; 9th byte carries 8 bits
    val out = new ArrayBuffer[Byte](9)
    var x = v
    val needs9 = java.lang.Long.numberOfLeadingZeros(if (x < 0) -1L else x) < 8
    if (needs9 || x < 0) {
      // canonical 9-byte form for negatives / huge values
      val b = new Array[Byte](9)
      b(8) = (x & 0xff).toByte
      x >>= 8
      var i = 7
      while (i >= 0) { b(i) = ((x & 0x7f) | 0x80).toByte; x >>= 7; i -= 1 }
      return b
    }
    while (x != 0) { out.prepend((x & 0x7f).toByte); x >>>= 7 }
    var i = 0
    while (i < out.length - 1) { out(i) = (out(i) | 0x80).toByte; i += 1 }
    out.toArray
  }

  /** Decode a varint at `off`; returns (value, bytesRead). */
  private[etl] def readVarint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(off + i)
      if ((x & 0x80) == 0) return (v << 7 | (x & 0x7f), i + 1)
      v = v << 7 | (x & 0x7f)
      i += 1
    }
    (v << 8 | (b(off + 8) & 0xff), 9)
  }

  // ------------------------------------------------------------ records

  /** Serialize one record (SQLite record format). Values: null, Long,
    * Double, String, Array[Byte], Boolean. */
  private[etl] def record(values: Seq[Any]): Array[Byte] = {
    def serial(v: Any): (Long, Array[Byte]) = v match {
      case null => (0L, Array.empty)
      case b: Boolean => serial(if (b) 1L else 0L)
      case i: Int => serial(i.toLong)
      case x: Long =>
        if (x == 0) (8L, Array.empty)
        else if (x == 1) (9L, Array.empty)
        else if (x >= Byte.MinValue && x <= Byte.MaxValue) (1L, Array(x.toByte))
        else if (x >= Short.MinValue && x <= Short.MaxValue)
          (2L, ByteBuffer.allocate(2).putShort(x.toShort).array())
        else if (x >= Int.MinValue && x <= Int.MaxValue)
          (4L, ByteBuffer.allocate(4).putInt(x.toInt).array())
        else (6L, ByteBuffer.allocate(8).putLong(x).array())
      case d: Double => (7L, ByteBuffer.allocate(8).putDouble(d).array())
      case s: String =>
        val b = s.getBytes("UTF-8"); (13L + 2 * b.length, b)
      case b: Array[Byte] => (12L + 2 * b.length, b)
      case other => throw new IllegalArgumentException(
        s"unsupported SQLite value ${other.getClass}")
    }
    val parts = values.map(serial)
    val typeBytes = parts.flatMap { case (t, _) => varint(t) }.toArray
    // header length includes its own varint
    var hlen = typeBytes.length + 1
    if (varint(hlen).length > 1) hlen = typeBytes.length + varint(typeBytes.length + 2).length
    val header = varint(hlen) ++ typeBytes
    header ++ parts.flatMap(_._2)
  }

  /** Parse one record → values (ints → Long, floats → Double). */
  private[etl] def readRecord(b: Array[Byte], off: Int): Seq[Any] = {
    val (hlen, n0) = readVarint(b, off)
    var p = off + n0
    val types = ArrayBuffer.empty[Long]
    while (p < off + hlen) {
      val (t, n) = readVarint(b, p); types += t; p += n
    }
    var body = off + hlen.toInt
    types.toSeq.map { t =>
      def int(n: Int): Long = {
        var v = if ((b(body) & 0x80) != 0) -1L else 0L
        var i = 0
        while (i < n) { v = v << 8 | (b(body + i) & 0xff); i += 1 }
        body += n
        v
      }
      t match {
        case 0 => null
        case 1 => int(1)
        case 2 => int(2)
        case 3 => int(3)
        case 4 => int(4)
        case 5 => int(6)
        case 6 => int(8)
        case 7 =>
          val v = ByteBuffer.wrap(b, body, 8).getDouble; body += 8; v
        case 8 => 0L
        case 9 => 1L
        case n if n >= 13 && n % 2 == 1 =>
          val len = ((n - 13) / 2).toInt
          val s = new String(b, body, len, "UTF-8"); body += len; s
        case n if n >= 12 && n % 2 == 0 =>
          val len = ((n - 12) / 2).toInt
          val blob = java.util.Arrays.copyOfRange(b, body, body + len)
          body += len; blob
        case n => throw new IllegalArgumentException(s"serial type $n")
      }
    }
  }

  // ------------------------------------------------------------ writing

  private final case class Cell(rowid: Long, payload: Array[Byte])
  private final class Page(val data: Array[Byte] = new Array[Byte](PageSize))

  /** One table definition: CREATE SQL + rows. When `rowidAlias` is
    * set, that column is an INTEGER PRIMARY KEY — its value becomes
    * the rowid and the record stores NULL there (SQLite's rule).
    * Each [[IndexDef]] in `indexes` becomes a `sqlite_autoindex_*`
    * b-tree over the named key columns (what a TEXT/composite PRIMARY
    * KEY or UNIQUE constraint in `createSql` implies — stock SQLite
    * flags the database malformed when a declared constraint has no
    * tree). */
  final case class TableDef(name: String, createSql: String,
                            rows: Seq[Seq[Any]], rowidAlias: Option[Int] = None,
                            indexes: Seq[IndexDef] = Nil)

  /** A unique index over `keyCols` (indices into the row). `name`
    * follows SQLite's `sqlite_autoindex_<table>_<n>` convention for
    * constraint-implied indexes. */
  final case class IndexDef(name: String, keyCols: Seq[Int])

  /** BINARY-collation value order (sqlite.org/datatype3 §4.1):
    * NULL < numeric < text (memcmp of UTF-8) < blob (memcmp). */
  private def cmpVals(a: Any, b: Any): Int = {
    def rank(v: Any): Int = v match {
      case null => 0
      case _: Boolean | _: Int | _: Long | _: Double => 1
      case _: String => 2
      case _: Array[Byte] => 3
      case other => throw new IllegalArgumentException(
        s"unsupported index key ${other.getClass}")
    }
    def num(v: Any): Double = v match {
      case b: Boolean => if (b) 1.0 else 0.0
      case i: Int => i.toDouble
      case x: Long => x.toDouble
      case d: Double => d
    }
    def bytes(v: Any): Array[Byte] = v match {
      case s: String => s.getBytes("UTF-8")
      case b: Array[Byte] => b
    }
    val (ra, rb) = (rank(a), rank(b))
    if (ra != rb) Integer.compare(ra, rb)
    else ra match {
      case 0 => 0
      case 1 => java.lang.Double.compare(num(a), num(b))
      case _ => java.util.Arrays.compareUnsigned(bytes(a), bytes(b))
    }
  }

  private def cmpKeys(a: Seq[Any], b: Seq[Any]): Int =
    a.zip(b).iterator.map { case (x, y) => cmpVals(x, y) }
      .find(_ != 0).getOrElse(Integer.compare(a.length, b.length))

  def writeDb(path: java.nio.file.Path, tables: Seq[TableDef]): Unit = {
    val pages = ArrayBuffer.empty[Page] // index 0 = page 2
    def newPage(): (Page, Int) = {
      val p = new Page(); pages += p; (p, pages.length + 1)
    }

    def leafCells(t: TableDef): Seq[Cell] =
      t.rows.zipWithIndex.map { case (row, i) =>
        val rowid = t.rowidAlias match {
          case Some(c) => row(c).asInstanceOf[Number].longValue()
          case None => i + 1L
        }
        val stored = t.rowidAlias match {
          case Some(c) => row.updated(c, null)
          case None => row
        }
        Cell(rowid, record(stored))
      }

    /** The on-page image of one table-leaf cell: varint(FULL payload
      * length) + varint(rowid) + inline portion, plus the 4-byte
      * first-overflow-page number when the payload spills. Allocates
      * the overflow chain as a side effect — call once per cell. */
    def packCell(c: Cell): Array[Byte] = {
      val p = c.payload
      val inline = tableLeafInline(p.length, PageSize)
      val head = varint(p.length) ++ varint(c.rowid)
      if (inline == p.length) head ++ p
      else {
        val perPage = PageSize - 4
        val nPages = (p.length - inline + perPage - 1) / perPage
        val chain = Seq.fill(nPages)(newPage())
        var off = inline
        chain.zipWithIndex.foreach { case ((pg, _), idx) =>
          val next = if (idx + 1 < nPages) chain(idx + 1)._2 else 0
          ByteBuffer.wrap(pg.data).putInt(0, next)
          val n = math.min(perPage, p.length - off)
          System.arraycopy(p, off, pg.data, 4, n)
          off += n
        }
        head ++ p.take(inline) ++
          ByteBuffer.allocate(4).putInt(chain.head._2).array()
      }
    }

    /** Pack cells into leaf pages → (page number, max rowid) per leaf;
      * then stack interior levels until one root remains. Returns the
      * root page number. */
    def buildBtree(cells: Seq[Cell]): Int = {
      if (cells.isEmpty) { val (p, no) = newPage(); initLeaf(p, Nil, no == 1); return no }
      cells.sliding(2).foreach {
        case Seq(a, b) => require(a.rowid < b.rowid,
          s"rowids must strictly ascend (got ${a.rowid} then ${b.rowid})")
        case _ =>
      }
      // leaves (cells packed up front — overflow chains allocate here)
      val packed = cells.map(c => (c.rowid, packCell(c)))
      var leaves = ArrayBuffer.empty[(Int, Long)]
      var batch = ArrayBuffer.empty[(Long, Array[Byte])]
      var used = 8 // leaf header
      def flushLeaf(): Unit = if (batch.nonEmpty) {
        val (p, no) = newPage()
        initLeaf(p, batch.toSeq.map(_._2), pageOne = false)
        leaves += ((no, batch.last._1))
        batch = ArrayBuffer.empty[(Long, Array[Byte])]
        used = 8
      }
      packed.foreach { case (rowid, bytes) =>
        val sz = 2 + bytes.length
        if (used + sz > PageSize) flushLeaf()
        batch += ((rowid, bytes))
        used += sz
      }
      flushLeaf()
      // interior levels
      var level = leaves
      while (level.length > 1) {
        val next = ArrayBuffer.empty[(Int, Long)]
        var group = ArrayBuffer.empty[(Int, Long)]
        var iused = 12
        def flushInterior(): Unit = if (group.nonEmpty) {
          val (p, no) = newPage()
          initInterior(p, group.toSeq)
          next += ((no, group.last._2))
          group = ArrayBuffer.empty[(Int, Long)]
          iused = 12
        }
        level.foreach { child =>
          val sz = 2 + 4 + varint(child._2).length
          if (iused + sz > PageSize) flushInterior()
          group += child
          iused += sz
        }
        flushInterior()
        level = next
      }
      level.head._1
    }

    def initLeaf(p: Page, cellImages: Seq[Array[Byte]], pageOne: Boolean): Unit = {
      val base = if (pageOne) 100 else 0
      val buf = ByteBuffer.wrap(p.data)
      buf.put(base, 0x0d.toByte)
      buf.putShort(base + 3, cellImages.length.toShort)
      var content = PageSize
      val ptrs = cellImages.map { bytes =>
        content -= bytes.length
        System.arraycopy(bytes, 0, p.data, content, bytes.length)
        content
      }
      buf.putShort(base + 5, (content & 0xffff).toShort)
      ptrs.zipWithIndex.foreach { case (off, i) =>
        buf.putShort(base + 8 + 2 * i, (off & 0xffff).toShort)
      }
    }

    /** One index b-tree: a single 0x0A leaf of key records
      * `(key values…, rowid)` in BINARY-collation order. Metadata-
      * table constraints index a handful of rows; a 64 KiB leaf holds
      * thousands, and the writer rejects overflow rather than build
      * interior index pages. Returns the root page number. */
    def buildIndex(t: TableDef, idx: IndexDef): Int = {
      val entries = t.rows.zipWithIndex.map { case (row, i) =>
        val rowid = t.rowidAlias match {
          case Some(c) => row(c).asInstanceOf[Number].longValue()
          case None => i + 1L
        }
        idx.keyCols.map(row(_)) :+ (rowid: Any)
      }.sortWith(cmpKeys(_, _) < 0)
      entries.sliding(2).foreach {
        case Seq(x, y) => require(cmpKeys(x.dropRight(1), y.dropRight(1)) != 0,
          s"duplicate key in unique index ${idx.name}")
        case _ =>
      }
      val payloads = entries.map(record)
      // the spec's INDEX inline maximum, X = (U-12)*64/255 - 23: a
      // payload past it would need a K/M split + overflow chain on
      // read — stock SQLite would misparse a fully-inlined one.
      // Constraint keys are short; reject rather than spill.
      val indexInlineMax = (PageSize - 12) * 64 / 255 - 23
      payloads.foreach(p => require(p.length <= indexInlineMax,
        s"index ${idx.name} key of ${p.length} B exceeds the index " +
          s"inline maximum ($indexInlineMax B)"))
      val size = 8 + payloads.map(p => 2 + varint(p.length).length + p.length).sum
      require(size <= PageSize,
        s"index ${idx.name} exceeds one leaf page ($size B)")
      val (p, no) = newPage()
      val buf = ByteBuffer.wrap(p.data)
      buf.put(0, 0x0a.toByte)
      buf.putShort(3, payloads.length.toShort)
      var content = PageSize
      val ptrs = payloads.map { pay =>
        val bytes = varint(pay.length) ++ pay
        content -= bytes.length
        System.arraycopy(bytes, 0, p.data, content, bytes.length)
        content
      }
      buf.putShort(5, (content & 0xffff).toShort)
      ptrs.zipWithIndex.foreach { case (off, i) =>
        buf.putShort(8 + 2 * i, (off & 0xffff).toShort)
      }
      no
    }

    def initInterior(p: Page, children: Seq[(Int, Long)]): Unit = {
      val buf = ByteBuffer.wrap(p.data)
      buf.put(0, 0x05.toByte)
      val left = children.dropRight(1)
      buf.putShort(3, left.length.toShort)
      buf.putInt(8, children.last._1) // rightmost child
      var content = PageSize
      val ptrs = left.map { case (child, maxRowid) =>
        val bytes = ByteBuffer.allocate(4).putInt(child).array() ++ varint(maxRowid)
        content -= bytes.length
        System.arraycopy(bytes, 0, p.data, content, bytes.length)
        content
      }
      buf.putShort(5, (content & 0xffff).toShort)
      ptrs.zipWithIndex.foreach { case (off, i) =>
        buf.putShort(12 + 2 * i, (off & 0xffff).toShort)
      }
    }

    // build user tables + their constraint indexes, then
    // sqlite_master on page 1 (index rows carry sql NULL — the
    // autoindex convention)
    val masterRows = tables.flatMap { t =>
      val root = buildBtree(leafCells(t))
      Seq[Seq[Any]](Seq("table", t.name, t.name, root.toLong, t.createSql)) ++
        t.indexes.map(idx =>
          Seq[Any]("index", idx.name, t.name, buildIndex(t, idx).toLong, null))
    }
    val masterCells = masterRows.zipWithIndex.map { case (row, i) =>
      Cell(i + 1L, record(row))
    }
    val pageOne = new Page()
    initLeaf(pageOne, masterCells.map(packCell), pageOne = true)
    require(12 + masterCells.map(c => 2 + 13 + c.payload.length).sum < PageSize - 100,
      "schema does not fit on page 1")

    // header
    val h = ByteBuffer.wrap(pageOne.data)
    "SQLite format 3".getBytes("US-ASCII").zipWithIndex.foreach {
      case (b, i) => h.put(i, b)
    }
    h.put(15, 0.toByte)
    h.putShort(16, 1.toShort) // 65536 encoded as 0x0001
    h.put(18, 1.toByte).put(19, 1.toByte)
    h.put(21, 64.toByte).put(22, 32.toByte).put(23, 32.toByte)
    h.putInt(24, 1) // change counter
    h.putInt(28, pages.length + 1) // db size in pages
    h.putInt(40, 1) // schema cookie
    h.putInt(44, 4) // schema format
    h.putInt(56, 1) // UTF-8
    h.putInt(68, 0x47504b47) // application_id "GPKG"
    h.putInt(92, 1) // version-valid-for
    h.putInt(96, 3045000)

    val out = java.nio.file.Files.newOutputStream(path)
    try {
      out.write(pageOne.data)
      pages.foreach(p => out.write(p.data))
    } finally out.close()
  }

  // ------------------------------------------------------------ reading

  /** All (rowid, record) pairs of `table`, walking its b-tree. */
  def readTable(db: Array[Byte], table: String): Seq[(Long, Seq[Any])] = {
    val pageSizeRaw = ((db(16) & 0xff) << 8) | (db(17) & 0xff)
    val pageSize = if (pageSizeRaw == 1) 65536 else pageSizeRaw
    // .gpkg sources parse on EXECUTORS from user-supplied URIs: a
    // corrupt interior page re-pointing at an ancestor must fail as a
    // catchable exception, not unbounded recursion (StackOverflowError
    // would escape the creation DAG's exception handling)
    val visited = scala.collection.mutable.Set.empty[Int]
    def walk(pageNo: Int, out: ArrayBuffer[(Long, Seq[Any])]): Unit = {
      require(pageNo >= 1 && (pageNo.toLong - 1) * pageSize < db.length,
        s"page $pageNo outside the database")
      require(visited.add(pageNo), s"cyclic b-tree at page $pageNo")
      val base = (pageNo - 1) * pageSize + (if (pageNo == 1) 100 else 0)
      val typ = db(base) & 0xff
      val nCells = ((db(base + 3) & 0xff) << 8) | (db(base + 4) & 0xff)
      typ match {
        case 0x0d =>
          var i = 0
          while (i < nCells) {
            val off = (pageNo - 1) * pageSize +
              (((db(base + 8 + 2 * i) & 0xff) << 8) | (db(base + 9 + 2 * i) & 0xff))
            val (plen, n0) = readVarint(db, off)
            val (rowid, n1) = readVarint(db, off + n0)
            val inline = tableLeafInline(plen, pageSize)
            if (inline == plen)
              out += ((rowid, readRecord(db, off + n0 + n1)))
            else {
              // spilled payload: inline bytes + overflow chain (each
              // page = 4-byte next pointer + data). Same cycle/range
              // armor as the b-tree walk — overflow pointers come
              // from the same untrusted bytes. A declared length
              // beyond the file itself is corrupt: reject BEFORE
              // allocating (a crafted 2 GB varint must not cost 2 GB
              // of executor heap, and a negative toInt must hit the
              // targeted require, not NegativeArraySizeException).
              require(plen > 0 && plen <= db.length,
                s"payload length $plen exceeds the ${db.length}-byte database")
              val full = new Array[Byte](plen.toInt)
              System.arraycopy(db, off + n0 + n1, full, 0, inline)
              var at = inline
              var ptr = ByteBuffer.wrap(db, off + n0 + n1 + inline, 4).getInt
              val seenOv = scala.collection.mutable.Set.empty[Int]
              while (ptr != 0) {
                // the whole page must be inside the file — a file
                // truncated mid-page fails here, not in arraycopy
                require(ptr >= 1 && ptr.toLong * pageSize <= db.length,
                  s"overflow page $ptr outside the database")
                require(seenOv.add(ptr), s"cyclic overflow chain at page $ptr")
                val ob = (ptr - 1) * pageSize
                val n = math.min(pageSize - 4, plen.toInt - at)
                require(n > 0, "overflow chain longer than the payload")
                System.arraycopy(db, ob + 4, full, at, n)
                at += n
                ptr = ByteBuffer.wrap(db, ob, 4).getInt
              }
              require(at == plen,
                s"overflow chain holds $at of $plen payload bytes")
              out += ((rowid, readRecord(full, 0)))
            }
            i += 1
          }
        case 0x05 =>
          var i = 0
          while (i < nCells) {
            val off = (pageNo - 1) * pageSize +
              (((db(base + 12 + 2 * i) & 0xff) << 8) | (db(base + 13 + 2 * i) & 0xff))
            walk(ByteBuffer.wrap(db, off, 4).getInt, out)
            i += 1
          }
          walk(ByteBuffer.wrap(db, base + 8, 4).getInt, out)
        case t => throw new IllegalArgumentException(s"page type $t")
      }
    }
    val master = ArrayBuffer.empty[(Long, Seq[Any])]
    walk(1, master)
    val root = master.map(_._2).collectFirst {
      case Seq("table", n: String, _, rp: Long, _) if n == table => rp.toInt
    }.getOrElse(throw new IllegalArgumentException(s"no table $table"))
    val rows = ArrayBuffer.empty[(Long, Seq[Any])]
    walk(root, rows)
    rows.toSeq
  }

  /** The CREATE statement of `table` (for column-name recovery). */
  def tableSql(db: Array[Byte], table: String): String = {
    val master = ArrayBuffer.empty[(Long, Seq[Any])]
    val pageSizeRaw = ((db(16) & 0xff) << 8) | (db(17) & 0xff)
    require(pageSizeRaw == 1 || pageSizeRaw > 0, "bad page size")
    // page 1 only — schema is written to fit there
    val base = 100
    val nCells = ((db(base + 3) & 0xff) << 8) | (db(base + 4) & 0xff)
    var i = 0
    while (i < nCells) {
      val off = ((db(base + 8 + 2 * i) & 0xff) << 8) | (db(base + 9 + 2 * i) & 0xff)
      val (_, n0) = readVarint(db, off)
      val (rowid, n1) = readVarint(db, off + n0)
      master += ((rowid, readRecord(db, off + n0 + n1)))
      i += 1
    }
    master.map(_._2).collectFirst {
      case Seq("table", n: String, _, _, sql: String) if n == table => sql
    }.getOrElse(throw new IllegalArgumentException(s"no table $table"))
  }
}
