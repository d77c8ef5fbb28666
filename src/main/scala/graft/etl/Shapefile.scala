package graft.etl

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}

/** Minimal pure-JVM ESRI Shapefile reader (SURVEY §2.1 S3; reference
  * `app/tasks/vector_source_assets.py:195-347` shells out to
  * ogr2ogr — no GDAL here, so the two public formats the reference's
  * vector ingest actually consumes are parsed directly):
  *
  *   - `.shp` (ESRI Shapefile Technical Description, 1998): 100-byte
  *     header, then records of big-endian (number, length) + a
  *     little-endian shape — Point (type 1) and Polygon (type 5,
  *     parts = rings) are supported, Null (type 0) rows are skipped.
  *   - `.dbf` (dBase III): 32-byte header + 32-byte field
  *     descriptors; `N` fields surface as BIGINT/DOUBLE, everything
  *     else as STRING. Deleted rows (flag `*`) are skipped.
  *
  * Geometries convert to WKB ([[graft.geo.Geom]]'s at-rest currency),
  * so the GFW-field derivation (`st_x`/`st_y`/`st_asgeojson`/
  * `st_geostore_id`) runs unchanged downstream.
  *
  * Scale shape: files load through the `binaryFile` source and parse
  * ON EXECUTORS — one task per shapefile (the format self-caps at
  * 2 GB), so a directory of thousands of shapefiles ingests as one
  * distributed job; only the first `.dbf` HEADER is read driver-side
  * (schema discovery, a few KB), mirroring the CSV path's 100-line
  * sample.
  */
object Shapefile {

  private final case class DbfField(name: String, typ: Char, len: Int, dec: Int)

  private def dbfFields(bytes: Array[Byte]): Seq[DbfField] = {
    val headerSize = ((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff)
    (32 until (headerSize - 1) by 32).takeWhile(o => bytes(o) != 0x0d).map { o =>
      val nameEnd = (o until o + 11).find(bytes(_) == 0).getOrElse(o + 11)
      DbfField(new String(bytes, o, nameEnd - o, StandardCharsets.US_ASCII),
        bytes(o + 11).toChar, bytes(o + 16) & 0xff, bytes(o + 17) & 0xff)
    }
  }

  private def fieldType(f: DbfField): DataType = f.typ match {
    case 'N' | 'F' => if (f.dec == 0 && f.typ == 'N') LongType else DoubleType
    case _ => StringType
  }

  /** Parse one `.dbf` body → per-record typed attribute values. */
  private def dbfRecords(bytes: Array[Byte]): Iterator[Seq[Any]] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = b.getInt(4)
    val headerSize = b.getShort(8) & 0xffff
    val recSize = b.getShort(10) & 0xffff
    val fields = dbfFields(bytes)
    (0 until nRec).iterator.flatMap { i =>
      val off = headerSize + i * recSize
      if (bytes(off) == '*') None // deleted row
      else Some {
        var p = off + 1
        fields.map { f =>
          val raw = new String(bytes, p, f.len, StandardCharsets.US_ASCII).trim
          p += f.len
          fieldType(f) match {
            case LongType => if (raw.isEmpty) null else java.lang.Long.valueOf(raw)
            case DoubleType => if (raw.isEmpty) null else java.lang.Double.valueOf(raw)
            case _ => raw
          }
        }
      }
    }
  }

  /** Parse one `.shp` body → per-record WKB (None = Null shape). */
  private def shpRecords(bytes: Array[Byte]): Iterator[Option[Array[Byte]]] = {
    val fileLen = // big-endian 16-bit words at offset 24
      ((bytes(24) & 0xff) << 24 | (bytes(25) & 0xff) << 16 |
        (bytes(26) & 0xff) << 8 | (bytes(27) & 0xff)) * 2
    new Iterator[Option[Array[Byte]]] {
      private var off = 100
      def hasNext: Boolean = off + 8 <= fileLen
      def next(): Option[Array[Byte]] = {
        val contentWords = (bytes(off + 4) & 0xff) << 24 | (bytes(off + 5) & 0xff) << 16 |
          (bytes(off + 6) & 0xff) << 8 | (bytes(off + 7) & 0xff)
        // executor-side parse of user-supplied files: a crafted
        // non-positive record length must fail, not stall the
        // iterator forever (off would stop advancing)
        require(contentWords >= 2 && off + 8 + contentWords * 2 <= bytes.length,
          s"corrupt shapefile record at offset $off (length $contentWords words)")
        val s = ByteBuffer.wrap(bytes, off + 8, contentWords * 2)
          .order(ByteOrder.LITTLE_ENDIAN)
        off += 8 + contentWords * 2
        s.getInt match {
          case 0 => None // Null shape
          case 1 => // Point
            val wkb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
            wkb.put(1.toByte).putInt(1).putDouble(s.getDouble).putDouble(s.getDouble)
            Some(wkb.array())
          case 5 => // Polygon: parts are rings
            s.position(s.position() + 32) // bbox
            val nParts = s.getInt
            val nPoints = s.getInt
            val parts = Array.fill(nParts)(s.getInt)
            val xs = new Array[Double](nPoints)
            val ys = new Array[Double](nPoints)
            var i = 0
            while (i < nPoints) { xs(i) = s.getDouble; ys(i) = s.getDouble; i += 1 }
            val ringEnds = parts.drop(1) :+ nPoints
            val rings: Array[Array[(Double, Double)]] =
              (0 until nParts).map { r =>
                val (from, to) = (parts(r), ringEnds(r))
                Array.tabulate(to - from)(j => (xs(from + j), ys(from + j)))
              }.toArray
            Some(assembleRings(rings))
          case t => throw new IllegalArgumentException(
            s"unsupported shapefile shape type $t (Point and Polygon only)")
        }
      }
    }
  }

  /** Ring-nesting reassembly (ESRI shapefile spec: ring ORDER carries
    * no structure — clockwise rings are exterior, counter-clockwise
    * rings are holes of the exterior ring containing them). One
    * exterior ring → WKB Polygon; several → WKB MultiPolygon with
    * each hole attached to the exterior containing its first vertex
    * (file order preserved within each group). A record with no
    * clockwise ring is degenerate per spec and passes through as a
    * Polygon in file order. Coordinates are never touched. */
  private def assembleRings(rings: Array[Array[(Double, Double)]]): Array[Byte] = {
    import graft.geo.Geom
    def ringWkb(b: ByteBuffer, r: Array[(Double, Double)]): Unit = {
      b.putInt(r.length)
      r.foreach { case (x, y) => b.putDouble(x); b.putDouble(y) }
    }
    def polyWkb(rs: Seq[Array[(Double, Double)]]): Array[Byte] = {
      val b = ByteBuffer
        .allocate(9 + rs.length * 4 + rs.map(_.length).sum * 16)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).putInt(3).putInt(rs.length)
      rs.foreach(ringWkb(b, _))
      b.array()
    }
    val outerIdx = rings.indices.filter(i => Geom.signedArea2(rings(i)) < 0)
    if (outerIdx.length <= 1) {
      if (outerIdx.length == 1 && outerIdx.head != 0) {
        // one exterior but holes precede it in the file: outer first
        val o = outerIdx.head
        polyWkb(rings(o) +: rings.indices.filterNot(_ == o).map(rings(_)))
      } else polyWkb(rings.toSeq)
    } else {
      val holeIdx = rings.indices.filterNot(outerIdx.contains)
      val groups = outerIdx.map(o => o -> scala.collection.mutable.ArrayBuffer(rings(o)))
      holeIdx.foreach { h =>
        val (hx, hy) = rings(h).head
        val owner = groups.find { case (o, _) =>
          Geom.pointInPolygon(hx, hy, Array(rings(o)))
        }.getOrElse(groups.head)
        owner._2 += rings(h)
      }
      val polys = groups.map(_._2.toSeq).map(polyWkb)
      val b = ByteBuffer.allocate(9 + polys.map(_.length).sum)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).putInt(6).putInt(polys.length)
      polys.foreach(b.put)
      b.array()
    }
  }

  /** Write a Point shapefile (`<base>.shp` + `<base>.dbf`) — the
    * export artifact the reference's batch jobs build with ogr2ogr
    * (`static_vector_file_assets.py`; served by the 307 redirect of
    * `downloads.py:264-348`). Attribute mapping: integral → `N(18,0)`,
    * floating → `N(18,6)`, everything else → `C(64)`. Bounded use
    * only — the caller caps the row count (exports are driver-built
    * files, mirroring the reference's single-file artifacts). */
  def writePoints(points: Seq[((Double, Double), Seq[Any])],
                  fields: Seq[(String, DataType)],
                  base: java.nio.file.Path): Unit = {
    val n = points.length
    require(n > 0, "cannot write an empty shapefile")
    val shpLen = 100 + n * 28
    val shp = ByteBuffer.allocate(shpLen)
    shp.order(ByteOrder.BIG_ENDIAN)
    shp.putInt(0, 9994)
    shp.putInt(24, shpLen / 2)
    shp.order(ByteOrder.LITTLE_ENDIAN)
    shp.putInt(28, 1000)
    shp.putInt(32, 1) // Point
    shp.putDouble(36, points.map(_._1._1).min)
    shp.putDouble(44, points.map(_._1._2).min)
    shp.putDouble(52, points.map(_._1._1).max)
    shp.putDouble(60, points.map(_._1._2).max)
    var off = 100
    points.zipWithIndex.foreach { case (((lon, lat), _), i) =>
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(off, i + 1)
      shp.putInt(off + 4, 10)
      shp.order(ByteOrder.LITTLE_ENDIAN)
      shp.putInt(off + 8, 1)
      shp.putDouble(off + 12, lon)
      shp.putDouble(off + 20, lat)
      off += 28
    }
    java.nio.file.Files.write(
      base.resolveSibling(base.getFileName.toString + ".shp"), shp.array())
    writeDbf(points.map(_._2), fields, base)
  }

  /** Write a Polygon shapefile: each record is one feature's polygon
    * parts (a MultiPolygon's parts share one type-5 record — the
    * shapefile model has no separate multipolygon type; readers
    * reassemble nesting from ring orientation). Each part's first
    * ring is the exterior. Winding is NORMALIZED to the spec's
    * convention — exterior rings clockwise, holes counter-clockwise
    * (our OGC-wound geometries are the opposite; writing them as
    * given would make external readers see every exterior as a
    * hole). A reversed ring keeps its start point, so [[read]]
    * (which reassembles nesting) returns the exact coordinates of a
    * spec-wound input. */
  def writePolygons(polys: Seq[(Seq[Array[Array[(Double, Double)]]], Seq[Any])],
                    fields: Seq[(String, DataType)],
                    base: java.nio.file.Path): Unit = {
    val n = polys.length
    require(n > 0, "cannot write an empty shapefile")
    require(polys.forall(p => p._1.nonEmpty && p._1.forall(_.nonEmpty)),
      "each polygon part needs at least one ring")
    // flatten parts into the record's ring list, normalizing winding
    val recs: Seq[(Array[Array[(Double, Double)]], Seq[Any])] =
      polys.map { case (parts, attrs) =>
        val rings = parts.flatMap(_.zipWithIndex.map { case (r, ri) =>
          val cw = graft.geo.Geom.signedArea2(r) < 0
          if (cw == (ri == 0)) r else r.reverse
        }).toArray
        (rings, attrs)
      }
    def contentBytes(rings: Array[Array[(Double, Double)]]): Int =
      4 + 32 + 4 + 4 + 4 * rings.length + 16 * rings.map(_.length).sum
    val shpLen = 100 + recs.map { case (r, _) => 8 + contentBytes(r) }.sum
    val shp = ByteBuffer.allocate(shpLen)
    shp.order(ByteOrder.BIG_ENDIAN)
    shp.putInt(0, 9994)
    shp.putInt(24, shpLen / 2)
    shp.order(ByteOrder.LITTLE_ENDIAN)
    shp.putInt(28, 1000)
    shp.putInt(32, 5) // Polygon
    val flat = recs.flatMap(_._1.toSeq).flatten
    shp.putDouble(36, flat.map(_._1).min)
    shp.putDouble(44, flat.map(_._2).min)
    shp.putDouble(52, flat.map(_._1).max)
    shp.putDouble(60, flat.map(_._2).max)
    var off = 100
    recs.zipWithIndex.foreach { case ((rings, _), i) =>
      val content = contentBytes(rings)
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(off, i + 1)
      shp.putInt(off + 4, content / 2)
      shp.order(ByteOrder.LITTLE_ENDIAN)
      shp.position(off + 8)
      shp.putInt(5)
      val pts = rings.flatten
      shp.putDouble(pts.map(_._1).min).putDouble(pts.map(_._2).min)
      shp.putDouble(pts.map(_._1).max).putDouble(pts.map(_._2).max)
      shp.putInt(rings.length).putInt(pts.length)
      var start = 0
      rings.foreach { r => shp.putInt(start); start += r.length }
      rings.foreach(_.foreach { case (x, y) => shp.putDouble(x).putDouble(y) })
      off += 8 + content
    }
    java.nio.file.Files.write(
      base.resolveSibling(base.getFileName.toString + ".shp"), shp.array())
    writeDbf(recs.map(_._2), fields, base)
  }

  /** Write the `<base>.dbf` attribute table (dBase III; shared by the
    * point and polygon writers). Attribute mapping: integral →
    * `N(18,0)`, floating → `N(18,6)`, everything else → `C(64)`. */
  private def writeDbf(records: Seq[Seq[Any]],
                       fields: Seq[(String, DataType)],
                       base: java.nio.file.Path): Unit = {
    val n = records.length
    def fieldSpec(t: DataType): (Char, Int, Int) = t match {
      case LongType | IntegerType | ShortType => ('N', 18, 0)
      case DoubleType | FloatType => ('N', 18, 6)
      case _ => ('C', 64, 0)
    }
    val specs = fields.map { case (nm, t) => (nm, fieldSpec(t)) }
    val headerSize = 32 + 32 * specs.length + 1
    val recSize = 1 + specs.map(_._2._2).sum
    val dbf = ByteBuffer.allocate(headerSize + n * recSize + 1)
    dbf.order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0, 0x03.toByte)
    dbf.putInt(4, n)
    dbf.putShort(8, headerSize.toShort)
    dbf.putShort(10, recSize.toShort)
    specs.zipWithIndex.foreach { case ((nm, (typ, len, dec)), i) =>
      val o = 32 + 32 * i
      val nameBytes = nm.take(10).getBytes(StandardCharsets.US_ASCII)
      nameBytes.zipWithIndex.foreach { case (c, j) => dbf.put(o + j, c) }
      dbf.put(o + 11, typ.toByte)
      dbf.put(o + 16, len.toByte)
      dbf.put(o + 17, dec.toByte)
    }
    dbf.put(32 + 32 * specs.length, 0x0d.toByte)
    records.zipWithIndex.foreach { case (attrs, i) =>
      val off0 = headerSize + i * recSize
      dbf.put(off0, ' '.toByte)
      var p = off0 + 1
      specs.zip(attrs).foreach { case ((_, (typ, len, dec)), v) =>
        val txt = (typ, v) match {
          case (_, null) => " " * len
          case ('N', x) if dec == 0 => x.toString.reverse.padTo(len, ' ').reverse
          case ('N', x) =>
            f"${x.asInstanceOf[Number].doubleValue()}%.6f".reverse.padTo(len, ' ').reverse
          case (_, x) => x.toString.take(len).padTo(len, ' ')
        }
        txt.take(len).zipWithIndex.foreach { case (c, j) => dbf.put(p + j, c.toByte) }
        p += len
      }
    }
    dbf.put(headerSize + n * recSize, 0x1a.toByte)
    java.nio.file.Files.write(
      base.resolveSibling(base.getFileName.toString + ".dbf"), dbf.array())
  }

  /** Read every `<base>.shp` + `<base>.dbf` pair under `dir` into one
    * DataFrame: `fid` (1-based record number within its file), `geom`
    * (WKB), then the dbf attribute columns. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val d = new java.io.File(dir)
    val fs = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".dbf")).sortBy(_.getName)
    require(fs.nonEmpty, s"no .dbf files under $dir")
    readPaths(spark, Seq(s"$dir/*.shp", s"$dir/*.dbf"), fs.head.getPath)
  }

  /** [[read]] over an explicit `.shp` file list (the `/append` and
    * version-creation source-URI form); sibling `.dbf` files are
    * implied by the format. */
  def readFiles(spark: SparkSession, shpFiles: Seq[String]): DataFrame = {
    val paths = shpFiles.map(_.stripPrefix("file://"))
    val dbfs = paths.map(p => p.stripSuffix(".shp") + ".dbf")
    readPaths(spark, paths ++ dbfs, dbfs.head)
  }

  private def readPaths(spark: SparkSession, loadPaths: Seq[String],
                        firstDbfPath: String): DataFrame = {
    // schema discovery: first .dbf header only (driver-side, bounded)
    val firstDbf = {
      val in = new java.io.FileInputStream(firstDbfPath)
      try { val h = new Array[Byte](4096); in.read(h); h } finally in.close()
    }
    val fields = dbfFields(firstDbf)
    val schema = StructType(
      StructField("fid", IntegerType, nullable = false) +:
        StructField("geom", BinaryType) +:
        fields.map(f => StructField(f.name, fieldType(f))))

    val files = spark.read.format("binaryFile")
      .load(loadPaths: _*)
      .select(
        // the FULL path minus extension pairs .shp with ITS .dbf —
        // grouping on the basename alone silently merges (and can
        // cross-pair) same-named shapefiles from different directories
        regexp_replace(col("path"), "\\.(shp|dbf)$", "").as("base"),
        regexp_extract(col("path"), "\\.(shp|dbf)$", 1).as("ext"),
        col("content"))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(schema))
    files
      .groupByKey(_.getString(0))(Encoders.STRING)
      .flatMapGroups { (base, it) =>
        val byExt = it.map(r => r.getString(1) -> r.getAs[Array[Byte]](2)).toMap
        val shp = byExt.getOrElse("shp",
          throw new IllegalArgumentException(s"$base.dbf has no matching .shp"))
        val dbf = byExt.getOrElse("dbf",
          throw new IllegalArgumentException(s"$base.shp has no matching .dbf"))
        shpRecords(shp).zip(dbfRecords(dbf)).zipWithIndex.collect {
          case ((Some(wkb), attrs), i) =>
            Row.fromSeq(Integer.valueOf(i + 1) +: wkb +: attrs)
        }
      }
  }
}
