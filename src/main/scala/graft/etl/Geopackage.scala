package graft.etl

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}

/** GeoPackage (OGC 12-128r19) feature containers over the pure-JVM
  * [[Sqlite]] core — the second vector exchange format the
  * reference's ogr2ogr pipelines consume and publish (SURVEY §2.1 S3
  * ingest formats; S12 `/download/gpkg` export assets):
  *
  *   - [[write]] builds a valid single-layer GeoPackage: the three
  *     required metadata tables (`gpkg_spatial_ref_sys` with the
  *     mandatory −1/0/4326 records, `gpkg_contents`,
  *     `gpkg_geometry_columns`) plus the feature table
  *     (`fid INTEGER PRIMARY KEY`, GPKG-blob `geom`, typed
  *     attributes). Stock SQLite reports `integrity_check: ok` on the
  *     output.
  *   - [[read]] lists `*.gpkg` under a directory through the
  *     `binaryFile` source and parses ON EXECUTORS (one task per
  *     file), emitting `fid`, `geom` (WKB) and the attribute columns
  *     — the same downstream contract as [[Shapefile.read]], so the
  *     GFW-field derivation runs unchanged.
  *
  * Geometry blobs are GPKG v0 headers (magic `GP`, little-endian
  * srs_id, XY envelope) wrapping the standard WKB that
  * [[graft.geo.Geom]] already speaks.
  */
object Geopackage {

  // The spec DDL (OGC 12-128r19 annex C): TEXT/composite PRIMARY KEY
  // and UNIQUE constraints imply `sqlite_autoindex_*` b-trees, which
  // [[Sqlite.IndexDef]] builds alongside each table.
  private val SrsSql =
    """CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER NOT NULL PRIMARY KEY, organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, description TEXT)"""
  private val ContentsSql =
    """CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT DEFAULT '', last_change DATETIME NOT NULL DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')), min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER, CONSTRAINT fk_gc_r_srs_id FOREIGN KEY (srs_id) REFERENCES gpkg_spatial_ref_sys(srs_id))"""
  private val GeomColsSql =
    """CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL, CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name), CONSTRAINT uk_gc_table_name UNIQUE (table_name), CONSTRAINT fk_gc_tn FOREIGN KEY (table_name) REFERENCES gpkg_contents(table_name), CONSTRAINT fk_gc_srs FOREIGN KEY (srs_id) REFERENCES gpkg_spatial_ref_sys(srs_id))"""

  private def sqlType(t: DataType): String = t match {
    case LongType | IntegerType | ShortType | BooleanType => "INTEGER"
    case DoubleType | FloatType => "REAL"
    case BinaryType => "BLOB"
    case _ => "TEXT"
  }

  private def sparkType(sql: String): DataType = sql.trim.toUpperCase match {
    case "INTEGER" | "TINYINT" | "SMALLINT" | "MEDIUMINT" | "INT" => LongType
    case "REAL" | "DOUBLE" | "FLOAT" => DoubleType
    case "BLOB" => BinaryType
    case _ => StringType
  }

  /** GPKG geometry blob: 8-byte header + XY envelope + WKB. */
  private[etl] def geomBlob(wkb: Array[Byte], srsId: Int = 4326): Array[Byte] = {
    val g = graft.geo.Geom.fromWkb(wkb)
    val (xmin, ymin, xmax, ymax) = g.bbox
    val b = ByteBuffer.allocate(8 + 32 + wkb.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x47.toByte).put(0x50.toByte) // "GP"
    b.put(0.toByte) // version
    b.put(((1 << 1) | 1).toByte) // XY envelope, little-endian header
    b.putInt(srsId)
    // envelope order per spec: minx, maxx, miny, maxy
    b.putDouble(xmin).putDouble(xmax).putDouble(ymin).putDouble(ymax)
    b.put(wkb)
    b.array()
  }

  /** Strip the GPKG blob header → WKB. */
  private[etl] def blobWkb(blob: Array[Byte]): Array[Byte] = {
    require(blob.length > 8 && blob(0) == 0x47 && blob(1) == 0x50,
      "not a GPKG geometry blob")
    val flags = blob(3) & 0xff
    val envSize = ((flags >> 1) & 0x7) match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case other => throw new IllegalArgumentException(s"envelope indicator $other")
    }
    java.util.Arrays.copyOfRange(blob, 8 + envSize, blob.length)
  }

  /** Write a single-layer feature GeoPackage. `rows` carry (WKB,
    * attribute values) aligned with `fields`. */
  def write(path: java.nio.file.Path, tableName: String,
            geometryTypeName: String,
            rows: Seq[(Array[Byte], Seq[Any])],
            fields: Seq[(String, DataType)]): Unit = {
    require(rows.nonEmpty, "cannot write an empty GeoPackage layer")
    val boxes = rows.map(r => graft.geo.Geom.fromWkb(r._1).bbox)
    val (xmin, ymin) = (boxes.map(_._1).min, boxes.map(_._2).min)
    val (xmax, ymax) = (boxes.map(_._3).max, boxes.map(_._4).max)

    val attrCols = fields.map { case (n, t) => s"`$n` ${sqlType(t)}" }
    val featureSql =
      s"CREATE TABLE `$tableName` (fid INTEGER PRIMARY KEY, geom GEOMETRY" +
        (if (attrCols.isEmpty) "" else attrCols.mkString(", ", ", ", "")) + ")"
    val featureRows = rows.zipWithIndex.map { case ((wkb, attrs), i) =>
      (i + 1L) +: geomBlob(wkb) +: attrs
    }

    Sqlite.writeDb(path, Seq(
      // srs_id is INTEGER PRIMARY KEY → a rowid alias; the rowids ARE
      // the srs ids (−1/0/4326, ascending as the b-tree requires)
      Sqlite.TableDef("gpkg_spatial_ref_sys", SrsSql, Seq(
        Seq("Undefined cartesian SRS", -1L, "NONE", -1L, "undefined", null),
        Seq("Undefined geographic SRS", 0L, "NONE", 0L, "undefined", null),
        Seq("WGS 84 geodetic", 4326L, "EPSG", 4326L,
          "GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\",SPHEROID[\"WGS 84\",6378137,298.257223563]],PRIMEM[\"Greenwich\",0],UNIT[\"degree\",0.0174532925199433]]",
          "longitude/latitude coordinates in decimal degrees")),
        rowidAlias = Some(1)),
      Sqlite.TableDef("gpkg_contents", ContentsSql, Seq(
        Seq(tableName, "features", tableName, "",
          "2026-01-01T00:00:00.000Z", xmin, ymin, xmax, ymax, 4326L)),
        indexes = Seq(
          Sqlite.IndexDef("sqlite_autoindex_gpkg_contents_1", Seq(0)),
          Sqlite.IndexDef("sqlite_autoindex_gpkg_contents_2", Seq(2)))),
      Sqlite.TableDef("gpkg_geometry_columns", GeomColsSql, Seq(
        Seq(tableName, "geom", geometryTypeName, 4326L, 0L, 0L)),
        indexes = Seq(
          Sqlite.IndexDef("sqlite_autoindex_gpkg_geometry_columns_1", Seq(0, 1)),
          Sqlite.IndexDef("sqlite_autoindex_gpkg_geometry_columns_2", Seq(0)))),
      Sqlite.TableDef(tableName, featureSql, featureRows, rowidAlias = Some(0))))
  }

  /** Column (name, type) pairs of the feature table, parsed from its
    * CREATE statement (the writer's own formatting). */
  private def featureColumns(create: String): Seq[(String, DataType)] = {
    val inner = create.substring(create.indexOf('(') + 1, create.lastIndexOf(')'))
    inner.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      .filterNot(_.toUpperCase.startsWith("CONSTRAINT"))
      .map { colDef =>
        val parts = colDef.split("\\s+", 2)
        val name = parts(0).stripPrefix("`").stripSuffix("`")
        name -> sparkType(parts.lift(1).getOrElse("TEXT").split("\\s+")(0))
      }
  }

  /** Feature-table name of a GeoPackage: the first `sqlite_master`
    * entry that is not a `gpkg_*` metadata table. */
  private def featureTable(db: Array[Byte]): String = {
    // page-1 schema walk via tableSql of each candidate is circular;
    // list names from gpkg_geometry_columns instead
    Sqlite.readTable(db, "gpkg_geometry_columns").headOption
      .map(_._2.head.asInstanceOf[String])
      .getOrElse(throw new IllegalArgumentException("no feature layer"))
  }

  /** Read every `*.gpkg` under `dir` into one DataFrame: `fid`,
    * `geom` (WKB), then the attribute columns of the (shared) layer
    * schema. Schema discovery reads ONE file driver-side; parsing
    * runs on executors. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val d = new java.io.File(dir)
    val fs = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".gpkg")).sortBy(_.getName)
    require(fs.nonEmpty, s"no .gpkg files under $dir")
    readFiles(spark, fs.map(_.getPath).toSeq)
  }

  /** [[read]] over an explicit file list (the `/append` and version
    * creation source-URI form). */
  def readFiles(spark: SparkSession, files: Seq[String]): DataFrame = {
    val first = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(files.head.stripPrefix("file://")))
    val table = featureTable(first)
    val cols = featureColumns(Sqlite.tableSql(first, table))
    val attrs = cols.filterNot { case (n, _) => n == "fid" || n == "geom" }
    val schema = StructType(
      StructField("fid", LongType, nullable = false) +:
        StructField("geom", BinaryType) +:
        attrs.map { case (n, t) => StructField(n, t) })

    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(schema))
    spark.read.format("binaryFile")
      .load(files.map(_.stripPrefix("file://")): _*)
      .select(col("content"))
      .flatMap { r =>
        val db = r.getAs[Array[Byte]](0)
        val t = featureTable(db)
        Sqlite.readTable(db, t).map { case (rowid, values) =>
          // values: (fid=null via rowid alias) :: geomBlob :: attrs
          val wkb = blobWkb(values(1).asInstanceOf[Array[Byte]])
          Row.fromSeq(rowid +: wkb +: values.drop(2))
        }
      }
  }
}
