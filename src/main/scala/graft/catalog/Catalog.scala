package graft.catalog

/** The dataset → version → asset metadata model (SURVEY §1.1;
  * `app/models/orm/{datasets,versions,assets}.py`,
  * `app/models/enum/assets.py`). The catalog is the engine's routing
  * layer: the default asset of a version decides which query engine
  * serves it (`queries.py:487-503`), `is_latest` plus per-request
  * overrides resolve version references (`queries.py:790-813`).
  */
object AssetType {
  val DatabaseTable = "Database table"
  val GeoDatabaseTable = "Geo database table"
  val RasterTileSet = "Raster tile set"
  val ShapefileExport = "ESRI Shapefile"
  val GeopackageExport = "Geopackage"
  val NdjsonExport = "ndjson"
  val CsvExport = "csv"
  val TsvExport = "tsv"
  val Grid1x1 = "1x1 grid"
  val StaticVectorTileCache = "Static vector tile cache"
  val RasterTileCache = "Raster tile cache"
  val Cog = "COG"

  /** Default asset type from the version's source type
    * (`assets.py:36-52`). */
  def defaultFor(sourceType: String, hasGeometry: Boolean = false): String =
    sourceType match {
      case "table" => if (hasGeometry) GeoDatabaseTable else DatabaseTable
      case "vector" => GeoDatabaseTable
      case "raster" => RasterTileSet
      case t => throw new IllegalArgumentException(s"unknown source type '$t'")
    }
}

sealed trait QueryEngine
case object TableEngine extends QueryEngine
case object RasterEngine extends QueryEngine

final case class Asset(
    assetId: String,
    assetType: String,
    assetUri: String,
    isDefault: Boolean,
    creationOptions: Map[String, String] = Map.empty,
    status: String = "saved")

final case class Version(
    dataset: String,
    version: String,
    isLatest: Boolean,
    isDownloadable: Boolean = true,
    sourceType: String = "table",
    assets: Seq[Asset] = Nil) {
  def defaultAsset: Option[Asset] = assets.find(_.isDefault)
}

/** Dataset record: name + versions + the free-form metadata document
  * the reference keeps on `ORMDataset` (`app/models/orm/datasets.py` —
  * title, source, license, …; PATCH merges individual fields). */
final case class Dataset(name: String, versions: Seq[Version],
                         metadata: Map[String, String] = Map.empty)

final class Catalog(val datasets: Seq[Dataset]) {

  private val byName: Map[String, Dataset] = datasets.map(d => d.name -> d).toMap

  /** A new catalog with `version` upserted into `dataset` (creating
    * the dataset record if needed); when the new version is latest,
    * previous versions lose the flag (`app/crud/versions.py` latest
    * handling). Catalogs are immutable — the API layer swaps the
    * reference atomically at the end of a creation job. */
  def withVersion(dataset: String, version: Version): Catalog = {
    val existing = byName.get(dataset)
    val newVersions = existing.map(_.versions).getOrElse(Nil)
      .filterNot(_.version == version.version)
      .map(v => if (version.isLatest) v.copy(isLatest = false) else v) :+ version
    val d = Dataset(dataset, newVersions,
      existing.map(_.metadata).getOrElse(Map.empty))
    new Catalog(datasets.filterNot(_.name == dataset) :+ d)
  }

  /** Upsert a bare dataset record (PUT /dataset/{d},
    * `dataset.py:84-116` — a dataset is "largely a metadata concept";
    * versions attach later). */
  def withDataset(name: String, metadata: Map[String, String]): Catalog = {
    val existing = byName.get(name)
    val d = Dataset(name, existing.map(_.versions).getOrElse(Nil), metadata)
    new Catalog(datasets.filterNot(_.name == name) :+ d)
  }

  /** Merge metadata fields into a dataset record (PATCH semantics:
    * "individual fields of the metadata can be modified, without
    * affecting other existing fields", `dataset.py:125-148`). */
  def withDatasetMetadata(name: String, patch: Map[String, String]): Catalog =
    byName.get(name) match {
      case None => this
      case Some(d) => new Catalog(datasets.filterNot(_.name == name) :+
        d.copy(metadata = d.metadata ++ patch))
    }

  /** Drop a dataset record entirely (DELETE /dataset/{d}; the caller
    * enforces the no-versions-left 409, `dataset.py:157-188`). */
  def withoutDataset(name: String): Catalog =
    new Catalog(datasets.filterNot(_.name == name))

  /** Drop one version (DELETE /dataset/{d}/{v}; the caller enforces
    * the latest-tag conflict rule, `versions.py:279-315`). */
  def withoutVersion(dataset: String, version: String): Catalog =
    byName.get(dataset) match {
      case None => this
      case Some(d) => new Catalog(datasets.filterNot(_.name == dataset) :+
        d.copy(versions = d.versions.filterNot(_.version == version)))
    }

  /** Update one asset's status in place (task-failure/-completion
    * propagation, `app/routes/tasks/task.py:132-247`). */
  def withAssetStatus(dataset: String, version: String, assetId: String,
                      status: String): Catalog =
    withVersionPatched(dataset, version, v => v.copy(assets = v.assets.map(a =>
      if (a.assetId == assetId) a.copy(status = status) else a)))

  /** Drop one asset record (DELETE /asset/{id}; the caller enforces
    * the cannot-delete-default-asset 409, `assets/asset.py:142-223`). */
  def withoutAsset(dataset: String, version: String, assetId: String): Catalog =
    withVersionPatched(dataset, version, v =>
      v.copy(assets = v.assets.filterNot(_.assetId == assetId)))

  /** Apply a partial update to one version (PATCH /dataset/{d}/{v},
    * `versions.py:154-199`). When the patch sets `is_latest`, sibling
    * versions lose the flag (crud latest handling). */
  def withVersionPatched(dataset: String, version: String,
                         f: Version => Version): Catalog =
    byName.get(dataset) match {
      case None => this
      case Some(d) =>
        d.versions.find(_.version == version) match {
          case None => this
          case Some(v) =>
            val patched = f(v)
            val others = d.versions.filterNot(_.version == version).map(o =>
              if (patched.isLatest) o.copy(isLatest = false) else o)
            new Catalog(datasets.filterNot(_.name == dataset) :+
              d.copy(versions = others :+ patched))
        }
    }

  def dataset(name: String): Option[Dataset] = byName.get(name)

  def version(dataset: String, version: String): Option[Version] =
    if (version == "latest") latest(dataset)
    else byName.get(dataset).flatMap(_.versions.find(_.version == version))

  def latest(dataset: String): Option[Version] =
    byName.get(dataset).flatMap(_.versions.find(_.isLatest))

  /** Query routing from the default asset type (`queries.py:487-503`):
    * database tables → the tabular engine, raster tile sets → the OTF
    * raster engine (which additionally requires a geometry); anything
    * else is not queryable. */
  def queryEngine(dataset: String, version: String): Either[String, QueryEngine] =
    this.version(dataset, version) match {
      case None => Left(s"Dataset version $dataset.$version not found")
      case Some(v) => v.defaultAsset.map(_.assetType) match {
        case Some(AssetType.DatabaseTable) | Some(AssetType.GeoDatabaseTable) =>
          Right(TableEngine)
        case Some(AssetType.RasterTileSet) => Right(RasterEngine)
        case _ => Left("This endpoint is not implemented for the given dataset")
      }
    }

  /** Names of datasets whose latest version serves the raster engine —
    * the dataset set `_get_data_environment` synthesizes layers for
    * (`queries.py:654-774` iterates raster tile set assets). */
  def rasterDatasets: Seq[String] =
    datasets.collect {
      case d if d.versions.exists(v => v.isLatest &&
        v.defaultAsset.exists(_.assetType == AssetType.RasterTileSet)) => d.name
    }

  /** Latest-unless-overridden resolution for a set of datasets
    * (`queries.py:790-813`): per dataset take the override version if
    * supplied, else the latest. */
  def resolveVersions(names: Seq[String],
                      overrides: Map[String, String]): Map[String, Option[Version]] =
    names.map { d =>
      d -> overrides.get(d).flatMap(v => version(d, v)).orElse(latest(d))
    }.toMap
}
