package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

class CatalogSpec extends AnyFunSuite {

  private def tableAsset(t: String) = Asset("a1", t, "s3://x", isDefault = true)

  private val cat = new Catalog(Seq(
    Dataset("trees", Seq(
      Version("trees", "v1", isLatest = false,
        assets = Seq(tableAsset(AssetType.DatabaseTable))),
      Version("trees", "v2", isLatest = true,
        assets = Seq(tableAsset(AssetType.DatabaseTable))))),
    Dataset("cover", Seq(
      Version("cover", "v2020", isLatest = true, sourceType = "raster",
        assets = Seq(tableAsset(AssetType.RasterTileSet))))),
    Dataset("tiles", Seq(
      Version("tiles", "v1", isLatest = true,
        assets = Seq(tableAsset(AssetType.StaticVectorTileCache)))))))

  test("default asset type routing from source type") {
    assert(AssetType.defaultFor("table") == AssetType.DatabaseTable)
    assert(AssetType.defaultFor("table", hasGeometry = true) == AssetType.GeoDatabaseTable)
    assert(AssetType.defaultFor("vector") == AssetType.GeoDatabaseTable)
    assert(AssetType.defaultFor("raster") == AssetType.RasterTileSet)
    intercept[IllegalArgumentException](AssetType.defaultFor("stream"))
  }

  test("latest resolution and 'latest' alias") {
    assert(cat.latest("trees").map(_.version).contains("v2"))
    assert(cat.version("trees", "latest").map(_.version).contains("v2"))
    assert(cat.version("trees", "v1").map(_.version).contains("v1"))
    assert(cat.version("nope", "latest").isEmpty)
  }

  test("query engine routing") {
    assert(cat.queryEngine("trees", "v2") == Right(TableEngine))
    assert(cat.queryEngine("cover", "v2020") == Right(RasterEngine))
    assert(cat.queryEngine("tiles", "v1").isLeft) // tile cache: not queryable
    assert(cat.queryEngine("trees", "v9").isLeft)
  }

  test("latest-unless-overridden version resolution") {
    val r = cat.resolveVersions(Seq("trees", "cover"), Map("trees" -> "v1"))
    assert(r("trees").map(_.version).contains("v1"))
    assert(r("cover").map(_.version).contains("v2020"))
  }
}
