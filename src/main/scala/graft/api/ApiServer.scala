package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sinks.Sinks
import graft.sqlgate.{Scrutinizer, SqlGateException}
import graft.{Tables, catalog => cat}
import org.apache.spark.sql.SparkSession

/** The HTTP face of the engine (SURVEY §3.1, §7.1 #5): dataset-version
  * query endpoints with JSEND envelopes, the deprecated-path 308
  * redirect, field introspection, and the content-addressed geostore.
  * Zero dependencies — JDK HttpServer; the engine behind it is the
  * same `Scrutinizer` → Catalyst path the tests drive.
  *
  * Routes (reference: `app/routes/datasets/queries.py`,
  * `app/routes/datasets/versions.py:377-403`, `app/crud/geostore.py`):
  *   - GET /dataset/{d}/{v}/query            → 308 to /query/json
  *   - GET /dataset/{d}/{v}/query/json?sql=… → JSEND rows
  *   - GET /dataset/{d}/{v}/query/csv?sql=…  → CSV (QUOTE_NONNUMERIC)
  *   - GET /dataset/{d}/{v}/fields           → field metadata
  *   - POST /geostore  (GeoJSON body)        → {gfw_geostore_id, …}
  *   - GET /geostore/{id}                    → stored GeoJSON
  * Errors: SQL-gate rejections → 400 JSEND failed (reference error
  * strings); unknown dataset/version → 404; 2-hour Cache-Control on
  * query responses (`queries.py:155-158`).
  */
/** In-memory API-key registry (reference `app/crud/api_keys` +
  * `authentication/api_keys.py`): a key is valid when it exists, is
  * unexpired, and — if it carries domain restrictions — the request's
  * Origin/Referer domain matches one (wildcards per `_to_regex`). */
final class ApiKeys {
  private val keys =
    scala.collection.concurrent.TrieMap.empty[String, (Seq[String], Option[Long])]

  def create(domains: Seq[String] = Nil, expiresOnMs: Option[Long] = None): String = {
    val id = java.util.UUID.randomUUID().toString
    keys.put(id, (domains, expiresOnMs))
    id
  }

  private def toRegex(domain: String) =
    ("^" + domain.replace(".", "\\.").replace("*", ".*") + "$").r

  private def extractDomain(url: String): String = {
    val noScheme = url.replaceFirst("^[a-z]+://", "")
    noScheme.split("[/:]")(0)
  }

  def get(key: String): Option[(Seq[String], Option[Long])] = keys.get(key)

  def list: Seq[(String, Seq[String], Option[Long])] =
    keys.toSeq.map { case (k, (d, e)) => (k, d, e) }.sortBy(_._1)

  def delete(key: String): Option[(Seq[String], Option[Long])] = keys.remove(key)

  /** `api_key_is_valid` (`authentication/api_keys.py:62-95`). The
    * reference's elif-chain falls THROUGH to the referrer check when
    * an Origin header is present but non-matching — either header
    * matching validates. */
  def isValid(key: String, origin: Option[String], referrer: Option[String]): Boolean =
    keys.get(key).exists { case (domains, expires) =>
      def matches(v: String): Boolean =
        domains.exists(d => toRegex(d).findFirstIn(extractDomain(v)).isDefined)
      val domainOk =
        if (domains.isEmpty) true
        else origin.exists(matches) || referrer.exists(matches)
      domainOk && expires.forall(_ > System.currentTimeMillis())
    }
}

/** Zoom → search-radius table for the point feature lookup
  * (`features.py:177-218`: tippecanoe vector-tile precision per zoom
  * level × scale factor 50, in metres). */
object FeatureLookup {
  private val precision: Map[Int, Double] = Map(
    0 -> 10000, 1 -> 5000, 2 -> 2500, 3 -> 1250, 4 -> 600, 5 -> 300,
    6 -> 150, 7 -> 80, 8 -> 40, 9 -> 20, 10 -> 10, 11 -> 5, 12 -> 2,
    13 -> 1, 14 -> 0.5, 15 -> 0.25, 16 -> 0.15, 17 -> 0.08, 18 -> 0.04,
    19 -> 0.02, 20 -> 0.01, 21 -> 0.005, 22 -> 0.0025)

  def bufferMeters(zoom: Int): Option[Double] = precision.get(zoom).map(_ * 50)
}

/** Interactive query exceeded `sqlRequestTimeoutSec`; its Spark job
  * group has been cancelled. `raster` selects which of the reference's
  * two timeout envelopes applies (see `withDeadline`). */
private[api] final class QueryTimeoutException(val raster: Boolean)
  extends RuntimeException("query deadline exceeded")

final class ApiServer(spark: SparkSession, sfDir: String, port: Int = 0,
                      nonDownloadable: Set[String] = Set.empty,
                      apiKeys: Option[ApiKeys] = None,
                      protectedDatasets: Set[String] = Set.empty,
                      adminTokens: Set[String] = Set.empty,
                      rwGeostore: Option[String => Option[String]] = None,
                      allowedSourceRoots: Seq[String] = Nil,
                      sqlRequestTimeoutSec: Int =
                        sys.env.getOrElse("GRAFT_SQL_REQUEST_TIMEOUT_SEC", "58").toInt) {

  Tables.register(spark, sfDir)

  /** Directories a PUT body's `source_uri` (or a batch query's `uri`)
    * may point into — the reference only loads from its own buckets;
    * an open path would let any writer read server-local files into a
    * queryable table. Defaults to the data dir and the JVM tmpdir
    * (where version targets and test fixtures live). */
  private val sourceRoots: Seq[java.nio.file.Path] =
    (if (allowedSourceRoots.nonEmpty) allowedSourceRoots
     else Seq(sfDir, sys.props("java.io.tmpdir")))
      .map(r => java.nio.file.Paths.get(r).toAbsolutePath.normalize)

  private def sourceAllowed(uri: String): Boolean = {
    val p = java.nio.file.Paths.get(uri.stripPrefix("file://"))
      .toAbsolutePath.normalize
    sourceRoots.exists(p.startsWith)
  }

  @volatile private var catalog = new cat.Catalog(Tables.all.map { t =>
    // geo-flavoured lake tables carry pre-built export assets the
    // shp/gpkg download routes 307-redirect to (reference S3 exports)
    val exports =
      if (t == "region") Seq(
        cat.Asset(s"$t-shp", cat.AssetType.ShapefileExport,
          s"$sfDir/exports/$t.shp.zip", isDefault = false),
        cat.Asset(s"$t-gpkg", cat.AssetType.GeopackageExport,
          s"$sfDir/exports/$t.gpkg", isDefault = false))
      else Nil
    cat.Dataset(t, Seq(cat.Version(t, "v1", isLatest = true,
      isDownloadable = !nonDownloadable.contains(t),
      assets = cat.Asset(s"$t-a1", cat.AssetType.DatabaseTable,
        s"$sfDir/$t.parquet", isDefault = true) +: exports)))
  } ++ graft.raster.SyntheticRasters.datasets)

  /** Pre-registered lake/raster dataset names — version creation must
    * not reuse them (a created version would otherwise masquerade as,
    * and its register step poison queries against, a builtin table). */
  private val builtinDatasets: Set[String] = catalog.datasets.map(_.name).toSet

  /** All catalog swaps go through one lock: `withVersion` is a
    * read-modify-write of the immutable catalog, and two creation jobs
    * completing together could otherwise each rebuild from the same
    * stale snapshot and lose a version. */
  private val catalogLock = new Object

  private val geostore = scala.collection.concurrent.TrieMap.empty[String, String]

  /** RW-origin results memoized LRU-style, maxsize 128
    * (`app/utils/geostore.py:42-85` `@lru_cache(maxsize=128)`). */
  private val rwMemo =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Option[String]](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Option[String]]): Boolean = size() > 128
      })

  /** Geostore resolution with origin fallback (`get_geostore`,
    * `geostore.py:42-85`): try the requested origin first, fall back
    * to the other — GFW is the in-process store, RW the injected
    * external fetcher (an HTTP client in the reference; pluggable
    * here, absent by default). */
  private def resolveGeostore(id: String, origin: String): Option[String] = {
    def gfw: Option[String] = geostore.get(id)
    def rw: Option[String] = rwGeostore.flatMap { fetch =>
      Option(rwMemo.get(id)).getOrElse {
        val fetched = fetch(id).map(gj =>
          graft.geo.Geom.toGeoJson(graft.geo.Geom.fromGeoJson(gj)))
        rwMemo.put(id, fetched)
        fetched
      }
    }
    if (origin == "rw") rw.orElse(gfw) else gfw.orElse(rw)
  }
  private val jobRegistry = new JobRegistry

  /** Version lifecycle records: status (pending → saved/failed) +
    * change log, pollable at GET /dataset/{d}/{v}
    * (`app/models/orm/versions.py` status + `change_log`). */
  private val versionRecords = scala.collection.concurrent.TrieMap
    .empty[(String, String), (String, Seq[graft.etl.VersionCreation.ChangeLog])]

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  // without an executor the JDK HttpServer handles every exchange on
  // the single dispatcher thread — one long streaming download would
  // block /ping and every /job poll of the 202-then-poll workflow.
  // The exchange pool is CACHED (exchange threads route, serve small
  // payloads, or park on a query future — all cheap); the expensive
  // resource, concurrent Spark work, is bounded by `querySlots` /
  // `downloadGate` below. A FIXED exchange pool conflates the two:
  // measured under ApiLoad at 16–32 concurrent mixed requests, a
  // fixed-8 pool put /ping's p99 at 2.3–4.9 s (queued behind
  // Spark-bound queries) where the reference's async event loop +
  // bounded asyncpg pool keeps health checks instant under the same
  // load (`gunicorn_conf.py:5-30`, `globals.py:59-60`).
  private val requestPool = java.util.concurrent.Executors.newCachedThreadPool(
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-http-${n.getAndIncrement()}")
        t.setDaemon(true); t
      }
    })
  server.setExecutor(requestPool)

  /** Bounded interactive-query concurrency — the analog of the
    * reference's per-worker asyncpg pool (5–10 connections,
    * `globals.py:59-60`): at most [[QuerySlots]] Spark-bound
    * interactive queries run at once; excess requests wait for a slot
    * up to the same 58 s-class deadline and then answer the timeout
    * envelope (a stuck pool surfaces as the command timeout in the
    * reference too). The slot id doubles as the request's FAIR
    * scheduler pool name (`spark.scheduler.pool = graft-api-slot-N`):
    * under `spark.scheduler.mode=FAIR` each in-flight query gets an
    * equal cluster share, so one continent-sized zonal cannot starve
    * seven cheap counts; under the default FIFO mode the property is
    * inert. Slots (not per-request pool names) keep the scheduler's
    * pool set BOUNDED — Spark never garbage-collects pools, so
    * per-request names would leak one pool per request forever. */
  private val QuerySlots = 8
  private val querySlots = new java.util.concurrent.LinkedBlockingQueue[Integer]
  (0 until QuerySlots).foreach(i => querySlots.put(i))

  /** Streaming downloads hold a separate bounded gate for the life of
    * the stream (the reference holds a pool connection for the whole
    * server-side cursor the same way, `downloads.py:35-231`) so a
    * burst of downloads can neither oversubscribe Spark nor starve
    * the interactive slots. */
  private val downloadGate = new java.util.concurrent.Semaphore(8, true)

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = {
    jobRegistry.shutdown(); server.stop(0); requestPool.shutdown()
    queryExec.shutdownNow()
  }

  // -------------------------------------------- interactive-query deadline

  /** The reference bounds every interactive query at
    * `SQL_REQUEST_TIMEOUT = 58` s: the asyncpg pool's
    * `command_timeout` (`app/application.py:105`,
    * `app/settings/globals.py:143`) cancels the server-side query and
    * surfaces as a 524 "A timeout occurred while processing the
    * request. Request canceled." (`app/main.py:53-64`); the raster
    * path's lambda client timeout maps to 500 "Query took too long to
    * process." (`app/routes/datasets/queries.py:596-599`). On Spark
    * the equivalent needs an explicit job group: without one, a
    * pathological-but-valid query (a continent-wide zonal, a
    * selective-looking filter that isn't) holds a request-pool thread
    * AND keeps its cluster job burning executors forever — 8 of those
    * and the API is dead. So each interactive query runs on a
    * dedicated thread under `setJobGroup(interruptOnCancel = true)`;
    * on deadline expiry the group is cancelled (killing all its
    * running stages cluster-side) and the handler answers with the
    * reference's envelope. Downloads stream incrementally and async
    * batch jobs poll (202) — neither is deadline-bound, matching the
    * reference's split. */
  private val queryExec = {
    val fac = new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-query-exec-${n.getAndIncrement()}")
        t.setDaemon(true); t
      }
    }
    java.util.concurrent.Executors.newCachedThreadPool(fac)
  }

  /** Last cancelled job group, observable by specs so they can assert
    * the Spark job actually died (`statusTracker.getJobIdsForGroup`). */
  @volatile private[api] var lastCancelledGroup: Option[String] = None

  private def withDeadline[T](tag: String, raster: Boolean)(body: => T): T = {
    val sc = spark.sparkContext
    val groupId = s"graft-api-$tag-${java.util.UUID.randomUUID()}"
    // slot acquisition is the pool-connection wait: bounded by the
    // same deadline class, surfacing the same timeout envelope when
    // the pool is saturated (the reference's exhausted asyncpg pool
    // reads identically to a slow query from the client's side)
    val slot: Integer =
      querySlots.poll(sqlRequestTimeoutSec.toLong,
        java.util.concurrent.TimeUnit.SECONDS)
    if (slot == null) throw new QueryTimeoutException(raster)
    // release-once ownership: normally the query task's finally frees
    // the slot when the Spark work actually ENDS (a cancelled query
    // still holds its slot until its stages die — a zombie must count
    // against the pool, not beside it). If cancel lands before the
    // task ever ran, the timeout path claims the release instead; the
    // CAS makes the two paths mutually exclusive under FutureTask's
    // cancel/run race (cancel(true) can return true while call() is
    // concurrently entering).
    val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    val taskEntered = new java.util.concurrent.atomic.AtomicBoolean(false)
    def releaseOnce(): Unit =
      if (released.compareAndSet(false, true)) querySlots.put(slot)
    val fut = queryExec.submit(new java.util.concurrent.Callable[T] {
      def call(): T = {
        taskEntered.set(true)
        // job groups are thread-local: set on the thread that runs the
        // Spark actions, cleared so pool reuse can't leak the group
        sc.setJobGroup(groupId, s"graft interactive $tag",
          interruptOnCancel = true)
        sc.setLocalProperty("spark.scheduler.pool", s"graft-api-slot-$slot")
        try body finally {
          sc.setLocalProperty("spark.scheduler.pool", null)
          sc.clearJobGroup()
          releaseOnce()
        }
      }
    })
    try fut.get(sqlRequestTimeoutSec.toLong, java.util.concurrent.TimeUnit.SECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        sc.cancelJobGroup(groupId)
        if (fut.cancel(true) && !taskEntered.get()) releaseOnce()
        lastCancelledGroup = Some(groupId)
        throw new QueryTimeoutException(raster)
      case e: java.util.concurrent.ExecutionException =>
        throw e.getCause
    }
  }

  // ------------------------------------------------------------- routing

  private val QueryRoot = "^/dataset/([^/]+)/([^/]+)/query$".r
  private val QueryJson = "^/dataset/([^/]+)/([^/]+)/query/json$".r
  private val QueryCsv = "^/dataset/([^/]+)/([^/]+)/query/csv$".r
  private val Download = "^/dataset/([^/]+)/([^/]+)/download/(csv|json)$".r
  private val DownloadFile = "^/dataset/([^/]+)/([^/]+)/download/(shp|gpkg)$".r
  private val DownloadTiff = "^/dataset/([^/]+)/([^/]+)/download/geotiff$".r
  private val Fields = "^/dataset/([^/]+)/([^/]+)/fields$".r
  private val Features = "^/dataset/([^/]+)/([^/]+)/features$".r
  private val StatsR = "^/dataset/([^/]+)/([^/]+)/stats$".r
  private val ExtentR = "^/dataset/([^/]+)/([^/]+)/extent$".r
  private val GeostoreGet = "^/geostore/([^/]+)$".r
  private val AdminBoundary0 = "^/geostore/admin/([^/]+)$".r
  private val AdminBoundary1 = "^/geostore/admin/([^/]+)/([^/]+)$".r
  private val AdminBoundary2 = "^/geostore/admin/([^/]+)/([^/]+)/([^/]+)$".r
  private val TileGet =
    "^/([^/]+)/([^/]+)/([^/]+)/(\\d+)/(\\d+)/(\\d+)\\.(png|pbf)$".r
  private val TileRootJson = "^/([^/]+)/([^/]+)/([^/]+)/root\\.json$".r
  private val VersionRoot = "^/dataset/([^/]+)/([^/]+)$".r
  private val QueryBatch = "^/dataset/([^/]+)/([^/]+)/query/batch$".r
  private val VersionAppend = "^/dataset/([^/]+)/([^/]+)/append$".r
  private val DatasetRoot = "^/dataset/([^/]+)$".r
  private val DownloadAoi = "^/dataset/([^/]+)/([^/]+)/download_by_aoi/(csv|json)$".r
  private val MetadataR = "^/dataset/([^/]+)/([^/]+)/metadata$".r
  private val VersionGeostore = "^/dataset/([^/]+)/([^/]+)/geostore/([^/]+)$".r
  private val AssetR = "^/asset/([^/]+)$".r
  private val AssetSubR = "^/asset/([^/]+)/(creation_options|change_log|tasks|stats|extent|tiles_info)$".r
  private val ApiKeyR = "^/auth/apikey/([^/]+)$".r
  private val ApiKeyValidateR = "^/auth/apikey/([^/]+)/validate$".r
  private val ZonalPathR = "^/analysis/zonal/([^/]+)$".r
  private val AssetMetaR = "^/asset/([^/]+)/metadata$".r
  private val AssetFieldsR = "^/asset/([^/]+)/fields$".r
  private val AssetFieldR = "^/asset/([^/]+)/fields/([^/]+)$".r
  private val TaskR = "^/task/([^/]+)$".r
  private val TclDriver = "^/land/tree_cover_loss_by_driver$".r
  private val TclDriverId = "^/land/tree_cover_loss_by_driver/([^/]+)$".r
  private val AssetsR = "^/dataset/([^/]+)/([^/]+)/assets$".r
  private val CreationOptsR = "^/dataset/([^/]+)/([^/]+)/creation_options$".r
  private val ChangeLogR = "^/dataset/([^/]+)/([^/]+)/change_log$".r

  // ----------------------------------------------------------- auth gate

  /** The reference's two-layer gate on query/download routes: a valid
    * API key (`get_api_key` → 403 "No valid API Key found.") and, for
    * protected datasets, an admin bearer token
    * (`is_authorized_for_query` → 401). Returns the rejection, if
    * any; key auth only applies when the server was built with a key
    * registry. */
  private def authGate(ex: HttpExchange, dataset: String): Option[(Int, String)] = {
    val keyFail = apiKeys.flatMap { reg =>
      val hdr = Option(ex.getRequestHeaders.getFirst("x-api-key"))
      val key = hdr.orElse(queryParams(ex).get("x-api-key"))
      val origin = Option(ex.getRequestHeaders.getFirst("Origin"))
      val referrer = Option(ex.getRequestHeaders.getFirst("Referer"))
      if (key.exists(k => reg.isValid(k, origin, referrer))) None
      else Some((403, Sinks.jsendError("No valid API Key found.")))
    }
    keyFail.orElse {
      if (protectedDatasets.contains(dataset)) {
        val token = Option(ex.getRequestHeaders.getFirst("Authorization"))
          .filter(_.startsWith("Bearer ")).map(_.stripPrefix("Bearer "))
        token match {
          case Some(t) if adminTokens.contains(t) => None
          case _ => Some((401, Sinks.jsendError(
            "Unauthorized query on a restricted dataset or version")))
        }
      } else None
    }
  }

  private val versionsRoot = s"${sys.props("java.io.tmpdir")}/graft_versions/"

  /** Session table for a (dataset, version): created versions are
    * registered under per-(dataset, version) view names (so they can
    * never shadow a lake table, and every version stays queryable);
    * builtin lake tables keep their bare names. */
  private def tableFor(dataset: String, version: String): String =
    catalog.version(dataset, version) match {
      case Some(v) if v.defaultAsset.exists(a =>
          (a.assetType == cat.AssetType.DatabaseTable ||
            a.assetType == cat.AssetType.GeoDatabaseTable) &&
            a.assetUri.startsWith(versionsRoot)) =>
        graft.etl.VersionCreation.viewName(dataset, v.version)
      case _ => dataset
    }

  /** The CONCRETE version name behind a possibly-aliased path
    * segment: the catalog resolves `latest` (tableFor relies on it),
    * but the versionRecords/versionOpts/versionMetadata side maps key
    * on real names — looking them up with the alias 404s/blanks
    * routes that work under the real name. */
  private def realVersion(dataset: String, version: String): String =
    if (version == "latest")
      catalog.version(dataset, version).map(_.version).getOrElse(version)
    else version

  /** Gate for mutating routes (version creation, API-key minting):
    * the reference requires an authenticated owner/admin
    * (`add_new_version` → `get_owner`, `create_api_key` → `get_user`);
    * here that is an admin bearer token. A server constructed without
    * admin tokens has no write identity at all, so writes are refused
    * rather than open. */
  private def writeGate(ex: HttpExchange): Option[(Int, String)] = {
    val token = Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.startsWith("Bearer ")).map(_.stripPrefix("Bearer "))
    token match {
      case Some(t) if adminTokens.contains(t) => None
      case _ => Some((401, Sinks.jsendError("Unauthorized")))
    }
  }

  private def handle(ex: HttpExchange): Unit =
    try {
      val path = ex.getRequestURI.getPath
      (ex.getRequestMethod, path) match {
        case ("GET", QueryRoot(d, v)) =>
          val q = Option(ex.getRequestURI.getRawQuery).map("?" + _).getOrElse("")
          ex.getResponseHeaders.add("Location", s"/dataset/$d/$v/query/json$q")
          respond(ex, 308, "application/json", "")
        case ("GET", QueryJson(d, v)) => query(ex, d, v, json = true)
        case ("GET", QueryCsv(d, v)) => query(ex, d, v, json = false)
        case ("POST", QueryJson(d, v)) => queryPost(ex, d, v, json = true)
        case ("POST", QueryCsv(d, v)) => queryPost(ex, d, v, json = false)
        case ("GET", Download(d, v, fmt)) => download(ex, d, v, fmt)
        case ("GET", DownloadFile(d, v, fmt)) => downloadFile(ex, d, v, fmt)
        case ("GET", DownloadTiff(d, v)) => downloadGeotiff(ex, d, v)
        case ("GET", Fields(d, v)) => fields(ex, d, v)
        case ("GET", Features(d, v)) => features(ex, d, v)
        case ("GET", StatsR(d, v)) => stats(ex, d, v)
        case ("GET", ExtentR(d, v)) => extent(ex, d, v)
        case ("GET", "/political/id-lookup") => idLookup(ex)
        case ("GET", "/ping") => respond(ex, 200, "application/json", "\"pong\"")
        case ("GET", DownloadAoi(d, v, fmt)) => downloadByAoi(ex, d, v, fmt)
        case ("GET", MetadataR(d, v)) => versionMetadataGet(ex, d, v)
        case (m, MetadataR(d, v)) if m == "POST" || m == "PATCH" =>
          versionMetadataWrite(ex, d, v)
        case ("DELETE", MetadataR(d, v)) => versionMetadataDelete(ex, d, v)
        case ("GET", VersionGeostore(d, v, gid)) => versionGeostore(ex, d, v, gid)
        case ("GET", AssetMetaR(id)) => assetMetadataGet(ex, id)
        case (m, AssetMetaR(id)) if m == "POST" || m == "PATCH" =>
          assetMetadataWrite(ex, id)
        case ("DELETE", AssetMetaR(id)) => assetMetadataDelete(ex, id)
        case ("GET", AssetFieldsR(id)) => assetFields(ex, id)
        case ("GET", AssetFieldR(id, f)) => assetFieldGet(ex, id, f)
        case ("PATCH", AssetFieldR(id, f)) => assetFieldPatch(ex, id, f)
        case ("GET", AssetR(id)) => assetGet(ex, id)
        case ("DELETE", AssetR(id)) => assetDelete(ex, id)
        case ("GET", AssetSubR(id, sub)) => assetSub(ex, id, sub)
        case ("GET", TaskR(id)) => taskGet(ex, id)
        case ("PUT", TaskR(id)) => taskPut(ex, id)
        case ("PATCH", TaskR(id)) => taskPatch(ex, id)
        case ("GET", TclDriver()) => tclSearch(ex)
        case ("POST", TclDriver()) => tclPost(ex)
        case ("GET", TclDriverId(rid)) => tclGet(ex, rid)
        case ("DELETE", TclDriverId(rid)) => tclDelete(ex, rid)
        case ("POST", "/auth/apikey") => apiKeyCreate(ex)
        case ("PUT", VersionRoot(d, v)) => versionPut(ex, d, v)
        case ("POST", VersionAppend(d, v)) => versionAppend(ex, d, v)
        case ("GET", AssetsR(d, v)) => versionAssets(ex, d, v)
        case ("POST", AssetsR(d, v)) => assetAdd(ex, d, v)
        case ("GET", "/assets") => assetsList(ex)
        case ("GET", CreationOptsR(d, v)) => creationOptions(ex, d, v)
        case ("GET", ChangeLogR(d, v)) => versionChangeLog(ex, d, v)
        case ("GET", VersionRoot(d, v)) => versionGet(ex, d, v)
        case ("PATCH", VersionRoot(d, v)) => versionPatch(ex, d, v)
        case ("DELETE", VersionRoot(d, v)) => versionDelete(ex, d, v)
        case ("GET", "/datasets") => datasetsList(ex)
        case ("PUT", DatasetRoot(d)) => datasetPut(ex, d)
        case ("GET", DatasetRoot(d)) => datasetGet(ex, d)
        case ("PATCH", DatasetRoot(d)) => datasetPatch(ex, d)
        case ("DELETE", DatasetRoot(d)) => datasetDelete(ex, d)
        case ("GET", "/analysis/zonal") => zonal(ex)
        case ("GET", ZonalPathR(gid)) => zonal(ex, Some(gid))
        case ("GET", ApiKeyValidateR(key)) => apiKeyValidate(ex, key)
        case ("GET", ApiKeyR(key)) => apiKeyGet(ex, key)
        case ("DELETE", ApiKeyR(key)) => apiKeyDelete(ex, key)
        case ("GET", "/auth/apikeys") => apiKeysList(ex)
        case ("POST", "/analysis/zonal/batch") => zonalBatch(ex)
        case ("POST", QueryBatch(d, v)) => queryBatch(ex, d, v)
        case ("GET", JobDownload(id)) =>
          jobRegistry.result(id) match {
            case Some(payload) =>
              ex.getResponseHeaders.add("Content-Disposition",
                s"""attachment; filename="$id.json"""")
              respond(ex, 200, "application/json", payload)
            case None => respond(ex, 404, "application/json",
              Sinks.jsendError(s"No results for job $id"))
          }
        case ("GET", JobGet(id)) =>
          jobRegistry.get(id) match {
            case None => respond(ex, 404, "application/json",
              Sinks.jsendError(s"Job $id not found"))
            case Some(j) =>
              val payload = j.payload.getOrElse("null")
              val msg = j.message.map(m => s""","message":${graft.geo.Json.write(m)}""").getOrElse("")
              val link =
                if (j.status.name == "success")
                  s""","download_link":"/job/${j.id}/download""""
                else ""
              respond(ex, 200, "application/json",
                s"""{"data":{"job_id":"${j.id}","status":"${j.status.name}","results":$payload$msg$link},"status":"success"}""")
          }
        case ("POST", "/geostore") => geostoreCreate(ex)
        case ("GET", "/geostore/admin/list") => adminList(ex)
        case ("GET", AdminBoundary2(c, r, s)) =>
          adminBoundary(ex, c, Some(r), Some(s))
        case ("GET", AdminBoundary1(c, r)) => adminBoundary(ex, c, Some(r), None)
        case ("GET", AdminBoundary0(c)) => adminBoundary(ex, c, None, None)
        case ("GET", TileGet(d, v, impl, z, x, y, ext)) =>
          serveTile(ex, d, v, impl, z, x, y, ext)
        case ("GET", TileRootJson(d, v, impl)) => serveTileRoot(ex, d, v, impl)
        case ("GET", GeostoreGet(id)) =>
          geostore.get(id) match {
            case Some(gj) => respond(ex, 200, "application/json",
              s"""{"data":{"gfw_geostore_id":"$id","geojson":$gj},"status":"success"}""")
            case None => respond(ex, 404, "application/json",
              Sinks.jsendError(s"Geostore $id not found"))
          }
        case _ =>
          respond(ex, 404, "application/json", Sinks.jsendError("Not found"))
      }
    } catch {
      case e: QueryTimeoutException =>
        // raster analysis timeout → 500 (`queries.py:596-599`); tabular
        // command timeout → the global 524 handler (`main.py:53-64`);
        // both are ≥500 so status "error" (`errors.py:43-46`)
        if (e.raster)
          respond(ex, 500, "application/json",
            Sinks.jsendError("Query took too long to process.", "error"))
        else
          respond(ex, 524, "application/json", Sinks.jsendError(
            "A timeout occurred while processing the request. Request canceled.",
            "error"))
      case e: SqlGateException =>
        respond(ex, e.statusCode, "application/json", Sinks.jsendError(e.detail))
      case e: graft.raster.ZonalEngine.ZonalException =>
        respond(ex, 400, "application/json", Sinks.jsendError(e.detail))
      case e: graft.raster.RasterSqlException =>
        // raster-analysis validation failure → 422 (queries.py:617-621)
        respond(ex, 422, "application/json", Sinks.jsendError(e.detail))
      case e: org.apache.spark.sql.AnalysisException
          if e.getErrorClass != null &&
            (e.getErrorClass.startsWith("UNRESOLVED_COLUMN") ||
              e.getErrorClass.startsWith("UNRESOLVED_ROUTINE")) =>
        // a user-SQL reference that doesn't resolve is the client's
        // error — the reference surfaces PG's message as 400
        // (`queries.py` Bad request passthrough)
        respond(ex, 400, "application/json",
          Sinks.jsendError("Bad request. " + e.getSimpleMessage))
      case e: Throwable =>
        // ≥500 carries status "error" in the reference's JSEND mapping
        // (`errors.py:43-46`)
        respond(ex, 500, "application/json",
          Sinks.jsendError(
            Option(e.getMessage).getOrElse("Internal server error"), "error"))
    } finally ex.close()

  // ------------------------------------------------------------ handlers

  /** 2h Cache-Control, except TCL tables which are immutable per
    * version → 1y (`queries.py:155-158`). */
  private def cacheControl(dataset: String): String =
    if (dataset.contains("gadm__tcl__")) "max-age=31536000" else "max-age=7200"

  /** Driver-memory guardrail for the INTERACTIVE query routes: they
    * buffer the full result (JSEND/CSV string) on the driver, so an
    * un-LIMITed `SELECT *` over a big version would OOM the server.
    * The reference leans on its API-gateway timeout for this; a
    * Spark driver needs an explicit bound. Downloads stream
    * (`toLocalIterator`) and are not capped. */
  private val MaxInteractiveRows =
    sys.env.getOrElse("GRAFT_MAX_QUERY_ROWS", "100000").toInt

  private def query(ex: HttpExchange, dataset: String, version: String,
                    json: Boolean): Unit = {
    authGate(ex, dataset).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    val params = queryParams(ex)
    val sql = params.getOrElse("sql",
      return respond(ex, 422, "application/json", Sinks.jsendError("Missing sql parameter")))
    catalog.queryEngine(dataset, version) match {
      case Left(msg) if msg.contains("not found") =>
        respond(ex, 404, "application/json", Sinks.jsendError(msg))
      case Left(msg) =>
        respond(ex, 501, "application/json", Sinks.jsendError(msg))
      case Right(cat.RasterEngine) =>
        // raster path: geostore mandatory (queries.py:487-503 → 422);
        // the user's SQL runs for real — select list, WHERE over layer
        // pseudo-columns, GROUP BY — via the fused zonal engine
        // (`_query_raster`, queries.py:548-575)
        params.get("geostore_id").flatMap(resolveGeostore(_,
          params.getOrElse("geostore_origin", "gfw"))) match {
          case None => respond(ex, 422, "application/json",
            Sinks.jsendError("Raster tile set queries require a geostore"))
          case Some(gj) =>
            val payload = withDeadline("query", raster = true) {
              val df = graft.raster.ZonalEngine.runSql(
                spark, catalog, dataset, sql, gj).limit(MaxInteractiveRows)
              if (json) Sinks.toJsend(df) else Sinks.toCsv(df)
            }
            ex.getResponseHeaders.add("Cache-Control", cacheControl(dataset))
            respond(ex, 200, if (json) "application/json" else "text/csv", payload)
        }
      case Right(_) =>
        val gidOpt = params.get("geostore_id")
        val geom = gidOpt.flatMap(resolveGeostore(_,
          params.getOrElse("geostore_origin", "gfw")))
        // an UNRESOLVABLE geostore is 404 (the reference's
        // RecordNotFoundError) — silently dropping the AOI would
        // return the full unfiltered table
        if (gidOpt.isDefined && geom.isEmpty)
          return respond(ex, 404, "application/json", Sinks.jsendError(
            s"Area with gfw_geostore_id ${gidOpt.get} does not exist"))
        // lake table view name == dataset name (single-version lake)
        val rewritten = Scrutinizer.scrutinizeTo(tableFor(dataset, version), geom, sql)
        graft.sqlgate.TabularEngine.checkFunctionsExist(spark, rewritten)
        val payload = withDeadline("query", raster = false) {
          val df = spark.sql(rewritten).limit(MaxInteractiveRows)
          if (json) Sinks.toJsend(df) else Sinks.toCsv(df)
        }
        ex.getResponseHeaders.add("Cache-Control", cacheControl(dataset))
        respond(ex, 200, if (json) "application/json" else "text/csv", payload)
    }
  }

  private def fields(ex: HttpExchange, dataset: String, version: String): Unit =
    catalog.version(dataset, version) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found"))
      case Some(v) if v.defaultAsset.exists(_.assetType == cat.AssetType.RasterTileSet) =>
        // raster fields = reserved pseudo-columns + the queryable
        // layers of the data environment (versions.py:516-522)
        val reserved = Seq("area__ha", "latitude", "longitude").map(n =>
          s"""{"name":"$n","data_type":"number","is_reserved":true}""")
        val env = graft.raster.DataEnvironment.cached(
          catalog, graft.raster.TileLake.defaultDir)
        val layers = env.layers.keys.filterNot(_ == "area__ha").toSeq.sorted.map(n =>
          s"""{"name":"$n","data_type":"integer","is_reserved":false}""")
        respond(ex, 200, "application/json",
          s"""{"data":[${(reserved ++ layers).mkString(",")}],"status":"success"}""")
      case Some(_) =>
        val schema = spark.table(tableFor(dataset, version)).schema
        val items = schema.fields.map { f =>
          s"""{"name":"${f.name}","data_type":"${f.dataType.catalogString}","is_feature_info":true}"""
        }.mkString(",")
        respond(ex, 200, "application/json", s"""{"data":[$items],"status":"success"}""")
    }

  /** POST body form: `{"sql": "...", "geometry": {...GeoJSON...}}`
    * with an inline AOI (`queries.py` POST routes; `json = false` is
    * the POST `/query/csv` variant). */
  private def queryPost(ex: HttpExchange, dataset: String, version: String,
                        json: Boolean): Unit = {
    authGate(ex, dataset).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val obj = parseBody422(ex, body).getOrElse(return)
    val sql = obj.get("sql") match {
      case Some(s: String) => s
      case _ => return respond(ex, 422, "application/json",
        Sinks.jsendError("Missing sql in request body"))
    }
    val geom = obj.get("geometry").map(graft.geo.Json.write)
    def send(raster: Boolean)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val payload = withDeadline("query", raster) {
        val limited = df.limit(MaxInteractiveRows)
        if (json) Sinks.toJsend(limited) else Sinks.toCsv(limited)
      }
      respond(ex, 200, if (json) "application/json" else "text/csv", payload)
    }
    catalog.queryEngine(dataset, version) match {
      case Left(msg) if msg.contains("not found") =>
        respond(ex, 404, "application/json", Sinks.jsendError(msg))
      case Left(msg) => respond(ex, 501, "application/json", Sinks.jsendError(msg))
      case Right(cat.RasterEngine) =>
        // raster POST needs the inline geometry (queries.py:487-503)
        geom match {
          case None => respond(ex, 422, "application/json",
            Sinks.jsendError("Raster tile set queries require a geometry"))
          case Some(gj) =>
            send(raster = true)(graft.raster.ZonalEngine.runSql(
              spark, catalog, dataset, sql, gj, versionOverrides(obj)))
        }
      case Right(_) =>
        val rewritten = Scrutinizer.scrutinizeTo(tableFor(dataset, version), geom, sql)
        graft.sqlgate.TabularEngine.checkFunctionsExist(spark, rewritten)
        send(raster = false)(spark.sql(rewritten))
    }
  }

  /** Download variant of the query endpoints: attachment disposition,
    * gated by the version's downloadability flag
    * (`downloads.py:391-396`). Unlike `/query`, downloads STREAM —
    * rows flow through `toLocalIterator` into a chunked response, so
    * `SELECT *` of a large version never buffers on the driver
    * (`downloads.py:35-231`). */
  private def download(ex: HttpExchange, dataset: String, version: String,
                       fmt: String): Unit =
    catalog.version(dataset, version) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found"))
      case Some(v) if !v.isDownloadable =>
        respond(ex, 403, "application/json",
          Sinks.jsendError("This dataset is not available for download"))
      case Some(_) =>
        authGate(ex, dataset).foreach { case (code, body) =>
          return respond(ex, code, "application/json", body) }
        val params = queryParams(ex)
        val sql = params.getOrElse("sql", return respond(ex, 422,
          "application/json", Sinks.jsendError("Missing sql parameter")))
        catalog.queryEngine(dataset, version) match {
          case Right(cat.TableEngine) =>
            val gidOpt = params.get("geostore_id")
            val geom = gidOpt.flatMap(resolveGeostore(_,
              params.getOrElse("geostore_origin", "gfw")))
            if (gidOpt.isDefined && geom.isEmpty)
              return respond(ex, 404, "application/json", Sinks.jsendError(
                s"Area with gfw_geostore_id ${gidOpt.get} does not exist"))
            val rewritten = Scrutinizer.scrutinizeTo(tableFor(dataset, version), geom, sql)
            graft.sqlgate.TabularEngine.checkFunctionsExist(spark, rewritten)
            val df = spark.sql(rewritten)
            // bounded stream concurrency: wait for the download gate
            // up to the deadline class, then answer the timeout
            // envelope (the reference holds a pool connection for the
            // whole cursor; an exhausted pool surfaces the same way)
            if (!downloadGate.tryAcquire(sqlRequestTimeoutSec.toLong,
                java.util.concurrent.TimeUnit.SECONDS))
              return respond(ex, 524, "application/json", Sinks.jsendError(
                "A timeout occurred while processing the request. Request canceled.",
                "error"))
            try {
              ex.getResponseHeaders.add("Content-Disposition",
                s"""attachment; filename="$dataset.$fmt"""")
              val ct = if (fmt == "json") "application/json" else "text/csv"
              ex.getResponseHeaders.add("Content-Type", ct)
              ex.sendResponseHeaders(200, 0) // chunked
              val out = ex.getResponseBody
              try {
                if (fmt == "json") Sinks.streamJsend(df, out)
                else Sinks.streamCsv(df, out)
              } finally out.close()
            } finally downloadGate.release()
          case _ =>
            // raster downloads redirect to asset files in the
            // reference; out of scope for the synthetic lake
            respond(ex, 501, "application/json", Sinks.jsendError(
              "This endpoint is not implemented for the given dataset"))
        }
    }

  /** `GET /download_by_aoi/{csv,json}` (`downloads.py:202-263`): the
    * download variant whose AOI is MANDATORY — same streaming sink,
    * 422 without a resolvable geostore. */
  private def downloadByAoi(ex: HttpExchange, dataset: String, version: String,
                            fmt: String): Unit = {
    val params = queryParams(ex)
    val gid = params.getOrElse("geostore_id", return respond(ex, 422,
      "application/json", Sinks.jsendError("geostore_id is required")))
    if (resolveGeostore(gid, params.getOrElse("geostore_origin", "gfw")).isEmpty)
      return respond(ex, 404, "application/json",
        Sinks.jsendError(s"Geostore $gid not found"))
    download(ex, dataset, version, fmt)
  }

  /** Version metadata CRUD (`versions.py:407-517`): a free-form
    * metadata document per (dataset, version); POST creates, PATCH
    * merges fields, DELETE clears. */
  private val versionMetadata = scala.collection.concurrent.TrieMap
    .empty[(String, String), Map[String, String]]

  private def versionMetadataGet(ex: HttpExchange, dataset: String, version: String): Unit =
    if (catalog.version(dataset, version).isEmpty)
      respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found"))
    else versionMetadata.get((dataset, realVersion(dataset, version))) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Version $dataset.$version has no metadata"))
      case Some(m) =>
        val body = m.toSeq.sortBy(_._1).map { case (k, v) =>
          s"${graft.geo.Json.write(k)}:${graft.geo.Json.write(v)}"
        }.mkString("{", ",", "}")
        respond(ex, 200, "application/json", s"""{"data":$body,"status":"success"}""")
    }

  private def versionMetadataWrite(ex: HttpExchange, dataset: String, version: String): Unit = {
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    if (catalog.version(dataset, version).isEmpty)
      return respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found"))
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val patch = if (body.isBlank) Map.empty[String, String]
                else parseBody422(ex, body).getOrElse(return).collect {
                  case (k, s: String) => k -> s
                  case (k, v) if v != null => k -> graft.geo.Json.write(v)
                }
    val isCreate = ex.getRequestMethod == "POST"
    val merged = versionMetadata.updateWith((dataset, realVersion(dataset, version))) {
      case Some(old) if !isCreate => Some(old ++ patch)
      case _ => Some(patch)
    }.get
    val out = merged.toSeq.sortBy(_._1).map { case (k, v) =>
      s"${graft.geo.Json.write(k)}:${graft.geo.Json.write(v)}"
    }.mkString("{", ",", "}")
    respond(ex, if (isCreate) 201 else 200, "application/json",
      s"""{"data":$out,"status":"success"}""")
  }

  private def versionMetadataDelete(ex: HttpExchange, dataset: String, version: String): Unit = {
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    versionMetadata.remove((dataset, realVersion(dataset, version))) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Version $dataset.$version has no metadata"))
      case Some(_) => respond(ex, 200, "application/json",
        """{"data":{},"status":"success"}""")
    }
  }

  /** `GET /dataset/{d}/{v}/geostore/{id}` (`datasets/geostore.py:16`):
    * a geostore looked up WITHIN a version's table — the row whose
    * content-addressed `gfw_geostore_id` matches returns its stored
    * geometry. */
  private def versionGeostore(ex: HttpExchange, dataset: String, version: String,
                              gid: String): Unit =
    catalog.version(dataset, version) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found"))
      case Some(v) if !v.defaultAsset.exists(_.assetType == cat.AssetType.GeoDatabaseTable) =>
        respond(ex, 501, "application/json", Sinks.jsendError(
          "This endpoint is not implemented for the given dataset"))
      case Some(_) =>
        val rows = spark.sql(
          s"""SELECT gfw_geojson FROM ${tableFor(dataset, version)}
             |WHERE gfw_geostore_id = '${gid.replace("'", "''")}' LIMIT 1""".stripMargin)
          .collect()
        if (rows.isEmpty)
          respond(ex, 404, "application/json",
            Sinks.jsendError(s"Geostore $gid not found in $dataset.$version"))
        else
          respond(ex, 200, "application/json",
            s"""{"data":{"gfw_geostore_id":"$gid","geojson":${rows.head.getString(0)}},"status":"success"}""")
    }

  /** Asset-by-id routes (`assets/asset.py:82-305`): the catalog is
    * searched across all datasets/versions. */
  private def findAsset(id: String): Option[(cat.Version, cat.Asset)] =
    catalog.datasets.iterator.flatMap(_.versions).flatMap(v =>
      v.assets.collect { case a if a.assetId == id => (v, a) }).nextOption()

  private def assetGet(ex: HttpExchange, id: String): Unit = findAsset(id) match {
    case None => respond(ex, 404, "application/json",
      Sinks.jsendError(s"Asset $id not found"))
    case Some((v, a)) =>
      respond(ex, 200, "application/json",
        s"""{"data":{"asset_id":"${a.assetId}","dataset":"${v.dataset}","version":"${v.version}","asset_type":${graft.geo.Json.write(a.assetType)},"asset_uri":${graft.geo.Json.write(a.assetUri)},"is_default":${a.isDefault},"status":"${a.status}"},"status":"success"}""")
  }

  private def assetSub(ex: HttpExchange, id: String, sub: String): Unit = findAsset(id) match {
    case None => respond(ex, 404, "application/json",
      Sinks.jsendError(s"Asset $id not found"))
    case Some((v, a)) => sub match {
      case "creation_options" =>
        val body = a.creationOptions.toSeq.sortBy(_._1).map { case (k, x) =>
          s"${graft.geo.Json.write(k)}:${graft.geo.Json.write(x)}"
        }.mkString("{", ",", "}")
        respond(ex, 200, "application/json", s"""{"data":$body,"status":"success"}""")
      case "change_log" => versionChangeLog(ex, v.dataset, v.version)
      case "tasks" =>
        val items = taskRecords.values.toSeq
          .filter(_.assetId == a.assetId).sortBy(_.taskId)
          .map(taskBody).mkString(",")
        respond(ex, 200, "application/json",
          s"""{"data":[$items],"status":"success"}""")
      case "stats" => stats(ex, v.dataset, v.version)
      case "extent" => extent(ex, v.dataset, v.version)
      case "tiles_info" => assetTilesInfo(ex, v, a)
    }
  }

  /** GET /asset/{id}/tiles_info (`asset.py:316-335`): raster tile
    * sets only — 307 to the tiles.geojson artifact (the reference
    * presigns the pixETL-written S3 object; here the FeatureCollection
    * of tile footprints materializes from the lake on first request). */
  private def assetTilesInfo(ex: HttpExchange, v: cat.Version, a: cat.Asset): Unit = {
    if (a.assetType != cat.AssetType.RasterTileSet)
      return respond(ex, 400, "application/json", Sinks.jsendError(
        "Tiles information only available for raster tile sets"))
    val cacheDir = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_tiles_info")
    java.nio.file.Files.createDirectories(cacheDir)
    val out = cacheDir.resolve(s"${a.assetId}_tiles.geojson")
    if (!java.nio.file.Files.exists(out)) {
      val g = graft.raster.DataEnvironment.gridOf(a.creationOptions)
      graft.raster.TileLake.ensureLake(spark, a.assetUri)
      val tiles = spark.read.parquet(a.assetUri)
        .selectExpr("tile_id", "tx", "ty").distinct()
        .collect().sortBy(r => (r.getInt(1), r.getInt(2)))
      val features = tiles.map { r =>
        val (tx, ty) = (r.getInt(1), r.getInt(2))
        val x0 = g.originLon + tx * g.tileDeg
        val y0 = g.originLat - ty * g.tileDeg
        val ring = s"[[$x0,$y0],[${x0 + g.tileDeg},$y0]," +
          s"[${x0 + g.tileDeg},${y0 - g.tileDeg}],[$x0,${y0 - g.tileDeg}],[$x0,$y0]]"
        s"""{"type":"Feature","properties":{"name":"${r.getString(0)}.tif"},""" +
          s""""geometry":{"type":"Polygon","coordinates":[$ring]}}"""
      }
      java.nio.file.Files.writeString(out,
        s"""{"type":"FeatureCollection","features":[${features.mkString(",")}]}""")
    }
    ex.getResponseHeaders.add("Location", out.toString)
    respond(ex, 307, "application/json", "")
  }

  /** DELETE /asset/{id} (`assets/asset.py:142-223`): non-default
    * assets (exports, caches) delete their artifact and drop out of
    * the catalog; default assets are refused — deleting them means
    * deleting the parent version. */
  private def assetDelete(ex: HttpExchange, id: String): Unit = {
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    findAsset(id) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Asset $id not found"))
      case Some((v, a)) if a.isDefault =>
        respond(ex, 409, "application/json", Sinks.jsendError(
          "Deletion failed. You cannot delete a default asset. " +
            "To delete a default asset you must delete the parent version."))
      case Some((v, a)) =>
        catalogLock.synchronized {
          catalog = catalog.withoutAsset(v.dataset, v.version, a.assetId)
        }
        val f = new java.io.File(a.assetUri)
        if (f.isFile) f.delete()
        assetMetadata.remove(a.assetId)
        // field overrides die with the asset — a later asset reusing
        // the id must not inherit stale aliases
        fieldMetaOverrides.keys.filter(_._1 == a.assetId)
          .foreach(fieldMetaOverrides.remove)
        respond(ex, 200, "application/json",
          s"""{"data":{"asset_id":"${a.assetId}","status":"deleted"},"status":"success"}""")
    }
  }

  // -------------------------------------------------- asset metadata

  /** Asset metadata documents + per-field overrides
    * (`assets/asset.py:356-520`; the reference keeps them on
    * `asset_metadata` / `field_metadata` ORM rows). */
  private val assetMetadata = scala.collection.concurrent.TrieMap
    .empty[String, Map[String, Any]]
  private val fieldMetaOverrides = scala.collection.concurrent.TrieMap
    .empty[(String, String), Map[String, Any]]

  private def assetMetadataGet(ex: HttpExchange, id: String): Unit =
    findAsset(id) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Asset $id not found"))
      case Some(_) =>
        // asset_metadata_factory: a record-less asset still serves a
        // (empty) metadata document rather than 404
        val doc = assetMetadata.getOrElse(id, Map.empty[String, Any])
        respond(ex, 200, "application/json",
          s"""{"data":${graft.geo.Json.write(doc)},"status":"success"}""")
    }

  /** POST creates (409 when a record exists,
    * `metadata_crud.create_asset_metadata`); PATCH merges fields into
    * an existing record (404 without one). */
  private def assetMetadataWrite(ex: HttpExchange, id: String): Unit = {
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    if (findAsset(id).isEmpty)
      return respond(ex, 404, "application/json",
        Sinks.jsendError(s"Asset $id not found"))
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val doc =
      try graft.geo.Json.parseObject(body)
      catch { case _: Exception => return respond(ex, 422, "application/json",
        Sinks.jsendError("Invalid metadata document")) }
    ex.getRequestMethod match {
      case "POST" =>
        if (assetMetadata.putIfAbsent(id, doc).isDefined)
          respond(ex, 409, "application/json", Sinks.jsendError(
            s"Asset $id already has a metadata record"))
        else respond(ex, 201, "application/json",
          s"""{"data":${graft.geo.Json.write(doc)},"status":"success"}""")
      case _ =>
        assetMetadata.get(id) match {
          case None => respond(ex, 404, "application/json",
            Sinks.jsendError(s"Asset $id has no metadata record"))
          case Some(prior) =>
            val merged = prior ++ doc
            assetMetadata.put(id, merged)
            respond(ex, 200, "application/json",
              s"""{"data":${graft.geo.Json.write(merged)},"status":"success"}""")
        }
    }
  }

  private def assetMetadataDelete(ex: HttpExchange, id: String): Unit = {
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    assetMetadata.remove(id) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Asset $id has no metadata record"))
      case Some(doc) => respond(ex, 200, "application/json",
        s"""{"data":${graft.geo.Json.write(doc)},"status":"success"}""")
    }
  }

  /** A raster asset's band columns: explicit `lake_bands` creation
    * option (created raster versions) or the lake's own parquet
    * schema — NOT the builtin fine lake's band list, which is wrong
    * for the derived lake. One helper so fields/stats/downloads can't
    * diverge. */
  private def bandsOfAsset(a: cat.Asset): Seq[String] =
    a.creationOptions.get("lake_bands").map(_.split(",").toSeq)
      .getOrElse(graft.raster.TileLake.bandsOf(a.assetUri))

  /** Field metadata of the asset's version schema
    * (`get_asset_fields_dicts`): name + data_type from the table
    * schema, reference defaults, merged with PATCHed overrides.
    * Raster-backed versions register no table view — their fields are
    * the reserved pseudo-columns plus the version's own bands (the
    * version-level `/fields` convention, `versions.py:516-522`). */
  private def assetFieldDocs(v: cat.Version): Seq[Map[String, Any]] = {
    def doc(name: String, dataType: String): Map[String, Any] =
      Map[String, Any]("name" -> name, "data_type" -> dataType,
        "alias" -> null, "description" -> null, "unit" -> null,
        "is_feature_info" -> true, "is_filter" -> true)
    v.defaultAsset match {
      case Some(a) if a.assetType == cat.AssetType.RasterTileSet =>
        val reserved = Seq("area__ha", "latitude", "longitude")
          .map(doc(_, "number"))
        reserved ++ bandsOfAsset(a).map(b => doc(b.stripPrefix("px_"), "integer"))
      case _ =>
        val schema = spark.table(tableFor(v.dataset, v.version)).schema
        schema.fields.toSeq.map(f => doc(f.name, f.dataType.catalogString))
    }
  }

  private def assetFields(ex: HttpExchange, id: String): Unit =
    findAsset(id) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Asset $id not found"))
      case Some((v, a)) =>
        val items = assetFieldDocs(v).map { doc =>
          val merged = doc ++
            fieldMetaOverrides.getOrElse((id, doc("name").toString), Map.empty)
          graft.geo.Json.write(merged)
        }.mkString(",")
        respond(ex, 200, "application/json",
          s"""{"data":[$items],"status":"success"}""")
    }

  private def assetFieldGet(ex: HttpExchange, id: String, field: String): Unit =
    findAsset(id) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Asset $id not found"))
      case Some((v, a)) =>
        assetFieldDocs(v).find(_("name") == field) match {
          case None => respond(ex, 404, "application/json",
            Sinks.jsendError(s"Field $field not found"))
          case Some(doc) =>
            val merged = doc ++ fieldMetaOverrides.getOrElse((id, field), Map.empty)
            respond(ex, 200, "application/json",
              s"""{"data":${graft.geo.Json.write(merged)},"status":"success"}""")
        }
    }

  /** PATCH /asset/{id}/fields/{name} (`update_field_metadata`,
    * `asset.py:380-415`): merge alias/description/unit/is_filter/
    * is_feature_info into the field's metadata. */
  private def assetFieldPatch(ex: HttpExchange, id: String, field: String): Unit = {
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    findAsset(id) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Asset $id not found"))
      case Some((v, a)) =>
        assetFieldDocs(v).find(_("name") == field) match {
          case None => respond(ex, 404, "application/json",
            Sinks.jsendError(s"Field $field not found"))
          case Some(doc) =>
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val patch =
              try graft.geo.Json.parseObject(body)
              catch { case _: Exception => return respond(ex, 422, "application/json",
                Sinks.jsendError("Invalid field metadata document")) }
            val merged = fieldMetaOverrides.getOrElse((id, field), Map.empty) ++
              (patch - "name" - "data_type") // immutable identity fields
            fieldMetaOverrides.put((id, field), merged)
            respond(ex, 200, "application/json",
              s"""{"data":${graft.geo.Json.write(doc ++ merged)},"status":"success"}""")
        }
    }
  }

  // ------------------------------------------------------------- tasks

  /** Per-step task records of the creation DAG (`app/routes/tasks/
    * task.py`; reference tasks are the AWS Batch jobs an asset build
    * fans out, each carrying its own change log). The version-creation
    * job registers one record per DAG step; PATCH appends change-log
    * entries and propagates terminal states to the asset — and, for a
    * default asset, the version (`_set_failed` / `_check_completed`,
    * `task.py:132-247`). */
  final case class TaskRec(taskId: String, assetId: String,
                           changeLog: Seq[graft.etl.VersionCreation.ChangeLog])

  private val taskRecords = scala.collection.concurrent.TrieMap
    .empty[String, TaskRec]

  private def taskBody(t: TaskRec): String = {
    val log = t.changeLog.map(c =>
      s"""{"task":"${c.task}","status":"${c.status}","detail":${graft.geo.Json.write(c.detail)}}""")
      .mkString(",")
    s"""{"task_id":"${t.taskId}","asset_id":"${t.assetId}","change_log":[$log]}"""
  }

  /** Deterministic task ids for DAG-spawned steps so a re-PUT of the
    * same version replaces its task records instead of leaking. */
  private def registerDagTasks(dataset: String, version: String,
                               log: Seq[graft.etl.VersionCreation.ChangeLog]): Unit = {
    val assetId = s"$dataset-$version-default"
    log.foreach { c =>
      val tid = graft.geo.GeoExpressions.Uuid5.of("oid", s"task:$dataset/$version/${c.task}")
      taskRecords.put(tid, TaskRec(tid, assetId, Seq(c)))
    }
  }

  private def taskGet(ex: HttpExchange, id: String): Unit =
    taskRecords.get(id) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Task $id not found"))
      case Some(t) => respond(ex, 200, "application/json",
        s"""{"data":${taskBody(t)},"status":"success"}""")
    }

  /** PUT /task/{id} (service-account route, `task.py:60-81`): attach a
    * new task record to an existing asset. */
  private def taskPut(ex: HttpExchange, id: String): Unit = {
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val obj =
      try graft.geo.Json.parseObject(body)
      catch { case _: Exception => return respond(ex, 422, "application/json",
        Sinks.jsendError("Invalid task document")) }
    val assetId = obj.get("asset_id") match {
      case Some(s: String) => s
      case _ => return respond(ex, 400, "application/json",
        Sinks.jsendError("asset_id is required"))
    }
    if (findAsset(assetId).isEmpty)
      return respond(ex, 400, "application/json",
        Sinks.jsendError(s"Asset $assetId not found"))
    val t = TaskRec(id, assetId, parseChangeLog(obj))
    // putIfAbsent: a concurrent PUT of the same id must not overwrite
    if (taskRecords.putIfAbsent(id, t).isDefined)
      return respond(ex, 400, "application/json",
        Sinks.jsendError(s"Task $id already exists"))
    respond(ex, 201, "application/json",
      s"""{"data":${taskBody(t)},"status":"success"}""")
  }

  private def parseChangeLog(obj: Map[String, Any]): Seq[graft.etl.VersionCreation.ChangeLog] =
    obj.get("change_log") match {
      case Some(l: List[_]) => l.collect { case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[String, Any]]
        graft.etl.VersionCreation.ChangeLog(
          mm.getOrElse("task", "").toString,
          mm.getOrElse("status", "").toString,
          mm.getOrElse("detail", mm.getOrElse("message", "")).toString)
      }
      case _ => Nil
    }

  /** PATCH /task/{id} (`task.py:83-129`): append change-log entries;
    * a `failed` entry marks the asset (and, when default, the version)
    * failed; all-success marks the asset saved once every task's last
    * entry succeeded; anything else is a 400. */
  private def taskPatch(ex: HttpExchange, id: String): Unit = {
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    val prior = taskRecords.getOrElse(id,
      return respond(ex, 404, "application/json",
        Sinks.jsendError(s"Task $id not found")))
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val entries = parseChangeLog(
      try graft.geo.Json.parseObject(body)
      catch { case _: Exception => return respond(ex, 422, "application/json",
        Sinks.jsendError("Invalid task document")) })
    if (entries.isEmpty || entries.exists(e =>
        e.status != "success" && e.status != "failed"))
      return respond(ex, 400, "application/json", Sinks.jsendError(
        "change log status must be either `success` or `failed`"))
    // atomic append: a background creation job putting a fresh record
    // for the same deterministic task id must not erase these entries
    val updated = catalogLock.synchronized {
      val cur = taskRecords.getOrElse(id, prior)
      val u = cur.copy(changeLog = cur.changeLog ++ entries)
      taskRecords.put(id, u)
      u
    }
    findAsset(updated.assetId).foreach { case (v, a) =>
      if (entries.exists(_.status == "failed")) {
        catalogLock.synchronized {
          catalog = catalog.withAssetStatus(v.dataset, v.version, a.assetId, "failed")
          if (a.isDefault) {
            val log = versionRecords.get((v.dataset, v.version)).map(_._2).getOrElse(Nil)
            versionRecords.put((v.dataset, v.version), ("failed", log ++ entries))
          }
        }
      } else {
        // _check_completed: every task of the asset finished cleanly
        val allDone = taskRecords.values.filter(_.assetId == a.assetId)
          .forall(_.changeLog.lastOption.exists(_.status == "success"))
        if (allDone) catalogLock.synchronized {
          catalog = catalog.withAssetStatus(v.dataset, v.version, a.assetId, "saved")
        }
      }
    }
    respond(ex, 200, "application/json",
      s"""{"data":${taskBody(updated)},"status":"success"}""")
  }

  // ------------------------------------------- datamart (land.py, beta)

  /** Tree-cover-loss-by-driver resources (`datamart/land.py:76-268`):
    * uuid5-keyed async analyses. status → (metadata json, result json
    * or error detail). */
  private val tclResources = scala.collection.concurrent.TrieMap
    .empty[String, (String, String, String)] // status, metadata, payload

  private def tclResourceId(gid: String, canopyCover: Int): String =
    graft.geo.GeoExpressions.Uuid5.of("oid",
      s"tree_cover_loss_by_driver_{'type': 'geostore', 'geostore_id': '$gid'}_${canopyCover}_None")

  /** GET search (`tree_cover_loss_by_driver_search`): 404 until the
    * resource has been computed. */
  private def tclSearch(ex: HttpExchange): Unit = {
    val params = queryParams(ex)
    val gid = params.getOrElse("geostore_id", return respond(ex, 422,
      "application/json", Sinks.jsendError("geostore_id is required")))
    val cc = num422(ex, "canopy_cover",
      params.get("canopy_cover").map(_.toInt).getOrElse(30)).getOrElse(return)
    val rid = tclResourceId(gid, cc)
    if (!tclResources.contains(rid))
      respond(ex, 404, "application/json", Sinks.jsendError(
        "Resource not found, may require computation."))
    else respond(ex, 200, "application/json",
      s"""{"data":{"link":"/land/tree_cover_loss_by_driver/$rid"},"status":"success"}""")
  }

  /** POST (`tree_cover_loss_by_driver_post`): 409 when the resource
    * exists, else 202 + link; the analysis runs in the background —
    * the SAME fused zonal engine, grouped by loss year and the driver
    * layer, thresholded on canopy cover. */
  private def tclPost(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val obj = parseBody422(ex, body).getOrElse(return)
    val gid = obj.get("geostore_id") match {
      case Some(s: String) => s
      case _ => return respond(ex, 422, "application/json",
        Sinks.jsendError("geostore_id is required"))
    }
    val cc = num422(ex, "canopy_cover",
      obj.get("canopy_cover").map(_.toString.toDouble.toInt).getOrElse(30)).getOrElse(return)
    val gj = resolveGeostore(gid, "gfw").getOrElse(
      return respond(ex, 422, "application/json", Sinks.jsendError(
        s"Geostore $gid can't be found or is not valid.")))
    val rid = tclResourceId(gid, cc)
    if (tclResources.contains(rid))
      return respond(ex, 409, "application/json", Sinks.jsendError(
        s"Resource $rid already exists with those parameters."))
    val metadata =
      s"""{"aoi":{"type":"geostore","geostore_id":"$gid"},"canopy_cover":$cc}"""
    tclResources.put(rid, ("pending", metadata, "null"))
    jobRegistry.submit { () =>
      try {
        // loss year × driver (the landcover classes play the driver
        // dictionary here), canopy-cover threshold, one zonal pass
        val df = graft.raster.ZonalEngine.runSql(spark, catalog,
          "umd_tree_cover_loss",
          s"""SELECT umd_tree_cover_loss__year,
             |  landcover_raster__class AS driver_class,
             |  SUM(area__ha) AS area__ha
             |FROM data
             |WHERE umd_tree_cover_density_2000__threshold >= $cc
             |GROUP BY umd_tree_cover_loss__year, landcover_raster__class""".stripMargin,
          gj)
        val rows = df.collect()
        val dict = graft.raster.SyntheticEnv.dictFor("landcover_raster")
        val items = rows.sortBy(r => (r.getAs[Long](0), r.getAs[Long](1))).map { r =>
          val yr = r.getAs[Long]("umd_tree_cover_loss__year")
          val cls = r.getAs[Long]("driver_class")
          val drv = dict.getOrElse(cls, s"class_$cls")
          val ha = r.getAs[Double]("area__ha")
          s"""{"umd_tree_cover_loss__year":$yr,"tsc_tree_cover_loss_drivers__driver":${graft.geo.Json.write(drv)},"area__ha":$ha}"""
        }.mkString(",")
        val byDriver = rows.groupBy(r =>
          dict.getOrElse(r.getAs[Long]("driver_class"),
            s"class_${r.getAs[Long]("driver_class")}"))
          .toSeq.sortBy(_._1).map { case (drv, rs) =>
            s"""{"driver":${graft.geo.Json.write(drv)},"area__ha":${rs.map(_.getAs[Double]("area__ha")).sum}}"""
          }.mkString(",")
        tclResources.put(rid, ("saved", metadata,
          s"""{"tree_cover_loss_by_driver":[$items],"by_driver_total":[$byDriver]}"""))
        "done"
      } catch {
        case e: Exception =>
          tclResources.put(rid, ("failed", metadata,
            graft.geo.Json.write(Option(e.getMessage).getOrElse("analysis failed"))))
          "failed"
      }
    }
    respond(ex, 202, "application/json",
      s"""{"data":{"link":"/land/tree_cover_loss_by_driver/$rid"},"status":"success"}""")
  }

  /** GET by id: pending resources answer with Retry-After: 1; the CSV
    * representation follows the documented `Accept: text/csv` shape
    * (year, driver, area). */
  private def tclGet(ex: HttpExchange, rid: String): Unit =
    tclResources.get(rid) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Resource $rid not found"))
      case Some((status, metadata, payload)) =>
        if (status == "pending") ex.getResponseHeaders.add("Retry-After", "1")
        if (status == "saved" &&
            Option(ex.getRequestHeaders.getFirst("Accept")).contains("text/csv")) {
          val rowRe = ("""\{"umd_tree_cover_loss__year":(\d+),""" +
            """"tsc_tree_cover_loss_drivers__driver":"([^"]*)","area__ha":([-0-9.eE]+)\}""").r
          val lines = rowRe.findAllMatchIn(payload).map(m =>
            s""""${m.group(1)}","${m.group(2)}",${m.group(3)}""").mkString("\r\n")
          ex.getResponseHeaders.add("Content-Disposition", "attachment")
          respond(ex, 200, "text/csv",
            "\"umd_tree_cover_loss__year\",\"tsc_tree_cover_loss_drivers__driver\",\"area__ha\"\r\n" +
              lines + "\r\n")
        } else
          respond(ex, 200, "application/json",
            s"""{"data":{"id":"$rid","status":"$status","metadata":$metadata,"result":$payload},"status":"success"}""")
    }

  /** DELETE: only failed resources delete (reference rule). */
  private def tclDelete(ex: HttpExchange, rid: String): Unit =
    tclResources.get(rid) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Resource $rid not found"))
      case Some((status, _, _)) if status != "failed" =>
        respond(ex, 400, "application/json", Sinks.jsendError(
          "Only resources with 'failed' status can be deleted"))
      case Some(_) =>
        tclResources.remove(rid)
        respond(ex, 204, "application/json", "")
    }

  /** Pre-built file-asset downloads (`downloads.py:264-348`): 307
    * temporary redirect to the version's shapefile / geopackage export
    * asset URI; absent asset → the reference's not-implemented 501. */
  private def downloadFile(ex: HttpExchange, dataset: String, version: String,
                           fmt: String): Unit =
    catalog.version(dataset, version) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found"))
      case Some(v) if !v.isDownloadable =>
        respond(ex, 403, "application/json",
          Sinks.jsendError("This dataset is not available for download"))
      case Some(v) =>
        // same gate as the csv/json downloads — a 307 to the asset is
        // still a download of protected data
        authGate(ex, dataset).foreach { case (code, body) =>
          return respond(ex, code, "application/json", body) }
        val wanted = if (fmt == "shp") cat.AssetType.ShapefileExport
                     else cat.AssetType.GeopackageExport
        v.assets.find(_.assetType == wanted) match {
          case Some(a) =>
            ex.getResponseHeaders.add("Location", a.assetUri)
            respond(ex, 307, "application/json", "")
          case None => respond(ex, 501, "application/json", Sinks.jsendError(
            "This endpoint is not implemented for the given dataset."))
        }
    }

  /** GET /dataset/{d}/{v}/download/geotiff?tile_id=…&pixel_meaning=…
    * (`downloads.py:264-292`): 307 to the requested raster tile as a
    * GeoTIFF. The reference redirects to a prebuilt S3 object; here
    * the tile materializes from the version's Parquet lake on first
    * request (cached in the version dir) through the pure-JVM
    * [[graft.raster.GeoTiff]] writer. */
  private def downloadGeotiff(ex: HttpExchange, dataset: String, version: String): Unit =
    catalog.version(dataset, version) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found"))
      case Some(v) if !v.isDownloadable =>
        respond(ex, 403, "application/json",
          Sinks.jsendError("This dataset is not available for download"))
      case Some(v) =>
        authGate(ex, dataset).foreach { case (code, body) =>
          return respond(ex, code, "application/json", body) }
        val asset = v.defaultAsset
          .filter(_.assetType == cat.AssetType.RasterTileSet).getOrElse(
            return respond(ex, 501, "application/json", Sinks.jsendError(
              "This endpoint is not implemented for the given dataset.")))
        val params = queryParams(ex)
        val tileId = params.getOrElse("tile_id", return respond(ex, 422,
          "application/json", Sinks.jsendError("tile_id is required")))
        val meaning = params.getOrElse("pixel_meaning", return respond(ex, 422,
          "application/json", Sinks.jsendError("pixel_meaning is required")))
        val g = graft.raster.DataEnvironment.gridOf(asset.creationOptions)
        val band = asset.creationOptions.getOrElse("band", s"px_$meaning")
        val bands = bandsOfAsset(asset)
        if (!bands.contains(band) ||
            asset.creationOptions.get("pixel_meaning").exists(_ != meaning))
          return respond(ex, 404, "application/json",
            Sinks.jsendError(s"No raster tile set with pixel meaning $meaning"))
        graft.raster.TileLake.ensureLake(spark, asset.assetUri)
        val compression = params.getOrElse("compression", "deflate")
        if (!Set("none", "lzw", "deflate").contains(compression))
          return respond(ex, 422, "application/json", Sinks.jsendError(
            s"Unsupported compression '$compression' (none/lzw/deflate)"))
        // srid mirrors the tile-cache CRS choice (reference warps tile
        // caches to EPSG:3857); the lake itself stays 4326
        val srid = params.getOrElse("srid", "4326")
        if (!Set("4326", "3857").contains(srid))
          return respond(ex, 422, "application/json", Sinks.jsendError(
            s"Unsupported srid '$srid' (4326/3857)"))
        val cacheDir = java.nio.file.Paths.get(
          s"${sys.props("java.io.tmpdir")}/graft_geotiff_cache/${dataset}_$version")
        java.nio.file.Files.createDirectories(cacheDir)
        val out = cacheDir.resolve(
          if (srid == "4326") s"${band}_${tileId}_$compression.tif"
          else s"${band}_${tileId}_${compression}_$srid.tif")
        if (!java.nio.file.Files.exists(out)) {
          val rows = spark.read.parquet(asset.assetUri)
            .where(org.apache.spark.sql.functions.col("tile_id") === tileId)
            .selectExpr("tx", "ty", band).collect()
          if (rows.isEmpty)
            return respond(ex, 404, "application/json",
              Sinks.jsendError(s"Tile $tileId not found"))
          val r = rows.head
          val px = r.getSeq[Long](2).map(_.toInt).toArray
          val tile = graft.raster.GeoTiff.Tile(
            g.pxPerTile, g.pxPerTile,
            g.originLon + r.getInt(0) * g.tileDeg,
            g.originLat - r.getInt(1) * g.tileDeg,
            g.pixelDeg, px)
          if (srid == "3857") {
            // tiles past ±85.05° have no mercator image — a client
            // input problem (422), not a server fault
            val warped =
              try graft.raster.Warp.tileToWebMercator(tile)
              catch {
                case e: IllegalArgumentException =>
                  return respond(ex, 422, "application/json",
                    Sinks.jsendError(e.getMessage))
              }
            graft.raster.GeoTiff.writeRaster(out, warped, compression,
              predictor = if (compression == "none") 1 else 2)
          } else
            graft.raster.GeoTiff.write(out, tile, compression)
        }
        ex.getResponseHeaders.add("Location", out.toString)
        respond(ex, 307, "application/json", "")
    }

  /** Vector feature lookup near a point
    * (`features.py:69-218`): zoom selects the search radius from the
    * tippecanoe precision table × 50; features within the geodesic
    * radius return. Geometry follows the repo's synthetic-point
    * convention (customer-key lattice — the lake stores no real
    * geometry columns). */
  private def features(ex: HttpExchange, dataset: String, version: String): Unit = {
    val params = queryParams(ex)
    val ver = catalog.version(dataset, version).getOrElse(
      return respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found")))
    // Eligible sources (features.py:39-76 serves any geo table): a
    // catalog GeoDatabaseTable (a created vector version — point OR
    // polygon features, via the geometry-to-point distance on its
    // stored GeoJSON); the synthetic customer lattice keeps its
    // documented lon/lat derivation.
    val source: Option[(String, String, String)] = // (FROM, dist expr, tiebreak)
      if (ver.defaultAsset.exists(_.assetType == cat.AssetType.GeoDatabaseTable))
        Some((tableFor(dataset, version),
          "st_distance_to_point(st_geomfromgeojson(gfw_geojson), " +
            "CAST(%LNG% AS DOUBLE), CAST(%LAT% AS DOUBLE))", ""))
      else if (dataset == "customer")
        Some(("""(SELECT c_custkey, c_nationkey,
            |    CAST(c_custkey % 720 AS DOUBLE) / 2.0 - 179.75 AS lon,
            |    CAST(c_custkey % 340 AS DOUBLE) / 2.0 - 84.75 AS lat
            |  FROM customer)""".stripMargin,
          "st_distance_sphere(st_point(lon, lat), st_point(%LNG%, %LAT%))",
          ", c_custkey"))
      else None
    source match {
      case None => respond(ex, 501, "application/json", Sinks.jsendError(
        "This endpoint is not implemented for the given dataset"))
      case Some((from, distTpl, tieBreak)) =>
        val (lat, lng, zoom) =
          try (params("lat").toDouble, params("lng").toDouble, params("z").toInt)
          catch { case _: Exception => return respond(ex, 422, "application/json",
            Sinks.jsendError("lat, lng and z query parameters are required")) }
        // nasa_viirs_fire_alerts special form (`features.py:39-76`):
        // an alert__date window on top of the location lookup,
        // defaulting to the trailing week (`default_start/default_end`)
        val dateFilter: Either[(Int, String), String] =
          if (dataset != "nasa_viirs_fire_alerts") Right("")
          else {
            val today = java.time.LocalDate.now()
            val start = params.getOrElse("start_date", today.minusWeeks(1).toString)
            val end = params.getOrElse("end_date", today.toString)
            val DateRe = "^\\d{4}-\\d{2}-\\d{2}$".r
            // calendar-validate BOTH bounds (the regex admits 2026-02-30)
            val parsed =
              if (DateRe.findFirstIn(start).isEmpty || DateRe.findFirstIn(end).isEmpty) None
              else try Some((java.time.LocalDate.parse(start),
                java.time.LocalDate.parse(end)))
              catch { case _: java.time.format.DateTimeParseException => None }
            parsed match {
              case None =>
                Left((422, Sinks.jsendError("start_date and end_date must be valid YYYY-MM-DD dates")))
              case Some((_, e)) if e.isAfter(today) =>
                Left((422, Sinks.jsendError("End date cannot be in the future.")))
              case Some(_) =>
                Right(s" AND alert__date BETWEEN DATE '$start' AND DATE '$end'")
            }
          }
        (FeatureLookup.bufferMeters(zoom), dateFilter) match {
          case (None, _) => respond(ex, 400, "application/json",
            Sinks.jsendError("Zoom level out of range"))
          case (_, Left((code, body))) => respond(ex, code, "application/json", body)
          case (Some(radius), Right(extra)) =>
            val dist = distTpl.replace("%LNG%", lng.toString)
              .replace("%LAT%", lat.toString)
            val df = spark.sql(
              s"""SELECT *, $dist AS dist_m
                 |FROM $from pts
                 |WHERE $dist <= $radius$extra
                 |ORDER BY dist_m$tieBreak LIMIT 100""".stripMargin)
            respond(ex, 200, "application/json", Sinks.toJsend(df))
        }
    }
  }

  /** Version asset statistics (`versions.py:363-374`): row/tile counts
    * and size facts of the default asset. */
  private def stats(ex: HttpExchange, dataset: String, version: String): Unit =
    catalog.version(dataset, version) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found"))
      case Some(v) if v.defaultAsset.exists(_.assetType == cat.AssetType.RasterTileSet) =>
        // the version's OWN grid and band set (created raster versions
        // carry both in their asset options; builtin falls back)
        val asset = v.defaultAsset.get
        val g = graft.raster.DataEnvironment.gridOf(asset.creationOptions)
        val bands = bandsOfAsset(asset).length
        respond(ex, 200, "application/json",
          s"""{"data":{"tile_count":${g.nTiles},"pixel_count":${g.nTiles.toLong * g.pxPerTile * g.pxPerTile},"bands":$bands},"status":"success"}""")
      case Some(_) =>
        val cnt = spark.table(tableFor(dataset, version)).count()
        respond(ex, 200, "application/json",
          s"""{"data":{"row_count":$cnt},"status":"success"}""")
    }

  /** Version extent (`versions.py:351-360`): raster versions report
    * the grid bbox; tabular versions have no spatial extent. */
  private def extent(ex: HttpExchange, dataset: String, version: String): Unit =
    catalog.version(dataset, version) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found"))
      case Some(v) if v.defaultAsset.exists(_.assetType == cat.AssetType.RasterTileSet) =>
        // the version's OWN grid — created raster versions carry the
        // DAG-derived georeferencing in their asset options (gridOf
        // falls back to the builtin lake's grid)
        val g = graft.raster.DataEnvironment.gridOf(
          v.defaultAsset.get.creationOptions)
        val (xmin, ymax) = (g.originLon, g.originLat)
        val (xmax, ymin) = (g.originLon + g.tilesX * g.tileDeg,
          g.originLat - g.tilesY * g.tileDeg)
        respond(ex, 200, "application/json",
          s"""{"data":{"extent":[$xmin,$ymin,$xmax,$ymax]},"status":"success"}""")
      case Some(_) =>
        respond(ex, 200, "application/json",
          """{"data":{"extent":null},"status":"success"}""")
    }

  /** Admin-name id lookup (`political/id_lookup.py:58-126`): match the
    * normalized name (unidecode + lowercase — our `norm_name`
    * expression) against the nation table. */
  private def idLookup(ex: HttpExchange): Unit = {
    val params = queryParams(ex)
    val country = params.getOrElse("country", return respond(ex, 400,
      "application/json", Sinks.jsendError("Country MUST be specified.")))
    val df = spark.sql(
      s"""SELECT n_nationkey AS id, n_name AS name
         |FROM nation
         |WHERE norm_name(n_name) = norm_name('${country.replace("'", "''")}')
         |ORDER BY n_nationkey""".stripMargin)
    respond(ex, 200, "application/json", Sinks.toJsend(df))
  }

  /** Version creation (`PUT /dataset/{d}/{v}`, SURVEY §3.4 /
    * `app/routes/datasets/versions.py` + `tasks/default_assets.py`):
    * 202 immediately, the job DAG runs in the background appending
    * change-log records, and the catalog swaps in the new version
    * atomically when the DAG saves. Body:
    * `{"creation_options": {"source_uri": [...], "delimiter": ",",
    * "table_schema": [...], "partitions": {...}, "cluster": [...],
    * "indices": [...], "constraints": [...]}}`. */
  private def versionPut(ex: HttpExchange, dataset: String, version: String): Unit = {
    import graft.etl.VersionCreation
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    if (builtinDatasets.contains(dataset))
      return respond(ex, 409, "application/json", Sinks.jsendError(
        s"Dataset $dataset conflicts with a pre-registered table"))
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val opts =
      try VersionCreation.CreationOptions.fromJson(
        graft.geo.Json.parseObject(body).get("creation_options") match {
          case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
          case _ => throw new IllegalArgumentException("Missing creation_options")
        })
      catch { case e: IllegalArgumentException =>
        return respond(ex, 422, "application/json",
          Sinks.jsendError(Option(e.getMessage).getOrElse("Invalid creation options")))
      }
    opts.sourceUris.find(!sourceAllowed(_)).foreach { uri =>
      return respond(ex, 403, "application/json", Sinks.jsendError(
        s"Source URI outside the allowed data directories: $uri")) }
    versionRecords.put((dataset, version), ("pending", Nil))
    versionOpts.put((dataset, version), opts)
    val targetDir =
      s"${sys.props("java.io.tmpdir")}/graft_versions/${dataset}_$version"
    val jobId = jobRegistry.submit { () =>
      val (log, ok) = VersionCreation.createTable(spark, dataset, version, opts, targetDir)
      // Terminal status writer: under catalogLock, never downgrading —
      // a concurrent PATCH /task that already marked a default-asset
      // task failed (taskPatch, same lock) must not be overwritten by
      // 'saved'. "saved" becomes visible only AFTER the catalog swap
      // below: a client that polls the status and immediately queries
      // /features (the reference's documented workflow) would
      // otherwise race the swap and 404 on a version it was just told
      // is saved (observed under full-suite load).
      def writeTerminal(finalOk: Boolean): String = catalogLock.synchronized {
        val cur = versionRecords.get((dataset, version))
        val s = if (!finalOk || cur.exists(_._1 == "failed")) "failed" else "saved"
        versionRecords.put((dataset, version),
          (s, log ++ cur.map(_._2).getOrElse(Nil)))
        s
      }
      // Task registration and the catalog swap run guarded: an
      // exception here must still record a terminal 'failed' status —
      // otherwise the version is stuck at 'pending' forever and the
      // reference's poll-until-terminal workflow never finishes. The
      // exception then PROPAGATES so the job registry records it as
      // the job failure (GET /job/{id} keeps its cause, as before).
      try {
      registerDagTasks(dataset, version, log)
      if (ok) catalogLock.synchronized {
        val assetType = opts.sourceType match {
          case "vector" => cat.AssetType.GeoDatabaseTable
          case "raster" => cat.AssetType.RasterTileSet
          case _ => cat.AssetType.DatabaseTable
        }
        // raster versions carry the DAG-derived grid/band metadata the
        // data environment synthesizes layers from
        val assetOpts =
          if (opts.sourceType == "raster")
            graft.etl.VersionCreation.rasterAssetOptions(targetDir)
          else Map.empty[String, String]
        // vector versions that built the optional shapefile export
        // register it, so /download/shp 307-redirects like the
        // reference's prebuilt S3 artifacts
        val exportShp = new java.io.File(s"${targetDir}_exports/export.shp")
        val exportGpkg = new java.io.File(s"${targetDir}_exports/export.gpkg")
        val exports =
          (if (exportShp.exists()) Seq(cat.Asset(s"$dataset-$version-shp",
            cat.AssetType.ShapefileExport, exportShp.getPath, isDefault = false))
          else Nil) ++
          (if (exportGpkg.exists()) Seq(cat.Asset(s"$dataset-$version-gpkg",
            cat.AssetType.GeopackageExport, exportGpkg.getPath, isDefault = false))
          else Nil)
        catalog = catalog.withVersion(dataset, cat.Version(
          dataset, version, isLatest = opts.latest,
          sourceType = opts.sourceType,
          assets = cat.Asset(s"$dataset-$version-default",
            assetType, targetDir, isDefault = true,
            creationOptions = assetOpts) +: exports))
      }
      } catch { case scala.util.control.NonFatal(e) =>
        writeTerminal(false)
        throw e
      }
      val status = writeTerminal(ok)
      s"""{"dataset":"$dataset","version":"$version","status":"$status"}"""
    }
    respond(ex, 202, "application/json",
      s"""{"data":{"dataset":"$dataset","version":"$version","status":"pending","job_id":"$jobId"},"status":"success"}""")
  }

  /** Creation options of versions created through this server —
    * `/append` re-runs load tasks with the original delimiter/schema/
    * constraint settings (`table_source_assets.py:221-285`). */
  private val versionOpts = scala.collection.concurrent.TrieMap
    .empty[(String, String), graft.etl.VersionCreation.CreationOptions]

  /** Append new source URIs to an existing created version
    * (`POST /dataset/{d}/{v}/append`, `versions.py` append route):
    * 202 + background job that re-runs ONLY the load tasks with the
    * saved creation options — idempotent via the unique-constraint
    * anti-join. */
  private def versionAppend(ex: HttpExchange, dataset: String, version: String): Unit = {
    import graft.etl.VersionCreation
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    val opts = versionOpts.getOrElse((dataset, realVersion(dataset, version)),
      return respond(ex, 404, "application/json", Sinks.jsendError(
        s"Dataset version $dataset.$version not found or not appendable")))
    if (opts.sourceType == "raster")
      return respond(ex, 501, "application/json", Sinks.jsendError(
        "Append is not implemented for raster versions"))
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val uris = parseBody422(ex, body).getOrElse(return).get("creation_options") match {
      case Some(m: Map[_, _]) =>
        m.asInstanceOf[Map[String, Any]].get("source_uri") match {
          case Some(l: List[_]) => l.map(_.toString)
          case Some(s: String) => Seq(s)
          case _ => Nil
        }
      case _ => Nil
    }
    if (uris.isEmpty)
      return respond(ex, 422, "application/json",
        Sinks.jsendError("No source URI provided."))
    uris.find(!sourceAllowed(_)).foreach { uri =>
      return respond(ex, 403, "application/json", Sinks.jsendError(
        s"Source URI outside the allowed data directories: $uri")) }
    val targetDir =
      s"${sys.props("java.io.tmpdir")}/graft_versions/${dataset}_$version"
    catalogLock.synchronized {
      val prior = versionRecords.get((dataset, version)).map(_._2).getOrElse(Nil)
      versionRecords.put((dataset, version), ("pending", prior))
    }
    val jobId = jobRegistry.submit { () =>
      val (log, ok) =
        if (opts.sourceType == "vector")
          VersionCreation.appendVectorSources(spark, dataset, version, uris, targetDir)
        else
          VersionCreation.appendSources(spark, dataset, version, opts, uris, targetDir)
      // append against the CURRENT log under the lock — capturing
      // `prior` at request time loses a concurrent append's entries
      catalogLock.synchronized {
        val cur = versionRecords.get((dataset, version)).map(_._2).getOrElse(Nil)
        versionRecords.put((dataset, version),
          (if (ok) "saved" else "failed", cur ++ log))
      }
      s"""{"dataset":"$dataset","version":"$version","status":"${if (ok) "saved" else "failed"}"}"""
    }
    respond(ex, 202, "application/json",
      s"""{"data":{"dataset":"$dataset","version":"$version","status":"pending","job_id":"$jobId"},"status":"success"}""")
  }

  /** GET /dataset/{d}/{v}/assets (`versions.py` + `asset.py` asset
    * listing): every asset record of the version — the default
    * database table plus derived exports. */
  /** GET /assets (`assets/assets.py:18-…`): the catalog's full asset
    * list, filterable by `asset_type` and `dataset`. */
  private def assetsList(ex: HttpExchange): Unit = {
    val params = queryParams(ex)
    val items = for {
      d <- catalog.datasets.sortBy(_.name)
      v <- d.versions.sortBy(_.version)
      a <- v.assets
      if params.get("asset_type").forall(_ == a.assetType)
      if params.get("dataset").forall(_ == d.name)
    } yield s"""{"asset_id":"${a.assetId}","dataset":"${d.name}","version":"${v.version}","asset_type":${graft.geo.Json.write(a.assetType)},"asset_uri":${graft.geo.Json.write(a.assetUri)},"is_default":${a.isDefault},"status":"${a.status}"}"""
    respond(ex, 200, "application/json",
      s"""{"data":[${items.mkString(",")}],"status":"success"}""")
  }

  /** POST /dataset/{d}/{v}/assets (`add_new_asset`,
    * `assets/assets.py:111-…`): build a follow-up asset for a saved
    * version. COG is the supported managed type — the job coalesces
    * the source raster tile set into one cloud-optimized GeoTIFF with
    * average-resampled overviews (`cog_assets.py:26-117`; creation
    * options `source_asset_id`, `block_size`, `resampling`,
    * `implementation` per `COGCreationOptions`). The build is
    * DISTRIBUTED ([[graft.raster.Cog.buildFromLake]]): executors
    * assemble and encode TIFF blocks, the driver streams compressed
    * bytes — never a full-lake collect; the at-scale query path stays
    * the Parquet tile lake. */
  private def assetAdd(ex: HttpExchange, dataset: String, version: String): Unit = {
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    val ver = catalog.version(dataset, version).getOrElse(
      return respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found")))
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val obj =
      try graft.geo.Json.parseObject(body)
      catch { case _: Exception => return respond(ex, 422, "application/json",
        Sinks.jsendError("Invalid request body")) }
    obj.get("asset_type") match {
      case Some("COG") => ()
      case Some("Raster tile cache") =>
        return rasterTileCacheAdd(ex, dataset, version, ver, obj)
      case Some("Static vector tile cache") =>
        return vectorTileCacheAdd(ex, dataset, version, ver, obj)
      case other =>
        return respond(ex, 501, "application/json", Sinks.jsendError(
          "Not implemented for asset type " + other.getOrElse("(missing)")))
    }
    val co = obj.get("creation_options") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty[String, Any]
    }
    val resampling = co.getOrElse("resampling", "average").toString
    if (resampling != "average")
      return respond(ex, 501, "application/json", Sinks.jsendError(
        s"Unsupported resampling method $resampling (average only)"))
    val blockSize =
      try co.get("block_size").map(_.toString.toDouble.toInt).getOrElse(512)
      catch { case _: NumberFormatException =>
        return respond(ex, 422, "application/json", Sinks.jsendError(
          "block_size must be a positive multiple of 16")) }
    if (blockSize <= 0 || blockSize % 16 != 0)
      return respond(ex, 422, "application/json", Sinks.jsendError(
        "block_size must be a positive multiple of 16"))
    val implementation = co.getOrElse("implementation", "default").toString
    val srcId = co.get("source_asset_id") match {
      case Some(s: String) => s
      case _ => return respond(ex, 422, "application/json",
        Sinks.jsendError("source_asset_id is required"))
    }
    // "Must be an asset of the same version"
    val source = ver.assets.find(_.assetId == srcId) match {
      case Some(a) if a.assetType == cat.AssetType.RasterTileSet => a
      case Some(_) => return respond(ex, 400, "application/json",
        Sinks.jsendError(s"Source asset $srcId is not a raster tile set"))
      case None => return respond(ex, 400, "application/json",
        Sinks.jsendError(s"Source asset $srcId is not an asset of $dataset.$version"))
    }
    val assetId = s"$dataset-$version-cog-$implementation"
    val outDir = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_versions/${dataset}_${version}_exports")
    val outPath = outDir.resolve(s"cog_$implementation.tif")
    // reserve the asset record SYNCHRONOUSLY (status pending, the
    // reference's asset-row-before-batch-job shape) — the check and
    // the append must share the lock or two quick identical POSTs
    // both pass and duplicate the record
    val reserved = catalogLock.synchronized {
      // a FAILED record is re-reservable — otherwise one transient
      // build error would 409 every retry until a manual DELETE
      findAsset(assetId) match {
        case Some((_, prior)) if prior.status == "failed" =>
          catalog = catalog.withoutAsset(dataset, version, assetId)
        case _ => ()
      }
      if (findAsset(assetId).isDefined) false
      else {
        catalog = catalog.withVersionPatched(dataset, version, v =>
          v.copy(assets = v.assets :+ cat.Asset(assetId, cat.AssetType.Cog,
            outPath.toString, isDefault = false,
            creationOptions = Map(
              "source_asset_id" -> srcId,
              "block_size" -> blockSize.toString,
              "resampling" -> resampling,
              "implementation" -> implementation),
            status = "pending")))
        true
      }
    }
    if (!reserved)
      return respond(ex, 409, "application/json", Sinks.jsendError(
        s"Asset $assetId already exists (choose another implementation)"))
    val jobId = jobRegistry.submit { () =>
      try {
        val g = graft.raster.DataEnvironment.gridOf(source.creationOptions)
        val band = source.creationOptions.getOrElse("band",
          s"px_${source.creationOptions.getOrElse("pixel_meaning", "value")}")
        graft.raster.TileLake.ensureLake(spark, source.assetUri)
        java.nio.file.Files.createDirectories(outDir)
        // distributed mosaic: executors assemble + encode TIFF
        // blocks, the driver only streams compressed bytes — never a
        // full-lake collect ([[graft.raster.Cog]]); absent tiles fill
        // with the asset's declared no_data (0 when none declared)
        val nd = source.creationOptions.get("no_data")
          .map(_.toString.toDouble).getOrElse(0.0)
        val nTiles = graft.raster.Cog.buildFromLake(
          spark, source.assetUri, band, g, blockSize, outPath, noData = nd)
        catalogLock.synchronized {
          catalog = catalog.withAssetStatus(dataset, version, assetId, "saved")
        }
        val tid = graft.geo.GeoExpressions.Uuid5.of("oid",
          s"task:$dataset/$version/cogify_$implementation")
        taskRecords.put(tid, TaskRec(tid, assetId, Seq(
          graft.etl.VersionCreation.ChangeLog("cogify", "success",
            s"$outPath ($nTiles tiles, block $blockSize)"))))
        s"""{"asset_id":"$assetId","status":"saved"}"""
      } catch {
        case e: Throwable =>
          catalogLock.synchronized {
            catalog = catalog.withAssetStatus(dataset, version, assetId, "failed")
          }
          throw e
      }
    }
    respond(ex, 202, "application/json",
      s"""{"data":{"asset_id":"$assetId","dataset":"$dataset","version":"$version","asset_type":"COG","status":"pending","job_id":"$jobId"},"status":"success"}""")
  }

  /** POST asset_type "Raster tile cache"
    * (`raster_tile_cache_assets.py` — the reference fans out
    * gdal2tiles + symbology lambdas per zoom): pre-renders the source
    * raster tile set as z/x/y web-mercator PNG tiles for zooms
    * 0..max_static_zoom with a discrete/gradient colormap
    * ([[graft.raster.TileCache]]; one distributed source-driven pass,
    * PNG encode at the reducer). Tiles serve from
    * `GET /{dataset}/{version}/{implementation}/{z}/{x}/{y}.png` —
    * the tile-cache URL shape. */
  private def rasterTileCacheAdd(ex: HttpExchange, dataset: String,
                                 version: String, ver: cat.Version,
                                 obj: Map[String, Any]): Unit = {
    val co = obj.get("creation_options") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty[String, Any]
    }
    val implementation = co.getOrElse("implementation", "default").toString
    val maxZoom = num422(ex, "max_static_zoom",
      co.get("max_static_zoom").map(_.toString.toDouble.toInt).getOrElse(9)).getOrElse(return)
    if (maxZoom < 0 || maxZoom > 22)
      return respond(ex, 422, "application/json",
        Sinks.jsendError("max_static_zoom must be in 0..22"))
    val resampling = co.getOrElse("resampling", "nearest").toString
    if (resampling != "nearest")
      return respond(ex, 501, "application/json", Sinks.jsendError(
        s"Unsupported resampling method $resampling (nearest only)"))
    val sym = co.get("symbology") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => return respond(ex, 422, "application/json",
        Sinks.jsendError("symbology is required"))
    }
    val cmap =
      try graft.raster.TileCache.Colormap.parse(sym)
      catch { case e: IllegalArgumentException =>
        return respond(ex, 422, "application/json",
          Sinks.jsendError(Option(e.getMessage).getOrElse("Invalid symbology"))) }
    val srcId = co.get("source_asset_id") match {
      case Some(s: String) => s
      case _ => return respond(ex, 422, "application/json",
        Sinks.jsendError("source_asset_id is required"))
    }
    val source = ver.assets.find(_.assetId == srcId) match {
      case Some(a) if a.assetType == cat.AssetType.RasterTileSet => a
      case Some(_) => return respond(ex, 400, "application/json",
        Sinks.jsendError(s"Source asset $srcId is not a raster tile set"))
      case None => return respond(ex, 400, "application/json",
        Sinks.jsendError(s"Source asset $srcId is not an asset of $dataset.$version"))
    }
    val assetId = s"$dataset-$version-tilecache-$implementation"
    val outDir = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_versions/" +
        s"${dataset}_${version}_tilecache/$implementation")
    val reserved = catalogLock.synchronized {
      findAsset(assetId) match {
        case Some((_, prior)) if prior.status == "failed" =>
          catalog = catalog.withoutAsset(dataset, version, assetId)
        case _ => ()
      }
      if (findAsset(assetId).isDefined) false
      else {
        catalog = catalog.withVersionPatched(dataset, version, v =>
          v.copy(assets = v.assets :+ cat.Asset(assetId,
            cat.AssetType.RasterTileCache, outDir.toString, isDefault = false,
            creationOptions = Map(
              "source_asset_id" -> srcId,
              "implementation" -> implementation,
              "resampling" -> resampling,
              "min_zoom" -> "0",
              "max_static_zoom" -> maxZoom.toString),
            status = "pending")))
        true
      }
    }
    if (!reserved)
      return respond(ex, 409, "application/json", Sinks.jsendError(
        s"Asset $assetId already exists (choose another implementation)"))
    val jobId = jobRegistry.submit { () =>
      try {
        val g = graft.raster.DataEnvironment.gridOf(source.creationOptions)
        val band = source.creationOptions.getOrElse("band",
          s"px_${source.creationOptions.getOrElse("pixel_meaning", "value")}")
        val noData = source.creationOptions.get("no_data").map(_.toDouble)
        graft.raster.TileLake.ensureLake(spark, source.assetUri)
        val n = graft.raster.TileCache.build(spark, source.assetUri, band, g,
          cmap, noData, maxZoom, outDir.toString)
        catalogLock.synchronized {
          catalog = catalog.withAssetStatus(dataset, version, assetId, "saved")
        }
        val tid = graft.geo.GeoExpressions.Uuid5.of("oid",
          s"task:$dataset/$version/tilecache_$implementation")
        taskRecords.put(tid, TaskRec(tid, assetId, Seq(
          graft.etl.VersionCreation.ChangeLog("tile_cache", "success",
            s"$outDir ($n tiles, zooms 0..$maxZoom)"))))
        s"""{"asset_id":"$assetId","status":"saved","tiles":$n}"""
      } catch {
        case e: Throwable =>
          catalogLock.synchronized {
            catalog = catalog.withAssetStatus(dataset, version, assetId, "failed")
          }
          throw e
      }
    }
    respond(ex, 202, "application/json",
      s"""{"data":{"asset_id":"$assetId","dataset":"$dataset","version":"$version","asset_type":"Raster tile cache","status":"pending","job_id":"$jobId"},"status":"success"}""")
  }

  /** POST asset_type "Static vector tile cache"
    * (`static_vector_tile_cache_assets.py` — the reference exports
    * NDJSON and shells out to tippecanoe): renders the vector
    * version's geo table as z/x/y Mapbox Vector Tiles
    * ([[graft.geo.VectorTileCache]] — bbox fan-out, per-tile clip +
    * quantize + MVT encode in one distributed pass) and writes the
    * Mapbox-GL `root.json` from the posted `layer_style`. Tiles serve
    * from `GET /{dataset}/{version}/{implementation}/{z}/{x}/{y}.pbf`. */
  private def vectorTileCacheAdd(ex: HttpExchange, dataset: String,
                                 version: String, ver: cat.Version,
                                 obj: Map[String, Any]): Unit = {
    val co = obj.get("creation_options") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty[String, Any]
    }
    val implementation = co.getOrElse("implementation", "default").toString
    val minZoom = num422(ex, "min_zoom",
      co.get("min_zoom").map(_.toString.toDouble.toInt).getOrElse(0)).getOrElse(return)
    val maxZoom = num422(ex, "max_zoom",
      co.get("max_zoom").map(_.toString.toDouble.toInt).getOrElse(9)).getOrElse(return)
    if (minZoom < 0 || maxZoom > 22 || maxZoom < minZoom)
      return respond(ex, 422, "application/json", Sinks.jsendError(
        "`max_zoom` must be equal or larger than `min_zoom` (0..22)"))
    val source = ver.assets.find(a =>
      a.isDefault && a.assetType == cat.AssetType.GeoDatabaseTable) match {
      case Some(a) => a
      case None => return respond(ex, 400, "application/json", Sinks.jsendError(
        s"$dataset.$version is not a vector version (no geo database table)"))
    }
    val fields: Seq[String] = co.get("field_attributes") match {
      case Some(xs: Seq[_]) => xs.map(_.toString)
      case _ =>
        // default: the version's feature-info columns — every stored
        // attribute except the geometry/derived internals
        val internal = Set("geom", "lon", "lat", "gfw_geojson", "gfw_geostore_id")
        spark.read.parquet(source.assetUri).schema.fieldNames.toSeq
          .filterNot(internal)
    }
    val layerStyle = co.get("layer_style") match {
      case Some(xs: Seq[_]) => graft.geo.Json.write(xs.toList)
      case _ => "[]"
    }
    val assetId = s"$dataset-$version-vectortilecache-$implementation"
    val outDir = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_versions/" +
        s"${dataset}_${version}_vectortiles/$implementation")
    val reserved = catalogLock.synchronized {
      findAsset(assetId) match {
        case Some((_, prior)) if prior.status == "failed" =>
          catalog = catalog.withoutAsset(dataset, version, assetId)
        case _ => ()
      }
      if (findAsset(assetId).isDefined) false
      else {
        catalog = catalog.withVersionPatched(dataset, version, v =>
          v.copy(assets = v.assets :+ cat.Asset(assetId,
            cat.AssetType.StaticVectorTileCache, outDir.toString,
            isDefault = false,
            creationOptions = Map(
              "implementation" -> implementation,
              "min_zoom" -> minZoom.toString,
              "max_zoom" -> maxZoom.toString),
            status = "pending")))
        true
      }
    }
    if (!reserved)
      return respond(ex, 409, "application/json", Sinks.jsendError(
        s"Asset $assetId already exists (choose another implementation)"))
    val jobId = jobRegistry.submit { () =>
      try {
        val rows = spark.read.parquet(source.assetUri)
        val n = graft.geo.VectorTileCache.build(spark, rows, dataset,
          fields, minZoom, maxZoom, outDir.toString)
        // Mapbox-GL root.json (tile-cache convention): the posted
        // layer styles over a vector source at the serving URL shape
        val rootJson =
          s"""{"version":8,"sources":{${graft.geo.Json.write(dataset)}:{""" +
            s""""type":"vector","tiles":[${graft.geo.Json.write(
              s"/$dataset/$version/$implementation/{z}/{x}/{y}.pbf")}],""" +
            s""""minzoom":$minZoom,"maxzoom":$maxZoom}},"layers":$layerStyle}"""
        java.nio.file.Files.writeString(
          outDir.resolve("root.json"), rootJson)
        catalogLock.synchronized {
          catalog = catalog.withAssetStatus(dataset, version, assetId, "saved")
        }
        val tid = graft.geo.GeoExpressions.Uuid5.of("oid",
          s"task:$dataset/$version/vectortiles_$implementation")
        taskRecords.put(tid, TaskRec(tid, assetId, Seq(
          graft.etl.VersionCreation.ChangeLog("vector_tile_cache", "success",
            s"$outDir ($n tiles, zooms $minZoom..$maxZoom, " +
              s"fields ${fields.mkString(",")})"))))
        s"""{"asset_id":"$assetId","status":"saved","tiles":$n}"""
      } catch {
        case e: Throwable =>
          catalogLock.synchronized {
            catalog = catalog.withAssetStatus(dataset, version, assetId, "failed")
          }
          throw e
      }
    }
    respond(ex, 202, "application/json",
      s"""{"data":{"asset_id":"$assetId","dataset":"$dataset","version":"$version","asset_type":"Static vector tile cache","status":"pending","job_id":"$jobId"},"status":"success"}""")
  }

  /** GET /{dataset}/{version}/{implementation}/{z}/{x}/{y}.{png|pbf}
    * — the tile-cache serving shape (the reference serves these from
    * the tile-cache CDN; same path layout). */
  private def serveTile(ex: HttpExchange, dataset: String, version: String,
                        impl: String, z: String, x: String, y: String,
                        ext: String): Unit = {
    val wanted =
      if (ext == "png") cat.AssetType.RasterTileCache
      else cat.AssetType.StaticVectorTileCache
    val asset = catalog.version(dataset, version).toSeq.flatMap(_.assets)
      .find(a => a.assetType == wanted &&
        a.creationOptions.get("implementation").contains(impl) &&
        a.status == "saved")
    asset match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"No $wanted $impl for $dataset.$version"))
      case Some(a) =>
        val f = java.nio.file.Paths.get(a.assetUri, z, x, s"$y.$ext")
        if (!java.nio.file.Files.exists(f))
          respond(ex, 404, "application/json", Sinks.jsendError("Tile not found"))
        else {
          val bytes = java.nio.file.Files.readAllBytes(f)
          val ctype =
            if (ext == "png") "image/png" else "application/x-protobuf"
          ex.getResponseHeaders.set("Content-Type", ctype)
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
    }
  }

  /** GET /{dataset}/{version}/{implementation}/root.json — the
    * Mapbox-GL style document the vector tile cache builder writes
    * (tile-cache convention: the style lives next to the tiles). */
  private def serveTileRoot(ex: HttpExchange, dataset: String,
                            version: String, impl: String): Unit = {
    val asset = catalog.version(dataset, version).toSeq.flatMap(_.assets)
      .find(a => a.assetType == cat.AssetType.StaticVectorTileCache &&
        a.creationOptions.get("implementation").contains(impl) &&
        a.status == "saved")
    asset match {
      case None => respond(ex, 404, "application/json", Sinks.jsendError(
        s"No static vector tile cache $impl for $dataset.$version"))
      case Some(a) =>
        val f = java.nio.file.Paths.get(a.assetUri, "root.json")
        if (!java.nio.file.Files.exists(f))
          respond(ex, 404, "application/json", Sinks.jsendError("root.json not found"))
        else respond(ex, 200, "application/json",
          java.nio.file.Files.readString(f))
    }
  }

  private def versionAssets(ex: HttpExchange, dataset: String, version: String): Unit =
    catalog.version(dataset, version) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found"))
      case Some(v) =>
        val items = v.assets.map { a =>
          s"""{"asset_id":"${a.assetId}","asset_type":${graft.geo.Json.write(a.assetType)},""" +
            s""""asset_uri":${graft.geo.Json.write(a.assetUri)},"is_default":${a.isDefault},""" +
            s""""status":"${a.status}"}"""
        }.mkString(",")
        respond(ex, 200, "application/json", s"""{"data":[$items],"status":"success"}""")
    }

  /** GET /dataset/{d}/{v}/creation_options (`versions.py:333-347`):
    * the default asset's creation options — the settings `/append`
    * re-runs loads with. */
  private def creationOptions(ex: HttpExchange, dataset: String, version: String): Unit =
    versionOpts.get((dataset, realVersion(dataset, version))) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version has no creation options"))
      case Some(o) =>
        val uris = o.sourceUris.map(graft.geo.Json.write).mkString("[", ",", "]")
        respond(ex, 200, "application/json",
          s"""{"data":{"source_uri":$uris,"source_type":"${o.sourceType}","delimiter":${graft.geo.Json.write(o.delimiter)},"has_header":${o.header},"latest":${o.latest},"pixel_meaning":"${o.pixelMeaning}"},"status":"success"}""")
    }

  /** GET /dataset/{d}/{v}/change_log (`versions.py:317-330`): the
    * creation DAG's task log on its own. */
  private def versionChangeLog(ex: HttpExchange, dataset: String, version: String): Unit = {
    val record = versionRecords.get((dataset, realVersion(dataset, version)))
    if (record.isEmpty && catalog.version(dataset, version).isEmpty)
      return respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found"))
    val log = record.map(_._2).getOrElse(Nil).map { c =>
      s"""{"task":"${c.task}","status":"${c.status}","detail":${graft.geo.Json.write(c.detail)}}"""
    }.mkString(",")
    respond(ex, 200, "application/json", s"""{"data":[$log],"status":"success"}""")
  }

  /** Version metadata + change log (`GET /dataset/{d}/{v}`). */
  private def versionGet(ex: HttpExchange, dataset: String, version: String): Unit = {
    val record = versionRecords.get((dataset, realVersion(dataset, version)))
    val inCatalog = catalog.version(dataset, version)
    if (record.isEmpty && inCatalog.isEmpty)
      return respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found"))
    val status = record.map(_._1).getOrElse("saved")
    val log = record.map(_._2).getOrElse(Nil).map { c =>
      s"""{"task":"${c.task}","status":"${c.status}","detail":${graft.geo.Json.write(c.detail)}}"""
    }.mkString(",")
    val latest = inCatalog.exists(_.isLatest)
    respond(ex, 200, "application/json",
      s"""{"data":{"dataset":"$dataset","version":"$version","status":"$status","is_latest":$latest,"change_log":[$log]},"status":"success"}""")
  }

  // ------------------------------------------------- dataset/version CRUD

  /** JSEND body for one dataset record (`_dataset_response`,
    * `dataset.py:190-…`: metadata + the version name list). */
  private def datasetBody(d: cat.Dataset): String = {
    val meta = d.metadata.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${graft.geo.Json.write(k)}:${graft.geo.Json.write(v)}" }
      .mkString("{", ",", "}")
    val versions = d.versions.map(v => graft.geo.Json.write(v.version))
      .mkString("[", ",", "]")
    s"""{"data":{"dataset":"${d.name}","metadata":$meta,"versions":$versions},"status":"success"}"""
  }

  private def metadataOf(obj: Map[String, Any]): Map[String, String] =
    obj.get("metadata") match {
      case Some(m: Map[_, _]) =>
        m.asInstanceOf[Map[String, Any]].collect {
          case (k, s: String) => k -> s
          case (k, v) if v != null => k -> graft.geo.Json.write(v)
        }
      case _ => Map.empty
    }

  /** GET /datasets (`datasets.py` get_datasets + `utils/paginate.py`):
    * all dataset records; with `page[size]` / `page[number]` the
    * response pages and carries the reference's links + meta blocks. */
  private def datasetsList(ex: HttpExchange): Unit = {
    val all = catalog.datasets.sortBy(_.name)
    def item(d: cat.Dataset): String = {
      val versions = d.versions.map(v => graft.geo.Json.write(v.version))
        .mkString("[", ",", "]")
      s"""{"dataset":"${d.name}","versions":$versions}"""
    }
    val params = queryParams(ex)
    val sizeP = params.get("page[size]")
    val pageP = params.get("page[number]")
    if (sizeP.isEmpty && pageP.isEmpty)
      return respond(ex, 200, "application/json",
        s"""{"data":[${all.map(item).mkString(",")}],"status":"success"}""")
    val size = num422(ex, "page[size]",
      sizeP.map(_.toInt).getOrElse(10)).getOrElse(return)
    val page = num422(ex, "page[number]",
      pageP.map(_.toInt).getOrElse(1)).getOrElse(return)
    if (size <= 0 || page <= 0)
      return respond(ex, 422, "application/json",
        Sinks.jsendError("page[size] and page[number] must be positive"))
    val totalPages = math.max(1, (all.length + size - 1) / size)
    val slice = all.slice((page - 1) * size, (page - 1) * size + size)
    def link(p: Int) = s"/datasets?page[number]=$p&page[size]=$size"
    val links =
      s"""{"self":"${link(page)}","first":"${link(1)}","last":"${link(totalPages)}",""" +
        s""""prev":"${if (page > 1) link(page - 1) else ""}",""" +
        s""""next":"${if (page < totalPages) link(page + 1) else ""}"}"""
    val meta = s"""{"size":$size,"total_items":${all.length},"total_pages":$totalPages}"""
    respond(ex, 200, "application/json",
      s"""{"data":[${slice.map(item).mkString(",")}],"links":$links,"meta":$meta,"status":"success"}""")
  }

  /** PUT /dataset/{d} (`dataset.py:84-116`): create the metadata-only
    * dataset record; 201, or 400 when the record already exists
    * (reference RecordAlreadyExistsError). Requires a manager/admin. */
  private def datasetPut(ex: HttpExchange, dataset: String): Unit = {
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    if (catalog.dataset(dataset).isDefined || builtinDatasets.contains(dataset))
      return respond(ex, 400, "application/json",
        Sinks.jsendError(s"Dataset with name $dataset already exists"))
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val meta = if (body.isBlank) Map.empty[String, String]
               else metadataOf(parseBody422(ex, body).getOrElse(return))
    val created = catalogLock.synchronized {
      catalog = catalog.withDataset(dataset, meta)
      catalog.dataset(dataset).get
    }
    ex.getResponseHeaders.add("Location", s"/$dataset")
    respond(ex, 201, "application/json", datasetBody(created))
  }

  /** GET /dataset/{d} (`dataset.py:61-75`). */
  private def datasetGet(ex: HttpExchange, dataset: String): Unit =
    catalog.dataset(dataset) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset $dataset not found"))
      case Some(d) => respond(ex, 200, "application/json", datasetBody(d))
    }

  /** PATCH /dataset/{d} (`dataset.py:125-148`): merge individual
    * metadata fields without touching the rest. */
  private def datasetPatch(ex: HttpExchange, dataset: String): Unit = {
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    if (catalog.dataset(dataset).isEmpty)
      return respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset $dataset not found"))
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val patch = if (body.isBlank) Map.empty[String, String]
                else metadataOf(parseBody422(ex, body).getOrElse(return))
    val updated = catalogLock.synchronized {
      catalog = catalog.withDatasetMetadata(dataset, patch)
      catalog.dataset(dataset).get
    }
    respond(ex, 200, "application/json", datasetBody(updated))
  }

  /** DELETE /dataset/{d} (`dataset.py:157-188`): only once no versions
    * remain — 409 otherwise, word-for-word the reference detail. */
  private def datasetDelete(ex: HttpExchange, dataset: String): Unit = {
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    catalog.dataset(dataset) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset $dataset not found"))
      case Some(d) if d.versions.nonEmpty =>
        respond(ex, 409, "application/json", Sinks.jsendError(
          "There are versions registered with the dataset." +
            "Delete all related versions prior to deleting a dataset"))
      case Some(d) =>
        catalogLock.synchronized { catalog = catalog.withoutDataset(dataset) }
        respond(ex, 200, "application/json", datasetBody(d))
    }
  }

  /** PATCH /dataset/{d}/{v} (`versions.py:154-199`): update the
    * `latest` tag and/or downloadability of a version. */
  private def versionPatch(ex: HttpExchange, dataset: String, version: String): Unit = {
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    if (catalog.version(dataset, version).isEmpty)
      return respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found"))
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val obj = if (body.isBlank) Map.empty[String, Any]
              else parseBody422(ex, body).getOrElse(return)
    val isLatest = obj.get("is_latest").collect { case b: Boolean => b }
    val downloadable = obj.get("is_downloadable").collect { case b: Boolean => b }
    catalogLock.synchronized {
      catalog = catalog.withVersionPatched(dataset, version, v =>
        v.copy(
          isLatest = isLatest.getOrElse(v.isLatest),
          isDownloadable = downloadable.getOrElse(v.isDownloadable)))
    }
    versionGet(ex, dataset, version)
  }

  /** DELETE /dataset/{d}/{v} (`versions.py:279-315`): refuse to delete
    * a `latest` version while siblings exist (reference 409 detail);
    * otherwise drop the version, its registered view, and its managed
    * assets (the background `delete_all_assets`). Builtin lake tables
    * are not deletable — they are the test fixture, not managed
    * assets. */
  private def versionDelete(ex: HttpExchange, dataset: String, version: String): Unit = {
    writeGate(ex).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    if (builtinDatasets.contains(dataset))
      return respond(ex, 409, "application/json", Sinks.jsendError(
        s"Dataset $dataset conflicts with a pre-registered table"))
    catalog.version(dataset, version) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Dataset version $dataset.$version not found"))
      case Some(v) =>
        val siblings = catalog.dataset(dataset).map(_.versions.length).getOrElse(0)
        if (v.isLatest && siblings > 1)
          return respond(ex, 409, "application/json", Sinks.jsendError(
            "Deletion failed." +
              "You can only delete a version tagged as `latest` if no other version of the same dataset exists." +
              "Change `latest` version, or delete all other versions first."))
        // cascade the per-asset state too: asset ids are deterministic,
        // so a recreated version must not inherit stale metadata,
        // field overrides, or task records
        v.assets.foreach { a =>
          assetMetadata.remove(a.assetId)
          fieldMetaOverrides.keys.filter(_._1 == a.assetId)
            .foreach(fieldMetaOverrides.remove)
          taskRecords.values.filter(_.assetId == a.assetId)
            .foreach(t => taskRecords.remove(t.taskId))
        }
        catalogLock.synchronized { catalog = catalog.withoutVersion(dataset, version) }
        versionRecords.remove((dataset, version))
        versionOpts.remove((dataset, version))
        // delete_all_assets: the registered view + the version's files
        spark.catalog.dropTempView(
          graft.etl.VersionCreation.viewName(dataset, version))
        val base = s"${sys.props("java.io.tmpdir")}/graft_versions/${dataset}_$version"
        for (dir <- Seq(base, base + "_exports",
          s"${sys.props("java.io.tmpdir")}/graft_geotiff_cache/${dataset}_$version")) {
          val p = java.nio.file.Paths.get(dir)
          if (java.nio.file.Files.exists(p)) {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(p).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          }
        }
        respond(ex, 200, "application/json",
          s"""{"data":{"dataset":"$dataset","version":"$version","status":"deleted"},"status":"success"}""")
    }
  }

  /** API-key creation (`POST /auth/apikey`): 201 with the new key.
    * Body: `{"domains": ["*.example.com", ...]}` (optional). */
  private def apiKeyCreate(ex: HttpExchange): Unit = apiKeys match {
    case None => respond(ex, 501, "application/json",
      Sinks.jsendError("API keys are not enabled on this deployment"))
    case Some(reg) if writeGate(ex).isDefined =>
      val (code, body) = writeGate(ex).get
      respond(ex, code, "application/json", body)
    case Some(reg) =>
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val domains =
        if (body.isBlank) Nil
        else parseBody422(ex, body).getOrElse(return).get("domains") match {
          case Some(l: List[_]) => l.map(_.toString)
          case _ => Nil
        }
      val id = reg.create(domains)
      respond(ex, 201, "application/json",
        s"""{"data":{"api_key":"$id"},"status":"success"}""")
  }

  private def apiKeyBody(key: String, domains: Seq[String],
                         expires: Option[Long]): String = {
    val ds = domains.map(graft.geo.Json.write).mkString("[", ",", "]")
    val exp = expires.map(_.toString).getOrElse("null")
    s"""{"api_key":"$key","domains":$ds,"expires_on":$exp}"""
  }

  /** GET /auth/apikey/{key} (`authentication.py:106-128`). */
  private def apiKeyGet(ex: HttpExchange, key: String): Unit = apiKeys match {
    case None => respond(ex, 501, "application/json",
      Sinks.jsendError("API keys are not enabled on this deployment"))
    case Some(reg) =>
      writeGate(ex).foreach { case (code, body) =>
        return respond(ex, code, "application/json", body) }
      reg.get(key) match {
        case None => respond(ex, 404, "application/json",
          Sinks.jsendError("The API Key does not exist."))
        case Some((domains, expires)) => respond(ex, 200, "application/json",
          s"""{"data":${apiKeyBody(key, domains, expires)},"status":"success"}""")
      }
  }

  /** GET /auth/apikeys (`authentication.py:131-142`). */
  private def apiKeysList(ex: HttpExchange): Unit = apiKeys match {
    case None => respond(ex, 501, "application/json",
      Sinks.jsendError("API keys are not enabled on this deployment"))
    case Some(reg) =>
      writeGate(ex).foreach { case (code, body) =>
        return respond(ex, code, "application/json", body) }
      val items = reg.list.map { case (k, d, e) => apiKeyBody(k, d, e) }
      respond(ex, 200, "application/json",
        s"""{"data":[${items.mkString(",")}],"status":"success"}""")
  }

  /** GET /auth/apikey/{key}/validate (`authentication.py:145-167`):
    * admin-gated validity check with optional origin/referrer. */
  private def apiKeyValidate(ex: HttpExchange, key: String): Unit = apiKeys match {
    case None => respond(ex, 501, "application/json",
      Sinks.jsendError("API keys are not enabled on this deployment"))
    case Some(reg) =>
      writeGate(ex).foreach { case (code, body) =>
        return respond(ex, code, "application/json", body) }
      if (reg.get(key).isEmpty)
        return respond(ex, 404, "application/json",
          Sinks.jsendError("The requested API key does not exist."))
      val params = queryParams(ex)
      val valid = reg.isValid(key, params.get("origin"), params.get("referrer"))
      respond(ex, 200, "application/json",
        s"""{"data":{"is_valid":$valid},"status":"success"}""")
  }

  /** DELETE /auth/apikey/{key} (`authentication.py:170-205`). */
  private def apiKeyDelete(ex: HttpExchange, key: String): Unit = apiKeys match {
    case None => respond(ex, 501, "application/json",
      Sinks.jsendError("API keys are not enabled on this deployment"))
    case Some(reg) =>
      writeGate(ex).foreach { case (code, body) =>
        return respond(ex, code, "application/json", body) }
      reg.delete(key) match {
        case None => respond(ex, 404, "application/json",
          Sinks.jsendError("The requested API key does not exist."))
        case Some((domains, expires)) => respond(ex, 200, "application/json",
          s"""{"data":${apiKeyBody(key, domains, expires)},"status":"success"}""")
      }
  }

  /** OTF zonal statistics over a stored geostore AOI
    * (`/analysis/zonal`, `analysis.py:36-93`): geostore is mandatory
    * for the raster engine (422 without one, `queries.py:487-503`). */
  private def zonal(ex: HttpExchange, pathGid: Option[String] = None): Unit = {
    val params = queryParams(ex)
    val gid = pathGid.orElse(params.get("geostore_id")).getOrElse(
      return respond(ex, 422, "application/json",
        Sinks.jsendError("Raster analysis requires a geostore_id")))
    geostore.get(gid) match {
      case None => respond(ex, 404, "application/json",
        Sinks.jsendError(s"Geostore $gid not found"))
      case Some(gj) =>
        val req = graft.raster.ZonalEngine.Request(
          aoiGeoJson = gj,
          groupBy = params.get("group_by").map(_.split(",").toSeq)
            .getOrElse(Seq("landcover")),
          tcdThreshold = num422(ex, "tcd_threshold",
            params.get("tcd_threshold").map(_.toInt)).getOrElse(return))
        val payload = withDeadline("zonal", raster = true) {
          Sinks.toJsend(graft.raster.ZonalEngine.run(spark, req))
        }
        ex.getResponseHeaders.add("Cache-Control", "max-age=7200")
        respond(ex, 200, "application/json", payload)
    }
  }

  private val JobGet = "^/job/([^/]+)$".r
  private val JobDownload = "^/job/([^/]+)/download$".r

  /** Batch zonal analysis over an inline FeatureCollection: 202 + a
    * pollable job (the reference fans out ≤100 Step-Function lambdas;
    * here the features run through the zonal engine in one process —
    * the single-shuffle whole-batch plan is the r7_batch_zonal query).
    * Body: `{"feature_collection": {...}, "tcd_threshold": n?}`. */
  private def zonalBatch(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val obj = parseBody422(ex, body).getOrElse(return)
    val fc = obj.get("feature_collection") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => return respond(ex, 422, "application/json",
        Sinks.jsendError("Missing feature_collection in request body"))
    }
    val features = fc.getOrElse("features", List.empty).asInstanceOf[List[Any]]
    if (features.isEmpty || features.size > 100)
      return respond(ex, 400, "application/json",
        Sinks.jsendError("feature_collection must contain 1-100 features"))
    val threshold = num422(ex, "tcd_threshold",
      obj.get("tcd_threshold").map(_.toString.toDouble.toInt)).getOrElse(return)
    val geoms = features.map { f =>
      graft.geo.Json.write(f.asInstanceOf[Map[String, Any]]("geometry"))
    }
    val id = jobRegistry.submit { () =>
      // ONE Spark job for the whole batch: broadcast AOI table × pruned
      // tile scan, fused per-(aoi, tile) pass, single (fid, key)
      // shuffle — not a sequential per-feature loop (the at-scale
      // answer to the reference's 100-lambda fan-out).
      val df = graft.raster.ZonalEngine.runBatch(spark, catalog, geoms, threshold)
      val rows = df.collect() // ≤ 100 features × |dict| rows (API sink)
      val byFid = rows.groupBy(_.getAs[Int]("fid")).toSeq.sortBy(_._1)
      byFid.map { case (fid, rs) =>
        val items = rs.map { r =>
          s"""{"landcover":${r.getAs[Long]("landcover")},""" +
            s""""landcover_name":${graft.geo.Json.write(r.getAs[String]("landcover_name"))},""" +
            s""""area_ha":${r.getAs[Double]("area_ha")},""" +
            s""""pixel_count":${r.getAs[Long]("pixel_count")}}"""
        }.mkString(",")
        s"""{"fid":$fid,"rows":[$items]}"""
      }.mkString("[", ",", "]")
    }
    respond(ex, 202, "application/json",
      s"""{"data":{"job_id":"$id","status":"pending"},"status":"success"}""")
  }

  /** User-SQL batch query over a feature list (`POST
    * /dataset/{d}/{v}/query/batch`, `queries.py:280-430`): exactly one
    * of `feature_collection` (inline, ≤256 KB payload), `uri` (GeoJSON
    * FeatureCollection file — the escape hatch for large geometry),
    * or `geostore_ids`. 202 + a pollable job; the whole list runs as
    * ONE Spark job (`ZonalEngine.runSqlBatch`). */
  private def queryBatch(ex: HttpExchange, dataset: String, version: String): Unit = {
    authGate(ex, dataset).foreach { case (code, body) =>
      return respond(ex, code, "application/json", body) }
    val bytes = ex.getRequestBody.readAllBytes()
    if (bytes.length > 256 * 1024)
      return respond(ex, 413, "application/json",
        Sinks.jsendError("The request payload must be under 256 KB. Reference " +
          "larger feature files with the uri field instead."))
    val body = new String(bytes, StandardCharsets.UTF_8)
    if (!catalog.version(dataset, version).exists(
      _.defaultAsset.exists(_.assetType == cat.AssetType.RasterTileSet)))
      return respond(ex, 400, "application/json", Sinks.jsendError(
        "Querying on lists is only available for raster tile sets."))
    val obj = parseBody422(ex, body).getOrElse(return)
    val sql = obj.get("sql") match {
      case Some(s: String) => s
      case _ => return respond(ex, 422, "application/json",
        Sinks.jsendError("Missing sql in request body"))
    }
    val idField = obj.get("id_field").map(_.toString)
    val sources = Seq("feature_collection", "uri", "geostore_ids")
      .flatMap(k => obj.get(k).map(k -> _))
    if (sources.length > 1)
      return respond(ex, 400, "application/json", Sinks.jsendError(
        "Must provide only one of valid feature collection, URI, or geostore_ids list."))
    if (sources.isEmpty)
      return respond(ex, 400, "application/json", Sinks.jsendError(
        "Must provide valid feature collection, URI, or geostore_ids list."))

    def featuresOf(fc: Map[String, Any]): Seq[(String, String)] = {
      val features = fc.getOrElse("features", List.empty).asInstanceOf[List[Any]]
        .map(_.asInstanceOf[Map[String, Any]])
      features.zipWithIndex.map { case (f, i) =>
        val fid = idField.flatMap(k =>
          f.get("properties").collect { case p: Map[_, _] =>
            p.asInstanceOf[Map[String, Any]].get(k) }.flatten.map(graft.geo.Json.write))
          .getOrElse(i.toString)
        fid -> graft.geo.Json.write(f("geometry"))
      }
    }

    val geoms: Seq[(String, String)] =
      try sources.head match {
        case ("feature_collection", fc: Map[_, _]) =>
          featuresOf(fc.asInstanceOf[Map[String, Any]])
        case ("uri", uri) =>
          if (!sourceAllowed(uri.toString))
            return respond(ex, 403, "application/json", Sinks.jsendError(
              s"Source URI outside the allowed data directories: $uri"))
          val p = java.nio.file.Paths.get(
            uri.toString.stripPrefix("file://"))
          if (!java.nio.file.Files.isReadable(p))
            return respond(ex, 400, "application/json",
              Sinks.jsendError("Cannot access all of the source files"))
          featuresOf(graft.geo.Json.parseObject(
            java.nio.file.Files.readString(p)))
        case ("geostore_ids", ids: List[_]) =>
          ids.map { id =>
            val gid = id.toString
            gid -> resolveGeostore(gid, "gfw").getOrElse(
              return respond(ex, 404, "application/json",
                Sinks.jsendError(s"Geostore $gid not found")))
          }
        case _ => return respond(ex, 400, "application/json", Sinks.jsendError(
          "Must provide valid feature collection, URI, or geostore_ids list."))
      } catch {
        case _: Exception => return respond(ex, 400, "application/json",
          Sinks.jsendError("Could not parse feature input"))
      }
    if (geoms.isEmpty || geoms.size > 100)
      return respond(ex, 400, "application/json",
        Sinks.jsendError("feature list must contain 1-100 features"))

    val overrides = versionOverrides(obj)
    val id = jobRegistry.submit { () =>
      val df = graft.raster.ZonalEngine.runSqlBatch(
        spark, catalog, dataset, sql, geoms, overrides)
      val rows = df.collect()
      val outCols = df.schema.fields.map(_.name).filterNot(_ == "fid")
      val byFid = rows.groupBy(_.getAs[String]("fid")).toSeq.sortBy(_._1)
      byFid.map { case (fid, rs) =>
        val items = rs.map { r =>
          outCols.map { c =>
            val i = r.fieldIndex(c)
            val v =
              if (r.isNullAt(i)) "null"
              else r.get(i) match {
                case n: java.lang.Number => n.toString
                case other => graft.geo.Json.write(other.toString)
              }
            s"${graft.geo.Json.write(c)}:$v"
          }.mkString("{", ",", "}")
        }.mkString(",")
        s"""{"fid":${graft.geo.Json.write(fid)},"rows":[$items]}"""
      }.mkString("[", ",", "]")
    }
    respond(ex, 202, "application/json",
      s"""{"data":{"job_id":"$id","status":"pending"},"status":"success"}""")
  }

  /** `version_overrides` request-body map (`_query_raster`'s
    * per-dataset latest-override resolution, `queries.py:556,790-813`). */
  private def versionOverrides(obj: Map[String, Any]): Map[String, String] =
    obj.get("version_overrides") match {
      case Some(m: Map[_, _]) =>
        m.asInstanceOf[Map[String, Any]].map { case (k, v) => k -> v.toString }
      case _ => Map.empty
    }

  /** Content-addressed geostore id of a geometry (the service-wide
    * convention: md5 of the canonical GeoJSON, uuid-formatted). */
  private def geostoreIdOf(canonical: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
    val hex = md.map(b => f"$b%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20)}"
  }

  /** GET /geostore/admin/list (`geostore.py:99-133` +
    * `crud/geostore.py:137-178`, the A9 admin aggregation): national
    * ids/names/codes ordered by id. Geostore ids are the
    * content-addressed hash of each country's synthesized boundary
    * polygon ([[graft.geo.AdminFixtures]]) — the same id the
    * per-boundary routes serve and register. */
  private def adminList(ex: HttpExchange): Unit = {
    val params = queryParams(ex)
    val provider = params.getOrElse("source[provider]", "gadm")
    val version = params.getOrElse("source[version]", "3.6")
    if (provider.isEmpty || version.isEmpty)
      return respond(ex, 400, "application/json",
        Sinks.jsendError("source provider and version must be non-empty"))
    if (provider != "gadm")
      return respond(ex, 400, "application/json",
        Sinks.jsendError(s"Invalid admin boundary source $provider"))
    val rows = spark.sql(
      "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey").collect()
    val items = rows.map { r =>
      val k = r.get(0).toString.toInt
      val canonical = graft.geo.Geom.toGeoJson(
        graft.geo.AdminFixtures.polygon(graft.geo.AdminFixtures.adm0Rect(k)))
      // register every advertised id so it immediately resolves via
      // GET /geostore/{id} (before the fix, ids 404'd until the
      // per-boundary route happened to be hit first)
      val id = geostoreIdOf(canonical)
      geostore.put(id, canonical)
      s"""{"geostore_id":"$id","iso":"${r.get(0)}",""" +
        s""""name":${graft.geo.Json.write(r.getString(1))}}"""
    }.mkString(",")
    respond(ex, 200, "application/json", s"""{"data":[$items],"status":"success"}""")
  }

  /** GET /geostore/admin/{country}[/{region}[/{subregion}]]
    * (`geostore.py:135-260` + `crud/geostore.py:218-330`
    * `build_gadm_geostore`/`form_admin_geostore`): the per-boundary
    * GADM geometry lookup. The reference proxies gadm/3.6 to the RW
    * API and serves other versions from a boundary version table;
    * zero-egress build serves BOTH from the synthesized deterministic
    * boundaries ([[graft.geo.AdminFixtures]] — documented divergence
    * in data source, same response shape). The boundary's geostore id
    * is content-addressed and REGISTERED, so it resolves through
    * `GET /geostore/{id}` and works as a query `geostore_id`. */
  private def adminBoundary(ex: HttpExchange, cid: String,
                            rid: Option[String], sid: Option[String]): Unit = {
    import graft.geo.{AdminFixtures, Geom, Json}
    val params = queryParams(ex)
    val provider = params.getOrElse("source[provider]", "gadm")
    val version = params.getOrElse("source[version]", "3.6")
    if (provider.isEmpty || version.isEmpty)
      return respond(ex, 400, "application/json",
        Sinks.jsendError("source provider and version must be non-empty"))
    if (provider != "gadm")
      return respond(ex, 400, "application/json",
        Sinks.jsendError(s"Invalid admin boundary source $provider"))
    def notFound() = respond(ex, 404, "application/json", Sinks.jsendError(
      s"Admin boundary not found in $provider version $version"))
    val k = cid.toIntOption.getOrElse(return notFound())
    val country = spark.sql(s"SELECT n_name FROM nation WHERE n_nationkey = $k")
      .collect().headOption.map(_.getString(0)).getOrElse(return notFound())
    val r1 = rid.map(_.toIntOption.getOrElse(return notFound()))
    val s2 = sid.map(_.toIntOption.getOrElse(return notFound()))
    if (r1.exists(r => r < 1 || r > 4) || s2.exists(s => s < 1 || s > 2))
      return notFound()
    val admLevel = s2.map(_ => 2).orElse(r1.map(_ => 1)).getOrElse(0)
    val rect = (r1, s2) match {
      case (Some(r), Some(s)) => AdminFixtures.adm2Rect(k, r, s)
      case (Some(r), None) => AdminFixtures.adm1Rect(k, r)
      case _ => AdminFixtures.adm0Rect(k)
    }
    val simplify = num422(ex, "simplify",
      params.get("simplify").map(_.toDouble)).getOrElse(return)
    val poly0 = AdminFixtures.polygon(rect)
    // Douglas–Peucker at the requested tolerance (identity on the
    // rectangular fixtures; the threshold is echoed in `info`)
    val poly = simplify.map(Geom.simplify(poly0, _)).getOrElse(poly0)
    val canonical = Geom.toGeoJson(poly)
    val id = geostoreIdOf(canonical)
    geostore.put(id, canonical)
    val name = admLevel match {
      case 0 => country
      case 1 => s"$country Region ${r1.get}"
      case _ => s"$country Region ${r1.get} Subregion ${s2.get}"
    }
    val (bx0, by0, bx1, by1) = poly.bbox
    val info = {
      val base =
        s""""use":{},"simplifyThresh":${simplify.map(_.toString).getOrElse("null")},""" +
          s""""gadm":${Json.write(version)},"name":${Json.write(name)},"iso":${Json.write(cid)}"""
      admLevel match {
        case 0 => s"{$base}"
        case 1 => s"""{$base,"id1":${r1.get}}"""
        case _ => s"""{$base,"id1":${r1.get},"id2":${s2.get}}"""
      }
    }
    respond(ex, 200, "application/json",
      s"""{"data":{"type":"geoStore","id":"$id","attributes":{""" +
        s""""geojson":{"crs":{},"type":"FeatureCollection","features":[""" +
        s"""{"geometry":$canonical,"properties":null,"type":"Feature"}]},""" +
        s""""hash":"$id","provider":{},"areaHa":${Geom.areaHa(poly)},""" +
        s""""bbox":[$bx0,$by0,$bx1,$by1],"lock":false,"info":$info}},""" +
        s""""status":"success"}""")
  }

  private def geostoreCreate(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val geom =
      try graft.geo.Geom.fromGeoJson(body)
      catch { case scala.util.control.NonFatal(_) =>
        return respond(ex, 422, "application/json",
          Sinks.jsendError("Invalid GeoJSON body")) }
    val canonical = graft.geo.Geom.toGeoJson(geom)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
    val hex = md.map(b => f"$b%02x").mkString
    val id = s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20)}"
    geostore.put(id, canonical)
    respond(ex, 201, "application/json",
      s"""{"data":{"gfw_geostore_id":"$id"},"status":"success"}""")
  }

  // --------------------------------------------------------------- utils

  /** Parse a JSON request body, answering 422 (the validation-error
    * contract every write route shares) instead of letting the parse
    * exception surface as a 500. `None` means the 422 was sent. */
  private def parseBody422(ex: HttpExchange,
                           body: String): Option[Map[String, Any]] =
    try Some(graft.geo.Json.parseObject(body))
    catch {
      case scala.util.control.NonFatal(_) =>
        respond(ex, 422, "application/json",
          Sinks.jsendError("Invalid request body"))
        None
    }

  /** A numeric parameter, answering 422 on a non-numeric value
    * instead of a NumberFormatException 500. */
  private def num422[T](ex: HttpExchange, name: String,
                        parse: => T): Option[T] =
    try Some(parse)
    catch {
      case _: NumberFormatException | _: ClassCastException =>
        respond(ex, 422, "application/json",
          Sinks.jsendError(s"$name must be a number"))
        None
    }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).map { q =>
      q.split("&").toSeq.flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8"))
          case Array(k) => Some(java.net.URLDecoder.decode(k, "UTF-8") -> "")
          case _ => None
        }
      }.toMap
    }.getOrElse(Map.empty)

  private def respond(ex: HttpExchange, code: Int, ct: String, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", ct)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
  }
}
