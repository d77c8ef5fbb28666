package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession

/** Concurrent-load smoke for the API layer (round-15 verdict ask #7):
  * the bench is serial, but the reference serves concurrent HTTP
  * (pool 5–10, workers/core — `app/settings/globals.py:59-60`,
  * `gunicorn_conf.py:5-30`). This main fires N simultaneous mixed
  * requests (interactive count/agg, zonal analysis, streaming CSV
  * download, field introspection) at an [[api.ApiServer]] on sf0.1,
  * with a 10 Hz `/ping` prober running throughout as the starvation
  * signal, and prints ONE JSON line with per-class p50/p99, ping p99,
  * and error counts. Recorded in BENCH_sf1.md.
  *
  *   runMain graft.ApiLoad [concurrency] [rounds]
  */
object ApiLoad {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 16
    val rounds = if (args.length > 1) args(1).toInt else 6
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // FAIR across the server's per-slot scheduler pools: concurrent
      // requests share the cluster instead of queueing whole-job FIFO
      // (ApiServer sets spark.scheduler.pool = graft-api-slot-N per
      // in-flight query; inert under the default FIFO mode)
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val server = new api.ApiServer(spark, sfDir)
    val port = server.start()
    val client = HttpClient.newHttpClient()
    def get(path: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

    // a stored geostore for the zonal class (inside the synthetic grid)
    val gj = """{"type":"Polygon","coordinates":[[[0.3513,40.6821],[3.1242,40.9753],[3.7081,43.2517],[0.8472,42.8391],[0.3513,40.6821]]]}"""
    val created = client.send(HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:$port/geostore"))
      .POST(HttpRequest.BodyPublishers.ofString(gj)).build(),
      HttpResponse.BodyHandlers.ofString())
    val gid = "\"gfw_geostore_id\":\"([0-9a-f-]+)\"".r
      .findFirstMatchIn(created.body()).get.group(1)

    val classes: Seq[(String, String)] = Seq(
      "count" -> s"/dataset/lineitem/v1/query/json?sql=${enc("SELECT count(*) AS n FROM data")}",
      "agg" -> s"/dataset/lineitem/v1/query/json?sql=${enc(
        "SELECT l_returnflag, sum(l_quantity) AS q FROM data GROUP BY l_returnflag")}",
      "filter" -> s"/dataset/orders/v1/query/json?sql=${enc(
        "SELECT count(*) AS n FROM data WHERE o_totalprice > 100000")}",
      "zonal" -> s"/analysis/zonal?geostore_id=$gid&group_by=landcover&tcd_threshold=30",
      "download" -> s"/dataset/region/v1/download/csv?sql=${enc("SELECT * FROM data")}",
      "fields" -> "/dataset/lineitem/v1/fields")
    // warm each class once (codegen/JIT) so the load numbers measure
    // concurrency, not first-touch compilation
    classes.foreach { case (_, path) => get(path) }

    val lat = new ConcurrentLinkedQueue[(String, Double, Int)]()
    val pingLat = new ConcurrentLinkedQueue[Double]()
    @volatile var stop = false
    val pinger = new Thread(() => {
      val pc = HttpClient.newHttpClient()
      while (!stop) {
        val t0 = System.nanoTime()
        val code = try pc.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/ping")).GET().build(),
          HttpResponse.BodyHandlers.ofString()).statusCode()
        catch { case _: Throwable => -1 }
        pingLat.add((System.nanoTime() - t0) / 1e6)
        if (code != 200) pingLat.add(Double.MaxValue)
        Thread.sleep(100)
      }
    })
    pinger.setDaemon(true)
    pinger.start()

    val pool = Executors.newFixedThreadPool(n)
    val wall0 = System.nanoTime()
    for (r <- 0 until rounds) {
      val latch = new CountDownLatch(n)
      for (i <- 0 until n) {
        val (cls, path) = classes((r * n + i) % classes.size)
        pool.submit(new Runnable {
          def run(): Unit = {
            val t0 = System.nanoTime()
            val code = try get(path).statusCode()
            catch { case _: Throwable => -1 }
            lat.add((cls, (System.nanoTime() - t0) / 1e6, code))
            latch.countDown()
          }
        })
      }
      latch.await(120, TimeUnit.SECONDS)
    }
    val wallSec = (System.nanoTime() - wall0) / 1e9
    stop = true
    pool.shutdown()

    def pct(xs: Seq[Double], p: Double): Double =
      if (xs.isEmpty) 0.0
      else xs.sorted.apply(math.min(xs.size - 1, (xs.size * p).toInt))
    import scala.jdk.CollectionConverters._
    val all = lat.asScala.toSeq
    val errors = all.count(_._3 != 200)
    val byCls = all.groupBy(_._1).toSeq.sortBy(_._1).map { case (c, xs) =>
      val ms = xs.map(_._2)
      s""""$c":{"n":${xs.size},"p50_ms":${pct(ms, 0.5).round},"p99_ms":${pct(ms, 0.99).round},"max_ms":${ms.max.round}}"""
    }.mkString(",")
    val pings = pingLat.asScala.toSeq.filter(_ != Double.MaxValue)
    val pingErr = pingLat.asScala.count(_ == Double.MaxValue)
    println(s"""{"metric":"api_load","concurrency":$n,"rounds":$rounds,"requests":${all.size},"errors":$errors,"wall_sec":${f"$wallSec%.1f"},"classes":{$byCls},"ping":{"n":${pings.size},"p50_ms":${pct(pings, 0.5).round},"p99_ms":${pct(pings, 0.99).round},"errors":$pingErr},"sf":"$sfDir"}""")
    server.stop()
    spark.stop()
  }
}
