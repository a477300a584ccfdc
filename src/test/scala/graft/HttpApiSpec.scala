package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.server.HttpApiServer

/** Real-HTTP coverage of the admin/metrics API: a stock `java.net.http`
  * client drives every route of [[HttpApiServer]] over a live socket —
  * the same surface the reference exposes via its warp router
  * (api/http/router.rs:24-30) and prometheus exporter
  * (metrics/metric_service.rs:30). */
class HttpApiSpec extends AnyFunSuite {

  private lazy val session = TestSpark.spark.newSession()
  private lazy val server = new HttpApiServer(session)
  private lazy val port = server.start()
  private lazy val client = HttpClient.newHttpClient()

  private def get(path: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def post(path: String, body: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body))
        .header("Content-Type", "application/json").build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def parse(s: String) =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)

  test("/v1/hello identifies the engine and its routes") {
    val (code, body) = get("/v1/hello")
    assert(code == 200)
    val j = parse(body)
    assert(j.get("name").asText() == "graft")
    assert(j.get("version").asText() == session.version)
    assert(j.get("endpoints").toString.contains("/metrics"))
  }

  test("/v1/configs returns the settings overlay system.settings serves") {
    // an engine-level SET must surface in the HTTP config dump
    graft.sql.GraftSession.cached(session).sql("SET max_threads = 7")
    val (code, body) = get("/v1/configs")
    assert(code == 200)
    val j = parse(body)
    assert(j.get("max_threads").asText() == "7")
    assert(j.get("spark.sql.session.timeZone") != null)
  }

  test("/v1/cluster: list seeds the local node; add/remove round-trip") {
    val (c0, l0) = get("/v1/cluster/list")
    assert(c0 == 200 && parse(l0).get(0).get("name").asText() == "local")
    // add — the reference's ClusterNodeRequest shape
    val (c1, l1) = post("/v1/cluster/add",
      """{"name":"worker-1","priority":5,"address":"10.0.0.7:9091"}""")
    assert(c1 == 200 && l1.contains("worker-1"))
    // duplicate add conflicts
    val (c2, _) = post("/v1/cluster/add",
      """{"name":"worker-1","priority":5,"address":"10.0.0.7:9091"}""")
    assert(c2 == 409)
    // invalid priority rejected
    val (c3, e3) = post("/v1/cluster/add",
      """{"name":"w2","priority":99,"address":"x"}""")
    assert(c3 == 400 && e3.contains("priority"))
    // remove — by name
    val (c4, l4) = post("/v1/cluster/remove",
      """{"name":"worker-1","priority":0,"address":"-"}""")
    assert(c4 == 200 && !l4.contains("worker-1"))
    // the local node is not removable; unknown nodes 404
    assert(post("/v1/cluster/remove",
      """{"name":"local","priority":0,"address":"-"}""")._1 == 404)
    // malformed JSON is a clean 400
    assert(post("/v1/cluster/add", "{nope")._1 == 400)
  }

  test("/metrics serves Prometheus text and counts completed executions") {
    val before = get("/metrics")._2
    assert(before.contains("# TYPE graft_queries_total counter"))
    def counter(body: String, name: String): Double =
      body.linesIterator.find(_.startsWith(name + " ")).map(_.split(' ')(1).toDouble).get
    val n0 = counter(before, "graft_queries_total")
    // run real actions through the session the listener watches
    session.range(0, 1000).count()
    session.range(0, 10).collect()
    // the listener bus is async — poll briefly for the counters to land
    var body = ""
    val deadline = System.nanoTime() + 10e9.toLong
    while ({ body = get("/metrics")._2
      counter(body, "graft_queries_total") < n0 + 2 && System.nanoTime() < deadline })
      Thread.sleep(50)
    assert(counter(body, "graft_queries_total") >= n0 + 2)
    assert(counter(body, "graft_query_rows_total") >= 0)
    assert(counter(body, "jvm_heap_used_bytes") > 0)
    assert(body.contains("graft_tracing_events"))
    assert(counter(body, "graft_query_seconds_total") > 0)
  }

  test("concurrency torture: parallel scrapes + routes while queries run; counters stay monotone") {
    // 8 threads × 25 scrapes across every GET route, racing a thread that
    // keeps the session busy with real actions. Asserts: every response is
    // well-formed, nothing drops or hangs, and graft_queries_total observed
    // by any single thread never DECREASES across its sequential scrapes
    // (a torn read or per-scrape self-inflation would show up here — the
    // round-8 ADVICE fix made /metrics itself action-free).
    def counter(body: String, name: String): Double =
      body.linesIterator.find(_.startsWith(name + " "))
        .map(_.split(' ')(1).toDouble).getOrElse(Double.NaN)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val load = new Thread(() => {
      var i = 0L
      while (!stop.get) { session.range(0, 1000 + i % 7).count(); i += 1 }
    })
    load.setDaemon(true); load.start()
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        try {
          var last = -1.0
          (1 to 25).foreach { r =>
            val (mc, metrics) = get("/metrics")
            if (mc != 200) failures.add(s"t$t r$r /metrics -> $mc")
            val q = counter(metrics, "graft_queries_total")
            if (q.isNaN) failures.add(s"t$t r$r graft_queries_total missing")
            else if (q < last) failures.add(s"t$t r$r counter went backwards: $last -> $q")
            else last = q
            val (hc, hello) = get("/v1/hello")
            if (hc != 200 || parse(hello).get("name") == null)
              failures.add(s"t$t r$r /v1/hello malformed")
            val (cc, cfg) = get("/v1/configs")
            if (cc != 200 || !parse(cfg).isObject)
              failures.add(s"t$t r$r /v1/configs malformed")
            val (lc, lst) = get("/v1/cluster/list")
            if (lc != 200 || !parse(lst).isArray)
              failures.add(s"t$t r$r /v1/cluster/list malformed")
          }
        } catch {
          case e: Throwable => failures.add(s"t$t died: ${e.getMessage}")
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    stop.set(true); load.join(30000)
    threads.filter(_.isAlive).foreach(t => failures.add(s"${t.getName} hung"))
    assert(failures.isEmpty, failures.toArray.mkString("; "))
  }

  test("unknown cluster routes 404 with a JSON error") {
    val (code, body) = get("/v1/cluster/nope")
    assert(code == 404 && parse(body).get("error") != null)
  }
}
