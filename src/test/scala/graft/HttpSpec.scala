package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.sources.Http

class HttpSpec extends SparkSpec {
  import spark.implicits._

  test("fetchCached downloads once and serves the cache afterwards") {
    val dir = Files.createTempDirectory("graft-http").toString
    var calls = 0
    val transport: Http.Transport = url => {
      calls += 1
      assert(url == "https://example.test/base/teams.csv")
      "team_id,team_name\nT-1,West Germany\n".getBytes("UTF-8")
    }
    val p1 = Http.fetchCached("teams.csv", dir, "https://example.test/base",
      transport)
    val p2 = Http.fetchCached("teams.csv", dir, "https://example.test/base",
      transport)
    assert(p1 == p2)
    assert(calls == 1) // second call hit the cache, like the reference
  }

  // --- real-transport tests: a loopback com.sun.net.httpserver on
  // 127.0.0.1 (ephemeral port, zero egress) serves fixture CSV bytes
  // and the REAL defaultTransport (JDK URL stream) fetches them — the
  // injected-transport tests above verify cache logic; these verify
  // the actual wire path the reference's fetch_csv exercises.

  private def withLoopbackServer[T](
      routes: Map[String, Array[Byte]])(f: (String, () => Int) => T): T = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(
        java.net.InetAddress.getLoopbackAddress, 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/", { exchange =>
      hits.incrementAndGet()
      routes.get(exchange.getRequestURI.getPath) match {
        case Some(bytes) =>
          exchange.sendResponseHeaders(200, bytes.length.toLong)
          exchange.getResponseBody.write(bytes)
        case None =>
          exchange.sendResponseHeaders(404, -1L)
      }
      exchange.close()
    })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try f(base, () => hits.get())
    finally server.stop(0)
  }

  test("defaultTransport fetches over a real loopback HTTP server; " +
      "the cache absorbs the second call") {
    val csv = "team_id,team_name\nT-1,West Germany\nT-2,Netherlands\n"
      .getBytes("UTF-8")
    withLoopbackServer(Map("/base/teams.csv" -> csv)) { (base, hits) =>
      val dir = Files.createTempDirectory("graft-http-real").toString
      val p1 = Http.fetchCached("teams.csv", dir, s"$base/base")
      assert(new String(Files.readAllBytes(p1), "UTF-8")
        .contains("Netherlands"))
      assert(hits() == 1)
      val p2 = Http.fetchCached("teams.csv", dir, s"$base/base")
      assert(p1 == p2 && hits() == 1,
        "second fetch must be served from the cache, not the wire")
    }
  }

  test("readCsv end-to-end over the real transport scans the declared " +
      "schema") {
    val csv = "team_id,team_name\nT-1,West Germany\nT-2,Netherlands\n"
      .getBytes("UTF-8")
    withLoopbackServer(Map("/base/teams.csv" -> csv)) { (base, _) =>
      val dir = Files.createTempDirectory("graft-http-real2").toString
      val schema = StructType(Seq(StructField("team_id", StringType),
        StructField("team_name", StringType)))
      val df = Http.readCsv(spark, "teams.csv", dir, s"$base/base", schema)
      assert(df.count() == 2)
      assert(df.select("team_name").as[String].collect().toSet
        .contains("Netherlands"))
    }
  }

  test("a failed real fetch (404) throws and leaves NO cache entry — " +
      "truncated/absent upstreams never poison later builds") {
    withLoopbackServer(Map.empty) { (base, _) =>
      val dir = Files.createTempDirectory("graft-http-404").toString
      intercept[java.io.IOException] {
        Http.fetchCached("missing.csv", dir, s"$base/base")
      }
      assert(!Files.exists(java.nio.file.Paths.get(dir, "missing.csv")),
        "no cache file may exist after a failed fetch")
      // and no leftover .part temp files either
      val leftovers = java.nio.file.Files.list(
          java.nio.file.Paths.get(dir)).toArray.map(_.toString)
      assert(leftovers.isEmpty, s"leftover files: ${leftovers.toSeq}")
    }
  }

  test("readCsv scans the fetched file under the declared schema") {
    val dir = Files.createTempDirectory("graft-http2").toString
    val transport: Http.Transport = _ =>
      "team_id,team_name\nT-1,West Germany\nT-2,Netherlands\n".getBytes("UTF-8")
    val schema = StructType(Seq(StructField("team_id", StringType),
      StructField("team_name", StringType)))
    val df = Http.readCsv(spark, "teams.csv", dir,
      "https://example.test/base", schema, transport)
    assert(df.count() == 2)
    assert(df.select("team_name").as[String].collect().toSet
      .contains("Netherlands"))
  }
}
