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
