package graft

import org.apache.spark.sql.functions._

import graft.operators.Web

class WebSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[Option[String]] =
    urls.toDF("u").select(Web.canonicalUrl(col("u")).as("c"))
      .as[Option[String]].collect().toSeq

  private def domain(hosts: Seq[String], suffixes: Seq[String]): Seq[String] =
    hosts.toDF("h")
      .select(Web.registeredDomain(col("h"), suffixes).as("d"))
      .as[String].collect().toSeq

  test("canonicalUrl: scheme/host lowering, default-port and www strip, " +
    "fragment drop, slash collapse, trailing-slash normalization") {
    assert(canon(
      "HTTP://WWW.A.Example.TEST:80/Docs//x/?b=2&a=1#frag",
      "https://a.example.test:443/",
      "https://a.example.test:8443/p/") == Seq(
      Some("http://a.example.test/Docs/x?a=1&b=2"),
      Some("https://a.example.test/"),
      Some("https://a.example.test:8443/p")))
  }

  test("canonicalUrl: userinfo stripped, tracking and empty params " +
    "dropped, survivors sorted, emptied query dropped") {
    assert(canon(
      "https://u:p@a.example.test/x?utm_source=s&utm_medium=m&z=1&b=2&",
      "http://a.example.test/x?gclid=g&fbclid=f&msclkid=m&ref=r") == Seq(
      Some("https://a.example.test/x?b=2&z=1"),
      Some("http://a.example.test/x")))
  }

  test("canonicalUrl: port 80 kept on https, 443 kept on http " +
    "(elision is scheme-specific), path case preserved") {
    assert(canon(
      "https://a.example.test:80/P",
      "http://a.example.test:443/P") == Seq(
      Some("https://a.example.test:80/P"),
      Some("http://a.example.test:443/P")))
  }

  test("canonicalUrl: non-absolute input is NULL, not mangled") {
    assert(canon("doc 17", "/relative/path", "") == Seq(None, None, None))
  }

  test("canonicalUrl is idempotent on its own output") {
    val messy = Seq(
      "HTTP://WWW.A.Example.TEST:80/Docs//x/?b=2&a=1#frag",
      "https://u:p@a.example.test/x?utm_source=s&z=1&",
      "https://www.b.example.test/docs/9/#sec")
    val once = canon(messy: _*).map(_.get)
    assert(canon(once: _*).map(_.get) == once)
  }

  test("registeredDomain: longest listed suffix wins, suffix-only and " +
    "dotless hosts return themselves, unlisted falls back to 2 labels") {
    val sufs = Seq("example.test", "deep.example.test")
    assert(domain(Seq(
      "a.b.example.test",     // one label + listed suffix
      "a.b.deep.example.test", // longer suffix beats shorter
      "example.test",         // host IS a suffix
      "localhost",            // dotless
      "x.y.other.zone"        // unlisted -> last two labels
    ), sufs) == Seq(
      "b.example.test", "b.deep.example.test", "example.test",
      "localhost", "other.zone"))
  }

  test("canonicalHost strips port AND www together (the DuckDB " +
    "first-match alternation trap: two separate replaces)") {
    val h = Seq("https://WWW.a.Example.TEST:8080/p").toDF("u")
      .select(Web.canonicalHost(col("u")).as("h")).as[String].head()
    assert(h == "a.example.test")
  }
}
