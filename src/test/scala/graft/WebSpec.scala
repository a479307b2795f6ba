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

  test("percent-encoding normalization (RFC 3986 §6.2.2.2): unreserved " +
    "escapes decode, reserved escapes uppercase but stay encoded, " +
    "bare/truncated % passes through") {
    assert(canon(
      // %7E ~ and %41 A decode (either hex case); %2f / stays, upcased
      "https://a.example.test/%7Edocs%2fx?q=%41%2d1",
      // %3a : reserved -> %3A; 100% has no valid escape -> untouched
      "https://a.example.test/p?b=%3a&c=100%",
      // decoded %7e merges with the literal-~ spelling of the same URL
      "https://a.example.test/~docs") == Seq(
      Some("https://a.example.test/~docs%2Fx?q=A-1"),
      Some("https://a.example.test/p?b=%3A&c=100%"),
      Some("https://a.example.test/~docs")))
  }

  test("percentNormalize (native expression): truncated escape at end " +
    "of string, escape-free fast path, and multi-byte UTF-8 bytes " +
    "pass through verbatim") {
    val got = Seq("a%7", "a%", "no escapes here", "ü%7eü", "%41")
      .toDF("s").select(Web.percentNormalize(col("s")).as("n"))
      .as[String].collect().toSeq
    assert(got == Seq("a%7", "a%", "no escapes here", "ü~ü", "A"))
  }

  test("percent-normalized equivalents collapse to ONE canonical key") {
    val ks = canon(
      "https://a.example.test/%7euser",
      "https://a.example.test/%7Euser",
      "https://a.example.test/~user").map(_.get)
    assert(ks.distinct.size == 1)
  }

  test("host: trailing root dot dropped, mixed-case punycode (xn--) " +
    "labels lowercase-stable, Unicode hosts IDNA-encode to the same " +
    "key as their ACE spelling (RFC 3492 §7.1 vector)") {
    val hosts = Seq(
      "https://a.example.test./p",
      "https://XN--BCHER-KVA.example.test/p",
      "https://bücher.example.test/p", // bücher -> xn--bcher-kva
      "https://xn--bcher-kva.example.test/p")
      .toDF("u").select(Web.canonicalHost(col("u")).as("h"))
      .as[String].collect().toSeq
    assert(hosts(0) == "a.example.test")
    assert(hosts(1) == "xn--bcher-kva.example.test")
    assert(hosts(2) == "xn--bcher-kva.example.test")
    assert(hosts(3) == "xn--bcher-kva.example.test")
  }

  test("idnAsciiHost: invalid IDNA label shapes pass through unchanged " +
    "instead of erroring (crawl input must not kill the job)") {
    // a label over 63 chars is rejected by IDNA toASCII; the ü forces
    // it off the ASCII fast path into the JDK call
    val bad = "ü" + ("a" * 70) + ".example.test"
    val out = Seq(bad).toDF("h")
      .select(Web.idnAsciiHost(col("h")).as("o")).as[String].head()
    assert(out == bad)
  }

  test("registeredDomain PSL wildcard rule *.s: every label under s is " +
    "a public suffix (reg domain = 3 trailing labels); a 2-label host " +
    "IS a suffix and returns itself") {
    val sufs = Seq("*.ck")
    assert(domain(Seq(
      "a.b.ck",      // label + wildcard suffix b.ck
      "x.a.b.ck",    // deeper: still last 3 labels
      "b.ck",        // IS a public suffix
      "weck"         // dotless, unrelated to .ck
    ), sufs) == Seq("a.b.ck", "a.b.ck", "b.ck", "weck"))
  }

  test("registeredDomain PSL exception rule !e carves e out of the " +
    "wildcard: e is the registered domain for itself and below") {
    val sufs = Seq("*.ck", "!www.ck")
    assert(domain(Seq(
      "www.ck",         // the exception itself
      "foo.www.ck",     // below it
      "a.b.ck"          // untouched wildcard behavior
    ), sufs) == Seq("www.ck", "www.ck", "a.b.ck"))
  }

  test("registeredDomain: oracle twin agrees arm-for-arm on the mixed " +
    "rule list (plain + wildcard + exception)") {
    val sufs = Seq("example.test", "*.cdn.example.test",
      "!origin.cdn.example.test")
    assert(domain(Seq(
      "a.b.example.test",
      "a.b.cdn.example.test",        // wildcard: 3 trailing labels
      "x.a.b.cdn.example.test",      // deeper under wildcard
      "b.cdn.example.test",          // IS a wildcard public suffix
      "origin.cdn.example.test",     // exception itself
      "sub.origin.cdn.example.test"  // below the exception
    ), sufs) == Seq(
      "b.example.test", "a.b.cdn.example.test", "a.b.cdn.example.test",
      "b.cdn.example.test", "origin.cdn.example.test",
      "origin.cdn.example.test"))
  }

  private def domainJoin(hosts: Seq[String],
      rules: Seq[String]): Seq[String] = {
    val m = Web.withRegisteredDomain(hosts.toDF("h"), "h", rules, "d")
      .select(col("h"), col("d")).as[(String, String)].collect().toMap
    hosts.map(m)
  }

  test("parsePslFile: publicsuffix.org format — comment lines " +
      "(including the ICANN/PRIVATE section markers), blank lines, " +
      "trailing annotations, and case are all handled") {
    val file =
      """// ===BEGIN ICANN DOMAINS===
        |// ck : https://example.test/registry
        |*.ck
        |!www.ck
        |
        |Example.TEST   // inline trailing comment
        |// ===END ICANN DOMAINS===
        |// ===BEGIN PRIVATE DOMAINS===
        |cdn.example.test
        |// ===END PRIVATE DOMAINS===
        |""".stripMargin
    assert(Web.parsePslFile(file) ==
      Seq("*.ck", "!www.ck", "example.test", "cdn.example.test"))
    // the file form round-trips through registeredDomain unchanged
    val p = java.nio.file.Files.createTempFile("psl", ".dat")
    java.nio.file.Files.writeString(p, file)
    assert(domain(Seq("foo.www.ck", "a.b.ck", "x.example.test"),
      Web.parsePslFile(p)) ==
      Seq("www.ck", "a.b.ck", "x.example.test"))
  }

  test("PSL unicode rules are IDNA-normalized like hosts: a 公司.cn " +
      "rule matches the punycoded hosts hostExpr actually produces, " +
      "in both the expression and join forms") {
    // the real publicsuffix.org list carries unicode rules while
    // crawl hosts arrive punycoded (xn--55qx5d.cn = 公司.cn) — an
    // un-normalized rule silently never matches and distinct sites
    // collapse into the 2-label fallback
    val rules = Seq("公司.cn", "*.навсегда.bg")
    val hostsUnderTest = Seq(
      "a.foo.xn--55qx5d.cn",            // plain unicode rule, deep
      "foo.xn--55qx5d.cn",              // suffix + one label
      "x.lbl.xn--80aafefe7c8a.bg")     // wildcard unicode rule
    val expected = Seq(
      "foo.xn--55qx5d.cn",
      "foo.xn--55qx5d.cn",
      "x.lbl.xn--80aafefe7c8a.bg")
    assert(java.net.IDN.toASCII("навсегда.bg") == "xn--80aafefe7c8a.bg")
    assert(domain(hostsUnderTest, rules) == expected)
    assert(domainJoin(hostsUnderTest, rules) == expected)
  }

  test("withRegisteredDomain (broadcast rule-table join) agrees with " +
      "the expression form on every PSL rule-kind interaction, and " +
      "plans the rule match as a BroadcastHashJoin (never a " +
      "nested-loop rule walk)") {
    val rules = Seq("example.test", "*.cdn.example.test",
      "!origin.cdn.example.test", "*.ck", "!www.ck", "test")
    val hostsUnderTest = Seq(
      "a.b.example.test", "a.b.cdn.example.test",
      "x.a.b.cdn.example.test", "b.cdn.example.test",
      "origin.cdn.example.test", "sub.origin.cdn.example.test",
      "www.ck", "foo.www.ck", "a.b.ck", "weck",
      "plain.test", "test", "unrelated.zz", "dotless")
    assert(domainJoin(hostsUnderTest, rules) ==
      domain(hostsUnderTest, rules))
    val out = Web.withRegisteredDomain(
      hostsUnderTest.toDF("h"), "h", rules, "d")
    out.collect() // finalize AQE so the plan string is the real one
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rule match must be a BroadcastHashJoin:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop join may appear in the plan:\n$plan")
  }

  test("withRegisteredDomain at real-PSL rule scale: a 300-rule " +
      "generated list (nested wildcards + exceptions included) " +
      "resolves every rule-kind correctly — the expression form " +
      "CANNOT run this (its 300-arm fold overflows the analyzer " +
      "stack), which is exactly why the lookup-join form exists") {
    val rules =
      (0 until 250).map(i => s"tld$i") ++
        (0 until 25).map(i => s"co.tld$i") ++
        (0 until 15).map(i => s"*.w.tld$i") ++
        (0 until 10).map(i => s"!keep$i.w.tld$i")
    // expected values derived from the PSL algorithm by hand — the
    // expression form is NOT the oracle here (it stack-overflows at
    // this rule count; measured, see withRegisteredDomain's doc)
    val cases =
      (0 until 40).map(i =>
        s"a.site$i.tld${i % 250}" -> s"site$i.tld${i % 250}") ++
        (0 until 20).map(i =>
          s"x.shop$i.co.tld${i % 25}" -> s"shop$i.co.tld${i % 25}") ++
        (0 until 15).map(i =>
          s"a$i.b$i.w.tld${i % 15}" -> s"a$i.b$i.w.tld${i % 15}") ++
        (0 until 10).map(i =>
          s"deep$i.keep$i.w.tld$i" -> s"keep$i.w.tld$i") ++
        Seq("bare.unlisted" -> "bare.unlisted", "solo" -> "solo")
    assert(domainJoin(cases.map(_._1), rules) == cases.map(_._2))
  }

  private def clean(htmls: String*): Seq[String] =
    htmls.toDF("h").select(Web.htmlToText(col("h")).as("t"))
      .as[String].collect().toSeq

  private def links(html: String): Seq[String] =
    Seq(html).toDF("h").select(Web.extractLinks(col("h")).as("l"))
      .as[Seq[String]].collect().head

  test("htmlToText: script/style payloads vanish whole (including " +
    "embedded <, quotes and &), comments vanish, tags become " +
    "spaces, whitespace collapses") {
    assert(clean(
      "<p>a</p><script>if (x < 2) { x = \"a&b\"; }</script><p>b</p>",
      "<P>a</P><STYLE>p { color: red }</STYLE>c",
      "x<!-- hidden <b>bold</b> -->y",
      "  <div>\n  spaced   out\t</div> ") == Seq(
      "a b", "a c", "x y", "spaced out"))
  }

  test("htmlToText: the six entities decode with &amp; last, so " +
    "&amp;lt; yields the literal text &lt; rather than double-" +
    "decoding into <") {
    assert(clean(
      "R&amp;D &lt;spec&gt; &quot;q&quot; &#39;s&#39;&nbsp;end",
      "escaped: &amp;lt; stays") == Seq(
      "R&D <spec> \"q\" 's' end",
      "escaped: &lt; stays"))
  }

  test("extractLinks: double-quoted hrefs in document order, " +
    "case-insensitive tag/attr, commented-out and script-embedded " +
    "anchors contribute nothing") {
    assert(links(
      "<a href=\"http://a.test/1\">x</a>" +
        "<A HREF = \"http://a.test/2\">y</A>" +
        "<!-- <a href=\"http://a.test/no\">n</a> -->" +
        "<script>var s = '<a href=\"http://a.test/js\">j</a>';" +
        "</script>" +
        "<a id=\"z\" href=\"http://a.test/3\">z</a>") ==
      Seq("http://a.test/1", "http://a.test/2", "http://a.test/3"))
    assert(links("<p>no anchors here</p>").isEmpty)
  }

  test("extractAnchors pairs each href with its tag-stripped, " +
      "whitespace-collapsed anchor text, in document order, ignoring " +
      "commented and script-embedded anchors") {
    val html = "<a href=\"http://a.test/1\"> first  link </a>" +
      "<a href=\"http://a.test/2\"><b>bold</b> two</a>" +
      "<!-- <a href=\"http://a.test/no\">n</a> -->" +
      "<script>s('<a href=\"http://a.test/js\">j</a>')</script>" +
      "<a name=\"no-href\">plain</a>"
    val got = Seq(html).toDF("h")
      .select(explode(Web.extractAnchors(col("h"))).as("a"))
      .select($"a.href", $"a.anchor").as[(String, String)]
      .collect().toSeq
    assert(got == Seq(
      ("http://a.test/1", "first link"),
      ("http://a.test/2", "bold two"),
      ("", "plain")))
  }

  test("robotsGroup + robotsDecision: RFC 9309 group selection " +
      "(multi-UA headers, merged matching groups, star fallback, " +
      "exact-group-wins-even-if-empty, pre-header rules ignored) and " +
      "longest-match decisions (allow wins length ties, trailing-$ " +
      "anchor, * wildcard, empty Disallow = no restriction)") {
    def decide(body: String, paths: Seq[String]): Seq[(String, Boolean, Long, String)] =
      paths.toDF("path")
        .select(col("path"),
          Web.robotsDecision(col("path"),
            Web.robotsGroup(lit(body), "GraftBot")).as("d"))
        .select(col("path"), $"d.allowed", $"d.win_len", $"d.win_p")
        .as[(String, Boolean, Long, String)].collect().toSeq

    val body =
      "Disallow: /orphan # rule before any header: ignored\r\n" +
      "User-Agent: otherbot\n" +
      "user-agent: graftbot\n" +        // multi-UA header, case-insens.
      "Disallow: /docs\n" +
      "Allow: /docs/public\n" +          // longer allow carves back in
      "disallow : /*.zip$\n" +           // wildcard + end anchor
      "Allow: /dup1\n" +
      "Disallow: /dup2\n" +              // same-length pair for ties
      "Disallow:\n" +                    // empty pattern: no restriction
      "\n" +
      "User-agent: graftbot\n" +         // second matching group MERGES
      "Disallow: /extra\n" +
      "\n" +
      "User-agent: *\n" +
      "Disallow: /\n"                    // star group: moot (exact exists)
    val got = decide(body, Seq(
      "/docs/x", "/docs/public/x", "/free", "/a/b.zip", "/a/b.zipx",
      "/extra/1", "/orphan"))
    assert(got == Seq(
      ("/docs/x", false, 5L, "/docs"),
      ("/docs/public/x", true, 12L, "/docs/public"),
      ("/free", true, -1L, ""),           // no rule: allowed
      ("/a/b.zip", false, 7L, "/*.zip$"),
      ("/a/b.zipx", true, -1L, ""),       // $ anchor: .zipx survives
      ("/extra/1", false, 6L, "/extra"),  // merged second group applies
      ("/orphan", true, -1L, "")))        // pre-header rule ignored

    // allow wins a length tie: /dup1 (allow) vs /dup2 (disallow) never
    // match the same path; a REAL tie needs equal-length patterns that
    // both match — seed one
    val tie = "User-agent: graftbot\nAllow: /t*\nDisallow: /ti\n"
    assert(decide(tie, Seq("/ti")) ==
      Seq(("/ti", true, 3L, "/t*")))      // same len 3: allow wins

    // star fallback when no exact group exists
    val star = "User-agent: otherbot\nDisallow: /\n\n" +
      "User-agent: *\nDisallow: /private\n"
    assert(decide(star, Seq("/private/x", "/pub")) ==
      Seq(("/private/x", false, 8L, "/private"), ("/pub", true, -1L, "")))

    // exact group EXISTS but is empty (its only rule line has an
    // empty value — which still CLOSES the header): star ignored,
    // everything allowed
    val emptyExact = "User-agent: graftbot\nDisallow:\n\n" +
      "User-agent: *\nDisallow: /\n"
    assert(decide(emptyExact, Seq("/anything")) ==
      Seq(("/anything", true, -1L, "")))

    // RFC 9309 grammar: a BLANK line does not split a header sequence
    // — two ua lines separated only by a blank form ONE group
    val blankHdr = "User-agent: graftbot\n\nUser-agent: *\n" +
      "Disallow: /\n"
    assert(decide(blankHdr, Seq("/x")) == Seq(("/x", false, 1L, "/")))

    // literal % and _ in patterns must not act as LIKE wildcards
    val meta = "User-agent: graftbot\nDisallow: /p%2F_x\n"
    assert(decide(meta, Seq("/p%2F_xy", "/pQ2FZxy")) ==
      Seq(("/p%2F_xy", false, 7L, "/p%2F_x"), ("/pQ2FZxy", true, -1L, "")))
  }
}
