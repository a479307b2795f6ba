package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

/** Crawl-curation URL handling: canonicalization and registered-domain
  * extraction — the keying step every web-scale corpus pipeline runs
  * before URL-level dedup, per-domain quotas (x30) and link-graph
  * construction (x55). Canonicalization follows RFC 3986 §6
  * (case normalization of scheme/host, default-port elision,
  * §6.2.2.2 percent-encoding normalization: uppercase hex, decode
  * unreserved octets) plus IDNA host normalization (RFC 3490:
  * Unicode hosts to their punycode ACE form, `xn--` labels stable)
  * and the de-facto crawl extensions: fragment drop, userinfo strip,
  * tracking-parameter removal, query-parameter sort, duplicate-slash
  * collapse, trailing-slash and trailing-host-dot normalization.
  *
  * Scale shape: every function here is a chain of codegen'd
  * regexp/array projections — narrow, zero shuffle, runs where the
  * URL bytes already are. At 100 TB the canonical key is what SHOULD
  * shuffle (32-byte-ish strings) instead of raw page text; pair it
  * with Dedup.exactKeepFirst on the canonical column.
  *
  * Engine portability: patterns use only the regex subset with
  * identical semantics in Java regex (Spark) and RE2 (DuckDB) — no
  * lookaround, no backreferences (same constraint as
  * [[Corpus.piiPatterns]]). The DuckDB twins are generated from the
  * SAME constants so the two engines cannot drift; DuckDB
  * regexp_replace needs the explicit 'g' flag wherever Spark's
  * replace-all semantics matter. The one step with no SQL twin is
  * IDNA conversion of NON-ASCII hosts ([[graft.plans.IdnToAscii]] is
  * a JDK punycode call; DuckDB 1.0 has no equivalent) — on all-ASCII
  * hosts the expression is the identity by its fast-path contract,
  * so ASCII oracle fixtures stay bit-exact and the Unicode path is
  * pinned by WebSpec against RFC 3492 vectors instead.
  */
object Web {

  /** Query parameters dropped during canonicalization: analytics
    * click/campaign trackers that never change the resource. Each
    * entry is a regex matched against the full `key=value` pair,
    * anchored at the key. */
  val trackingParamPatterns: Seq[String] =
    Seq("utm_[^=]*", "fbclid", "gclid", "msclkid", "ref")

  private val trackingRe = s"^(?:${trackingParamPatterns.mkString("|")})="

  private val schemeRe = "^[A-Za-z][A-Za-z0-9+.-]*://"

  /** True iff `c` is an absolute hierarchical URL this module
    * canonicalizes (scheme followed by `://`). */
  def isAbsoluteUrl(c: Column): Column = c.rlike(schemeRe)

  // ---- percent-encoding normalization (RFC 3986 §6.2.2.2) ----------

  /** RFC 3986 §6.2.2.2 percent-encoding normalization: every valid
    * `%XY` escape gets UPPERCASE hex, and escapes of UNRESERVED
    * characters (ALPHA / DIGIT / `-` / `.` / `_` / `~`, §2.3) are
    * decoded — `%7Euser`, `%7euser` and `~user` become one key.
    * Escapes of reserved characters stay encoded (decoding `%2F`
    * would change which `/` are path delimiters); a `%` not followed
    * by two hex digits is passed through untouched (crawl reality:
    * unencoded percent signs exist, and normalization must not
    * corrupt them).
    *
    * Shape: one in-row byte pass (the native codegen'd
    * [[graft.plans.PercentNormalize]] expression — the composed
    * split/transform/re-join form evaluated its lambda interpreted
    * per token, ~3× the whole x56 entry's cost). Safe to apply to the
    * whole after-scheme string BEFORE structural parsing: unreserved
    * characters are never URL delimiters, so decoding cannot create a
    * new `/`, `?`, `#`, `@`, `&` or `=`. */
  def percentNormalize(c: Column): Column =
    GraftBridge.column(
      graft.plans.PercentNormalize(GraftBridge.expression(c)))

  /** IDNA ACE form of a host ([[graft.plans.IdnToAscii]]): identity
    * on all-ASCII hosts, punycode on Unicode hosts, input unchanged
    * when IDNA rejects the label shape. */
  def idnAsciiHost(c: Column): Column =
    GraftBridge.column(graft.plans.IdnToAscii(GraftBridge.expression(c)))

  /** Structural pieces every URL consumer derives between "trimmed
    * URL" and "IDNA host": scheme + fragment off, percent-normalize,
    * authority, userinfo off, port split, lowercase, trailing
    * root-dot off, IDNA. ONE construction site — [[hostExpr]] and
    * [[canonicalUrl]] both consume this, so the next RFC rule lands
    * in one place and the two can never drift (they did in r12:
    * two hand-maintained copies of this pipeline). */
  private final case class UrlParts(rest: Column, port: Column,
      hostIdn: Column)

  private def urlParts(t: Column): UrlParts = {
    val rest = percentNormalize(
      regexp_replace(regexp_replace(t, schemeRe, ""), "#.*$", ""))
    val authority = regexp_extract(rest, "^([^/?]*)", 1)
    val hostport = regexp_replace(authority, "^[^@]*@", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val host0 = lower(regexp_replace(hostport, ":[0-9]+$", ""))
    UrlParts(rest, port, idnAsciiHost(regexp_replace(host0, "\\.$", "")))
  }

  /** Shared host pipeline over the trimmed URL. (The leading `www.`
    * strip is the caller's — [[canonicalUrl]] needs the pre-strip
    * form for port logic anyway.) */
  private def hostExpr(t: Column): Column = urlParts(t).hostIdn

  /** Canonical form of an absolute URL, NULL for anything else.
    *
    * Steps, in order: trim; lowercase scheme; drop the fragment;
    * normalize percent-encodings ([[percentNormalize]]); strip
    * userinfo; drop `:80`/`:443` on http/https (other ports kept);
    * lowercase the host, drop a trailing root dot, IDNA-normalize,
    * strip a leading `www.`; collapse duplicate slashes in the path;
    * drop trailing slashes (the empty path becomes `/`); drop
    * tracking parameters ([[trackingParamPatterns]]) and empty
    * parameters; sort the surviving query parameters bytewise; drop
    * an emptied query. */
  def canonicalUrl(url: Column): Column = {
    val t = trim(url)
    val scheme = lower(regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val parts = urlParts(t)
    val (rest, port) = (parts.rest, parts.port)
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val host = regexp_replace(parts.hostIdn, "^www\\.", "")
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val rawPath = regexp_extract(pathq, "^([^?]*)", 1)
    val squashed = regexp_replace(
      regexp_replace(rawPath, "/{2,}", "/"), "/+$", "")
    val path = when(squashed === "", lit("/")).otherwise(squashed)
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingRe)))
    val qs = array_join(params, "&")
    when(isAbsoluteUrl(t),
      concat(scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path,
        when(qs =!= "", concat(lit("?"), qs)).otherwise(lit(""))))
      .otherwise(lit(null).cast("string"))
  }

  /** Host part of a canonical URL (NULL for non-absolute input):
    * [[hostExpr]] plus the leading `www.` strip. Port strip and
    * `www.` strip are SEPARATE replaces: an alternation would need
    * replace-all semantics, which DuckDB's regexp_replace only has
    * with the 'g' flag — anchored single-match replaces are portable
    * by construction. */
  def canonicalHost(url: Column): Column =
    when(isAbsoluteUrl(trim(url)),
      regexp_replace(hostExpr(trim(url)), "^www\\.", ""))
      .otherwise(lit(null).cast("string"))

  // ---- registered domain (public-suffix list semantics) ------------

  /** Rule kinds parsed from a PSL-style entry. */
  private sealed trait PslRule { def raw: String; def labels: Int }
  private final case class Exception_(body: String, raw: String)
      extends PslRule { def labels: Int = body.count(_ == '.') + 1 }
  private final case class Wildcard(body: String, raw: String)
      extends PslRule { def labels: Int = body.count(_ == '.') + 2 }
  private final case class Plain(body: String, raw: String)
      extends PslRule { def labels: Int = body.count(_ == '.') + 1 }

  /** Driver-side mirror of [[graft.plans.IdnToAscii.toAsciiSafe]]:
    * ASCII passthrough, else `IDN.toASCII` lowercased, unchanged when
    * IDNA rejects the shape. Rule bodies MUST take the same IDNA path
    * hosts take — the real publicsuffix.org list carries unicode
    * rules (`公司.cn`, `*.навсегда`...) while hosts arrive already
    * punycoded from [[hostExpr]], so an un-normalized rule can never
    * match anything. */
  private def idnRuleBody(body: String): String =
    if (body.forall(_ < 0x80)) body
    else try java.net.IDN.toASCII(body)
      .toLowerCase(java.util.Locale.ROOT)
    catch { case _: IllegalArgumentException => body }

  private def parseRule(raw: String): PslRule =
    if (raw.startsWith("!")) Exception_(idnRuleBody(raw.drop(1)), raw)
    else if (raw.startsWith("*.")) Wildcard(idnRuleBody(raw.drop(2)), raw)
    else Plain(idnRuleBody(raw), raw)

  /** Evaluation order per the PSL algorithm: exception rules beat
    * everything, then more-specific (more labels, counting a `*` as
    * one) beats less. */
  private def orderedRules(suffixes: Seq[String]): Seq[PslRule] =
    suffixes.map(parseRule).sortBy {
      case r: Exception_ => (0, -r.labels, -r.raw.length)
      case r             => (1, -r.labels, -r.raw.length)
    }

  /** Registrable domain of `host` given the caller's public-suffix
    * list (production pipelines ship the PSL as a config file; this
    * sandbox's fixtures use `example.test`), with full PSL rule
    * semantics (publicsuffix.org/list):
    *
    *   - plain `suffix`: registered domain = suffix plus one label;
    *     a host that IS the suffix returns itself;
    *   - wildcard `*.suffix`: EVERY label directly under `suffix` is
    *     a public suffix, so the registered domain is the last THREE
    *     labels ending in `.suffix`; a two-label `<x>.suffix` host IS
    *     a public suffix and returns itself;
    *   - exception `!host`: carves `host` back out of a wildcard —
    *     `host` is NOT a public suffix, so it (not a label above it)
    *     is the registered domain for itself and everything below.
    *
    * Exceptions are tested first, then rules by label count
    * descending (`*` counts as a label). A host under no listed rule
    * falls back to its last two labels; a dotless host returns
    * itself. */
  def registeredDomain(host: Column, suffixes: Seq[String]): Column = {
    val fallback = when(host.contains("."),
      regexp_extract(host, "([^.]+\\.[^.]+)$", 1)).otherwise(host)
    orderedRules(suffixes).foldRight(fallback) { (rule, acc) =>
      rule match {
        case Exception_(e, _) =>
          when(host === e || host.endsWith("." + e), lit(e)).otherwise(acc)
        case Wildcard(s, _) =>
          val esc = s.replace(".", "\\.")
          when(host.rlike(s"\\.[^.]+\\.$esc$$"),
            regexp_extract(host, s"([^.]+\\.[^.]+\\.$esc)$$", 1))
            .when(host.rlike(s"^[^.]+\\.$esc$$"), host)
            .otherwise(acc)
        case Plain(suf, _) =>
          val esc = suf.replace(".", "\\.")
          when(host === suf, host)
            .when(host.endsWith("." + suf),
              regexp_extract(host, s"([^.]+\\.$esc)$$", 1))
            .otherwise(acc)
      }
    }
  }

  /** Parse the publicsuffix.org file format (publicsuffix.org/list):
    * one rule per line, `//` comment lines skipped (the ICANN/PRIVATE
    * section markers are comments), blank lines skipped, anything
    * after whitespace on a rule line ignored (the format allows
    * trailing comments), rules lower-cased (the list is defined on
    * lower-case; hosts arrive lower-cased from [[hostExpr]]). File
    * order is irrelevant — evaluation order is the PSL algorithm's. */
  def parsePslFile(text: String): Seq[String] =
    text.linesIterator
      .map(l => l.trim.takeWhile(!_.isWhitespace))
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map(_.toLowerCase(java.util.Locale.ROOT))
      .toSeq

  def parsePslFile(path: java.nio.file.Path): Seq[String] =
    parsePslFile(java.nio.file.Files.readString(path))

  /** Registrable domain via a broadcast rule-table join — the at-scale
    * form of [[registeredDomain]] for the real ~9k-rule PSL. The
    * expression form is NOT viable there: measured, its per-rule fold
    * overflows the analyzer stack at ~300 rules (nested-Column
    * conversion recurses per arm), two orders of magnitude below the
    * list publicsuffix.org ships — and even below that ceiling every
    * row pays a linear walk of the arms. Identical semantics,
    * different shape:
    *
    *  1. each DISTINCT host explodes into its dot-suffix chain
    *     (≤ label-count rows, generated in-row — never a corpus-wide
    *     tokenize), each candidate carrying its parent suffix;
    *  2. ONE broadcast equi-join matches candidates against the rule
    *     table — plain/exception rules key on the candidate itself,
    *     wildcard rules on the candidate's parent (`*.b` ⟺ the
    *     candidate is exactly one label over `b`);
    *  3. the prevailing rule per host is a lexicographic struct-min
    *     (exception beats, then most labels, then longest raw rule —
    *     [[orderedRules]]' exact key), carrying the public-suffix
    *     label count;
    *  4. the registered domain is the host's last `ps + 1` labels
    *     (capped at the host itself), unmatched hosts falling back to
    *     the last two labels — the same arithmetic every rule kind of
    *     [[registeredDomain]] reduces to.
    *
    * The corpus pays one host-keyed shuffle (the distinct) and one
    * host-equi join back; the rule table is KBs and broadcasts. */
  def withRegisteredDomain(df: DataFrame, hostCol: String,
      rules: Seq[String], outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ruleRows = rules.map(parseRule).map {
      case r @ Exception_(b, raw) =>
        (b, "exact", 0, r.labels, raw.length, b.count(_ == '.'))
      case r @ Wildcard(b, raw) =>
        (b, "parent", 1, r.labels, raw.length, b.count(_ == '.') + 2)
      case r @ Plain(b, raw) =>
        (b, "exact", 1, r.labels, raw.length, b.count(_ == '.') + 1)
    }.toDF("key", "mode", "exc", "rule_labels", "raw_len", "ps_labels")
    val host = col(hostCol)
    val labels = split(col("h"), "\\.")
    // BOTH key kinds generate from ONE in-row pass over the suffix
    // chain: each candidate yields its exact key plus (when it has a
    // parent) its parent key. The earlier two-arm union of a shared
    // `cands` frame re-computed the distinct-host aggregate per arm —
    // the differing per-arm filters defeat Catalyst's exchange reuse —
    // so the distinct-host table scanned twice; one flatten'd explode
    // scans it once. The (mode, key) keying itself is what keeps the
    // rule match a pure BroadcastHashJoin — an OR-of-modes condition
    // would plan as a BroadcastNestedLoopJoin, a linear rule walk per
    // candidate.
    val keyed = hosts(df, hostCol)
      .select(col("h"), explode(flatten(transform(
        transform(sequence(lit(1), size(labels)),
          i => array_join(slice(labels, i, size(labels) - i + 1), ".")),
        c => {
          val par = regexp_replace(c, "^[^.]+\\.", "")
          val exact = struct(lit("exact").as("mode"), c.as("key"))
          when(par =!= c,
            array(exact, struct(lit("parent").as("mode"),
              par.as("key"))))
            .otherwise(array(exact))
        }))).as("mk"))
      .select(col("h"), col("mk.mode").as("mode"), col("mk.key").as("key"))
    val matched = keyed.join(broadcast(ruleRows), Seq("mode", "key"))
    val win = matched.groupBy(col("h"))
      .agg(min(struct(col("exc").as("x"),
        (-col("rule_labels")).as("nl"), (-col("raw_len")).as("nr"),
        col("ps_labels"))).as("w"))
      .select(col("h").as("__rd_h"), col("w.ps_labels").as("__rd_ps"))
    val n = size(split(host, "\\."))
    val keep = least(col("__rd_ps") + 1, n)
    val fallback = when(host.contains("."),
      regexp_extract(host, "([^.]+\\.[^.]+)$", 1)).otherwise(host)
    df.join(win, host === col("__rd_h"), "left")
      .withColumn(outCol, when(col("__rd_ps").isNull, fallback)
        .otherwise(array_join(slice(split(host, "\\."), -keep, keep),
          ".")))
      .drop("__rd_h", "__rd_ps")
  }

  private def hosts(df: DataFrame, hostCol: String): DataFrame =
    df.select(col(hostCol).as("h")).where(col("h").isNotNull).distinct()

  // ---- DuckDB twins (generated from the same constants) ------------

  /** DuckDB twin of [[percentNormalize]] over SQL expression `e`:
    * same split-on-`%`, same per-escape CASE. Hex is parsed via
    * strpos into a 16-char digit table (DuckDB 1.0 has no conv);
    * both engines compare on the final STRING, so the parse route
    * is free to differ. */
  def percentNormalizeSql(e: String): String = {
    val v = "((strpos('0123456789abcdef', lower(substr(x, 1, 1))) - 1) " +
      "* 16 + strpos('0123456789abcdef', lower(substr(x, 2, 1))) - 1)"
    val unres = s"($v BETWEEN 65 AND 90 OR $v BETWEEN 97 AND 122 " +
      s"OR $v BETWEEN 48 AND 57 OR $v IN (45, 46, 95, 126))"
    // coalesce: DuckDB 1.0's array_to_string([], '') is NULL (Spark's
    // array_join on an empty array is ''), and '||' propagates it
    s"(string_split($e, '%')[1] || coalesce(array_to_string(" +
      s"list_transform(string_split($e, '%')[2:], x -> " +
      s"CASE WHEN NOT regexp_matches(x, '^[0-9A-Fa-f]{2}') THEN '%' || x " +
      s"WHEN $unres THEN chr(CAST($v AS INTEGER)) || substr(x, 3) " +
      s"ELSE '%' || upper(substr(x, 1, 2)) || substr(x, 3) END), ''), ''))"
  }

  /** DuckDB twin of [[canonicalUrl]] over SQL expression `e`. Kept as
    * one readable CTE-free expression via nested replaces — the
    * oracle's job is bit-equality, not elegance. (No IDNA twin: the
    * expression is identity on the ASCII hosts oracle fixtures use.) */
  def canonicalUrlSql(e: String): String = {
    val t = s"trim($e)"
    val rest = percentNormalizeSql(
      s"regexp_replace(regexp_replace($t, '$schemeRe', ''), '#.*$$', '')")
    val hostport =
      s"regexp_replace(regexp_extract($rest, '^([^/?]*)', 1), '^[^@]*@', '')"
    val pathq = s"regexp_replace($rest, '^[^/?]*', '')"
    val scheme = s"lower(regexp_extract($t, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val port = s"regexp_extract($hostport, ':([0-9]+)$$', 1)"
    val host = s"regexp_replace(regexp_replace(lower(regexp_replace(" +
      s"$hostport, ':[0-9]+$$', '')), '\\.$$', ''), '^www\\.', '')"
    val squashed =
      s"regexp_replace(regexp_replace(regexp_extract($pathq, '^([^?]*)', 1), '/{2,}', '/', 'g'), '/+$$', '')"
    val path = s"CASE WHEN $squashed = '' THEN '/' ELSE $squashed END"
    val qs = "array_to_string(list_sort(list_filter(string_split(" +
      s"regexp_extract($pathq, '\\?(.*)$$', 1), '&'), " +
      s"p -> p <> '' AND NOT regexp_matches(p, '$trackingRe'))), '&')"
    s"""CASE WHEN regexp_matches($t, '$schemeRe') THEN
       |  $scheme || '://' || $host ||
       |  CASE WHEN $port <> '' AND NOT (($scheme = 'http' AND $port = '80')
       |         OR ($scheme = 'https' AND $port = '443'))
       |       THEN ':' || $port ELSE '' END ||
       |  $path ||
       |  CASE WHEN $qs <> '' THEN '?' || $qs ELSE '' END
       |ELSE NULL END""".stripMargin
  }

  /** DuckDB twin of [[canonicalHost]] over SQL expression `e`. */
  def canonicalHostSql(e: String): String = {
    val t = s"trim($e)"
    val rest = percentNormalizeSql(
      s"regexp_replace(regexp_replace($t, '$schemeRe', ''), '#.*$$', '')")
    val auth = s"regexp_extract($rest, '^([^/?]*)', 1)"
    s"""CASE WHEN regexp_matches($t, '$schemeRe') THEN
       |  regexp_replace(regexp_replace(regexp_replace(
       |    lower(regexp_replace($auth, '^[^@]*@', '')),
       |    ':[0-9]+$$', ''), '\\.$$', ''), '^www\\.', '')
       |ELSE NULL END""".stripMargin
  }

  /** DuckDB twin of [[registeredDomain]] over SQL expression `e` —
    * same rule parse, same evaluation order. */
  def registeredDomainSql(e: String, suffixes: Seq[String]): String = {
    val arms = orderedRules(suffixes).map {
      case Exception_(x, _) =>
        s"""WHEN $e = '$x' OR $e LIKE '%.$x' THEN '$x'""".stripMargin
      case Wildcard(s, _) =>
        val esc = s.replace(".", "\\.")
        s"""WHEN regexp_matches($e, '\\.[^.]+\\.$esc$$')
           |  THEN regexp_extract($e, '([^.]+\\.[^.]+\\.$esc)$$', 1)
           |WHEN regexp_matches($e, '^[^.]+\\.$esc$$') THEN $e""".stripMargin
      case Plain(suf, _) =>
        val esc = suf.replace(".", "\\.")
        s"""WHEN $e = '$suf' THEN $e
           |WHEN $e LIKE '%.$suf'
           |  THEN regexp_extract($e, '([^.]+\\.$esc)$$', 1)""".stripMargin
    }.mkString("\n")
    s"""CASE $arms
       |WHEN contains($e, '.') THEN regexp_extract($e, '([^.]+\\.[^.]+)$$', 1)
       |ELSE $e END""".stripMargin
  }

  // ---- robots.txt (RFC 9309) ---------------------------------------

  /** Line-parse regexes shared by the Spark fold and the DuckDB twin:
    * field names are case-insensitive, a trailing `#` comment and a
    * stray CR are stripped before parsing, surrounding blanks around
    * `:` are ignored. Only the three RFC 9309 fields matter; unknown
    * lines pass through as no-ops (the spec requires ignoring them). */
  private val robotsFieldRe = "(?i)^([a-z-]+)[ \t]*:"
  private val robotsValueRe = "(?i)^[a-z-]+[ \t]*:[ \t]*"

  private def robotsCleanLine(l: Column): Column =
    trim(regexp_replace(regexp_replace(l, "\r", ""), "#.*$", ""))

  /** Applicable rule group of a robots.txt BODY for `userAgent`, per
    * RFC 9309 §2.2.1: consecutive `User-agent:` lines form one group
    * header; a group applies when any header token matches the
    * crawler's token (case-insensitive) — all matching groups MERGE;
    * when no group matches, the `*` groups apply; rules before any
    * header belong to no group. Empty-pattern rules (`Disallow:` with
    * no value = "no restriction") are dropped at parse.
    *
    * Returns `array<struct<p: string, a: boolean>>` (pattern,
    * is-allow), computed as ONE in-row `aggregate` fold over the
    * body's lines — a robots body is KBs, so the parse is a narrow
    * projection on the (tiny) per-host robots table, parsed once per
    * host and broadcast to the URL corpus; page/URL rows never carry
    * the body. */
  def robotsGroup(body: Column, userAgent: String): Column = {
    val emptyRules = array().cast("array<struct<p:string,a:boolean>>")
    val init = struct(
      lit(false).as("hdr"),       // inside a group header
      lit(false).as("app"),       // current group names our UA
      lit(false).as("star"),      // current group names *
      lit(false).as("saw"),       // any group named our UA
      emptyRules.as("re"),        // merged rules of matching groups
      emptyRules.as("rs"))        // merged rules of * groups
    val folded = aggregate(
      split(body, "\n"),
      init,
      (acc, line) => {
        val l = robotsCleanLine(line)
        val fld = lower(regexp_extract(l, robotsFieldRe, 1))
        val v = trim(regexp_replace(l, robotsValueRe, ""))
        val isUa = fld === "user-agent"
        // an allow/disallow LINE closes the header even when its empty
        // value contributes no rule (RFC 9309: "Disallow:" with no
        // value = no restriction, but it is still a rule line; blank
        // and unknown lines are no-ops and do NOT close the header —
        // the grammar allows empty lines inside a header sequence)
        val isRuleLine = fld.isin("allow", "disallow")
        val uaHit = lower(v) === lit(userAgent.toLowerCase(
          java.util.Locale.ROOT))
        val starHit = v === "*"
        val rule = struct(v.as("p"), (fld === "allow").as("a"))
        when(isUa, struct(
          lit(true).as("hdr"),
          // a header line EXTENDS the current header or STARTS a new
          // group (resetting applicability) depending on acc.hdr
          when(acc.getField("hdr"), acc.getField("app") || uaHit)
            .otherwise(uaHit).as("app"),
          when(acc.getField("hdr"), acc.getField("star") || starHit)
            .otherwise(starHit).as("star"),
          (acc.getField("saw") || uaHit).as("saw"),
          acc.getField("re").as("re"),
          acc.getField("rs").as("rs")))
        .when(isRuleLine, struct(
          lit(false).as("hdr"),
          acc.getField("app").as("app"),
          acc.getField("star").as("star"),
          acc.getField("saw").as("saw"),
          when(acc.getField("app") && v =!= "",
            array_append(acc.getField("re"), rule))
            .otherwise(acc.getField("re")).as("re"),
          when(acc.getField("star") && v =!= "",
            array_append(acc.getField("rs"), rule))
            .otherwise(acc.getField("rs")).as("rs")))
        .otherwise(acc)
      })
    when(folded.getField("saw"), folded.getField("re"))
      .otherwise(folded.getField("rs"))
  }

  /** LIKE-pattern translation of an RFC 9309 path pattern (shared
    * recipe, both engines): `*` matches any octet sequence, a TRAILING
    * `$` anchors the end, everything else is literal; without `$` the
    * pattern is a prefix match (trailing `%`). Escape char is `\`. */
  private def robotsLikePattern(core: Column, endsDollar: Column)
      : Column = {
    val esc = replace(replace(replace(core,
      lit("\\"), lit("\\\\")), lit("%"), lit("\\%")), lit("_"), lit("\\_"))
    concat(replace(esc, lit("*"), lit("%")),
      when(endsDollar, lit("")).otherwise(lit("%")))
  }

  /** RFC 9309 §2.2.2 access decision for `path` under `rules` (the
    * array [[robotsGroup]] returns): the MOST SPECIFIC matching rule
    * wins — specificity is the raw pattern's octet length — and an
    * Allow beats a Disallow of equal length; no matching rule means
    * allowed. Ties beyond (length, kind) break on the pattern string
    * (descending) so the winner is total cross-engine. Returns
    * `struct<allowed: boolean, win_len: bigint, win_p: string>`
    * (win_len = -1, win_p = '' when nothing matches) — one in-row
    * fold over the (dozens at most) rules, no shuffle, no regex:
    * pattern matching is LIKE with `*`→`%`, so there is no per-row
    * regex compilation on the corpus side. */
  def robotsDecision(path: Column, rules: Column): Column = {
    val init = struct(lit(-1).as("len"), lit(1).as("a"), lit("").as("p"))
    val win = aggregate(rules, init, (acc, r) => {
      val p = r.getField("p")
      val endsD = p.endsWith("$")
      val core = when(endsD, p.substr(lit(1), length(p) - 1)).otherwise(p)
      val hit = like(path, robotsLikePattern(core, endsD), lit("\\"))
      val cand = struct(length(p).as("len"),
        r.getField("a").cast("int").as("a"), p.as("p"))
      when(hit, greatest(acc, cand)).otherwise(acc)
    })
    struct(
      (win.getField("len") === -1 || win.getField("a") === 1)
        .as("allowed"),
      win.getField("len").cast("long").as("win_len"),
      win.getField("p").as("win_p"))
  }

  /** DuckDB twin of [[robotsGroup]] + [[robotsDecision]], taking the
    * INDEPENDENT relational route (the cross-algorithm gate): lines
    * unnest with ordinality, group blocks via a lag/running-sum
    * window (a block starts at each non-header→header transition),
    * per-block applicability via bool_or, rule selection via the
    * saw-exact switch, and the longest-match decision as a
    * row_number over (length DESC, allow DESC, pattern DESC). Emits
    * CTEs ending in `<out>(kind, p, a)` — the applicable rules per
    * robots `kind` from `robotsSrc(kind, body)`. */
  def robotsRulesSqlCtes(robotsSrc: String, userAgent: String,
      out: String): String = {
    val ua = userAgent.toLowerCase(java.util.Locale.ROOT)
    s"""${out}_lines AS (
       |  SELECT kind, unnest(range(1, len(ls) + 1)) AS i,
       |    unnest(list_transform(ls, x -> trim(regexp_replace(
       |      regexp_replace(x, '\r', ''), '#.*$$', '')))) AS l
       |  FROM (SELECT kind, string_split(body, chr(10)) AS ls
       |        FROM $robotsSrc)),
       |${out}_parsed AS (
       |  SELECT kind, i,
       |    lower(regexp_extract(l, '$robotsFieldRe', 1)) AS fld,
       |    trim(regexp_replace(l, '$robotsValueRe', '')) AS val
       |  FROM ${out}_lines),
       |${out}_marked AS (
       |  -- blank/unknown lines are no-ops that must NOT split a header
       |  -- (RFC 9309 grammar allows empty lines inside the header
       |  -- sequence), so only ua/rule lines survive to block detection
       |  SELECT kind, i, fld, val, (fld = 'user-agent') AS isua
       |  FROM ${out}_parsed
       |  WHERE fld IN ('user-agent', 'allow', 'disallow')),
       |${out}_hdr AS (
       |  -- DuckDB forbids nesting lag inside sum: two window passes
       |  SELECT kind, i, fld, val, isua,
       |    CASE WHEN isua AND NOT coalesce(
       |        lag(isua) OVER (PARTITION BY kind ORDER BY i), false)
       |      THEN 1 ELSE 0 END AS hdrstart
       |  FROM ${out}_marked),
       |${out}_blk AS (
       |  SELECT kind, i, fld, val, isua,
       |    sum(hdrstart) OVER (PARTITION BY kind ORDER BY i
       |                        ROWS UNBOUNDED PRECEDING) AS b
       |  FROM ${out}_hdr),
       |${out}_grp AS (
       |  SELECT kind, b,
       |    bool_or(isua AND lower(val) = '$ua') AS ex,
       |    bool_or(isua AND val = '*') AS st
       |  FROM ${out}_blk GROUP BY kind, b),
       |${out}_saw AS (
       |  SELECT kind, bool_or(ex) AS saw FROM ${out}_grp GROUP BY kind),
       |$out AS (
       |  SELECT r.kind, r.val AS p, (r.fld = 'allow') AS a
       |  FROM ${out}_blk r
       |  JOIN ${out}_grp g ON r.kind = g.kind AND r.b = g.b
       |  JOIN ${out}_saw s ON r.kind = s.kind
       |  WHERE NOT r.isua AND r.val <> ''
       |    AND (CASE WHEN s.saw THEN g.ex ELSE g.st END))"""
      .stripMargin
  }

  /** DuckDB twin of [[robotsDecision]] over per-row `path` joined to
    * `rulesRel(kind, p, a)`: same LIKE translation, same
    * (length, allow, pattern) winner key. Emits the SELECT-list
    * expressions given the winner columns `wp`/`wa` (NULL when no
    * rule matched). */
  def robotsLikeSql(core: String, endsDollar: String): String =
    s"replace(replace(replace(replace($core, '\\', '\\\\'), " +
      s"'%', '\\%'), '_', '\\_'), '*', '%') || " +
      s"(CASE WHEN $endsDollar THEN '' ELSE '%' END)"

  // ---- HTML text + outlink extraction ------------------------------

  /** The crawl-ingest stage BEFORE every text operator in this
    * library: a fetched page is markup, and quality scoring, dedup
    * keys, language ID and token counts over raw HTML measure the
    * boilerplate, not the document. RE2 has no backreferences, so
    * script and style containers are removed by two separate
    * container-specific passes instead of one `<(script|style)>.*?
    * </\1>` alternation (which would let `<script>...</style>`
    * cross-match); containers go FIRST so their payload (which
    * legitimately contains `<`, `>` and quotes — `if (x < 2)`) never
    * reaches the generic tag strip. */
  private val scriptRe = "(?is)<script\\b[^>]*>.*?</script\\s*>"
  private val styleRe = "(?is)<style\\b[^>]*>.*?</style\\s*>"
  private val commentRe = "(?s)<!--.*?-->"
  private val tagRe = "<[^>]*>"

  /** Double-quoted `href` targets of anchor tags (group 1). */
  private val hrefRe = "(?i)<a\\b[^>]*\\bhref\\s*=\\s*\"([^\"]*)\""

  /** Entity decodes, in application order — `&amp;` LAST, the
    * standard order that keeps `&amp;lt;` from double-decoding into
    * `<`. The six cover the entities non-XML crawl text actually
    * uses; unknown entities pass through as text. */
  private val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** Visible text of an HTML page: drop script/style containers with
    * their payload, drop comments, replace every remaining tag with a
    * space, decode the common entities, collapse whitespace. A chain
    * of codegen'd replaces — narrow, zero shuffle, runs where the
    * page bytes already are; at 100 TB this is the projection that
    * turns a crawl table into the `text` column every downstream
    * operator (x1/x8/x9/x21...) consumes. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, scriptRe, " ")
    val noStyle = regexp_replace(noScript, styleRe, " ")
    val noComment = regexp_replace(noStyle, commentRe, " ")
    val noTags = regexp_replace(noComment, tagRe, " ")
    val decoded = htmlEntities.foldLeft(noTags) {
      case (c, (ent, ch)) => replace(c, lit(ent), lit(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Outlink targets (double-quoted anchor hrefs, document order) —
    * the edge-extraction step that feeds URL canonicalization
    * ([[canonicalUrl]]), per-domain quotas and the x55 link graph.
    * Script containers and comments are stripped first so
    * commented-out or script-embedded markup never contributes
    * edges. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(
      regexp_replace(regexp_replace(html, scriptRe, " "), commentRe, " "),
      lit(hrefRe), lit(1))

  /** Whole anchor elements (open tag through close tag) and the
    * href attribute within one, for [[extractAnchors]]. */
  private val anchorRe = "(?is)<a\\b[^>]*>.*?</a\\s*>"
  private val hrefAttrRe = "(?i)href\\s*=\\s*\"([^\"]*)\""

  /** (href, anchor text) pairs of a page's anchors, document order —
    * the inbound-description signal: aggregated per canonical TARGET,
    * anchor text is how the rest of the web describes a page (the
    * classic ranking/retrieval-training signal that the page's own
    * text cannot provide). Script containers and comments strip
    * first, as in [[extractLinks]]; anchor text is the element's
    * tag-stripped, whitespace-collapsed payload. Returns
    * `array<struct<href, anchor>>` — explode, canonicalize href with
    * [[canonicalUrl]], and group by the canonical target (one
    * short-string shuffle; the page bytes stay put). */
  def extractAnchors(html: Column): Column = {
    val stripped =
      regexp_replace(regexp_replace(html, scriptRe, " "), commentRe, " ")
    transform(regexp_extract_all(stripped, lit(anchorRe), lit(0)),
      e => struct(
        regexp_extract(e, hrefAttrRe, 1).as("href"),
        trim(regexp_replace(regexp_replace(e, tagRe, " "), "\\s+", " "))
          .as("anchor")))
  }

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB twin of [[htmlToText]] over SQL expression `e` — same
    * regex constants, same entity order; DuckDB needs the explicit
    * 'g' flag for replace-all. */
  def htmlToTextSql(e: String): String = {
    val noScript = s"regexp_replace($e, ${sq(scriptRe)}, ' ', 'g')"
    val noStyle = s"regexp_replace($noScript, ${sq(styleRe)}, ' ', 'g')"
    val noComment = s"regexp_replace($noStyle, ${sq(commentRe)}, ' ', 'g')"
    val noTags = s"regexp_replace($noComment, ${sq(tagRe)}, ' ', 'g')"
    val decoded = htmlEntities.foldLeft(noTags) {
      case (c, (ent, ch)) => s"replace($c, ${sq(ent)}, ${sq(ch)})"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  /** DuckDB twin of [[extractLinks]] over SQL expression `e`. */
  def extractLinksSql(e: String): String =
    s"regexp_extract_all(regexp_replace(regexp_replace($e, " +
      s"${sq(scriptRe)}, ' ', 'g'), ${sq(commentRe)}, ' ', 'g'), " +
      s"${sq(hrefRe)}, 1)"

  /** DuckDB twin of [[extractAnchors]] over SQL expression `e` —
    * same constants; returns `list<struct(href, anchor)>`. */
  def extractAnchorsSql(e: String): String = {
    val stripped = s"regexp_replace(regexp_replace($e, " +
      s"${sq(scriptRe)}, ' ', 'g'), ${sq(commentRe)}, ' ', 'g')"
    s"list_transform(regexp_extract_all($stripped, ${sq(anchorRe)}), " +
      s"x -> struct_pack(href := regexp_extract(x, ${sq(hrefAttrRe)}, 1), " +
      s"anchor := trim(regexp_replace(regexp_replace(x, ${sq(tagRe)}, " +
      s"' ', 'g'), '\\s+', ' ', 'g'))))"
  }
}
