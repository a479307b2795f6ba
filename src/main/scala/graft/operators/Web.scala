package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawl-curation URL handling: canonicalization and registered-domain
  * extraction — the keying step every web-scale corpus pipeline runs
  * before URL-level dedup, per-domain quotas (x30) and link-graph
  * construction (x55). Canonicalization follows RFC 3986 §6
  * (case normalization of scheme/host, default-port elision) plus the
  * de-facto crawl extensions: fragment drop, userinfo strip,
  * tracking-parameter removal, query-parameter sort, duplicate-slash
  * collapse and trailing-slash normalization.
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
  * replace-all semantics matter.
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

  /** Canonical form of an absolute URL, NULL for anything else.
    *
    * Steps, in order: trim; lowercase scheme and host; strip
    * userinfo; drop the fragment; drop `:80`/`:443` on http/https
    * (other ports kept); strip a leading `www.`; collapse duplicate
    * slashes in the path; drop trailing slashes (the empty path
    * becomes `/`); drop tracking parameters
    * ([[trackingParamPatterns]]) and empty parameters; sort the
    * surviving query parameters bytewise; drop an emptied query. */
  def canonicalUrl(url: Column): Column = {
    val t = trim(url)
    val scheme = lower(regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // everything after ://, fragment dropped
    val rest = regexp_replace(regexp_replace(t, schemeRe, ""), "#.*$", "")
    val authority = regexp_extract(rest, "^([^/?]*)", 1)
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val hostport = regexp_replace(authority, "^[^@]*@", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val host0 = lower(regexp_replace(hostport, ":[0-9]+$", ""))
    val host = regexp_replace(host0, "^www\\.", "")
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

  /** Host part of a canonical URL (NULL for non-absolute input).
    * Port strip and `www.` strip are two SEPARATE replaces: an
    * alternation would need replace-all semantics, which DuckDB's
    * regexp_replace only has with the 'g' flag — two anchored
    * single-match replaces are portable by construction. */
  def canonicalHost(url: Column): Column =
    when(isAbsoluteUrl(trim(url)),
      regexp_replace(
        regexp_replace(
          lower(regexp_replace(
            regexp_extract(regexp_replace(trim(url), schemeRe, ""),
              "^([^/?#]*)", 1),
            "^[^@]*@", "")),
          ":[0-9]+$", ""),
        "^www\\.", ""))
      .otherwise(lit(null).cast("string"))

  /** Registrable domain of `host` given the caller's public-suffix
    * list (production pipelines ship the PSL as a config file; this
    * sandbox's fixtures use `example.test`). Longest-suffix-wins:
    * the registered domain is the suffix plus one label. A host that
    * IS a listed suffix, or has no dot at all, returns itself; a
    * host under no listed suffix falls back to its last two labels. */
  def registeredDomain(host: Column, suffixes: Seq[String]): Column = {
    val ordered = suffixes.sortBy(s => (-s.count(_ == '.'), -s.length))
    val fallback = when(host.contains("."),
      regexp_extract(host, "([^.]+\\.[^.]+)$", 1)).otherwise(host)
    ordered.foldRight(fallback) { (suf, acc) =>
      val esc = suf.replace(".", "\\.")
      when(host === suf, host)
        .when(host.endsWith("." + suf),
          regexp_extract(host, s"([^.]+\\.$esc)$$", 1))
        .otherwise(acc)
    }
  }

  // ---- DuckDB twins (generated from the same constants) ------------

  /** DuckDB twin of [[canonicalUrl]] over SQL expression `e`. Kept as
    * one readable CTE-free expression via nested replaces — the
    * oracle's job is bit-equality, not elegance. */
  def canonicalUrlSql(e: String): String = {
    val t = s"trim($e)"
    val rest =
      s"regexp_replace(regexp_replace($t, '$schemeRe', ''), '#.*$$', '')"
    val hostport =
      s"regexp_replace(regexp_extract($rest, '^([^/?]*)', 1), '^[^@]*@', '')"
    val pathq = s"regexp_replace($rest, '^[^/?]*', '')"
    val scheme = s"lower(regexp_extract($t, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val port = s"regexp_extract($hostport, ':([0-9]+)$$', 1)"
    val host = s"regexp_replace(lower(regexp_replace($hostport, ':[0-9]+$$', '')), '^www\\.', '')"
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
    val auth = s"regexp_extract(regexp_replace($t, '$schemeRe', ''), '^([^/?#]*)', 1)"
    s"""CASE WHEN regexp_matches($t, '$schemeRe') THEN
       |  regexp_replace(regexp_replace(
       |    lower(regexp_replace($auth, '^[^@]*@', '')),
       |    ':[0-9]+$$', ''), '^www\\.', '')
       |ELSE NULL END""".stripMargin
  }

  /** DuckDB twin of [[registeredDomain]] over SQL expression `e`. */
  def registeredDomainSql(e: String, suffixes: Seq[String]): String = {
    val ordered = suffixes.sortBy(s => (-s.count(_ == '.'), -s.length))
    val arms = ordered.map { suf =>
      val esc = suf.replace(".", "\\.")
      s"""WHEN $e = '$suf' THEN $e
         |WHEN $e LIKE '%.$suf'
         |  THEN regexp_extract($e, '([^.]+\\.$esc)$$', 1)""".stripMargin
    }.mkString("\n")
    s"""CASE $arms
       |WHEN contains($e, '.') THEN regexp_extract($e, '([^.]+\\.[^.]+)$$', 1)
       |ELSE $e END""".stripMargin
  }
}
