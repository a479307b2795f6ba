package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StringType, StructType}

import graft.catalog.Warehouse
import graft.functions.SketchFunctions
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.operators.{Corpus, Dedup, LanguageModel, Layout, Relational, Retrieval, Sampling, Similarity, TextAnalysis}
import graft.sources.Tables

/** Shared helpers and fixtures of the extension-catalog slice files —
  * scratch-table lifecycle, trained-ANN memoization, DuckDB twin
  * fragments (quality metrics, language-ID chains, cluster CTEs) and
  * per-entry fixture constants. Split out of the single-file
  * ExtensionQueries in r15; one object so session-scoped state
  * (scratch cleanup hooks, the ANN train memo) stays a single
  * instance across the slices.
  */
private[queries] object ExtensionSupport {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Materialize an intermediate to a parquet scratch table under
    * target/ and read it back — the entry-level answer to "this
    * subtree feeds N consumers, including the RETURNED plan". A
    * persist() released in the builder dies before the harness
    * executes the returned frame (the r12 x70 recompute finding),
    * and one left unreleased leaks across a 186-entry suite; a
    * written table serves every consumer — in-entry REQUIRE gates,
    * the returned plan, and the driver's re-execution — from ONE
    * compute. At 100 TB this is the real design too: heavy reusable
    * intermediates (set indexes, pair tables, token frames) are
    * artifacts, not lineage. */
  def scratch(df: DataFrame, name: String): DataFrame = {
    // namespaced by the Spark application id: two concurrent graft
    // JVMs (a CatalogSpec sweep beside a Verify dump, at possibly
    // DIFFERENT SFs) would otherwise overwrite each other's table
    // mid-read — FileNotFound at best, the other run's SF data in a
    // hash gate at worst. The per-app dir is reclaimed at JVM exit by
    // a shutdown hook (at the 100 TB analog these are temp tables an
    // orphan sweep would otherwise have to find), with total scratch
    // bytes logged so the artifact cost is a measured line item.
    val appDir = java.nio.file.Paths.get("target", "scratch",
      df.sparkSession.sparkContext.applicationId).toAbsolutePath
    registerCleanup(appDir)
    val dir = appDir.resolve(name).toString
    df.write.mode("overwrite").parquet(dir)
    df.sparkSession.read.parquet(dir)
  }

  /** Read LONG metrics off an Observation whose frame went through
    * [[scratch]] (the write is the completing action) — the audit
    * scalars ride the materialization job instead of each paying a
    * separate collect job over the scratch table (the x19/x73
    * observe pattern applied to entry audits; guide §1.2: fewer
    * passes). A null metric (zero observed rows) reads as 0, matching
    * `agg(...).collect()` semantics under the entries' REQUIREs.
    *
    * CAVEAT (r17 ADVICE): null→0 is only faithful for sum/count-style
    * metrics, where an empty group genuinely IS 0. For max/min-style
    * metrics (x90's keptMax/loserMin) null means "no matching rows"
    * and 0 is a FABRICATED value — callers must guarantee a non-empty
    * group before trusting such a metric (x90's sKept-range REQUIRE
    * runs first and does exactly that; keep that ordering when
    * reusing this helper). */
  def observedLongs(obs: org.apache.spark.sql.Observation,
      keys: String*): Seq[Long] = {
    val m = org.apache.spark.sql.GraftBridge.observedOrEmpty(obs)
    require(m.nonEmpty,
      "observed audit metrics did not materialize with the scratch write")
    keys.map(k => m(k) match {
      case null => 0L
      case v: java.lang.Long => v.longValue()
      case other => throw new IllegalStateException(
        s"audit metric $k is not a long: $other")
    })
  }

  /** One shutdown hook per app-scratch dir: deletes the dir at JVM
    * exit and logs its final size. Registered lazily on first use so
    * runs that never scratch pay nothing. */
  val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  def registerCleanup(appDir: java.nio.file.Path): Unit =
    if (cleanupRegistered.add(appDir))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.exists(appDir)) {
          val files = java.nio.file.Files.walk(appDir)
            .sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.toSeq
          val bytes = files.map(p =>
            try { if (java.nio.file.Files.isRegularFile(p))
              java.nio.file.Files.size(p) else 0L }
            catch { case _: java.io.IOException => 0L }).sum
          files.foreach(p =>
            try java.nio.file.Files.deleteIfExists(p)
            catch { case _: java.io.IOException => () })
          // stdout, not a logger: hooks run after log4j may have shut down
          println(s"[graft-scratch] reclaimed $appDir ($bytes bytes)")
        }
      }, s"graft-scratch-cleanup"))

  /** Clean form of the x58 mojibake-fixture suffix (é ñ ü ö — all
    * Latin-1-representable, so one mis-decode step is exactly
    * invertible); the corrupted twin is DERIVED from it via the same
    * UTF-8-bytes-read-as-Latin-1 transform on both engines' sides,
    * so the fixture and oracle cannot drift. */
  val MOJIBAKE_CLEAN_SUFFIX =
    " café señor über schön"

  /** Composed (NFC) core of the x60 fixture suffix; the decomposed
    * twin is DERIVED from it via `Normalizer` NFD — so fixture and
    * expectation cannot drift — plus two canonical singletons
    * (U+212B ANGSTROM SIGN, U+2126 OHM SIGN) that NFC folds to
    * U+00C5/U+03A9, exercising composition-exclusion handling beyond
    * plain combining-mark composition. */
  val NFC_CLEAN_SUFFIX = " café España über naïve"
  val NFD_CORRUPT_SUFFIX =
    java.text.Normalizer.normalize(
      NFC_CLEAN_SUFFIX, java.text.Normalizer.Form.NFD) + " \u212B\u2126"

  /** Trainer-scan cache for the PQ/IVF eval queries: persists the
    * (id, vec) projection the trainers re-read every Lloyd iteration
    * (2 trainers × (1 init + iters) scans in the ADC paths), then
    * releases it before the returned plan is consumed — training runs
    * EAGERLY inside the query builder, so by the time `body` returns
    * the cache has served every scan it can; the final lazy frame
    * recomputes from source with full lineage. Callers that want the
    * cache to outlive training manage persistence themselves. */
  def withTrainerCache[A](body: (DataFrame => DataFrame) => A): A = {
    val cached = new java.util.concurrent.atomic.AtomicReference[Option[DataFrame]](None)
    val hook = (df: DataFrame) => {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached.set(Some(p)); p
    }
    try body(hook)
    finally cached.get.foreach(_.unpersist(false))
  }

  /** Per-JVM memo of deterministic WET fixture dumps (x81/x90): the
    * dump is a pure function of the SF dir (its path is SF-namespaced),
    * so re-writing it on every builder invocation — Bench calls each
    * entry 3× per JVM — bills pure fixture IO to the timed region
    * two extra times (the r15 verdict's per-entry-floor item). First
    * call per path writes (mode=overwrite, so a stale cross-JVM dump
    * at the same /tmp path is still replaced exactly as before);
    * subsequent calls in the same JVM reuse the bytes on disk.
    *
    * The memo is a per-path future claimed with putIfAbsent — NOT a
    * computeIfAbsent whose mapping function runs the Spark write:
    * computeIfAbsent holds the map's bin lock for the write's whole
    * duration, so a concurrent call on a DIFFERENT path hashing to
    * the same bin would block behind a multi-second job, and any
    * re-entrant call from inside the write closure would deadlock.
    * Here the winner runs the write OUTSIDE any map lock and
    * completes the future; duplicates await it (same
    * one-write/visibility contract, no long-held bin locks). A
    * FAILED write retracts its claim so a later call can retry
    * instead of memoizing the failure. */
  private val wetFixtureMemo = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[java.lang.Boolean]]()

  def wetFixtureOnce(path: String)(write: => Unit): Unit = {
    val mine = new java.util.concurrent.CompletableFuture[java.lang.Boolean]()
    val prev = wetFixtureMemo.putIfAbsent(path, mine)
    if (prev == null) {
      try {
        write
        mine.complete(true)
      } catch {
        case t: Throwable =>
          wetFixtureMemo.remove(path, mine)
          mine.completeExceptionally(t)
          throw t
      }
    } else {
      // rethrow the winner's ORIGINAL failure, not the
      // CompletionException join() wraps it in — losers and the
      // winner must surface the same exception type
      try prev.join()
      catch {
        case e: java.util.concurrent.CompletionException
            if e.getCause != null => throw e.getCause
      }
    }
  }

  /** Session-scoped memo of trained ANN artifacts shared across the
    * recall/eval family (x6b/x6c, x39, x42/x42b/x42d, x45/x46, plus
    * x42c's coarse quantizer): the trainers are deterministic over
    * (corpus dir, params), so each artifact trains ONCE per JVM per
    * test-data dir and every sibling serves/evaluates against the
    * frozen result — the x57 lifecycle (train once, serve many)
    * applied to the catalog itself, which previously re-trained the
    * SAME index 5× per sweep (~11% of the bench). Keyed by dir so a
    * JVM sweeping several SFs can never cross-pollinate; hashes are
    * unchanged by construction because the late-bound oracles embed
    * Similarity's stash, which the single training call populated.
    * A concurrent duplicate train is harmless (deterministic, last
    * write wins). Entries gating the TRAINING or PERSISTENCE path
    * itself (x6d "capped", x41 "base<400", x57 "persist", x42c's
    * ksub=16 sweep) keep their own eager trains. */
  val annMemo = new java.util.concurrent.atomic.AtomicReference(
    Map.empty[(String, String), AnyRef])

  def trainOnce[A <: AnyRef](dir: String, key: String)
      (train: => A): A =
    annMemo.get().get((dir, key)) match {
      case Some(v) => v.asInstanceOf[A]
      case None =>
        val v = train
        annMemo.updateAndGet(_ + ((dir, key) -> v))
        v
    }

  def memoCentroids(s: SparkSession, dir: String,
      hook: DataFrame => DataFrame = identity): Array[Array[Double]] =
    trainOnce(dir, "ivf-cents-8-2") {
      Similarity.ivfTrain(t(s, dir, "embeddings"), "vec_id", "embedding",
        nCells = 8, iters = 2, materialize = hook)
    }

  def memoBooks(s: SparkSession, dir: String,
      hook: DataFrame => DataFrame = identity)
      : Array[Array[Array[Double]]] =
    trainOnce(dir, "pq-books-8-8-2") {
      Similarity.pqTrain(t(s, dir, "embeddings"), "vec_id", "embedding",
        m = 8, ksub = 8, iters = 2, materialize = hook)
    }

  def memoResBooks(s: SparkSession, dir: String,
      hook: DataFrame => DataFrame = identity)
      : Array[Array[Array[Double]]] =
    trainOnce(dir, "pq-books-res-8-8-2") {
      Similarity.pqTrainResidual(t(s, dir, "embeddings"), "vec_id",
        "embedding", memoCentroids(s, dir, hook), m = 8, ksub = 8,
        iters = 2, materialize = hook)
    }

  // DuckDB twins of TextFunctions helpers, kept adjacent to their use.
  val duckWsTokens = "string_split_regex(trim(text), '\\s+')"
  def duckTokensIn(words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"CAST(len(list_filter($duckWsTokens, t -> list_contains($arr, t))) AS BIGINT)"
  }

  // TextAnalysis quality-metric twins over a `text` column — shared by
  // x9 and the x21 pipeline so the formulas cannot drift apart.
  val duckNTok = s"CAST(len($duckWsTokens) AS BIGINT)"
  val duckSwCount = duckTokensIn(TextAnalysis.stopwords)
  val duckAlpha =
    "CASE WHEN length(text) > 0 THEN " +
      "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) " +
      "AS DOUBLE) / length(text) ELSE 0.0 END"
  val duckLenSum = s"CAST(list_reduce(list_prepend(0, " +
    s"list_transform($duckWsTokens, t -> length(t))), (a, b) -> a + b) " +
    "AS BIGINT)"
  val duckMeanLen = s"CAST($duckLenSum AS DOUBLE) / $duckNTok"
  val duckQuality =
    s"CAST($duckSwCount AS DOUBLE) / $duckNTok * 0.4 + ($duckAlpha) * 0.4 + " +
      s"(CASE WHEN $duckMeanLen >= 3 AND $duckMeanLen <= 10 " +
      "THEN 0.2 ELSE 0.0 END)"

  /** Language-ID twin: CTE chain over `src(doc_id, text)` emitting
    * `<out>`(doc_id, text, lang_pred) — shared by x8 and x21. */
  def duckLangCtes(src: String, out: String): String = {
    val scores = TextAnalysis.langMarkers.map { case (lang, words) =>
      s"${duckTokensIn(words)} AS s_$lang"
    }.mkString(",\n  ")
    val best = TextAnalysis.langMarkers
      .map { case (l, _) => s"s_$l" }
      .reduceRight((a, b) => s"greatest($a, $b)")
    val cases = TextAnalysis.langMarkers.map { case (l, _) =>
      s"WHEN s_$l = best AND s_$l > 0 THEN '$l'"
    }.mkString(" ")
    s"""${out}_scored AS (
       |  SELECT doc_id, text, $scores
       |  FROM $src),
       |${out}_best AS (SELECT *, $best AS best FROM ${out}_scored),
       |$out AS (SELECT doc_id, text, CASE $cases ELSE 'und' END AS lang_pred
       |         FROM ${out}_best)""".stripMargin
  }

  /** x1d twins: BOTH the Spark run and the generated oracle read these,
    * so signature length and threshold cannot drift apart. */
  val x1dParams = Dedup.MinHashParams()
  val x1dMinEst = 0.75

  /** x56's public-suffix list: one plain rule, one wildcard, one
    * exception — every PSL rule kind the registered-domain extractor
    * supports, exercised by the fixture's shape-7 hosts. */
  val x56Suffixes: Seq[String] =
    Seq("example.test", "*.cdn.example.test", "!origin.cdn.example.test")

  /** x72's public-suffix fixture, in the publicsuffix.org FILE format
    * (comment/section lines, blank lines, a trailing-comment rule) and
    * at a rule count deliberately ABOVE the ~300-rule analyzer ceiling
    * where the expression form ([[graft.operators.Web.registeredDomain]])
    * stops being buildable in Spark — the regime that makes the
    * broadcast rule-table join ([[graft.operators.Web.withRegisteredDomain]])
    * the only viable shape (the real list is ~9,250 rules). Covers
    * every rule kind: plain one-label TLDs, two-level registries,
    * nested wildcards, exceptions carved from wildcards, and unicode
    * rules that must IDNA-normalize to match already-punycoded hosts. */
  val x72UniPlainBody: String =     // 公司.tld1 → xn--....tld1
    java.net.IDN.toASCII("公司.tld1")
      .toLowerCase(java.util.Locale.ROOT)
  val x72UniWildBody: String =      // 例.tld2 → xn--....tld2
    java.net.IDN.toASCII("例.tld2")
      .toLowerCase(java.util.Locale.ROOT)
  val x72PslFileText: String =
    s"""// ===BEGIN ICANN DOMAINS===
       |// generated graft fixture — one rule per line, format per
       |// publicsuffix.org/list
       |
       |${(0 until 320).map(i => s"tld$i").mkString("\n")}
       |
       |// two-level registries
       |${(0 until 40).map(i => s"co.tld$i").mkString("\n")}
       |
       |// wildcard registries (every label under w.tldN is public)
       |${(0 until 40).map(i => s"*.w.tld$i").mkString("\n")}
       |
       |// exceptions carved back out of the first wildcards
       |${(0 until 20).map(i => s"!keep.w.tld$i").mkString("\n")}
       |
       |// unicode rules (the list ships these raw; hosts arrive
       |// punycoded, so rule bodies must take the same IDNA path)
       |公司.tld1 ${"\t"}// trailing comment, format-legal
       |*.例.tld2
       |// ===END ICANN DOMAINS===
       |""".stripMargin
  lazy val x72Rules: Seq[String] =
    graft.operators.Web.parsePslFile(x72PslFileText)

  /** x74's robots.txt fixture bodies — one per host class, shared by
    * the Spark builder and the DuckDB twin so the two parses read the
    * same bytes. Together they cover: multi-UA headers (case-insens.),
    * wildcard + trailing-$ patterns, same-length allow/disallow ties,
    * empty-value rule lines (close the header, contribute no rule),
    * star fallback, exact-group-present-but-empty (star moot), rules
    * before any header (ignored), comments and CRLF. */
  val x74RobotsBodies: Seq[(Long, String)] = Seq(
    0L -> ("# fixture body 0\r\n" +
      "User-Agent: OtherBot\n" +
      "Disallow: /\n" +
      "\n" +
      "User-agent: GraftBot\n" +
      "Disallow: /docs\n" +
      "Allow: /docs/public\n" +
      "disallow : /*.zip$\n" +
      "Allow: /t*\n" +
      "Disallow: /ti\n" +
      "Disallow:\n" +
      "\n" +
      "User-agent: *\n" +
      "Disallow: /star\n"),
    1L -> ("User-agent: otherbot\n" +
      "Disallow: /\n" +
      "\n" +
      "User-agent: *   # fallback group\n" +
      "Disallow: /private\n" +
      "Allow: /private/ok\n"),
    2L -> ("Disallow: /orphan\n" +
      "User-agent: graftbot\n" +
      "Disallow:\n" +
      "\n" +
      "User-agent: *\n" +
      "Disallow: /\n"))

  /** x21/x21b shared oracle chain: language/quality filter → exact
    * fingerprint dedup → MinHash pairs → recursive reachability →
    * min-label per node. Ends at `labels(u, mv)`; `kept(doc_id, text)`
    * holds the exact-deduped survivors. One definition, two tails, so
    * the two pipeline oracles cannot drift. */
  lazy val hygieneOracleChain: String =
    s"""${duckLangCtes("documents", "lp")},
       |filtered AS (
       |  SELECT doc_id, text FROM lp
       |  WHERE lang_pred IN ('en') AND ($duckQuality) >= 0.55),
       |fps AS (
       |  SELECT doc_id, text,
       |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
       |  FROM filtered),
       |kept AS (
       |  SELECT p.doc_id, p.text
       |  FROM fps p JOIN (SELECT f, min(doc_id) AS mid
       |                   FROM fps GROUP BY f) k ON p.doc_id = k.mid),
       |mh AS (SELECT id_a, id_b FROM (
       |  ${Dedup.minHashOracleSql("kept", "doc_id", "text")
              .replace("\n", "\n  ")})),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM mh
       |  UNION SELECT id_b, id_a FROM mh),
       |reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       |labels AS (SELECT u, min(v) AS mv FROM reach GROUP BY u)""".stripMargin

  /** x2b's candidate-generation MinHash: 6 bands of 2 rows — collision
    * probability j², deliberately permissive so the adjudicator (not
    * the screen) makes the call and candidates exist even in corpora
    * with only moderate similarity. */
  val x2bParams = Dedup.MinHashParams(k = 12, bands = 6)

  /** x28 twin: '<EMAIL>' → n_email etc. — same count-column name on
    * both sides. */
  def piiCountCol(tok: String): String =
    "n_" + tok.replaceAll("[<>]", "").toLowerCase

  /** x29's embedded merges table (rank order), read by BOTH the Spark
    * run and the generated oracle. Each pair's parts are chars or
    * earlier merges, as in a real BPE merges file; the chains build
    * common corpus words (table, data, the, row) through multiple
    * ranks so the gate exercises merge STACKING, not single merges. */
  val bpeMerges: Seq[(String, String)] = Seq(
    ("t", "a"), ("l", "e"), ("r", "o"), ("d", "a"), ("t", "h"),
    ("b", "le"), ("ta", "ble"), ("ro", "w"), ("da", "ta"), ("th", "e"),
    ("a", "n"), ("s", "c"), ("sc", "an"), ("e", "r"), ("o", "r"))

  /** x27 twins: CTE chain hashing the distinct word-trigram shingles of
    * `src(doc_id, text)` — the DuckDB mirror of Dedup.gramHashes.
    * Emits `<a>_toks`, `<a>_grams`, `<a>_hashes`; reference the last
    * (doc_id, gram_h). */
  def decontamGramCtes(src: String, a: String, n: Int = 3): String = {
    val joined = (0 until n).map(k => s"tk[i + $k]").mkString(" || ' ' || ")
    s"""${a}_toks AS (
       |  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS tk
       |  FROM $src),
       |${a}_grams AS (
       |  SELECT DISTINCT doc_id, unnest(
       |    CASE WHEN len(tk) >= $n THEN
       |      list_transform(range(1, len(tk) - ${n - 1} + 1), i -> $joined)
       |    ELSE [trim(text)] END) AS g
       |  FROM ${a}_toks),
       |${a}_hashes AS (
       |  SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gram_h
       |  FROM ${a}_grams)""".stripMargin
  }

  /** Near-dup cluster labels (exact-dup + MinHash-LSH pair edges ->
    * connected components, min-id canonical label per doc) — shared by
    * x19 (the labels are the product) and x18b (the labels gate the
    * split) so the clustering semantics cannot drift between them. */
  def nearDupClusterLabels(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val keep = docs.groupBy(col("text")).agg(min(col("doc_id")).as("id_a"))
    val exactEdges = docs.join(keep, "text")
      .filter(col("doc_id") =!= col("id_a"))
      .select(col("id_a"), col("doc_id").as("id_b"))
    val nearEdges = Dedup.minHashNearDupPairs(docs, "doc_id", "text")
      .select(col("id_a"), col("id_b"))
    Dedup.connectedComponents(docs.select(col("doc_id")), "doc_id",
      exactEdges.union(nearEdges))
  }

  /** DuckDB twin of [[nearDupClusterLabels]], split as (CTE list,
    * final select) so callers can extend the WITH RECURSIVE chain. */
  def clusterCtes: String =
    s"""mh AS (
       |  SELECT id_a, id_b FROM (
       |    ${Dedup.minHashOracleSql("documents", "doc_id", "text")
              .replace("\n", "\n    ")})),
       |keep AS (
       |  SELECT text, min(doc_id) AS ka FROM documents GROUP BY text),
       |exact_e AS (
       |  SELECT k.ka AS id_a, d.doc_id AS id_b
       |  FROM documents d JOIN keep k USING (text)
       |  WHERE d.doc_id <> k.ka),
       |alledges AS (
       |  SELECT id_a, id_b FROM exact_e
       |  UNION ALL SELECT id_a, id_b FROM mh),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM alledges
       |  UNION SELECT id_b, id_a FROM alledges),
       |reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       |labels AS (SELECT u, min(v) AS mv FROM reach GROUP BY u)""".stripMargin

  val clusterSelect: String =
    """SELECT d.doc_id,
      |  CAST(least(d.doc_id, coalesce(l.mv, d.doc_id)) AS BIGINT)
      |    AS cluster_id
      |FROM documents d LEFT JOIN labels l ON l.u = d.doc_id""".stripMargin

  /** x62's oracle, generated from the same constants as the Spark
    * side: DuckDB re-derives the ±0.05 md5-signed twins, the JL
    * projections (the 32×64 Rademacher plane matrix embedded as
    * literals — the late-bound-literal idiom of the LSH/IVF/PQ
    * oracles, except nothing here is even late-bound: the planes are
    * a pure function of (j, d)), and both cosines, bit-for-bit. */
  def jlMarginOracle: String = {
    val dOut = 32; val dim = 64
    val scale = math.sqrt(dOut.toDouble).toString
    val planes = graft.operators.Similarity.jlWeights(dOut, dim)
    def proj(vecExpr: String): String =
      (0 until dOut).map { j =>
        val p = planes(j).map(v => if (v > 0) "1.0" else "-1.0")
          .mkString("[", ",", "]")
        s"list_dot_product($vecExpr, $p) / CAST('$scale' AS DOUBLE)"
      }.mkString("[", ",\n      ", "]")
    def cos(a: String, b: String): String =
      s"""CASE WHEN sqrt(list_dot_product($a, $a)) *
         |          sqrt(list_dot_product($b, $b)) > 0
         |  THEN list_dot_product($a, $b) /
         |       (sqrt(list_dot_product($a, $a)) *
         |        sqrt(list_dot_product($b, $b)))
         |  ELSE 0.0 END""".stripMargin
    val idxs = (0 until dim).mkString("[", ",", "]")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    [CAST(list_extract(embedding, i+1) AS DOUBLE) +
       |       CASE WHEN substring(md5(vec_id || '-' || i), 32, 1)
       |              IN ('0','2','4','6','8','a','c','e')
       |         THEN CAST('0.05' AS DOUBLE)
       |         ELSE CAST('-0.05' AS DOUBLE) END
       |     FOR i IN $idxs] AS tw
       |  FROM embeddings WHERE vec_id % 3 = 0),
       |p AS (
       |  SELECT vec_id, v, tw,
       |    ${proj("v")} AS jv,
       |    ${proj("tw")} AS jt
       |  FROM e),
       |pairs AS (
       |  SELECT 'dup' AS kind, vec_id AS id_a, vec_id AS id_b,
       |    ${cos("v", "tw")} AS cos_full,
       |    ${cos("jv", "jt")} AS cos_jl
       |  FROM p
       |  UNION ALL
       |  SELECT 'bg', a.vec_id, b.vec_id,
       |    ${cos("a.v", "b.v")},
       |    ${cos("a.jv", "b.jv")}
       |  FROM p a JOIN p b ON a.vec_id < b.vec_id
       |    AND (a.vec_id + b.vec_id) % 37 = 0)
       |SELECT kind, id_a, id_b,
       |  round(cos_full, 6) AS cos_full_r,
       |  round(cos_jl, 6) AS cos_jl_r,
       |  cos_jl >= CAST('0.5' AS DOUBLE) AS candidate
       |FROM pairs ORDER BY kind, id_a, id_b""".stripMargin
  }

  /** Shared by x5 (window form) and x5b (heap-aggregate form): both
    * must match this oracle bit-for-bit. */
  val annTopkOracle: String =
    """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
      |          FROM embeddings WHERE vec_id < 8),
      |c AS (SELECT vec_id AS did, embedding::DOUBLE[] AS dvec
      |      FROM embeddings),
      |scored AS (
      |  SELECT qid, did,
      |    CASE WHEN sqrt(list_dot_product(qvec, qvec)) *
      |              sqrt(list_dot_product(dvec, dvec)) > 0
      |      THEN list_dot_product(qvec, dvec) /
      |           (sqrt(list_dot_product(qvec, qvec)) *
      |            sqrt(list_dot_product(dvec, dvec)))
      |      ELSE 0.0 END AS cos
      |  FROM c JOIN q ON qid <> did),
      |ranked AS (
      |  SELECT qid, did, cos, CAST(row_number() OVER
      |    (PARTITION BY qid ORDER BY cos DESC, did) AS BIGINT) AS rn
      |  FROM scored)
      |SELECT qid, rn, did, round(cos, 6) AS cos_r
      |FROM ranked WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

}
