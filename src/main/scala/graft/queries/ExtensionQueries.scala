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

/** Training-data-pipeline operator catalog (driver-mandated extensions,
  * SURVEY.md §7.5): deduplication, similarity search, text analysis,
  * JSON extraction, streaming-equivalent windowed aggregation, and
  * binary-column (multimodal) plumbing. Hash-verifiable against DuckDB
  * wherever the computation is exactly portable; approximate/LSH
  * variants that are Spark-plan-specific are rows-only checked.
  */
object ExtensionQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

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
  private def scratch(df: DataFrame, name: String): DataFrame = {
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

  /** One shutdown hook per app-scratch dir: deletes the dir at JVM
    * exit and logs its final size. Registered lazily on first use so
    * runs that never scratch pay nothing. */
  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  private def registerCleanup(appDir: java.nio.file.Path): Unit =
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
  private val MOJIBAKE_CLEAN_SUFFIX =
    " café señor über schön"

  /** Composed (NFC) core of the x60 fixture suffix; the decomposed
    * twin is DERIVED from it via `Normalizer` NFD — so fixture and
    * expectation cannot drift — plus two canonical singletons
    * (U+212B ANGSTROM SIGN, U+2126 OHM SIGN) that NFC folds to
    * U+00C5/U+03A9, exercising composition-exclusion handling beyond
    * plain combining-mark composition. */
  private val NFC_CLEAN_SUFFIX = " café España über naïve"
  private val NFD_CORRUPT_SUFFIX =
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
  private def withTrainerCache[A](body: (DataFrame => DataFrame) => A): A = {
    val cached = new java.util.concurrent.atomic.AtomicReference[Option[DataFrame]](None)
    val hook = (df: DataFrame) => {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached.set(Some(p)); p
    }
    try body(hook)
    finally cached.get.foreach(_.unpersist(false))
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
  private val annMemo = new java.util.concurrent.atomic.AtomicReference(
    Map.empty[(String, String), AnyRef])

  private def trainOnce[A <: AnyRef](dir: String, key: String)
      (train: => A): A =
    annMemo.get().get((dir, key)) match {
      case Some(v) => v.asInstanceOf[A]
      case None =>
        val v = train
        annMemo.updateAndGet(_ + ((dir, key) -> v))
        v
    }

  private def memoCentroids(s: SparkSession, dir: String,
      hook: DataFrame => DataFrame = identity): Array[Array[Double]] =
    trainOnce(dir, "ivf-cents-8-2") {
      Similarity.ivfTrain(t(s, dir, "embeddings"), "vec_id", "embedding",
        nCells = 8, iters = 2, materialize = hook)
    }

  private def memoBooks(s: SparkSession, dir: String,
      hook: DataFrame => DataFrame = identity)
      : Array[Array[Array[Double]]] =
    trainOnce(dir, "pq-books-8-8-2") {
      Similarity.pqTrain(t(s, dir, "embeddings"), "vec_id", "embedding",
        m = 8, ksub = 8, iters = 2, materialize = hook)
    }

  private def memoResBooks(s: SparkSession, dir: String,
      hook: DataFrame => DataFrame = identity)
      : Array[Array[Array[Double]]] =
    trainOnce(dir, "pq-books-res-8-8-2") {
      Similarity.pqTrainResidual(t(s, dir, "embeddings"), "vec_id",
        "embedding", memoCentroids(s, dir, hook), m = 8, ksub = 8,
        iters = 2, materialize = hook)
    }

  // DuckDB twins of TextFunctions helpers, kept adjacent to their use.
  private val duckWsTokens = "string_split_regex(trim(text), '\\s+')"
  private def duckTokensIn(words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"CAST(len(list_filter($duckWsTokens, t -> list_contains($arr, t))) AS BIGINT)"
  }

  // TextAnalysis quality-metric twins over a `text` column — shared by
  // x9 and the x21 pipeline so the formulas cannot drift apart.
  private val duckNTok = s"CAST(len($duckWsTokens) AS BIGINT)"
  private val duckSwCount = duckTokensIn(TextAnalysis.stopwords)
  private val duckAlpha =
    "CASE WHEN length(text) > 0 THEN " +
      "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) " +
      "AS DOUBLE) / length(text) ELSE 0.0 END"
  private val duckLenSum = s"CAST(list_reduce(list_prepend(0, " +
    s"list_transform($duckWsTokens, t -> length(t))), (a, b) -> a + b) " +
    "AS BIGINT)"
  private val duckMeanLen = s"CAST($duckLenSum AS DOUBLE) / $duckNTok"
  private val duckQuality =
    s"CAST($duckSwCount AS DOUBLE) / $duckNTok * 0.4 + ($duckAlpha) * 0.4 + " +
      s"(CASE WHEN $duckMeanLen >= 3 AND $duckMeanLen <= 10 " +
      "THEN 0.2 ELSE 0.0 END)"

  /** Language-ID twin: CTE chain over `src(doc_id, text)` emitting
    * `<out>`(doc_id, text, lang_pred) — shared by x8 and x21. */
  private def duckLangCtes(src: String, out: String): String = {
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
  private val x1dParams = Dedup.MinHashParams()
  private val x1dMinEst = 0.75

  /** x56's public-suffix list: one plain rule, one wildcard, one
    * exception — every PSL rule kind the registered-domain extractor
    * supports, exercised by the fixture's shape-7 hosts. */
  private val x56Suffixes: Seq[String] =
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
  private val x72UniPlainBody: String =     // 公司.tld1 → xn--....tld1
    java.net.IDN.toASCII("公司.tld1")
      .toLowerCase(java.util.Locale.ROOT)
  private val x72UniWildBody: String =      // 例.tld2 → xn--....tld2
    java.net.IDN.toASCII("例.tld2")
      .toLowerCase(java.util.Locale.ROOT)
  private val x72PslFileText: String =
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
  private lazy val x72Rules: Seq[String] =
    graft.operators.Web.parsePslFile(x72PslFileText)

  /** x74's robots.txt fixture bodies — one per host class, shared by
    * the Spark builder and the DuckDB twin so the two parses read the
    * same bytes. Together they cover: multi-UA headers (case-insens.),
    * wildcard + trailing-$ patterns, same-length allow/disallow ties,
    * empty-value rule lines (close the header, contribute no rule),
    * star fallback, exact-group-present-but-empty (star moot), rules
    * before any header (ignored), comments and CRLF. */
  private val x74RobotsBodies: Seq[(Long, String)] = Seq(
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
  private lazy val hygieneOracleChain: String =
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
  private val x2bParams = Dedup.MinHashParams(k = 12, bands = 6)

  /** x28 twin: '<EMAIL>' → n_email etc. — same count-column name on
    * both sides. */
  private def piiCountCol(tok: String): String =
    "n_" + tok.replaceAll("[<>]", "").toLowerCase

  /** x29's embedded merges table (rank order), read by BOTH the Spark
    * run and the generated oracle. Each pair's parts are chars or
    * earlier merges, as in a real BPE merges file; the chains build
    * common corpus words (table, data, the, row) through multiple
    * ranks so the gate exercises merge STACKING, not single merges. */
  private val bpeMerges: Seq[(String, String)] = Seq(
    ("t", "a"), ("l", "e"), ("r", "o"), ("d", "a"), ("t", "h"),
    ("b", "le"), ("ta", "ble"), ("ro", "w"), ("da", "ta"), ("th", "e"),
    ("a", "n"), ("s", "c"), ("sc", "an"), ("e", "r"), ("o", "r"))

  /** x27 twins: CTE chain hashing the distinct word-trigram shingles of
    * `src(doc_id, text)` — the DuckDB mirror of Dedup.gramHashes.
    * Emits `<a>_toks`, `<a>_grams`, `<a>_hashes`; reference the last
    * (doc_id, gram_h). */
  private def decontamGramCtes(src: String, a: String, n: Int = 3): String = {
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
  private def nearDupClusterLabels(s: SparkSession, dir: String): DataFrame = {
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
  private def clusterCtes: String =
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

  private val clusterSelect: String =
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
  private def jlMarginOracle: String = {
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
  private val annTopkOracle: String =
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

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec("x1_dedup_exact",
      "exact dedup: keep lowest doc_id per identical text, report group sizes",
      (s, dir) => t(s, dir, "documents")
        // single-pass form of Dedup.exactKeepFirst + group sizes:
        // one shuffle on the key, no window, no re-join
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id")),
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)),

    QuerySpec("x1b_incremental_dedup",
      "incremental ingestion dedup: anti-join the new batch's " +
        "fingerprints against the historical set (no history recompute)",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val historical = docs.filter(col("doc_id") < 250)
          .select(md5Fingerprint(col("text")).as("md5_fp"))
        val batch = docs.filter(col("doc_id") >= 250)
        Dedup.incrementalExactNew(batch, "text", historical)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH fp AS (
             |  SELECT doc_id,
             |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
             |  FROM documents)
             |SELECT b.doc_id FROM fp b
             |WHERE b.doc_id >= 250 AND NOT EXISTS (
             |  SELECT 1 FROM fp h WHERE h.doc_id < 250 AND h.f = b.f)
             |ORDER BY doc_id""".stripMargin)),

    QuerySpec("x1c_incremental_near_screen",
      "incremental LSH band screen: batch rows whose text lands in any " +
        "historical bucket drop (every copy — screen keys by text " +
        "digest), vs a DuckDB re-derivation of both band sets",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val seen = Dedup.bandInventory(docs.filter(col("doc_id") < 250),
          "doc_id", "text")
        Dedup.incrementalNearNew(docs.filter(col("doc_id") >= 250),
            "doc_id", "text", seen)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH hist AS (
              |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 250),
              |${Dedup.bandsSqlCtes("hist", "h")},
              |batch AS (
              |  SELECT doc_id, text FROM documents WHERE doc_id >= 250),
              |btexts AS (
              |  SELECT DISTINCT md5(text) AS id, text FROM batch),
              |${Dedup.bandsSqlCtes("btexts", "q")},
              |hits AS (
              |  SELECT DISTINCT q.id FROM q_bands q
              |  JOIN h_bands h USING (band, band_key))
              |SELECT d.doc_id FROM batch d
              |WHERE NOT EXISTS (SELECT 1 FROM hits WHERE hits.id = md5(d.text))
              |ORDER BY doc_id""".stripMargin)),

    QuerySpec("x1d_incremental_adjudicated",
      "two-stage incremental near-dup: LSH band screen generates " +
        "candidates, each bucket hit is adjudicated by the MinHash " +
        "estimate against historical signatures (>= 0.75 drops) — " +
        "strictly higher precision than x1c's shared-bucket-drops rule",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val seen = Dedup.signatureInventory(docs.filter(col("doc_id") < 250),
          "doc_id", "text", x1dParams)
        Dedup.incrementalNearAdjudicated(docs.filter(col("doc_id") >= 250),
            "doc_id", "text", seen, x1dParams, x1dMinEst)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH hist AS (
              |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 250),
              |${Dedup.bandsSqlCtes("hist", "h", x1dParams)},
              |batch AS (
              |  SELECT doc_id, text FROM documents WHERE doc_id >= 250),
              |btexts AS (
              |  SELECT DISTINCT md5(text) AS id, text FROM batch),
              |${Dedup.bandsSqlCtes("btexts", "q", x1dParams)},
              |cand AS (
              |  SELECT DISTINCT q.id AS qid, h.id AS hid
              |  FROM q_bands q JOIN h_bands h USING (band, band_key)),
              |hits AS (
              |  SELECT DISTINCT c.qid AS id
              |  FROM cand c
              |  JOIN q_sigs sq ON sq.id = c.qid
              |  JOIN h_sigs sh ON sh.id = c.hid
              |  WHERE CAST(${Dedup.sigMatchSql("sq", "sh", x1dParams)}
              |          AS DOUBLE) / ${x1dParams.k} >= $x1dMinEst)
              |SELECT d.doc_id FROM batch d
              |WHERE NOT EXISTS (SELECT 1 FROM hits WHERE hits.id = md5(d.text))
              |ORDER BY doc_id""".stripMargin)),

    QuerySpec("x2_dedup_ngram_jaccard",
      "exact 3-gram Jaccard similarity on adjacent-id candidate pairs",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val ids = docs.select(col("doc_id"))
        val pairs = ids.select(col("doc_id").as("id_a"))
          .join(ids.select(col("doc_id").as("id_b")),
            col("id_a") + 1 === col("id_b"))
        Dedup.ngramJaccard(docs, pairs, "doc_id", "text", 3)
          .orderBy(col("id_a"))
      },
      Some("""WITH g AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(length(text) - 2, 1) + 1),
             |    i -> substr(text, i::INT, 3))) AS grams
             |  FROM documents)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
             |    (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
             |    AS jaccard
             |FROM g a JOIN g b ON a.doc_id + 1 = b.doc_id
             |ORDER BY id_a""".stripMargin)),

    QuerySpec("x3_dedup_minhash_lsh",
      "MinHash(12)+LSH(2 bands of 6) near-dup pairs with Jaccard " +
        "estimate; exact-dedup prefilter + capped buckets guard the " +
        "hot-bucket quadratic blowup",
      (s, dir) => Dedup.minHashNearDupPairs(t(s, dir, "documents"),
          "doc_id", "text").orderBy(col("id_a"), col("id_b")),
      Some(Dedup.minHashOracleSql("documents", "doc_id", "text"))),

    QuerySpec("x32_cross_corpus_neardup",
      "cross-corpus near-dup LINKS (src0 docs vs the rest): band-" +
        "bucket candidates across the two sides, MinHash-adjudicated, " +
        "partner ids named — the shard-vs-shard / train-vs-crawl " +
        "linker; same capped-bucket machinery as x3, never all-pairs",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.crossCorpusNearDupPairs(
            docs.filter(col("source") === "src0"),
            docs.filter(col("source") =!= "src0"),
            "doc_id", "text")
          .orderBy(col("id_a"), col("id_b"))
      },
      Some {
        val p = Dedup.MinHashParams()
        def capped(side: String): String =
          s"""${side}_capped AS (
             |  SELECT id, band, band_key FROM (
             |    SELECT id, band, band_key, row_number() OVER
             |      (PARTITION BY band, band_key ORDER BY id) AS rn
             |    FROM ${side}_bands) WHERE rn <= 1000)""".stripMargin
        s"""WITH a_src AS (
           |  SELECT min(doc_id) AS id, text FROM documents
           |  WHERE source = 'src0' GROUP BY text),
           |${Dedup.bandsSqlCtes("a_src", "a", p)},
           |b_src AS (
           |  SELECT min(doc_id) AS id, text FROM documents
           |  WHERE source <> 'src0' GROUP BY text),
           |${Dedup.bandsSqlCtes("b_src", "b", p)},
           |${capped("a")},
           |${capped("b")},
           |cand AS (
           |  SELECT DISTINCT x.id AS id_a, y.id AS id_b
           |  FROM a_capped x JOIN b_capped y USING (band, band_key)),
           |est AS (
           |  SELECT c.id_a, c.id_b,
           |    CAST(${Dedup.sigMatchSql("sa", "sb", p)} AS DOUBLE)
           |      / ${p.k} AS est_jaccard
           |  FROM cand c
           |  JOIN a_sigs sa ON sa.id = c.id_a
           |  JOIN b_sigs sb ON sb.id = c.id_b)
           |SELECT id_a, id_b, est_jaccard FROM est
           |WHERE est_jaccard >= 0.75
           |ORDER BY id_a, id_b""".stripMargin
      }),

    QuerySpec("x4_dedup_simhash",
      "64-bit SimHash signatures over distinct tokens (one md5 per " +
        "token feeds all 64 bit-sums)",
      (s, dir) => Dedup.simHash64(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(Dedup.simHashOracleSql("documents", "doc_id", "text"))),

    QuerySpec("x2b_dedup_levenshtein",
      "edit-distance ADJUDICATION over LSH candidate pairs (permissive " +
        "6-band/2-row MinHash for recall): Levenshtein on 64-char " +
        "prefixes scores only bucket-colocated pairs — the " +
        "candidates-then-adjudicate pipeline shape, never all-pairs",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text",
          x2bParams)
        val d = docs.select(col("doc_id"),
          substring(col("text"), 1, 64).as("p"))
        pairs
          .join(d.select(col("doc_id").as("id_a"), col("p").as("pa")), "id_a")
          .join(d.select(col("doc_id").as("id_b"), col("p").as("pb")), "id_b")
          .select(col("id_a"), col("id_b"),
            levenshtein(col("pa"), col("pb")).cast("long").as("edit_dist"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""WITH ${Dedup.lshCandSqlCtes("documents", "doc_id", "text",
                  x2bParams)},
              |d AS (SELECT doc_id, substr(text, 1, 64) AS p FROM documents)
              |SELECT c.id_a, c.id_b,
              |       CAST(levenshtein(a.p, b.p) AS BIGINT) AS edit_dist
              |FROM cand c
              |JOIN d a ON a.doc_id = c.id_a
              |JOIN d b ON b.doc_id = c.id_b
              |ORDER BY id_a, id_b""".stripMargin)),

    QuerySpec("x4b_simhash_hamming_pairs",
      "SimHash near-dup pairs: 64-bit signature, 4 bands of 16 bits " +
        "(exact recall for Hamming <= 3 by pigeonhole, 65536 buckets " +
        "per band), capped buckets + exact Hamming filter",
      (s, dir) => Dedup.simHashNearDupPairs(t(s, dir, "documents"),
          "doc_id", "text").orderBy(col("id_a"), col("id_b")),
      Some(Dedup.simHashPairsOracleSql("documents", "doc_id", "text"))),

    QuerySpec("x5_ann_cosine_topk",
      "brute-force cosine top-5 neighbors for query vectors (vec_id < 8)",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8),
            "vec_id", "embedding", 5)
          .select(col("qid"), col("rn"), col("did"),
            round(col("cos"), 6).as("cos_r"))
          .orderBy(col("qid"), col("rn"))
      },
      Some(annTopkOracle)),

    QuerySpec("x5b_ann_topk_heap_agg",
      "same brute-force ANN via the native bounded-heap aggregate " +
        "(TopKPairs TypedImperativeAggregate): map-side partial top-k " +
        "shrinks the shuffle corpus/k-fold; results identical to the " +
        "window form and the same DuckDB oracle",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.bruteForceTopKAgg(emb, emb.filter(col("vec_id") < 8),
            "vec_id", "embedding", 5)
          .select(col("qid"), col("rn"), col("did"),
            round(col("cos"), 6).as("cos_r"))
          .orderBy(col("qid"), col("rn"))
      },
      Some(annTopkOracle)),

    QuerySpec("x6_ann_lsh_bucketed",
      "sign-LSH bucketed ANN: approximate by design but fully " +
        "deterministic (md5-derived Rademacher planes), so the oracle " +
        "embeds the plane weights as literals and hash-matches",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.lshTopK(emb, emb.filter(col("vec_id") < 8),
            "vec_id", "embedding", 5, nPlanes = 4, dim = 64)
          .select(col("qid"), col("rn"), col("did"),
            round(col("cos"), 6).as("cos_r"))
          .orderBy(col("qid"), col("rn"))
      },
      Some(Similarity.lshOracleSql("embeddings", "vec_id", "embedding",
        5, nPlanes = 4, dim = 64, queryPred = "vec_id < 8"))),

    QuerySpec("x6b_ann_ivf",
      "IVF-cell ANN: deterministic Lloyd-trained inverted file, 2-probe " +
        "search; the late-bound oracle embeds the trained centroids " +
        "as literals and hash-matches",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopKWith(emb, emb.filter(col("vec_id") < 8),
            "vec_id", "embedding", 5, memoCentroids(s, dir), nProbes = 2)
          .select(col("qid"), col("rn"), col("did"),
            round(col("cos"), 6).as("cos_r"))
          .orderBy(col("qid"), col("rn"))
      },
      None,
      oracleGen = () => Similarity.trainedCentroids.get((8, 2, "")).map(cents =>
        Similarity.ivfOracleSql("embeddings", "vec_id", "embedding", 5,
          cents, nProbes = 2, queryPred = "vec_id < 8"))),

    QuerySpec("x6c_ann_recall_eval",
      "ANN governance: per-query recall@5 of the IVF path against the " +
        "exact brute-force top-k — the metric that picks nProbes before " +
        "scaling out; hash-gated via the same late-bound centroid oracle",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
        val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        val approx = Similarity.ivfTopKWith(emb, q, "vec_id",
          "embedding", 5, memoCentroids(s, dir), nProbes = 2)
        Similarity.recallAtK(approx, exact).orderBy(col("qid"))
      },
      None,
      oracleGen = () => Similarity.trainedCentroids.get((8, 2, "")).map { cents =>
        val exact = annTopkOracle.replace("\n", "\n    ")
        val approx = Similarity.ivfOracleSql("embeddings", "vec_id",
          "embedding", 5, cents, nProbes = 2, queryPred = "vec_id < 8")
          .replace("\n", "\n    ")
        s"""WITH exact AS (SELECT qid, did FROM (
           |    $exact)),
           |approx AS (SELECT qid, did FROM (
           |    $approx))
           |SELECT e.qid, CAST(count(a.did) AS DOUBLE) / count(*) AS recall_at_k
           |FROM exact e LEFT JOIN approx a
           |  ON e.qid = a.qid AND e.did = a.did
           |GROUP BY e.qid ORDER BY e.qid""".stripMargin
      }),

    QuerySpec("x6d_ivf_capped_serving",
      "IVF serving with a PER-CELL candidate cap — the drift " +
        "rehearsal's actual remedy (TUNING.md \"ANN drift\": a tight " +
        "appended mode collapses effective cells, and a blind retrain " +
        "does NOT rebalance it because one direction is one argmax " +
        "cell by geometry; per-cell caps are what hold candidate " +
        "volume flat): at most 12 corpus rows survive per cell, kept " +
        "in deterministic md5-hash order, so candidates/query ≤ " +
        "nProbes × cap REGARDLESS of how skewed assignment gets under " +
        "drift. Builder REQUIREs the cap actually bites at this SF " +
        "(the largest cell is over it — a vacuous cap would gate " +
        "nothing); the hash gate re-derives cells, the capped keep, " +
        "probe selection, and ranking in DuckDB via the late-bound " +
        "centroid oracle",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cap = 12
        val cents = Similarity.ivfTrain(emb, "vec_id", "embedding",
          nCells = 8, iters = 2, tag = "capped")
        val maxCell = emb
          .select(Similarity.cellExpr(col("embedding"), cents).as("cell"))
          .groupBy(col("cell")).agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).head.getLong(0)
        require(maxCell > cap,
          s"cap must bite at this SF: max cell $maxCell <= cap $cap")
        Similarity.ivfTopKWithCapped(emb,
            emb.filter(col("vec_id") < 8), "vec_id", "embedding", 5,
            cents, nProbes = 2, perCellCap = cap)
          .select(col("qid"), col("rn"), col("did"),
            round(col("cos"), 6).as("cos_r"))
          .orderBy(col("qid"), col("rn"))
      },
      None,
      oracleGen = () => Similarity.trainedCentroids.get((8, 2, "capped"))
        .map(cents => Similarity.ivfCappedOracleSql("embeddings",
          "vec_id", "embedding", 5, cents, nProbes = 2,
          queryPred = "vec_id < 8", perCellCap = 12))),

    QuerySpec("x7_dedup_embedding_cosine",
      "embedding-cosine near-dup ADJUDICATION over sign-LSH bucket " +
        "candidates (6 md5-derived planes, 64 buckets): exact cosine + " +
        "threshold flag on bucket-colocated pairs only — candidate " +
        "volume shrinks ~2^planes-fold vs all-pairs",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val b = e.select(col("vec_id"), col("embedding"),
          Similarity.bucketExpr(col("embedding"), 6, 64).as("bucket"))
        val a = b.select(col("bucket"), col("vec_id").as("id_a"),
          col("embedding").as("va"))
        val c = b.select(col("bucket"), col("vec_id").as("id_b"),
          col("embedding").as("vb"))
        a.join(c, Seq("bucket")).filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            round(cosine(col("va"), col("vb")), 6).as("cos_r"))
          .withColumn("is_near_dup", col("cos_r") >= 0.3)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some {
        val cosSql =
          """CASE WHEN sqrt(list_dot_product(x.v, x.v)) *
            |                  sqrt(list_dot_product(y.v, y.v)) > 0
            |    THEN list_dot_product(x.v, y.v) /
            |         (sqrt(list_dot_product(x.v, x.v)) *
            |          sqrt(list_dot_product(y.v, y.v)))
            |    ELSE 0.0 END""".stripMargin
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |b AS (SELECT vec_id, v,
           |        ${Similarity.bucketSqlExpr("v", 6, 64)} AS bucket
           |      FROM e)
           |SELECT x.vec_id AS id_a, y.vec_id AS id_b,
           |  round($cosSql, 6) AS cos_r,
           |  (round($cosSql, 6) >= 0.3) AS is_near_dup
           |FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
           |ORDER BY id_a, id_b""".stripMargin
      }),

    QuerySpec("x31_semantic_dedup",
      "SemDeDup-style semantic dedup: deterministic IVF cells (16), " +
        "exact cosine only against lower-id cell-mates, keep-lowest-id " +
        "dominance at tau=0.9 — cell-keyed equi-join with a hard " +
        "1000-row cap per cell (overflow reported, never silent), so " +
        "a dense cell can never go quadratic; hash-gated via the " +
        "late-bound trained-centroid oracle, cap included in the SQL",
      (s, dir) => Similarity.semanticDedup(t(s, dir, "embeddings"),
          "vec_id", "embedding", nCells = 16, tau = 0.9, maxCell = 1000)
        .orderBy(col("vec_id")),
      None,
      oracleGen = () => Similarity.trainedCentroids.get((16, 2, "")).map(cents =>
        Similarity.semanticDedupOracleSql("embeddings", "vec_id",
          "embedding", cents, 0.9, maxCell = 1000))),

    QuerySpec("x8_text_langid",
      "language ID via stopword-marker scoring, distribution by language",
      (s, dir) => t(s, dir, "documents")
        .select(wsTokens(col("text")).as("toks"))
        .select(TextAnalysis.langIdFromTokens(col("toks")).as("lang_pred"))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred")),
      Some(s"""WITH ${duckLangCtes("documents", "lp")}
              |SELECT lang_pred, count(*) AS n FROM lp
              |GROUP BY lang_pred ORDER BY lang_pred""".stripMargin)),

    QuerySpec("x9_text_quality",
      "per-document quality metrics: stopword/alpha ratios, mean token length, score",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), col("text"), wsTokens(col("text")).as("toks"))
        .select(col("doc_id"),
          TextAnalysis.stopwordRatioFromTokens(col("toks")).as("stopword_ratio"),
          TextAnalysis.alphaRatio(col("text")).as("alpha_ratio"),
          TextAnalysis.meanTokenLenFromTokens(col("toks")).as("mean_token_len"),
          TextAnalysis.qualityScoreFromTokens(col("text"), col("toks"))
            .as("quality"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  CAST($duckSwCount AS DOUBLE) / $duckNTok AS stopword_ratio,
              |  $duckAlpha AS alpha_ratio,
              |  $duckMeanLen AS mean_token_len,
              |  $duckQuality AS quality
              |FROM documents ORDER BY doc_id""".stripMargin)),

    QuerySpec("x34_quality_classifier",
      "embedded-weights linear quality classifier: logistic-regression " +
        "decision margin over exact count-ratio features (no sigmoid — " +
        "exp() is not bit-reproducible across libms and the verdict " +
        "only needs the sign); per-doc margin + keep flag, bit-exact",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), col("text"), wsTokens(col("text")).as("toks"))
        .withColumn("margin_r",
          round(TextAnalysis.classifierMargin(col("text"), col("toks")), 6))
        .select(col("doc_id"), col("margin_r"),
          (col("margin_r") >= 0).as("keep"))
        .orderBy(col("doc_id")),
      Some {
        val margin =
          s"-1.2 + (CAST($duckSwCount AS DOUBLE) / $duckNTok) * 2.0 + " +
            s"($duckAlpha) * 1.5 + " +
            s"(CASE WHEN $duckMeanLen >= 3 AND $duckMeanLen <= 10 " +
            "THEN 0.8 ELSE 0.0 END) + " +
            s"CAST(least($duckNTok, 400) AS DOUBLE) / 400.0 * 0.5"
        s"""SELECT doc_id, round($margin, 6) AS margin_r,
           |  (round($margin, 6) >= 0) AS keep
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    QuerySpec("x10_text_tokens",
      "token statistics: whitespace, BPE-ish regex, distinct counts",
      (s, dir) => TextAnalysis.tokenStats(t(s, dir, "documents"),
        "doc_id", "text").orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  CAST(len($duckWsTokens) AS BIGINT) AS n_ws_tokens,
              |  CAST(len(regexp_extract_all(text,
              |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
              |  CAST(len(list_distinct($duckWsTokens)) AS BIGINT) AS n_uniq_tokens
              |FROM documents ORDER BY doc_id""".stripMargin)),

    QuerySpec("x11_fingerprint",
      "document fingerprints: md5-normalized + custom rolling-hash Expression",
      (s, dir) => {
        graft.functions.Register.rollingHash(s)
        t(s, dir, "documents")
          .select(col("doc_id"), md5Fingerprint(col("text")).as("md5_fp"),
            expr("rolling_hash(substr(text, 1, 64))").as("rh64"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS md5_fp,
             |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
             |    range(1, length(substr(text, 1, 64)) + 1),
             |    i -> ascii(substr(substr(text, 1, 64), i::INT, 1)))),
             |    (a, b) -> (a * 131 + b) % 2147483647) AS BIGINT) AS rh64
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QuerySpec("x12_json_extract",
      "JSON property extraction from the events.props column",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, event_type,
             |       CAST(props ->> 'k' AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    QuerySpec("x13_stream_tumbling_window",
      "streaming-equivalent tumbling 1h window aggregation (batch semantics " +
        "identical to the Structured Streaming plan in graft.streaming)",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast("double").as("sum_value"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"),
          col("sum_value"))
        .orderBy(col("ws"), col("event_type")),
      Some("""SELECT date_trunc('hour', ts) AS ws, event_type,
             |  count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin)),

    QuerySpec("x13b_time_spine_gapfill",
      "calendar-spine gap filling: generated hourly sequence " +
        "left-joined to hourly aggregates, empty buckets zero-filled",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val bounds = ev.agg(
          date_trunc("hour", min(col("ts"))).as("h0"),
          date_trunc("hour", max(col("ts"))).as("h1"))
        val spine = bounds.select(explode(
          sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hr"))
        val hourly = ev
          .groupBy(date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("n_raw"),
            sum(dec2(col("value"))).cast("double").as("sum_raw"))
        spine.join(hourly, Seq("hr"), "left")
          .select(col("hr"), coalesce(col("n_raw"), lit(0L)).as("n"),
            coalesce(col("sum_raw"), lit(0.0)).as("sum_value"))
          .orderBy(col("hr"))
      },
      Some("""WITH bounds AS (
             |  SELECT date_trunc('hour', min(ts)) AS h0,
             |         date_trunc('hour', max(ts)) AS h1 FROM events),
             |spine AS (
             |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
             |  FROM bounds),
             |hourly AS (
             |  SELECT date_trunc('hour', ts) AS hr, count(*) AS n_raw,
             |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_raw
             |  FROM events GROUP BY 1)
             |SELECT s.hr AS hr, CAST(coalesce(n_raw, 0) AS BIGINT) AS n,
             |       coalesce(sum_raw, 0.0) AS sum_value
             |FROM spine s LEFT JOIN hourly h ON s.hr = h.hr
             |ORDER BY s.hr""".stripMargin)),

    QuerySpec("x15_asof_join",
      "as-of join (composed: union-tag + keyed carry-forward window) vs " +
        "DuckDB's native ASOF LEFT JOIN — each event picks the user's " +
        "most recent signup at-or-before its timestamp",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val left = ev.select(col("event_id"), col("ts"), col("user_id"),
          col("value"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"), col("event_id"))
        graft.operators.Temporal.asOfJoinLeft(left, signups,
            keyCol = "user_id", tsCol = "ts", rightOrder = "event_id",
            payload = Seq("event_id", "ts"))
          .orderBy(col("event_id"))
      },
      Some("""WITH signups AS (
             |  SELECT user_id, ts, event_id FROM events
             |  WHERE event_type = 'signup')
             |SELECT e.event_id, e.ts, e.user_id, e.value,
             |       s.event_id AS asof_event_id, s.ts AS asof_ts
             |FROM events e ASOF LEFT JOIN signups s
             |  ON e.user_id = s.user_id AND e.ts >= s.ts
             |ORDER BY e.event_id""".stripMargin)),

    QuerySpec("x16_range_join",
      "bounded range self-join (grid-bucketed equi-join composition) vs " +
        "DuckDB's native interval theta-join: same-user event pairs " +
        "within 10 minutes",
      (s, dir) => graft.operators.Temporal.rangeJoinWithin(
          t(s, dir, "events"), keyCol = "user_id", idCol = "event_id",
          tsCol = "ts", toleranceSec = 600)
        .orderBy(col("id_a"), col("id_b")),
      Some("""SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b
             |FROM events a JOIN events b
             |  ON a.user_id = b.user_id AND a.event_id < b.event_id
             | AND b.ts >= a.ts - INTERVAL 10 MINUTE
             | AND b.ts <= a.ts + INTERVAL 10 MINUTE
             |ORDER BY id_a, id_b""".stripMargin)),

    QuerySpec("x14_sessionize",
      "gap-based user sessionization (batch twin of the stateful " +
        "flatMapGroupsWithState streaming operator)",
      (s, dir) => graft.streaming.Sessionize
        .batchSessions(t(s, dir, "events"), 1800L)
        .orderBy(col("user_id"), col("sess_id"))
        .select(col("user_id"), col("sess_id"), col("session_start"),
          col("session_end"), col("n_events"), col("sum_value")),
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             |         THEN 1 ELSE 0 END AS is_new
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS sess_id
             |  FROM flagged)
             |SELECT user_id, sess_id, min(ts) AS session_start,
             |       max(ts) AS session_end, count(*) AS n_events,
             |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM sess GROUP BY user_id, sess_id
             |ORDER BY user_id, sess_id""".stripMargin)),

    QuerySpec("x17_token_freq",
      "corpus term frequencies: explode tokens, count, total-order top-50",
      (s, dir) => t(s, dir, "documents")
        .select(explode(wsTokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50),
      Some(s"""SELECT t AS token, CAST(count(*) AS BIGINT) AS n
              |FROM (SELECT unnest($duckWsTokens) AS t FROM documents)
              |GROUP BY t ORDER BY n DESC, token LIMIT 50""".stripMargin)),

    QuerySpec("x18_hash_split",
      "deterministic train/val/test split: md5-derived bucket per doc " +
        "(stable across runs/engines/cluster layouts; no rand())",
      (s, dir) => graft.operators.Sampling
        .assignSplit(t(s, dir, "documents").select(col("doc_id")),
          "doc_id", trainPct = 80, valPct = 10)
        .orderBy(col("doc_id")),
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |      % 100 AS bucket
             |  FROM documents)
             |SELECT doc_id, bucket,
             |  CASE WHEN bucket < 80 THEN 'train'
             |       WHEN bucket < 90 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM h ORDER BY doc_id""".stripMargin)),

    QuerySpec("x19_dedup_clusters",
      "near-dup clustering: exact-dup + MinHash-LSH pair edges -> " +
        "connected components (min-id canonical label per doc) vs a " +
        "DuckDB recursive-CTE closure",
      (s, dir) => nearDupClusterLabels(s, dir).orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE $clusterCtes
              |$clusterSelect
              |ORDER BY doc_id""".stripMargin)),

    QuerySpec("x18b_leakage_safe_split",
      "cluster-aware train/val/test split: the md5 split bucket is " +
        "drawn on the near-dup CLUSTER label (x19's exact+MinHash " +
        "connected components), not the doc id, so a test document " +
        "can never have a near-duplicate sitting in train — the " +
        "eval-leakage guard a pretraining pipeline runs after dedup " +
        "clustering; past the labels the split itself stays a narrow " +
        "md5 projection, zero extra shuffles",
      (s, dir) => Sampling.assignSplit(nearDupClusterLabels(s, dir),
          "cluster_id", trainPct = 80, valPct = 10)
        .orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE $clusterCtes,
              |cl AS (
              |  ${clusterSelect.replace("\n", "\n  ")}),
              |h AS (
              |  SELECT doc_id, cluster_id,
              |    ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15))::BIGINT
              |      % 100 AS bucket
              |  FROM cl)
              |SELECT doc_id, cluster_id, bucket,
              |  CASE WHEN bucket < 80 THEN 'train'
              |       WHEN bucket < 90 THEN 'val'
              |       ELSE 'test' END AS split
              |FROM h ORDER BY doc_id""".stripMargin)),

    QuerySpec("x20_keywords_tfidf",
      "per-document keyword extraction: top-3 tokens by tf x (N/df) " +
        "rarity weight (log-free so both engines produce identical bits)",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, dir, "documents")
        val tok = docs.select(col("doc_id"),
          explode(wsTokens(col("text"))).as("token"))
        val tf = tok.groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = tok.groupBy(col("token"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(dfreq, "token").crossJoin(broadcast(n))
          .select(col("doc_id"), col("token"),
            (col("tf").cast("double") * col("n_docs") / col("df"))
              .as("score"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("token"))
        scored.withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("token"), col("score"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some(s"""WITH tok AS (
              |  SELECT doc_id, unnest($duckWsTokens) AS token FROM documents),
              |tf AS (
              |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
              |  FROM tok GROUP BY doc_id, token),
              |df AS (
              |  SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              |  FROM tok GROUP BY token),
              |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
              |scored AS (
              |  SELECT t.doc_id, t.token,
              |         CAST(t.tf AS DOUBLE) * n.n_docs / d.df AS score
              |  FROM tf t JOIN df d USING (token) CROSS JOIN n),
              |ranked AS (
              |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
              |    ORDER BY score DESC, token) AS BIGINT) AS rk
              |  FROM scored)
              |SELECT doc_id, rk, token, score FROM ranked
              |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    QuerySpec("x21_corpus_clean_pipeline",
      "end-to-end corpus hygiene (Corpus.clean): quality floor + " +
        "language allowlist + exact dedup + near-dup cluster keep-one, " +
        "composed from the individually verified operators and " +
        "verified END-TO-END against a DuckDB re-derivation",
      (s, dir) => graft.operators.Corpus.clean(t(s, dir, "documents"),
          "doc_id", "text", minQuality = 0.55, langs = Seq("en"))
        .select(col("doc_id"))
        .orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE $hygieneOracleChain
              |SELECT k.doc_id FROM kept k
              |LEFT JOIN labels l ON l.u = k.doc_id
              |WHERE least(k.doc_id, coalesce(l.mv, k.doc_id)) = k.doc_id
              |ORDER BY doc_id""".stripMargin)),

    QuerySpec("x21b_corpus_clean_keep_best",
      "hygiene with QUALITY-RANKED cluster representatives " +
        "(Corpus.cleanKeepBest): each near-dup cluster keeps its " +
        "highest-quality member, ties to lowest id — what a real " +
        "ingest keeps (near-dups differ by boilerplate/truncation; " +
        "min-id keeps the first copy, not the best one)",
      (s, dir) => graft.operators.Corpus.cleanKeepBest(
          t(s, dir, "documents"),
          "doc_id", "text", minQuality = 0.55, langs = Seq("en"))
        .select(col("doc_id"))
        .orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE $hygieneOracleChain,
              |clustered AS (
              |  SELECT k.doc_id, k.text,
              |    least(k.doc_id, coalesce(l.mv, k.doc_id)) AS cluster
              |  FROM kept k LEFT JOIN labels l ON l.u = k.doc_id),
              |qscored AS (
              |  SELECT doc_id, cluster, ($duckQuality) AS q FROM clustered),
              |reps AS (
              |  SELECT doc_id FROM (
              |    SELECT doc_id, row_number() OVER
              |      (PARTITION BY cluster ORDER BY q DESC, doc_id) AS rn
              |    FROM qscored) r
              |  WHERE rn = 1)
              |SELECT doc_id FROM reps ORDER BY doc_id""".stripMargin)),

    QuerySpec("x22_embedding_quantize",
      "symmetric int8 embedding quantization: per-vector scale + " +
        "quantized-array aggregates (floor(x+0.5) rounding is " +
        "bit-identical cross-engine; round()'s half-modes are not)",
      (s, dir) => {
        val q = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            int8Scale(col("embedding")).as("scale"))
          .select(col("vec_id"), col("scale"),
            quantizeInt8(col("embedding"), col("scale")).as("q"))
        q.select(col("vec_id"), col("scale"),
            aggregate(col("q"), lit(0L), (a, x) => a + x).as("sum_q"),
            array_max(transform(col("q"), x => abs(x))).as("max_abs_q"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |s AS (SELECT vec_id, v,
             |        coalesce(list_max(list_transform(v, x -> abs(x))) / 127,
             |                 0.0) AS scale
             |      FROM e),
             |q AS (SELECT vec_id, scale,
             |        CASE WHEN scale > 0
             |          THEN list_transform(v, x -> CAST(least(127, greatest(-127,
             |                 floor(x / scale + 0.5))) AS BIGINT))
             |          ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS qv
             |      FROM s)
             |SELECT vec_id, scale,
             |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), qv),
             |    (a, b) -> a + b) AS BIGINT) AS sum_q,
             |  CAST(list_max(list_transform(qv, x -> abs(x))) AS BIGINT)
             |    AS max_abs_q
             |FROM q ORDER BY vec_id""".stripMargin)),

    QuerySpec("x23_sequence_packing",
      "LLM sequence packing: docs -> fixed token-budget packs via a " +
        "distributed two-level prefix sum (bit-identical to the " +
        "textbook global-cumsum oracle; no global window over docs)",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), wsTokenCount(col("text")).as("n_tokens"))
        graft.operators.Packing
          .assignPacks(docs, "doc_id", "n_tokens", budget = 256L)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (
              |  SELECT doc_id, $duckNTok AS n_tokens
              |  FROM documents),
              |c AS (
              |  SELECT doc_id, n_tokens,
              |    sum(n_tokens) OVER (ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      - n_tokens AS excl
              |  FROM d)
              |SELECT doc_id, n_tokens,
              |       CAST(excl // 256 AS BIGINT) AS pack_id
              |FROM c ORDER BY doc_id""".stripMargin)),

    QuerySpec("x23b_pack_manifest",
      "pack manifest for the shard writer: per-pack doc count, token " +
        "total, id range",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), wsTokenCount(col("text")).as("n_tokens"))
        val assigned = graft.operators.Packing
          .assignPacks(docs, "doc_id", "n_tokens", budget = 256L)
        graft.operators.Packing.packManifest(assigned, "doc_id", "n_tokens")
          .orderBy(col("pack_id"))
      },
      Some(s"""WITH d AS (
              |  SELECT doc_id, $duckNTok AS n_tokens
              |  FROM documents),
              |c AS (
              |  SELECT doc_id, n_tokens,
              |    sum(n_tokens) OVER (ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      - n_tokens AS excl
              |  FROM d),
              |a AS (SELECT doc_id, n_tokens,
              |             CAST(excl // 256 AS BIGINT) AS pack_id FROM c)
              |SELECT pack_id, CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
              |       min(doc_id) AS first_id, max(doc_id) AS last_id
              |FROM a GROUP BY pack_id ORDER BY pack_id""".stripMargin)),

    QuerySpec("x24_corpus_mixing",
      "weighted deterministic corpus mixing: stride-interleave two " +
        "sources at a 2:1 ratio via per-source distributed ranks — " +
        "no RNG, stable under re-runs and appends",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"))
        val even = docs.filter(col("doc_id") % 2 === 0)
        val odd = docs.filter(col("doc_id") % 2 === 1)
        graft.operators.Mixing.weightedInterleave(
            Seq(("even", even, 2.0), ("odd", odd, 1.0)), "doc_id")
          .orderBy(col("mix_key"), col("source"), col("doc_id"))
      },
      Some("""WITH ev AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0),
             |od AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 1),
             |r_ev AS (SELECT doc_id,
             |  CAST(row_number() OVER (ORDER BY doc_id) - 1 AS DOUBLE) AS r
             |  FROM ev),
             |r_od AS (SELECT doc_id,
             |  CAST(row_number() OVER (ORDER BY doc_id) - 1 AS DOUBLE) AS r
             |  FROM od),
             |u AS (
             |  SELECT 'even' AS source, doc_id, (r + 0.5) / 2.0 AS mix_key
             |  FROM r_ev
             |  UNION ALL
             |  SELECT 'odd', doc_id, (r + 0.5) / 1.0 FROM r_od)
             |SELECT source, doc_id, mix_key FROM u
             |ORDER BY mix_key, source, doc_id""".stripMargin)),

    QuerySpec("x24b_temperature_mixing",
      "temperature-based language rebalancing (XLM / mC4, alpha=0.7): " +
        "shares follow n^alpha instead of the natural skew — closed-" +
        "form max-utilization downsampling keeps (n_min/n_lang)^(1-" +
        "alpha) of each language (the smallest keeps 100%) via the " +
        "deterministic md5 keep filter; one #langs-cardinality count " +
        "shuffle + a broadcast of the keep-rate frame, nothing else " +
        "is wide",
      (s, dir) => Sampling.temperatureSample(
          t(s, dir, "documents").select(col("doc_id"), col("lang")),
          "lang", "doc_id", alpha = 0.7)
        .select(col("doc_id"), col("lang"), col("keep_rate_r"))
        .orderBy(col("doc_id")),
      Some("""WITH counts AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n
             |  FROM documents GROUP BY lang),
             |mn AS (SELECT min(n) AS nmin FROM counts),
             |rates AS (
             |  SELECT lang,
             |    round(pow(CAST(nmin AS DOUBLE) / n, 1.0 - 0.7), 6)
             |      AS keep_rate_r
             |  FROM counts, mn)
             |SELECT d.doc_id, d.lang, r.keep_rate_r
             |FROM documents d JOIN rates r USING (lang)
             |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |    % 10000 < floor(keep_rate_r * 10000)
             |ORDER BY doc_id""".stripMargin)),

    QuerySpec("x25_boilerplate_removal",
      "C4-style boilerplate stripping: lines repeated across >= 2 " +
        "distinct docs are removed, documents rebuilt in original " +
        "line order (single-line corpora degenerate to cross-doc " +
        "text dedup, which is the honest semantic here)",
      (s, dir) => Dedup.stripBoilerplate(t(s, dir, "documents"),
          "doc_id", "text")
        .select(col("doc_id"), md5(col("text")).as("cleaned_md5"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id")),
      Some("""WITH lines AS (
             |  SELECT doc_id,
             |    unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos,
             |    unnest(string_split(text, chr(10))) AS line
             |  FROM documents),
             |bp AS (
             |  SELECT line FROM lines WHERE trim(line) <> ''
             |  GROUP BY line HAVING count(DISTINCT doc_id) >= 2),
             |kept AS (
             |  SELECT l.doc_id, l.pos, l.line FROM lines l
             |  WHERE NOT EXISTS (SELECT 1 FROM bp WHERE bp.line = l.line)),
             |rebuilt AS (
             |  SELECT doc_id,
             |    string_agg(line, chr(10) ORDER BY pos) AS cleaned
             |  FROM kept GROUP BY doc_id)
             |SELECT d.doc_id,
             |  md5(coalesce(r.cleaned, '')) AS cleaned_md5,
             |  CAST(length(coalesce(r.cleaned, '')) AS BIGINT) AS n_chars
             |FROM documents d LEFT JOIN rebuilt r USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    QuerySpec("x26_repetition_stats",
      "Gopher-style within-doc repetition: duplicate-line fraction + " +
        "top-bigram fraction — the degenerate-text signals per-token " +
        "quality scores miss",
      (s, dir) => TextAnalysis.repetitionStats(t(s, dir, "documents"),
          "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(s"""WITH base AS (
              |  SELECT doc_id,
              |    list_filter(string_split(text, chr(10)),
              |                x -> trim(x) <> '') AS ls,
              |    $duckWsTokens AS tk
              |  FROM documents),
             |line_stats AS (
             |  SELECT doc_id,
             |    CASE WHEN len(ls) > 0
             |      THEN 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls)
             |      ELSE 0.0 END AS dup_line_frac
             |  FROM base),
             |bg AS (
             |  SELECT doc_id, unnest(list_transform(
             |    range(1, len(tk) - 1 + 1),
             |    i -> tk[i] || ' ' || tk[i + 1])) AS bigram
             |  FROM base WHERE len(tk) >= 2),
             |counts AS (
             |  SELECT doc_id, bigram, count(*) AS n
             |  FROM bg GROUP BY doc_id, bigram),
             |top AS (
             |  SELECT doc_id, CAST(max(n) AS DOUBLE) / sum(n)
             |           AS top_bigram_frac
             |  FROM counts GROUP BY doc_id)
             |SELECT l.doc_id, l.dup_line_frac,
             |       coalesce(t.top_bigram_frac, 0.0) AS top_bigram_frac
             |FROM line_stats l LEFT JOIN top t USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    QuerySpec("x26b_gopher_repetition",
      "full Gopher repetition rule set: top-3-gram / top-4-gram " +
        "fractions and duplicate-5-gram mass, each computed in-row by " +
        "the native NgramRepetition expression (one counting pass per " +
        "n; zero shuffles) — the composed explode/groupBy form would " +
        "re-key every gram string in the corpus twice per n",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), wsTokens(col("text")).as("tk"))
        .select(col("doc_id"),
          ngramRepetition(col("tk"), 3).as("r3"),
          ngramRepetition(col("tk"), 4).as("r4"),
          ngramRepetition(col("tk"), 5).as("r5"))
        .select(col("doc_id"),
          col("r3.top_frac").as("top_3gram_frac"),
          col("r4.top_frac").as("top_4gram_frac"),
          col("r5.dup_frac").as("dup_5gram_frac"))
        .orderBy(col("doc_id")),
      Some {
        def ngramCtes(n: Int): String = {
          val gram = (0 until n).map(k => s"tk[i + $k]")
            .mkString(" || ' ' || ")
          s"""g$n AS (
             |  SELECT doc_id, unnest(list_transform(
             |    range(1, len(tk) - $n + 2), i -> $gram)) AS g
             |  FROM base WHERE len(tk) >= $n),
             |c$n AS (SELECT doc_id, g, count(*) AS n
             |        FROM g$n GROUP BY doc_id, g),
             |s$n AS (
             |  SELECT doc_id,
             |    CAST(max(n) AS DOUBLE) / sum(n) AS topf,
             |    CAST(coalesce(sum(CASE WHEN n > 1 THEN n END), 0)
             |      AS DOUBLE) / sum(n) AS dupf
             |  FROM c$n GROUP BY doc_id)""".stripMargin
        }
        s"""WITH base AS (
           |  SELECT doc_id, $duckWsTokens AS tk FROM documents),
           |${ngramCtes(3)},
           |${ngramCtes(4)},
           |${ngramCtes(5)}
           |SELECT b.doc_id,
           |  coalesce(s3.topf, 0.0) AS top_3gram_frac,
           |  coalesce(s4.topf, 0.0) AS top_4gram_frac,
           |  coalesce(s5.dupf, 0.0) AS dup_5gram_frac
           |FROM base b
           |LEFT JOIN s3 USING (doc_id)
           |LEFT JOIN s4 USING (doc_id)
           |LEFT JOIN s5 USING (doc_id)
           |ORDER BY b.doc_id""".stripMargin
      }),

    QuerySpec("x27_decontaminate",
      "benchmark decontamination: per-training-doc fraction of distinct " +
        "word trigrams appearing anywhere in the held-out eval slice " +
        "(doc_id % 10 = 7); contaminated = overlap >= 0.5. Eval gram " +
        "set broadcast — corpus text never shuffles",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val ev = docs.filter(pmod(col("doc_id"), lit(10)) === 7)
        val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
        Dedup.contaminationScores(train, ev, "doc_id", "text", n = 3)
          .withColumn("contaminated", col("overlap_frac") >= lit(0.5))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH train AS (
              |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7),
              |ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 7),
              |${decontamGramCtes("train", "tg")},
              |${decontamGramCtes("ev", "eg")},
              |eh AS (SELECT DISTINCT gram_h FROM eg_hashes),
              |scored AS (
              |  SELECT t.doc_id, count(*) AS n_grams,
              |    CAST(coalesce(sum(CASE WHEN e.gram_h IS NOT NULL
              |                            THEN 1 END), 0) AS BIGINT)
              |      AS n_matched
              |  FROM tg_hashes t LEFT JOIN eh e USING (gram_h)
              |  GROUP BY t.doc_id)
              |SELECT doc_id, n_grams, n_matched,
              |  CAST(n_matched AS DOUBLE) / n_grams AS overlap_frac,
              |  (CAST(n_matched AS DOUBLE) / n_grams >= 0.5) AS contaminated
              |FROM scored ORDER BY doc_id""".stripMargin)),

    QuerySpec("x27b_decontamination_report",
      "which eval items were hit: per eval doc, the number of training " +
        "docs sharing >= 3 distinct trigram hashes with it, and the " +
        "deepest overlap — the audit trail for every dropped doc",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val ev = docs.filter(pmod(col("doc_id"), lit(10)) === 7)
        val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
        Dedup.contaminationReport(train, ev, "doc_id", "text",
            n = 3, minShared = 3)
          .orderBy(col("eval_id"))
      },
      Some(s"""WITH train AS (
              |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7),
              |ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 7),
              |${decontamGramCtes("train", "tg")},
              |${decontamGramCtes("ev", "eg")},
              |pairs AS (
              |  SELECT e.doc_id AS eval_id, t.doc_id, count(*) AS n_shared
              |  FROM tg_hashes t
              |  JOIN eg_hashes e ON t.gram_h = e.gram_h
              |  GROUP BY e.doc_id, t.doc_id
              |  HAVING count(*) >= 3)
              |SELECT eval_id, count(*) AS n_train_hits,
              |       max(n_shared) AS max_shared
              |FROM pairs GROUP BY eval_id ORDER BY eval_id""".stripMargin)),

    QuerySpec("x28_pii_scrub",
      "PII scrubbing: emails / credit cards / IPv4s / phone numbers " +
        "redacted by the shared Corpus.piiPatterns table (documents " +
        "augmented with deterministic synthetic PII so the gate " +
        "exercises every class; both engines build and scrub the same " +
        "bytes)",
      (s, dir) => {
        val idS = col("doc_id").cast("string")
        val aug = t(s, dir, "documents").select(col("doc_id"), concat(
          col("text"),
          when(pmod(col("doc_id"), lit(2)) === 0,
            concat(lit(" reach me at user"), idS, lit("@mail.example.org")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit(" from host 10.1."),
              pmod(col("doc_id"), lit(200)).cast("string"), lit(".77")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0, lit(" call 555-867-5309"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(7)) === 0,
            lit(" card 4111 1111 1111 1111 on file")).otherwise(lit("")))
          .as("ptext"))
        val counted = graft.operators.Corpus.piiPatterns
          .foldLeft(aug) { case (df, (pat, tok)) =>
            df.withColumn(piiCountCol(tok),
              regexp_count(col("ptext"), lit(pat)).cast("long"))
          }
        counted
          .withColumn("scrubbed_md5",
            md5(graft.operators.Corpus.scrubPii(col("ptext"))))
          .select(col("doc_id") +: col("scrubbed_md5") +:
            graft.operators.Corpus.piiPatterns.map { case (_, tok) =>
              col(piiCountCol(tok)) }: _*)
          .orderBy(col("doc_id"))
      },
      Some {
        val countCols = graft.operators.Corpus.piiPatterns
          .map { case (pat, tok) =>
            s"CAST(len(regexp_extract_all(ptext, '$pat')) AS BIGINT) " +
              s"AS ${piiCountCol(tok)}"
          }.mkString(",\n  ")
        s"""WITH aug AS (
           |  SELECT doc_id, text ||
           |    CASE WHEN doc_id % 2 = 0 THEN ' reach me at user' ||
           |      CAST(doc_id AS VARCHAR) || '@mail.example.org'
           |      ELSE '' END ||
           |    CASE WHEN doc_id % 3 = 0 THEN ' from host 10.1.' ||
           |      CAST(doc_id % 200 AS VARCHAR) || '.77' ELSE '' END ||
           |    CASE WHEN doc_id % 5 = 0 THEN ' call 555-867-5309'
           |      ELSE '' END ||
           |    CASE WHEN doc_id % 7 = 0 THEN ' card 4111 1111 1111 1111 on file'
           |      ELSE '' END AS ptext
           |  FROM documents)
           |SELECT doc_id,
           |  md5(${graft.operators.Corpus.scrubPiiSql("ptext")})
           |    AS scrubbed_md5,
           |  $countCols
           |FROM aug ORDER BY doc_id""".stripMargin
      }),

    QuerySpec("x29_bpe_tokenize",
      "merges-table BPE encode (Sennrich rank-order passes over " +
        "wrapped-token strings): per-doc word and BPE-token counts " +
        "under the embedded 15-merge table — the real-token-budget " +
        "counter behind packing",
      (s, dir) => {
        val words = t(s, dir, "documents")
          .select(col("doc_id"), explode(wsTokens(col("text"))).as("w"))
        words
          .select(col("doc_id"),
            size(bpeTokens(col("w"), bpeMerges)).cast("long").as("n_tok"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("n_tok")).as("n_bpe_tokens"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH words AS (
              |  SELECT doc_id,
              |    unnest(string_split_regex(trim(text), '\\s+')) AS w
              |  FROM documents)
              |SELECT doc_id, count(*) AS n_words,
              |  CAST(sum(${bpeTokenCountSql("w", bpeMerges)}) AS BIGINT)
              |    AS n_bpe_tokens
              |FROM words GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    QuerySpec("x29b_bpe_fertility",
      "tokenizer-fit governance over the x29 merges table: per-doc " +
        "fertility (BPE tokens per word), single-char fallback mass " +
        "(the OOV proxy — chars no merge covered) and chars-per-token " +
        "compression — the metrics that pick a vocab before a " +
        "100 TB tokenization run",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), explode(wsTokens(col("text"))).as("w"))
        .select(col("doc_id"), length(col("w")).cast("long").as("n_chars"),
          bpeTokens(col("w"), bpeMerges).as("bt"))
        .select(col("doc_id"), col("n_chars"),
          size(col("bt")).cast("long").as("n_tok"),
          size(filter(col("bt"), t => length(t) === 1)).cast("long")
            .as("n_single"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          (sum(col("n_tok")).cast("double") /
            count(lit(1)).cast("double")).as("fertility"),
          (sum(col("n_single")).cast("double") /
            sum(col("n_tok")).cast("double")).as("singleton_frac"),
          (sum(col("n_chars")).cast("double") /
            sum(col("n_tok")).cast("double")).as("chars_per_tok"))
        .orderBy(col("doc_id")),
      Some(s"""WITH words AS (
              |  SELECT doc_id,
              |    unnest(string_split_regex(trim(text), '\\s+')) AS w
              |  FROM documents),
              |pw AS (
              |  SELECT doc_id, CAST(length(w) AS BIGINT) AS n_chars,
              |    ${bpeTokensSql("w", bpeMerges)} AS bt
              |  FROM words),
              |pw2 AS (
              |  SELECT doc_id, n_chars, CAST(len(bt) AS BIGINT) AS n_tok,
              |    CAST(len(list_filter(bt, t -> length(t) = 1)) AS BIGINT)
              |      AS n_single
              |  FROM pw)
              |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
              |  CAST(sum(n_tok) AS DOUBLE) / CAST(count(*) AS DOUBLE)
              |    AS fertility,
              |  CAST(sum(n_single) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE)
              |    AS singleton_frac,
              |  CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE)
              |    AS chars_per_tok
              |FROM pw2 GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    QuerySpec("x14b_session_window_builtin",
      "sessionization via Spark's NATIVE session_window aggregate " +
        "(merge-on-overlap; end = last event + gap) — one aggregation, " +
        "no custom state; DuckDB oracle derives the same boundaries",
      (s, dir) => t(s, dir, "events")
        .groupBy(session_window(col("ts"), "1800 seconds").as("sw"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(dec2(col("value"))).cast("double").as("sum_value"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"),
          col("sum_value"))
        .orderBy(col("user_id"), col("session_start")),
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             |         THEN 1 ELSE 0 END AS is_new
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT *, sum(is_new) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS sess_id
             |  FROM flagged)
             |SELECT user_id, min(ts) AS session_start,
             |       max(ts) + INTERVAL 1800 SECONDS AS session_end,
             |       count(*) AS n_events,
             |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM sess GROUP BY user_id, sess_id
             |ORDER BY user_id, session_start""".stripMargin)),

    QuerySpec("s10_bucketed_colocated_join",
      "bucketed persistent fact tables: both sides pre-shuffled on the " +
        "join key at write time, so the join plans with ZERO shuffle " +
        "exchanges below it (asserted in-query on the physical plan); " +
        "the result hash-matches the plain-join oracle",
      (s, dir) => {
        Warehouse.saveBucketed(t(s, dir, "orders"), "orders_bkt",
          Seq("o_orderkey"), 8)
        Warehouse.saveBucketed(t(s, dir, "lineitem"), "lineitem_bkt",
          Seq("l_orderkey"), 8)
        // merge hint: keep the demonstration a sort-merge join even at
        // scale factors where the orders side would broadcast
        val joined = s.table("lineitem_bkt").hint("merge")
          .join(s.table("orders_bkt"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"))
          .orderBy(col("o_orderpriority"))
        // plan contract, enforced non-silently: the join consumes
        // co-located buckets, so no exchange may appear below it (the
        // groupBy on the non-bucket column is the only shuffle)
        val smjs = joined.queryExecution.sparkPlan.collect {
          case j: SortMergeJoinExec => j
        }
        require(smjs.nonEmpty,
          "expected a sort-merge join over the bucketed tables")
        val shufflesBelowJoin = smjs.head.collect {
          case e: ShuffleExchangeExec => e
        }
        require(shufflesBelowJoin.isEmpty,
          s"bucketed co-located join must not shuffle; got:\n${smjs.head}")
        joined
      },
      Some("""SELECT o.o_orderpriority,
             |  CAST(count(*) AS BIGINT) AS n_items,
             |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_price
             |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |GROUP BY o.o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    QuerySpec("x33_context_chunking",
      "fixed-context chunking with overlap: each document's token " +
        "sequence split into 64-token windows advancing by 48 (16 " +
        "overlap) — the pretraining context-window step; per-chunk " +
        "offsets + content md5, all in-row (narrow projection + " +
        "posexplode, zero shuffles before the gate's ORDER BY)",
      (s, dir) => graft.operators.Packing.slidingChunks(
          t(s, dir, "documents"), "doc_id", "text",
          chunkSize = 64, overlap = 16)
        .orderBy(col("doc_id"), col("chunk_id")),
      Some(s"""WITH base AS (
              |  SELECT doc_id, $duckWsTokens AS tk FROM documents),
              |st AS (
              |  SELECT doc_id, tk,
              |    unnest(range(1, greatest(len(tk) - 16, 1) + 1, 48)) AS st
              |  FROM base)
              |SELECT doc_id,
              |  CAST((st - 1) // 48 AS BIGINT) AS chunk_id,
              |  CAST(st AS BIGINT) AS start_tok,
              |  CAST(least(64, len(tk) - st + 1) AS BIGINT) AS n_tokens,
              |  md5(array_to_string(list_slice(tk, st, st + 63), ' '))
              |    AS chunk_md5
              |FROM st ORDER BY doc_id, chunk_id""".stripMargin)),

    QuerySpec("s13_partition_pruned_scan",
      "hive-partitioned parquet layout + pruned read: events rewritten " +
        "partitioned by event_type, the filtered scan carries a " +
        "partition filter (asserted in-query) so pruned directories " +
        "are never listed or read; result hash-matches the plain " +
        "filtered oracle over the original parquet",
      (s, dir) => {
        val path = Warehouse.savePartitioned(t(s, dir, "events"),
          "events_part", Seq("event_type"))
        val q = s.read.parquet(path)
          .filter(col("event_type") === "purchase")
          .groupBy((col("user_id") % 100).as("user_bucket"))
          .agg(count(lit(1)).as("n_events"),
            min(col("event_id")).as("min_event_id"),
            max(col("event_id")).as("max_event_id"))
          .orderBy(col("user_bucket"))
        // plan contract: the scan must prune on the partition column,
        // not post-filter full data — a missing partition filter here
        // means the layout silently lost its only reason to exist
        val scans = q.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
        require(scans.nonEmpty, "expected a parquet file scan")
        require(scans.head.partitionFilters.exists(
            _.references.exists(_.name == "event_type")),
          s"scan must carry an event_type partition filter; got:\n${scans.head}")
        q
      },
      Some("""SELECT user_id % 100 AS user_bucket,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  min(event_id) AS min_event_id,
             |  max(event_id) AS max_event_id
             |FROM events WHERE event_type = 'purchase'
             |GROUP BY user_bucket ORDER BY user_bucket""".stripMargin)),

    QuerySpec("s12_scd2_merge",
      "SCD2 dimension merge: customer segments as a type-2 history, " +
        "one batch with changed (%7), unchanged-resent (%5, exercises " +
        "the null-safe no-change path) and brand-new (+1M keys, %13) " +
        "rows — changed keys close their predecessor and open a new " +
        "version; ONE full-outer shuffle on the key, history rows " +
        "never join",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val dim = cust.select(col("c_custkey"), col("c_mktsegment"),
          to_date(lit("1995-01-01")).as("valid_from"),
          lit(null).cast("date").as("valid_to"),
          lit(true).as("is_current"))
        val updates = cust.filter(col("c_custkey") % 7 === 0)
            .select(col("c_custkey"),
              concat(col("c_mktsegment"), lit("-R2")).as("c_mktsegment"))
          .unionAll(cust
            .filter(col("c_custkey") % 5 === 0 && col("c_custkey") % 7 =!= 0)
            .select(col("c_custkey"), col("c_mktsegment")))
          .unionAll(cust.filter(col("c_custkey") % 13 === 0)
            .select((col("c_custkey") + 1000000).as("c_custkey"),
              lit("NEW").as("c_mktsegment")))
        Relational.scd2Merge(dim, updates, "c_custkey",
            Seq("c_mktsegment"), to_date(lit("2000-06-01")))
          .orderBy(col("c_custkey"), col("valid_from"))
      },
      // the oracle states the RESULT directly: '-R2' always differs,
      // resent rows never do, so the merge mechanics reduce to set
      // arithmetic on the key residues
      Some("""WITH res AS (
             |  SELECT c_custkey, c_mktsegment,
             |    DATE '1995-01-01' AS valid_from,
             |    CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
             |  FROM customer WHERE c_custkey % 7 <> 0
             |  UNION ALL
             |  SELECT c_custkey, c_mktsegment,
             |    DATE '1995-01-01', DATE '2000-06-01', FALSE
             |  FROM customer WHERE c_custkey % 7 = 0
             |  UNION ALL
             |  SELECT c_custkey, c_mktsegment || '-R2',
             |    DATE '2000-06-01', NULL, TRUE
             |  FROM customer WHERE c_custkey % 7 = 0
             |  UNION ALL
             |  SELECT c_custkey + 1000000, 'NEW',
             |    DATE '2000-06-01', NULL, TRUE
             |  FROM customer WHERE c_custkey % 13 = 0)
             |SELECT * FROM res
             |ORDER BY c_custkey, valid_from""".stripMargin)),

    QuerySpec("s11_jsonl_roundtrip",
      "JSONL source/sink round-trip: corpus written as newline-" +
        "delimited JSON, read back under a DECLARED schema, content " +
        "digests verified — the late-bound oracle reads the very " +
        "same part files this run wrote (NOTE: like s10, building " +
        "this query performs the write eagerly — it IS the sink op)",
      (s, dir) => {
        // per-scale path so a later different-sf run can never leave
        // files a re-checked oracle would silently mis-validate
        val path = sys.props.getOrElse("graft.jsonl.tmp",
          s"/tmp/graft_jsonl_docs_${new java.io.File(dir).getName}")
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        graft.sources.Jsonl.write(docs, path)
        graft.sources.Jsonl.lastRoundTripPath = Some(path)
        val schema = new StructType()
          .add("doc_id", LongType).add("text", StringType)
        graft.sources.Jsonl.read(s, path, schema)
          .select(col("doc_id"), md5(col("text")).as("text_md5"),
            length(col("text")).cast("long").as("n_chars"))
          .orderBy(col("doc_id"))
      },
      None,
      oracleGen = () => graft.sources.Jsonl.lastRoundTripPath.map(p =>
        s"""SELECT doc_id, md5(text) AS text_md5,
           |       CAST(length(text) AS BIGINT) AS n_chars
           |FROM read_json('$p/part-*',
           |       format='newline_delimited',
           |       columns={doc_id: 'BIGINT', text: 'VARCHAR'})
           |ORDER BY doc_id""".stripMargin)),

    QuerySpec("q5_profile_summarize",
      "per-column data profile (the DuckDB SUMMARIZE surface): type, " +
        "rows, nulls, exact distinct count per column in one pass",
      (s, dir) => Warehouse.profile(t(s, dir, "orders"))
        .orderBy(col("column_name")),
      Some {
        // the orders schema is stable synthetic test data; the Spark
        // side derives names/types from the frame at runtime
        val cols = Seq(
          "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
          "o_orderstatus" -> "string", "o_totalprice" -> "double",
          // Spark 4 reads parquet timestamps without timezone as NTZ
          "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string")
        cols.map { case (c, t) =>
          s"""SELECT '$c' AS column_name, '$t' AS data_type,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_nulls,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
             |FROM orders""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
      }),

    QuerySpec("x30_domain_quota",
      "per-domain quota sampling (the CC per-site cap): keep each " +
        "source's 10 lowest-id docs via the two-phase sharded rank — " +
        "no task ever sees more than shards*quota rows of one domain",
      (s, dir) => graft.operators.Sampling.domainQuota(
          t(s, dir, "documents"), "source", "doc_id", quota = 10)
        .select(col("source"), col("doc_id"))
        .orderBy(col("source"), col("doc_id")),
      Some("""SELECT source, doc_id FROM (
             |  SELECT source, doc_id, row_number() OVER
             |    (PARTITION BY source ORDER BY doc_id) AS rn
             |  FROM documents) t
             |WHERE rn <= 10 ORDER BY source, doc_id""".stripMargin)),

    QuerySpec("g7_quantile_bound",
      "numeric quantile profiling with an asserted sketch bound: " +
        "exact min/max per column + approx_percentile(10k) required " +
        "inside the rank-tolerance envelope [exact(p-.005), " +
        "exact(p+.005)] (p50, p95) — the epsilon-quantile guarantee " +
        "the sketch makes, granularity-independent; g4's pattern",
      (s, dir) => Warehouse.profileQuantiles(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
          Seq(0.5, 0.95))
        .orderBy(col("column_name")),
      Some(Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map { c =>
          s"""SELECT '$c' AS column_name,
             |  CAST(min($c) AS DOUBLE) AS min_val,
             |  CAST(max($c) AS DOUBLE) AS max_val,
             |  TRUE AS p50_within_tol, TRUE AS p95_within_tol
             |FROM lineitem""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name"))),

    QuerySpec("q5b_profile_sampled_approx",
      "the 100 TB profile form: deterministic 10% hash-sample slice " +
        "profiled exactly + HLL++ distinct asserted within 5% of the " +
        "sampled-exact count (g4's bound-assertion pattern per column)",
      (s, dir) => Warehouse.profileSampled(t(s, dir, "orders"),
          "o_orderkey", pct = 10)
        .orderBy(col("column_name")),
      Some {
        val cols = Seq(
          "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
          "o_orderstatus" -> "string", "o_totalprice" -> "double",
          "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string")
        val slice = "('0x' || substr(md5(CAST(o_orderkey AS VARCHAR))" +
          ", 1, 15))::BIGINT % 100 < 10"
        cols.map { case (c, t) =>
          s"""SELECT '$c' AS column_name, '$t' AS data_type,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_nulls,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  TRUE AS approx_within_tol
             |FROM orders WHERE $slice""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
      }),

    QuerySpec("m1_multimodal_binary_meta",
      "binary-column plumbing: opaque bytes + typed metadata extraction",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("bytes"))
        .select(col("doc_id"),
          octet_length(col("bytes")).cast("long").as("n_bytes"),
          substring(hex(col("bytes")), 1, 8).as("magic_hex"),
          md5(col("bytes")).as("content_md5"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  octet_length(text::BLOB) AS n_bytes,
             |  substr(hex(text::BLOB), 1, 8) AS magic_hex,
             |  md5(text) AS content_md5
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QuerySpec("m2_multimodal_decode",
      "typed mapPartitions decode pipeline over NON-image payloads " +
        "(text bytes sniff as octet-stream and take the md5 stub arm; " +
        "md5-deterministic pseudo-features keep the JVM path " +
        "oracle-verified; real image decoding is m2b)",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val media = graft.operators.Multimodal.fromBinaryColumn(
          s, docs, "doc_id", "text")
        graft.operators.Multimodal.decodeFeatures(media).toDF()
          .select(col("id"), col("n_bytes"), col("magic_hex"),
            col("content_md5"), col("width"), col("height"))
          .orderBy(col("id"))
      },
      Some("""WITH h AS (
             |  SELECT doc_id AS id,
             |    CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
             |    lower(substr(hex(text::BLOB), 1, 8)) AS magic_hex,
             |    md5(text) AS content_md5,
             |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv
             |  FROM documents)
             |SELECT id, n_bytes, magic_hex, content_md5,
             |  CAST(hv % 640 + 16 AS BIGINT) AS width,
             |  CAST((hv // 640) % 480 + 16 AS BIGINT) AS height
             |FROM h ORDER BY id""".stripMargin)),

    QuerySpec("m2b_multimodal_decode_real",
      "REAL image decode (javax.imageio, JDK-native): per doc a " +
        "deterministic (doc_id % 64 + 16) x (doc_id % 48 + 16) PNG is " +
        "sniffed and pixel-decoded back — the oracle states the " +
        "dimensions as arithmetic, so a decode that lied about " +
        "width/height or validity hash-fails; the per-row DECODE is " +
        "the operator under test, so the fixture ENCODE is memoized " +
        "per partition over the lcm(64,48)=192 distinct dimension " +
        "pairs; both run in the narrow mapPartitions stage, no shuffle",
      (s, dir) => {
        import s.implicits._
        val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            val memo = scala.collection.mutable.HashMap
              .empty[(Int, Int), Array[Byte]]
            it.map { id =>
              val dims = ((id % 64 + 16).toInt, (id % 48 + 16).toInt)
              val bytes = memo.getOrElseUpdate(dims,
                graft.operators.Multimodal.synthPng(dims._1, dims._2))
              graft.operators.Multimodal.MediaRecord(id, bytes,
                graft.operators.Multimodal.sniffMime(bytes))
            }
          }
        graft.operators.Multimodal.decodeFeatures(media).toDF()
          .select(col("id"), col("width"), col("height"), col("is_valid"))
          .orderBy(col("id"))
      },
      Some("""SELECT doc_id AS id,
             |  CAST(doc_id % 64 + 16 AS BIGINT) AS width,
             |  CAST(doc_id % 48 + 16 AS BIGINT) AS height,
             |  TRUE AS is_valid
             |FROM documents ORDER BY id""".stripMargin)),

    QuerySpec("m2c_multimodal_audio_real",
      "REAL audio decode (javax.sound.sampled, JDK-native): per doc a " +
        "deterministic PCM-16 WAV — rate 8000 + (doc_id % 5) * 2000, " +
        "channels 1 + doc_id % 2, frames 1000 + (doc_id % 7) * 500 — " +
        "is sniffed and container-parsed back; the oracle states " +
        "rate/channels/frames/duration as arithmetic, so a parse " +
        "that misread the fmt or data chunk hash-fails; the per-row " +
        "PARSE is the operator under test, so the fixture encode is " +
        "memoized per partition over the 5*2*7=70 distinct container " +
        "shapes; both run in the narrow mapPartitions stage, no shuffle",
      (s, dir) => {
        import s.implicits._
        val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            val memo = scala.collection.mutable.HashMap
              .empty[(Int, Int, Int), Array[Byte]]
            it.map { id =>
              val shape = ((8000 + (id % 5) * 2000).toInt,
                (1 + id % 2).toInt, (1000 + (id % 7) * 500).toInt)
              val bytes = memo.getOrElseUpdate(shape,
                graft.operators.Multimodal.synthWav(
                  shape._1, shape._2, shape._3))
              graft.operators.Multimodal.MediaRecord(id, bytes,
                graft.operators.Multimodal.sniffMime(bytes))
            }
          }
        graft.operators.Multimodal.decodeAudioFeatures(media).toDF()
          .select(col("id"), col("sample_rate"), col("channels"),
            col("n_frames"), col("duration_ms"), col("is_valid"))
          .orderBy(col("id"))
      },
      Some("""SELECT doc_id AS id,
             |  CAST(8000 + (doc_id % 5) * 2000 AS BIGINT) AS sample_rate,
             |  CAST(1 + doc_id % 2 AS BIGINT) AS channels,
             |  CAST(1000 + (doc_id % 7) * 500 AS BIGINT) AS n_frames,
             |  CAST((1000 + (doc_id % 7) * 500) * 1000
             |    // (8000 + (doc_id % 5) * 2000) AS BIGINT) AS duration_ms,
             |  TRUE AS is_valid
             |FROM documents ORDER BY id""".stripMargin)),

    QuerySpec("m2d_multimodal_video_real",
      "REAL video container metadata (no codec): per doc a " +
        "deterministic MP4 (even doc_id: ISO BMFF ftyp+moov/mvhd/" +
        "tkhd) or WebM (odd doc_id: EBML Segment/Info/Tracks) " +
        "container — dims (320 + id%8*16) x (180 + id%6*30), " +
        "duration 1000 + id%10*500 ms — is sniffed and header-walked " +
        "back; the oracle states container/dims/duration as " +
        "arithmetic, so a walk that misread a box size, a 16.16 " +
        "fixed-point dimension, or an EBML vint hash-fails; encode " +
        "memoized per partition over the bounded shape set; narrow " +
        "mapPartitions stage, no shuffle",
      (s, dir) => {
        import s.implicits._
        val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            val memo = scala.collection.mutable.HashMap
              .empty[(Boolean, Int, Int, Long), Array[Byte]]
            it.map { id =>
              val shape = (id % 2 == 0, (320 + (id % 8) * 16).toInt,
                (180 + (id % 6) * 30).toInt, 1000L + (id % 10) * 500L)
              val bytes = memo.getOrElseUpdate(shape,
                if (shape._1)
                  graft.operators.Multimodal.synthMp4(
                    shape._2, shape._3, shape._4)
                else
                  graft.operators.Multimodal.synthWebm(
                    shape._2, shape._3, shape._4))
              graft.operators.Multimodal.MediaRecord(id, bytes,
                graft.operators.Multimodal.sniffMime(bytes))
            }
          }
        graft.operators.Multimodal.decodeVideoFeatures(media).toDF()
          .select(col("id"), col("container"), col("width"),
            col("height"), col("duration_ms"), col("is_valid"))
          .orderBy(col("id"))
      },
      Some("""SELECT doc_id AS id,
             |  CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'webm' END
             |    AS container,
             |  CAST(320 + (doc_id % 8) * 16 AS BIGINT) AS width,
             |  CAST(180 + (doc_id % 6) * 30 AS BIGINT) AS height,
             |  CAST(1000 + (doc_id % 10) * 500 AS BIGINT) AS duration_ms,
             |  TRUE AS is_valid
             |FROM documents ORDER BY id""".stripMargin)),

    QuerySpec("m3_multimodal_transform",
      "resize + frame-sample plumbing: aspect-fit dims and evenly " +
        "spaced frame offsets over the stub duration (arithmetic " +
        "bit-identical cross-engine)",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val media = graft.operators.Multimodal.fromBinaryColumn(
          s, docs, "doc_id", "text")
        val feats = graft.operators.Multimodal.decodeFeatures(media)
        graft.operators.Multimodal.transformStage(feats, 64, 64, 3).toDF()
          .orderBy(col("id"), col("frame_idx"))
      },
      Some("""WITH h AS (
             |  SELECT doc_id AS id,
             |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv
             |  FROM documents),
             |dims AS (
             |  SELECT id,
             |    CAST(hv % 640 + 16 AS BIGINT) AS width,
             |    CAST((hv // 640) % 480 + 16 AS BIGINT) AS height,
             |    CAST(hv % 120000 AS BIGINT) AS dur
             |  FROM h),
             |resized AS (
             |  SELECT *,
             |    CAST(floor(width * least(1.0, 64.0 / width, 64.0 / height))
             |      AS BIGINT) AS resized_w,
             |    CAST(floor(height * least(1.0, 64.0 / width, 64.0 / height))
             |      AS BIGINT) AS resized_h
             |  FROM dims),
             |frames AS (
             |  SELECT id, width, height, resized_w, resized_h, dur,
             |         unnest([0, 1, 2]) AS frame_idx
             |  FROM resized)
             |SELECT id, width, height, resized_w, resized_h, frame_idx,
             |  CAST(frame_idx * dur // 3 AS BIGINT) AS frame_offset_ms
             |FROM frames ORDER BY id, frame_idx""".stripMargin)),

    QuerySpec("x35_exact_substring_dedup",
      "exact duplicated-SPAN removal (Lee et al. 2022 ExactSubstr " +
        "re-expressed as keyed dataflow): every 8-token window hashed " +
        "in-row, occurrences past the global first removed token-wise, " +
        "survivors reassembled — one window-hash shuffle + one per-doc " +
        "groupBy; never pairwise, no suffix array, no task ever holds " +
        "more than one document",
      (s, dir) => Dedup.exactSubstringDedup(t(s, dir, "documents"),
          "doc_id", "text", l = 8)
        .orderBy(col("doc_id")),
      Some(Dedup.exactSubstringOracleSql("documents", "doc_id", "text", 8))),

    QuerySpec("x35b_duplicate_spans",
      "MAXIMAL duplicated spans — the multi-length span report behind " +
        "x35's removal (Lee et al. 2022 suffix-array semantics as " +
        "dataflow): duplicated 8-token seed windows are extended and " +
        "merged gaps-and-islands style into maximal spans, so a " +
        "100-token copied paragraph is ONE span row at full length, " +
        "not 93 window hits; same shuffle budget as x35 (one window-" +
        "hash exchange + one per-doc exchange whose state is a single " +
        "document's seed starts)",
      (s, dir) => Dedup.duplicateSpans(t(s, dir, "documents"),
          "doc_id", "text", l = 8)
        .orderBy(col("doc_id"), col("span_start")),
      Some(Dedup.duplicateSpansOracleSql("documents", "doc_id",
        "text", 8))),

    QuerySpec("x36_bm25_retrieval",
      "BM25 top-20 lexical retrieval (Robertson & Zaragoza 2009) for " +
        "a 3-term query: ln-idf BM25, per-doc term scores folded in " +
        "sorted order, score rounded to 6dp before ranking so both " +
        "engines cut the same top-k; terms filtered AT THE SCAN so the " +
        "corpus text is never shuffled, top-k is TakeOrdered not a " +
        "global sort",
      (s, dir) => Retrieval.bm25TopK(t(s, dir, "documents"),
        "doc_id", "text", Seq("spark", "window", "merge"), k = 20),
      Some(Retrieval.bm25OracleSql("documents", "doc_id", "text",
        Seq("spark", "window", "merge"), k = 20))),

    QuerySpec("x36b_hybrid_rrf",
      "hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. " +
        "2009): x36's BM25 lexical top-20 and the exact-cosine dense " +
        "top-20 (query vector 0) fused by sum(1/(60+rank)) — rank " +
        "positions only, never the incomparable raw scores, so no " +
        "calibration step; fusion touches 40 rows total, the cost " +
        "stays in the two retriever legs",
      (s, dir) => {
        val lex = Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id",
            "text", Seq("spark", "window", "merge"), k = 20)
          .select(col("doc_id").as("id"), col("score_r"))
          .withColumn("rank", row_number().over(
            Window.orderBy(col("score_r").desc, col("id"))))
          .select(col("id"), col("rank"))
        val emb = t(s, dir, "embeddings")
        val vec = Similarity.bruteForceTopK(emb,
            emb.filter(col("vec_id") === 0), "vec_id", "embedding", 20)
          .select(col("did").as("id"), col("rn").as("rank"))
        Retrieval.rrfFuse(Seq("lex" -> lex, "vec" -> vec), k0 = 60, k = 10)
          .select(col("id").as("doc_id"), col("rn"), col("rrf_r"),
            col("lex_rn"), col("vec_rn"))
          .orderBy(col("rn"))
      },
      Some(s"""WITH lexraw AS (
              |  ${Retrieval.bm25OracleSql("documents", "doc_id", "text",
                   Seq("spark", "window", "merge"), k = 20)
                   .replace("\n", "\n  ")}),
              |lex AS (
              |  SELECT doc_id AS id, CAST(row_number() OVER
              |    (ORDER BY score_r DESC, doc_id) AS BIGINT) AS lex_rn
              |  FROM lexraw),
              |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
              |      FROM embeddings WHERE vec_id = 0),
              |c AS (SELECT vec_id AS did, embedding::DOUBLE[] AS dvec
              |      FROM embeddings),
              |scored AS (
              |  SELECT did,
              |    CASE WHEN sqrt(list_dot_product(qvec, qvec)) *
              |              sqrt(list_dot_product(dvec, dvec)) > 0
              |      THEN list_dot_product(qvec, dvec) /
              |           (sqrt(list_dot_product(qvec, qvec)) *
              |            sqrt(list_dot_product(dvec, dvec)))
              |      ELSE 0.0 END AS cos
              |  FROM c JOIN q ON qid <> did),
              |vec AS (
              |  SELECT did AS id, CAST(row_number() OVER
              |    (ORDER BY cos DESC, did) AS BIGINT) AS vec_rn
              |  FROM scored QUALIFY vec_rn <= 20),
              |fused AS (
              |  SELECT coalesce(l.id, v.id) AS doc_id, l.lex_rn, v.vec_rn,
              |    round(coalesce(1.0/(60 + l.lex_rn), 0.0) +
              |          coalesce(1.0/(60 + v.vec_rn), 0.0), 6) AS rrf_r
              |  FROM lex l FULL OUTER JOIN vec v ON l.id = v.id)
              |SELECT doc_id, CAST(row_number() OVER
              |    (ORDER BY rrf_r DESC, doc_id) AS BIGINT) AS rn,
              |  rrf_r, lex_rn, vec_rn
              |FROM fused
              |QUALIFY rn <= 10
              |ORDER BY rn""".stripMargin)),

    QuerySpec("x37_bloom_join_prefilter",
      "bloom-sketch join prefilter: Spark's native bloom aggregate " +
        "over high-value order keys (driver-collected KB-scale binary " +
        "riding the plan as a literal — InjectRuntimeFilter's own " +
        "materialization shape), pruning lineitem codegen'd at the " +
        "scan with zero shuffle; the exact join re-verifies survivors " +
        "so bloom false positives never reach the result",
      (s, dir) => {
        val hot = t(s, dir, "orders")
          .filter(col("o_totalprice") > 150000)
          .select(col("o_orderkey"), col("o_orderpriority"))
        val sketch = hot.agg(SketchFunctions.bloomFilterAgg(
            col("o_orderkey"), 100000L).as("bf"))
          .head.getAs[Array[Byte]]("bf")
        t(s, dir, "lineitem")
          .filter(SketchFunctions.mightContain(sketch, col("l_orderkey")))
          .join(hot, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            sum(dec2(col("l_extendedprice")) *
              (lit(1) - dec2(col("l_discount"))))
              .cast("double").as("revenue"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |       (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             |    AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_totalprice > 150000
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    QuerySpec("x38_perplexity_buckets",
      "CCNet-style LM quality filter (Wenzek et al. 2020): per-doc " +
        "unigram cross-entropy under a model trained on the trusted " +
        "English slice, add-one smoothing, then head/middle/tail " +
        "terciles PER LANGUAGE via ntile over a total order — the " +
        "perplexity-bucketing stage of a web-scale pretraining " +
        "pipeline; token-sorted left fold + 6dp rounding make the ln " +
        "arithmetic hash-stable across engines",
      (s, dir) => LanguageModel.crossEntropyBuckets(
        t(s, dir, "documents"), "doc_id", "text", "lang", "lang = 'en'"),
      Some(LanguageModel.crossEntropyOracleSql(
        "documents", "doc_id", "text", "lang", "lang = 'en'"))),

    QuerySpec("x39_pq_adc_topk",
      "product-quantization ANN, IVFADC shape (Jégou et al. 2011): " +
        "corpus compressed to 8 one-byte PQ codes by a deterministic " +
        "per-subspace Lloyd trainer (ONE fused shuffle per iteration " +
        "for all subspaces), IVF cell pruning, per-query LUTs, " +
        "asymmetric inner-product scoring that never re-reads the raw " +
        "vectors; late-bound oracle embeds the trained codebooks AND " +
        "coarse centroids as literals and hash-matches bit-for-bit",
      (s, dir) => withTrainerCache { hook =>
        val emb = t(s, dir, "embeddings")
        Similarity.adcTopKWith(emb, emb.filter(col("vec_id") < 8),
            "vec_id", "embedding", 5, memoBooks(s, dir, hook),
            memoCentroids(s, dir, hook), nProbes = 2)
          .select(col("qid"), col("rn"), col("did"),
            round(col("adc"), 6).as("adc_r"))
          .orderBy(col("qid"), col("rn"))
      },
      None,
      oracleGen = () => for {
        books <- Similarity.trainedCodebooks.get((8, 8, 2, ""))
        cents <- Similarity.trainedCentroids.get((8, 2, ""))
      } yield Similarity.adcOracleSql("embeddings", "vec_id", "embedding",
        5, books, cents, nProbes = 2, queryPred = "vec_id < 8")),

    QuerySpec("s14_zorder_clustered_scan",
      "Z-order (Morton) clustered layout + two-column box query: " +
        "lineitem rewritten z-clustered on (l_partkey, l_suppkey) — " +
        "one range exchange + in-partition sort, same cost as a " +
        "single-column sort — so every file covers a tight box in " +
        "BOTH dimensions and min/max stats prune filters on either; " +
        "the scan is asserted in-query to push both predicates down, " +
        "and LayoutSpec proves the per-file box tightness against a " +
        "linear-sort baseline",
      (s, dir) => {
        // bits auto-derived from the key domain: a hardcoded width
        // (21 formerly) silently collides z-cells once partkey grows
        // past 2^21 at SF >= ~10
        val path = Layout.saveZOrdered(t(s, dir, "lineitem"),
          "lineitem_zorder", "l_partkey", "l_suppkey", bits = 0,
          nFiles = 8)
        val q = s.read.parquet(path)
          .filter(col("l_partkey").between(100, 300) &&
            col("l_suppkey").between(10, 40))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"))
          .orderBy(col("l_returnflag"))
        // plan contract: both cluster-column predicates must reach the
        // parquet scan (PushedFilters) — that is what turns the
        // z-layout's per-file min/max boxes into skipped IO
        val scans = q.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
        require(scans.nonEmpty, "expected a parquet file scan")
        val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
        require(pushed.contains("l_partkey") && pushed.contains("l_suppkey"),
          s"both box predicates must be pushed to the scan; got: $pushed")
        q
      },
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_price
             |FROM lineitem
             |WHERE l_partkey BETWEEN 100 AND 300
             |  AND l_suppkey BETWEEN 10 AND 40
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QuerySpec("s14b_bloom_point_lookup",
      "parquet bloom-filter layout + point lookup — the standard " +
        "needle-in-100 TB access path for a HIGH-CARDINALITY key the " +
        "layout is NOT sorted by (min/max stats can't prune a " +
        "hash-distributed key): lineitem rewritten hash-distributed " +
        "on l_orderkey with split-block bloom filters per row group " +
        "and a bounded block size so files hold several row groups; " +
        "the builder walks the WRITTEN footers and REQUIRES every " +
        "row group carries a filter AND the probe key's candidate " +
        "row groups are a strict minority (the skipped majority is " +
        "the saved IO), plus the equality predicate reaching the " +
        "scan as a pushed filter; the lookup result itself is " +
        "hash-gated against DuckDB over the original table",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey").cast("long").as("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_partkey").cast("long").as("l_partkey"),
          dec2(col("l_quantity")).as("qty"),
          col("l_returnflag"))
        val path = Layout.saveBloomFiltered(li, "lineitem_bloom",
          "l_orderkey", nFiles = 4, expectedNdv = 20000L,
          blockBytes = 256L << 10)
        // deterministic probe both engines can name: the max key
        val probe = li.agg(max(col("l_orderkey"))).head().getLong(0)
        val (total, withBloom, cand) =
          Layout.bloomPointLookupStats(s, path, "l_orderkey", probe)
        require(total > 0 && withBloom == total,
          s"every row group must carry a bloom filter on l_orderkey; " +
            s"got $withBloom of $total")
        require(cand < total,
          s"bloom filters must rule out row groups for the probe: " +
            s"$cand candidates of $total row groups — no skip, no point")
        // boundary convention: decimal never crosses to the
        // comparator (representational divergence vs DuckDB), and the
        // ORDER BY must be a total order — the synthetic fixture has
        // duplicate (l_orderkey, l_linenumber) pairs (see
        // ParityQueries note on the fixture trap), so l_partkey and
        // qty complete the key.
        val q = s.read.parquet(path)
          .filter(col("l_orderkey") === probe)
          .withColumn("qty", col("qty").cast("double"))
          .orderBy(col("l_linenumber"), col("l_partkey"), col("qty"),
            col("l_returnflag"))
        val scans = q.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
        require(scans.nonEmpty, "expected a parquet file scan")
        val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
        require(pushed.contains("l_orderkey"),
          s"point predicate must be pushed to the scan; got: $pushed")
        q
      },
      Some("""SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
             |  CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |  CAST(l_partkey AS BIGINT) AS l_partkey,
             |  CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty,
             |  l_returnflag
             |FROM lineitem
             |WHERE l_orderkey = (SELECT max(l_orderkey) FROM lineitem)
             |ORDER BY l_linenumber, l_partkey, qty, l_returnflag"""
        .stripMargin)),

    QuerySpec("x40_heavy_hitters_two_phase",
      "scalable heavy-hitter tokens, sample-then-verify: phase 1 " +
        "counts a deterministic 20% hash-sample of docs and keeps a " +
        "candidate pool (total-order top-N), phase 2 recounts ONLY " +
        "candidate tokens over the full corpus — the wide shuffle " +
        "carries candidate rows instead of every token occurrence, " +
        "the at-scale shape for vocabulary/stopword mining; exact " +
        "counts in the output, candidates broadcast",
      (s, dir) => TextAnalysis.heavyHitters(t(s, dir, "documents"),
        "doc_id", "text", k = 25, candPool = 100, samplePct = 20),
      Some(TextAnalysis.heavyHittersOracleSql("documents", "doc_id",
        "text", k = 25, candPool = 100, samplePct = 20))
    ),

    QuerySpec("x41_incremental_ivf_append",
      "ANN index maintenance, append path: centroids frozen from a " +
        "Lloyd train over the base slice (vec_id < 400), the arriving " +
        "batch (vec_id >= 400) assigned by a narrow projection — no " +
        "retrain, no shuffle, no driver state beyond K codewords; the " +
        "per-row rounded best-dot score is the drift signal that " +
        "schedules the next full retrain; subset-trained centroids " +
        "are stash-tagged so the full-corpus oracles (x6b/x6c/x39) " +
        "cannot be clobbered",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val centroids = Similarity.ivfTrain(
          emb.filter(col("vec_id") < 400), "vec_id", "embedding",
          nCells = 8, iters = 2, tag = "base<400")
        Similarity.ivfAssign(emb.filter(col("vec_id") >= 400),
            "vec_id", "embedding", centroids)
          .orderBy(col("vec_id"))
      },
      None,
      oracleGen = () => Similarity.trainedCentroids.get((8, 2, "base<400"))
        .map(cents => Similarity.ivfAssignOracleSql("embeddings",
          "vec_id", "embedding", cents, newPred = "vec_id >= 400"))),

    QuerySpec("x42_pq_residual_topk",
      "FULL IVF-PQ with residual encoding (Jégou et al. 2011 §III): " +
        "codebooks quantize v - centroid(cell), recovering the " +
        "reconstruction error a cell-agnostic codebook wastes; " +
        "residuals are NEVER materialized — encode is argmax(dot(v, " +
        "cw) - bias[cell][j]) with driver-computed bias literals, and " +
        "a candidate's score is its probe's own dot(q, centroid) plus " +
        "m residual-LUT lookups, so both engines run identical " +
        "arithmetic; late-bound oracle embeds centroids + residual " +
        "codebooks + biases",
      (s, dir) => withTrainerCache { hook =>
        val emb = t(s, dir, "embeddings")
        Similarity.adcResidualTopKWith(emb,
            emb.filter(col("vec_id") < 8), "vec_id", "embedding", 5,
            memoResBooks(s, dir, hook), memoCentroids(s, dir, hook),
            nProbes = 2)
          .select(col("qid"), col("rn"), col("did"),
            round(col("score"), 6).as("score_r"))
          .orderBy(col("qid"), col("rn"))
      },
      None,
      oracleGen = () => for {
        books <- Similarity.trainedCodebooks.get((8, 8, 2, "res"))
        cents <- Similarity.trainedCentroids.get((8, 2, ""))
      } yield Similarity.adcResidualOracleSql("embeddings", "vec_id",
        "embedding", 5, books, cents, nProbes = 2,
        queryPred = "vec_id < 8")),

    QuerySpec("x42b_pq_recall_eval",
      "PQ governance: per-query recall@5 of BOTH compressed paths " +
        "(plain IVFADC and residual IVF-PQ) against the exact " +
        "brute-force top-k — the gate that picks m/ksub/nProbes and " +
        "decides whether residual encoding pays for a corpus before " +
        "scaling out; hash-gated through the same late-bound " +
        "codebook+centroid oracles (x6c's pattern)",
      (s, dir) => withTrainerCache { hook =>
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
        val exact = Similarity.bruteForceTopK(emb, q, "vec_id",
          "embedding", 5)
        val plain = Similarity.adcTopKWith(emb, q, "vec_id",
          "embedding", 5, memoBooks(s, dir, hook),
          memoCentroids(s, dir, hook), nProbes = 2)
        val res = Similarity.adcResidualTopKWith(emb, q, "vec_id",
          "embedding", 5, memoResBooks(s, dir, hook),
          memoCentroids(s, dir, hook), nProbes = 2)
        Similarity.recallAtK(plain, exact)
          .withColumnRenamed("recall_at_k", "recall_pq")
          .join(Similarity.recallAtK(res, exact)
            .withColumnRenamed("recall_at_k", "recall_respq"), Seq("qid"))
          .orderBy(col("qid"))
      },
      None,
      oracleGen = () => for {
        plainBooks <- Similarity.trainedCodebooks.get((8, 8, 2, ""))
        resBooks <- Similarity.trainedCodebooks.get((8, 8, 2, "res"))
        cents <- Similarity.trainedCentroids.get((8, 2, ""))
      } yield {
        val exact = annTopkOracle.replace("\n", "\n    ")
        val plain = Similarity.adcOracleSql("embeddings", "vec_id",
          "embedding", 5, plainBooks, cents, nProbes = 2,
          queryPred = "vec_id < 8").replace("\n", "\n    ")
        val res = Similarity.adcResidualOracleSql("embeddings", "vec_id",
          "embedding", 5, resBooks, cents, nProbes = 2,
          queryPred = "vec_id < 8").replace("\n", "\n    ")
        s"""WITH exact AS (SELECT qid, did FROM (
           |    $exact)),
           |plain AS (SELECT qid, did FROM (
           |    $plain)),
           |res AS (SELECT qid, did FROM (
           |    $res)),
           |pr AS (
           |  SELECT e.qid, CAST(count(a.did) AS DOUBLE) / count(*)
           |    AS recall_pq
           |  FROM exact e LEFT JOIN plain a
           |    ON e.qid = a.qid AND e.did = a.did
           |  GROUP BY e.qid),
           |rr AS (
           |  SELECT e.qid, CAST(count(a.did) AS DOUBLE) / count(*)
           |    AS recall_respq
           |  FROM exact e LEFT JOIN res a
           |    ON e.qid = a.qid AND e.did = a.did
           |  GROUP BY e.qid)
           |SELECT pr.qid, pr.recall_pq, rr.recall_respq
           |FROM pr JOIN rr ON pr.qid = rr.qid ORDER BY pr.qid""".stripMargin
      }),

    QuerySpec("x43_token_budget_selection",
      "token-budget data selection: keep the highest-margin documents " +
        "(x34's classifier) until a 10k-token budget is spent — the " +
        "greedy 'train on the best N tokens' curation fill; the " +
        "cumulative sum uses x38's histogram-rank decomposition (no " +
        "corpus-wide window task), bit-identical to the one-line " +
        "running-window oracle; losers are emitted with their " +
        "cum_tok so the budget boundary is auditable",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            wsTokens(col("text")).as("__tk"))
          .select(col("doc_id"),
            round(TextAnalysis.classifierMargin(col("text"), col("__tk")),
              6).as("margin_r"),
            size(col("__tk")).cast("long").as("n_tok"))
        graft.operators.Corpus.budgetSelect(d, "doc_id", "margin_r",
          "n_tok", budgetTokens = 10000L)
      },
      Some {
        val margin =
          s"-1.2 + (CAST($duckSwCount AS DOUBLE) / $duckNTok) * 2.0 + " +
            s"($duckAlpha) * 1.5 + " +
            s"(CASE WHEN $duckMeanLen >= 3 AND $duckMeanLen <= 10 " +
            "THEN 0.8 ELSE 0.0 END) + " +
            s"CAST(least($duckNTok, 400) AS DOUBLE) / 400.0 * 0.5"
        graft.operators.Corpus.budgetSelectOracleSql(
          s"(SELECT doc_id, text, round($margin, 6) AS margin_r " +
            "FROM documents) src",
          "doc_id", "margin_r", duckNTok, budgetTokens = 10000L)
      }),

    QuerySpec("s15_compaction",
      "small-file compaction: documents deliberately fragmented into " +
        "64 KB-scale files, rewritten into row-sized files clustered " +
        "on doc_id (one range exchange + in-partition sort — the " +
        "maintenance job every micro-batch ingest needs); file-count " +
        "reduction REQUIREd in-query, content identity hash-gated " +
        "against the original table",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // fragmentation and the expected compacted count both scale
        // with the corpus, so the REQUIRE holds at every SF
        val expected = ((docs.count() + 199) / 200).toInt
        val frag = Warehouse.saveFormat(
          docs.repartition(4 * expected), "docs_frag", "parquet")
        val before = Layout.parquetFileCount(s, frag)
        val compacted = Layout.compact(s, frag, "docs_compact",
          targetRowsPerFile = 200L, sortCol = "doc_id")
        val after = Layout.parquetFileCount(s, compacted)
        require(after < before && after == expected,
          s"compaction must hit ceil(n/target) files " +
            s"($before -> $after, expected $expected)")
        s.read.parquet(compacted)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    QuerySpec("x44_bigram_perplexity",
      "bigram LM cross-entropy with interpolation backoff (the n-gram " +
        "step toward CCNet's 5-gram KenLM): p(w2|w1) = 0.7*ML-bigram " +
        "+ 0.3*add-one unigram, trained on the English slice; backoff " +
        "keeps ln defined on fully-OOV bigrams, per-doc fold sorted " +
        "by (w1,w2), 6dp-rounded; three token-keyed model joins, " +
        "corpus text never shuffled",
      (s, dir) => LanguageModel.bigramCrossEntropy(
        t(s, dir, "documents"), "doc_id", "text", "lang", "lang = 'en'"),
      Some(LanguageModel.bigramCrossEntropyOracleSql(
        "documents", "doc_id", "text", "lang", "lang = 'en'"))),

    QuerySpec("x51_trigram_perplexity",
      "trigram LM cross-entropy with recursive interpolation backoff " +
        "(one order up the x44 ladder, CCNet's KenLM is order 5): " +
        "p(w3|w1 w2) = 0.6*ML-trigram + 0.4*(0.7*ML-bigram + " +
        "0.3*add-one unigram), trained on the English slice; five " +
        "token-keyed model joins, corpus text never shuffled, " +
        "per-doc fold sorted by (w1,w2,w3), 6dp-rounded",
      (s, dir) => LanguageModel.trigramCrossEntropy(
        t(s, dir, "documents"), "doc_id", "text", "lang", "lang = 'en'"),
      Some(LanguageModel.trigramCrossEntropyOracleSql(
        "documents", "doc_id", "text", "lang", "lang = 'en'"))),

    QuerySpec("g9b_global_exact_quantiles",
      "GLOBAL exact discrete quantiles over a high-cardinality " +
        "column: cumulative counts via the two-level distributed " +
        "prefix sum (Packing.exclusiveRunningSum) over the value " +
        "histogram — no window ever sees more than a range-partition " +
        "of distinct values, closing g9's single-task caveat for the " +
        "ungrouped case; integer-exact ranks, histogram-mirrored " +
        "oracle",
      (s, dir) => graft.operators.Stats.globalExactQuantiles(
        t(s, dir, "lineitem"), "l_extendedprice", Seq(25, 50, 75)),
      Some(graft.operators.Stats.globalExactQuantilesOracleSql(
        "lineitem", "l_extendedprice", Seq(25, 50, 75)))),

    QuerySpec("s14b_zvalue_parity",
      "Morton z-value bit parity: the interleave expression computed " +
        "per row in both engines and hash-compared directly — the " +
        "arithmetic a z-range predicate pushdown would rely on, " +
        "verified bit-for-bit rather than assumed",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 200)
        .select(col("l_orderkey"), col("l_linenumber").cast("long"),
          Layout.zValue(col("l_partkey"), col("l_suppkey"), 21).as("zval"))
        // zval completes the total order: the fixture has duplicate
        // (l_orderkey, l_linenumber) pairs whose tied rows carry
        // DIFFERENT zvals, so the pair alone leaves both engines free
        // to flip them. With zval in the key any remaining tie is a
        // fully identical row — hash-safe in either order.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("zval")),
      Some(s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT)
             |    AS l_linenumber,
             |  ${Layout.zValueSql("l_partkey", "l_suppkey", 21)} AS zval
             |FROM lineitem WHERE l_orderkey <= 200
             |ORDER BY l_orderkey, l_linenumber, zval""".stripMargin)),

    QuerySpec("x45_hard_negative_mining",
      "contrastive-pair mining for embedding training: per anchor, " +
        "the best candidate at/above the positive band and the best " +
        "strictly below the negative band (the in-between excluded as " +
        "likely near-dup noise) — hard negatives are what make " +
        "contrastive batches informative; candidates from the bounded " +
        "IVF cell join, rankings on the rounded cosine so both " +
        "engines mine the identical set",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.minePairsWith(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", memoCentroids(s, dir), nProbes = 2,
          posBand = 0.10, negBand = 0.0)
      },
      None,
      oracleGen = () => Similarity.trainedCentroids.get((8, 2, ""))
        .map(cents => Similarity.minePairsOracleSql("embeddings",
          "vec_id", "embedding", cents, nProbes = 2, posBand = 0.10,
          negBand = 0.0, queryPred = "vec_id < 8"))),

    QuerySpec("x46_cell_balanced_sample",
      "cluster-balanced diversity sampling: at most 12 rows per IVF " +
        "cell in deterministic hash order — after near-dups are gone " +
        "corpora stay density-skewed, and uniform sampling keeps the " +
        "head's redundancy while cell-balanced keeps the tail's " +
        "coverage; the only wide op is a cell-keyed window",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.cellBalancedSample(emb, "vec_id", "embedding",
            memoCentroids(s, dir), perCell = 12)
          .orderBy(col("vec_id"))
      },
      None,
      oracleGen = () => Similarity.trainedCentroids.get((8, 2, ""))
        .map(cents => Similarity.cellBalancedSampleOracleSql(
          "embeddings", "vec_id", "embedding", cents, perCell = 12))),

    QuerySpec("x42c_pq_recall_sweep",
      "the recall-vs-compression knob turned: same corpus as x42b " +
        "but ksub=16 codewords (one more bit per code) and 4 probes " +
        "(half the cells) — the parameter sweep a deployment runs " +
        "before freezing an index config; x42b's 8-codeword recall " +
        "is the baseline this variant must beat",
      (s, dir) => withTrainerCache { hook =>
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
        val exact = Similarity.bruteForceTopK(emb, q, "vec_id",
          "embedding", 5)
        // the ksub=16 codebook IS the sweep (trains eagerly); the
        // coarse quantizer is identical across the family — shared
        val wide = Similarity.adcTopKWith(emb, q, "vec_id", "embedding",
          5, Similarity.pqTrain(emb, "vec_id", "embedding", m = 8,
            ksub = 16, iters = 2, materialize = hook),
          memoCentroids(s, dir, hook), nProbes = 4)
        Similarity.recallAtK(wide, exact)
          .withColumnRenamed("recall_at_k", "recall_k16p4")
          .orderBy(col("qid"))
      },
      None,
      oracleGen = () => for {
        books <- Similarity.trainedCodebooks.get((8, 16, 2, ""))
        cents <- Similarity.trainedCentroids.get((8, 2, ""))
      } yield {
        val exact = annTopkOracle.replace("\n", "\n    ")
        val wide = Similarity.adcOracleSql("embeddings", "vec_id",
          "embedding", 5, books, cents, nProbes = 4,
          queryPred = "vec_id < 8").replace("\n", "\n    ")
        s"""WITH exact AS (SELECT qid, did FROM (
           |    $exact)),
           |wide AS (SELECT qid, did FROM (
           |    $wide))
           |SELECT e.qid, CAST(count(a.did) AS DOUBLE) / count(*)
           |  AS recall_k16p4
           |FROM exact e LEFT JOIN wide a
           |  ON e.qid = a.qid AND e.did = a.did
           |GROUP BY e.qid ORDER BY e.qid""".stripMargin
      }),

    QuerySpec("x42d_pq_rerank_recall",
      "the RE-RANK refinement that makes compressed ANN deployable " +
        "(Jégou et al. 2011 §V): raw ADC recall@5 is ~0.30 (x42b) — " +
        "unusable alone; here the ADC top-C shortlist is re-scored " +
        "with EXACT cosine (only C×queries vector fetches, never a " +
        "corpus scan) and recall@5 is measured per query at C=10 and " +
        "C=50 against the brute-force truth — the curve that picks " +
        "the shortlist size before freezing an index config; at C=50 " +
        "re-ranking recovers the IVF probe ceiling (~0.9, x6c's " +
        "uncompressed recall)",
      (s, dir) => withTrainerCache { hook =>
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
        val exact = Similarity.bruteForceTopK(emb, q, "vec_id",
          "embedding", 5)
        // ONE shortlist at the widest C; narrower C is a filter on its
        // rank — one training pass, one candidate join for all points
        val short100 = Similarity.adcTopKWith(emb, q, "vec_id",
          "embedding", 100, memoBooks(s, dir, hook),
          memoCentroids(s, dir, hook), nProbes = 2)
        def reAt(c: Int) = Similarity.exactRerank(emb, q, "vec_id",
          "embedding",
          short100.filter(col("rn") <= c)
            .select(col("qid"), col("did")), 5)
        Similarity.recallAtK(reAt(10), exact)
          .withColumnRenamed("recall_at_k", "recall_c10")
          .join(Similarity.recallAtK(reAt(50), exact)
            .withColumnRenamed("recall_at_k", "recall_c50"), Seq("qid"))
          .join(Similarity.recallAtK(reAt(100), exact)
            .withColumnRenamed("recall_at_k", "recall_c100"), Seq("qid"))
          .orderBy(col("qid"))
      },
      None,
      oracleGen = () => for {
        books <- Similarity.trainedCodebooks.get((8, 8, 2, ""))
        cents <- Similarity.trainedCentroids.get((8, 2, ""))
      } yield {
        val exact = annTopkOracle.replace("\n", "\n    ")
        def re(c: Int): String = Similarity.adcRerankOracleSql(
          "embeddings", "vec_id", "embedding", 5, c, books, cents,
          nProbes = 2, queryPred = "vec_id < 8")
          .replace("\n", "\n    ")
        s"""WITH exact AS (SELECT qid, did FROM (
           |    ${exact})),
           |re10 AS (SELECT qid, did FROM (
           |    ${re(10)})),
           |re50 AS (SELECT qid, did FROM (
           |    ${re(50)})),
           |re100 AS (SELECT qid, did FROM (
           |    ${re(100)})),
           |r10 AS (
           |  SELECT e.qid, CAST(count(a.did) AS DOUBLE) / count(*)
           |    AS recall_c10
           |  FROM exact e LEFT JOIN re10 a
           |    ON e.qid = a.qid AND e.did = a.did
           |  GROUP BY e.qid),
           |r50 AS (
           |  SELECT e.qid, CAST(count(a.did) AS DOUBLE) / count(*)
           |    AS recall_c50
           |  FROM exact e LEFT JOIN re50 a
           |    ON e.qid = a.qid AND e.did = a.did
           |  GROUP BY e.qid),
           |r100 AS (
           |  SELECT e.qid, CAST(count(a.did) AS DOUBLE) / count(*)
           |    AS recall_c100
           |  FROM exact e LEFT JOIN re100 a
           |    ON e.qid = a.qid AND e.did = a.did
           |  GROUP BY e.qid)
           |SELECT r10.qid, r10.recall_c10, r50.recall_c50,
           |  r100.recall_c100
           |FROM r10 JOIN r50 ON r10.qid = r50.qid
           |JOIN r100 ON r10.qid = r100.qid
           |ORDER BY r10.qid""".stripMargin
      }),

    QuerySpec("s16_export_import_roundtrip",
      "S8 as a data-gated catalog entry: register nation+region with " +
        "PK/FK metadata, export the whole database (parquet per table " +
        "+ generated DDL text), wipe the registry, import it back by " +
        "parsing the DDL, and query the re-imported views. The DuckDB " +
        "oracle reads the EXPORTED parquet files themselves (late-" +
        "bound path), so the hash gate proves the export wrote " +
        "faithful bytes — not merely that the source tables agree",
      (s, dir) => {
        import graft.catalog.Warehouse.{FkEdge, TableMeta}
        Warehouse.clear()
        Warehouse.load(s, t(s, dir, "region"),
          TableMeta("region", pk = Seq("r_regionkey")))
        Warehouse.load(s, t(s, dir, "nation"),
          TableMeta("nation", pk = Seq("n_nationkey"),
            fks = Seq(FkEdge(Seq("n_regionkey"), "region",
              Seq("r_regionkey")))))
        val out = java.nio.file.Paths.get("target/warehouse_export_s16")
          .toAbsolutePath.toString
        Warehouse.exportDatabase(s, out)
        Warehouse.clear()
        val imported = Warehouse.importDatabase(s, out, validate = true)
        require(imported.sorted == Seq("nation", "region"),
          s"import must restore both exported tables, got $imported")
        require(Warehouse.meta("nation").exists(m =>
            m.pk == Seq("n_nationkey") &&
              m.fks == Seq(FkEdge(Seq("n_regionkey"), "region",
                Seq("r_regionkey")))),
          "PK/FK metadata must survive the DDL round-trip")
        s.table("nation")
          .join(s.table("region"),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_nations"),
            sum(col("n_nationkey")).cast("long").as("sum_key"))
          .orderBy(col("r_name"))
      },
      None,
      oracleGen = () => Warehouse.lastExportDir.get.map { d =>
        s"""SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_nations,
           |  CAST(sum(n.n_nationkey) AS BIGINT) AS sum_key
           |FROM read_parquet('$d/nation.parquet/*.parquet') n
           |JOIN read_parquet('$d/region.parquet/*.parquet') r
           |  ON n.n_regionkey = r.r_regionkey
           |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin
      }),

    QuerySpec("s17_shuffled_shards",
      "deterministic GLOBAL SHUFFLE + sharded write — curated corpus " +
        "to servable pretraining data: a 60-bit md5 shuffle key per " +
        "doc (reproducible, growth-stable: a row's shard and relative " +
        "position never change as the corpus grows; the salt picks " +
        "the permutation), shard = key % 8 written hive-partitioned " +
        "with rows in key order so reading a shard start-to-finish IS " +
        "the shuffled order; one RANGE exchange on (shard, key) + " +
        "in-partition sort — the disjoint-per-file key ranges the " +
        "manifest relies on hold ONLY under range partitioning; the " +
        "manifest is read back from the WRITTEN files, gating the " +
        "layout, not the plan",
      (s, dir) => {
        val path = Layout.saveShuffledShards(t(s, dir, "documents"),
          "documents_shuffled", "doc_id", nShards = 8)
        s.read.parquet(path)
          .groupBy(col("shard").cast("int").as("shard"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("shuffle_key")).as("min_key"),
            max(col("shuffle_key")).as("max_key"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("shard"))
      },
      Some("""WITH h AS (
             |  SELECT doc_id, n_chars,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'), 1, 15))::BIGINT
             |      AS k
             |  FROM documents)
             |SELECT CAST(k % 8 AS INTEGER) AS shard,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  min(k) AS min_key, max(k) AS max_key,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM h GROUP BY shard ORDER BY shard""".stripMargin)),

    QuerySpec("s18_snapshot_diff",
      "corpus snapshot diff — the audit step of an incremental " +
        "update: added/removed/changed per key between two versions " +
        "(here: v2 derived in-query — every 7th doc dropped, every " +
        "5th text revised, 20 new ids), null-safe change detection " +
        "on (text, lang), unchanged bulk NEVER rides the result; one " +
        "key-partitioned full-outer join is the whole cost",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang"))
        val next = docs.filter(col("doc_id") % 7 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
          .unionByName(docs.filter(col("doc_id") < 20)
            .select((col("doc_id") + 10000).as("doc_id"),
              col("text"), col("lang")))
        Relational.snapshotDiff(docs, next, "doc_id", Seq("text", "lang"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH old AS (SELECT doc_id, text, lang FROM documents),
             |nw AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
             |         ELSE text END AS text,
             |    lang
             |  FROM documents WHERE doc_id % 7 <> 0
             |  UNION ALL
             |  SELECT doc_id + 10000, text, lang
             |  FROM documents WHERE doc_id < 20),
             |j AS (
             |  SELECT o.doc_id AS ok, n.doc_id AS nk,
             |    CASE WHEN o.doc_id IS NULL THEN 'added'
             |         WHEN n.doc_id IS NULL THEN 'removed'
             |         WHEN o.text IS DISTINCT FROM n.text
             |           OR o.lang IS DISTINCT FROM n.lang THEN 'changed'
             |         END AS change
             |  FROM old o FULL OUTER JOIN nw n ON o.doc_id = n.doc_id)
             |SELECT coalesce(ok, nk) AS doc_id, change FROM j
             |WHERE change IS NOT NULL ORDER BY doc_id""".stripMargin)),

    QuerySpec("s19_ingest_quarantine",
      "corrupt-input quarantine at ingest — a 100 TB crawl's first " +
        "operator is separating the parseable from the garbage " +
        "without dying: the fixture salts a JSONL file with two " +
        "corruption shapes (truncated JSON and a type-mismatched " +
        "field), the PERMISSIVE parse is materialized ONCE to " +
        "parquet, clean rows and a per-reason quarantine table are " +
        "narrow filters over that parse, and the builder REQUIRES " +
        "clean + quarantined = input lines (PERMISSIVE drops " +
        "nothing, unlike DROPMALFORMED); the gate hashes per-reason " +
        "counts plus content signatures (parsed-field sums for " +
        "clean, raw-line-length sums for quarantined) against DuckDB " +
        "reconstructing the same deterministic corruption",
      (s, dir) => {
        import graft.sources.{Jsonl, Quarantine}
        val id = col("doc_id").cast("string")
        val nc = col("n_chars").cast("string")
        val m = col("doc_id") % 7
        val line = when(m === 0,
            concat(lit("{\"doc_id\": "), id, lit(", \"nc\": ")))
          .when(m === 1, concat(lit("{\"doc_id\": \"x"), id,
            lit("\", \"nc\": "), nc, lit("}")))
          .otherwise(concat(lit("{\"doc_id\": "), id,
            lit(", \"nc\": "), nc, lit("}")))
        val fixDir = java.nio.file.Paths.get("target", "ingest",
          "s19_fixture").toAbsolutePath.toString
        t(s, dir, "documents").select(line.as("value"))
          .write.mode("overwrite").text(fixDir)
        val schema = new StructType()
          .add("doc_id", LongType).add("nc", LongType)
        val parsed = Jsonl.read(s, fixDir, schema, keepCorrupt = true)
        val (clean, quar) = Quarantine.ingest(s, parsed, "s19",
          Quarantine.jsonReason)
        // reconciliation gate: nothing silently dropped between the
        // raw file and the two output tables
        val inputLines = s.read.text(fixDir)
          .filter(length(trim(col("value"))) > 0).count()
        val (nClean, nQuar) = (clean.count(), quar.count())
        require(nClean + nQuar == inputLines,
          s"quarantine must reconcile: $nClean clean + $nQuar " +
            s"quarantined != $inputLines input lines")
        clean.agg(count(lit(1)).as("n_rows"),
            (sum(col("doc_id")) + sum(col("nc"))).as("sig"))
          .select(lit("clean").as("reason"), col("n_rows"), col("sig"))
          .unionByName(quar.groupBy(col("reason"))
            .agg(count(lit(1)).as("n_rows"),
              sum(length(col("raw"))).cast("long").as("sig")))
          .orderBy(col("reason"))
      },
      Some("""WITH f AS (
             |  SELECT doc_id, n_chars, doc_id % 7 AS m,
             |    CASE WHEN doc_id % 7 = 0
             |      THEN '{"doc_id": ' || CAST(doc_id AS VARCHAR) || ', "nc": '
             |    WHEN doc_id % 7 = 1
             |      THEN '{"doc_id": "x' || CAST(doc_id AS VARCHAR) ||
             |        '", "nc": ' || CAST(n_chars AS VARCHAR) || '}'
             |    END AS badline
             |  FROM documents)
             |SELECT 'clean' AS reason, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(doc_id) + sum(n_chars) AS BIGINT) AS sig
             |FROM f WHERE m NOT IN (0, 1)
             |UNION ALL
             |SELECT 'malformed_json', CAST(count(*) AS BIGINT),
             |  CAST(sum(length(badline)) AS BIGINT)
             |FROM f WHERE m = 0
             |UNION ALL
             |SELECT 'schema_mismatch', CAST(count(*) AS BIGINT),
             |  CAST(sum(length(badline)) AS BIGINT)
             |FROM f WHERE m = 1
             |ORDER BY reason""".stripMargin)),

    QuerySpec("s20_dpp_star_join",
      "dynamic partition pruning on the star-join access path: the " +
        "fact (events, hive-partitioned by event_type) joins a small " +
        "filtered dim whose surviving keys are only known at RUN " +
        "time (md5-derived tag, opaque to static pruning) — the " +
        "broadcast dim's keys become a runtime partition filter on " +
        "the fact scan, so pruned partitions are never read; the " +
        "builder REQUIRES the DynamicPruningSubquery in the " +
        "optimized plan (a silently-degraded full scan still " +
        "hash-matches — the plan contract is the point). At 100 TB " +
        "this is THE mechanism that turns a dim filter into fact " +
        "I/O elision without a manual partition list",
      (s, dir) => {
        val path = Warehouse.savePartitioned(
          t(s, dir, "events").select(col("event_id"), col("user_id"),
            col("event_type"), col("value")),
          "events_dpp", Seq("event_type"))
        val fact = s.read.parquet(path)
        val dim = t(s, dir, "events").select(col("event_type")).distinct()
          .withColumn("type_tag", substring(md5(col("event_type")), 1, 2))
          .filter(col("type_tag") < "80")
        val q = fact.join(broadcast(dim), Seq("event_type"))
          .groupBy(col("event_type"), col("type_tag"))
          .agg(count(lit(1)).as("n_events"),
            sum(dec2(col("value"))).cast("double").as("sum_value"),
            min(col("event_id")).as("min_event_id"),
            max(col("event_id")).as("max_event_id"))
          .orderBy(col("event_type"))
        val hasDpp = q.queryExecution.optimizedPlan.collectFirst {
          case p if p.expressions.exists(_.exists(
              _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
                .DynamicPruningSubquery])) => p
        }.nonEmpty
        require(hasDpp, "fact scan must carry a dynamic partition " +
          "pruning subquery; a full scan means DPP silently degraded:\n" +
          q.queryExecution.optimizedPlan)
        q
      },
      Some("""WITH dim AS (
             |  SELECT DISTINCT event_type,
             |    substr(md5(event_type), 1, 2) AS type_tag
             |  FROM events)
             |SELECT e.event_type, d.type_tag,
             |  count(*) AS n_events,
             |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_value,
             |  min(e.event_id) AS min_event_id,
             |  max(e.event_id) AS max_event_id
             |FROM events e JOIN dim d USING (event_type)
             |WHERE d.type_tag < '80'
             |GROUP BY e.event_type, d.type_tag
             |ORDER BY e.event_type""".stripMargin)),

    QuerySpec("s21_orc_roundtrip",
      "ORC storage interop: lineitem columns rewritten as ORC, read " +
        "back with a selective filter and the g1 pricing aggregate — " +
        "the builder REQUIRES the scan is the ORC format AND the " +
        "row-level filter reached it as a pushed filter (ORC carries " +
        "the same predicate-pushdown/column-pruning contract as " +
        "parquet; a post-scan-only filter means the interop lost its " +
        "I/O elision); content hash-gated against DuckDB over the " +
        "original parquet — format roundtrip must be lossless",
      (s, dir) => {
        val path = Warehouse.saveFormat(
          t(s, dir, "lineitem").select(col("l_orderkey"),
            col("l_quantity"), col("l_extendedprice"),
            col("l_returnflag"), col("l_linestatus")),
          "lineitem_orc", "orc")
        val q = s.read.orc(path)
          .filter(col("l_returnflag") === "R")
          .groupBy(col("l_linestatus"))
          .agg(count(lit(1)).as("n_items"),
            sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec2(col("l_extendedprice"))).cast("double")
              .as("sum_price"),
            countDistinct(col("l_orderkey")).as("n_orders"))
          .orderBy(col("l_linestatus"))
        val scans = q.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
        require(scans.nonEmpty &&
            scans.head.relation.fileFormat.isInstanceOf[
              org.apache.spark.sql.execution.datasources.orc.OrcFileFormat],
          "expected an ORC file scan")
        require(scans.head.metadata.get("PushedFilters")
            .exists(_.contains("l_returnflag")),
          s"l_returnflag filter must push to the ORC scan; got: " +
            scans.head.metadata.get("PushedFilters"))
        q
      },
      Some("""SELECT l_linestatus, count(*) AS n_items,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_price,
             |  count(DISTINCT l_orderkey) AS n_orders
             |FROM lineitem WHERE l_returnflag = 'R'
             |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    QuerySpec("s22_schema_evolution",
      "schema-drift-tolerant ingest (sources.Evolution): three orders " +
        "snapshots written with EVOLVED schemas — v1 the base three " +
        "columns, v2 adds o_orderpriority, v3 instead carries an INT " +
        "priority_rank the canonical schema declares BIGINT (the " +
        "widening mergeSchema refuses — it fails conflicting footer " +
        "types outright, which is why a declared canonical schema + " +
        "per-snapshot cast/NULL-fill + union-by-position is the 100 " +
        "TB contract: narrow per-file, zero shuffle, snapshots " +
        "stream independently); builder REQUIRES exactly three " +
        "parquet scans under the union",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val v1 = Warehouse.saveFormat(
          orders.filter(col("o_orderkey") % 3 === 0)
            .select(col("o_orderkey"), col("o_custkey"),
              col("o_totalprice")),
          "orders_evo_v1", "parquet")
        val v2 = Warehouse.saveFormat(
          orders.filter(col("o_orderkey") % 3 === 1)
            .select(col("o_orderkey"), col("o_custkey"),
              col("o_totalprice"), col("o_orderpriority")),
          "orders_evo_v2", "parquet")
        val v3 = Warehouse.saveFormat(
          orders.filter(col("o_orderkey") % 3 === 2)
            .select(col("o_orderkey"), col("o_custkey"),
              col("o_totalprice"),
              substring(col("o_orderpriority"), 1, 1).cast("int")
                .as("priority_rank")),
          "orders_evo_v3", "parquet")
        val canonical = new StructType()
          .add("o_orderkey", LongType).add("o_custkey", LongType)
          .add("o_totalprice", org.apache.spark.sql.types.DoubleType)
          .add("o_orderpriority", StringType)
          .add("priority_rank", LongType)
        val u = graft.sources.Evolution.readUnion(s,
          Seq("v1" -> v1, "v2" -> v2, "v3" -> v3), canonical)
        // dec2 round-trips to 2dp for cross-engine determinism, but
        // the catalog's boundary convention is that DECIMAL never
        // reaches the comparator — cast back to double.
        val q = u.select(col("snapshot_id"), col("o_orderkey"),
            col("o_custkey"),
            dec2(col("o_totalprice")).cast("double").as("o_totalprice"),
            col("o_orderpriority"), col("priority_rank"))
          .orderBy(col("o_orderkey"))
        val nScans = q.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.size
        require(nScans == 3,
          s"evolved union must plan as 3 independent scans, got $nScans")
        q
      },
      Some("""WITH u AS (
             |  SELECT 'v1' AS snapshot_id, o_orderkey, o_custkey,
             |    o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority,
             |    CAST(NULL AS BIGINT) AS priority_rank
             |  FROM orders WHERE o_orderkey % 3 = 0
             |  UNION ALL
             |  SELECT 'v2', o_orderkey, o_custkey, o_totalprice,
             |    o_orderpriority, CAST(NULL AS BIGINT)
             |  FROM orders WHERE o_orderkey % 3 = 1
             |  UNION ALL
             |  SELECT 'v3', o_orderkey, o_custkey, o_totalprice,
             |    CAST(NULL AS VARCHAR),
             |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
             |  FROM orders WHERE o_orderkey % 3 = 2)
             |SELECT snapshot_id, o_orderkey, o_custkey,
             |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
             |    AS o_totalprice,
             |  o_orderpriority, priority_rank
             |FROM u ORDER BY o_orderkey""".stripMargin)),

    QuerySpec("s23_runtime_bloom_join",
      "runtime bloom-filter join injection — the row-level analog of " +
        "s20's partition-level DPP, for the 100 TB case where the " +
        "fact is NOT partitioned by the join key: Catalyst's " +
        "InjectRuntimeFilter plants a bloom_filter_agg subquery over " +
        "the selectively-filtered dim and a might_contain filter on " +
        "the fact side, so most fact rows die at the scan instead of " +
        "crossing the join shuffle (the built-in counterpart of the " +
        "hand-rolled x37 prefilter). The builder lowers the " +
        "size-threshold confs (fixtures are far below the 10 GB " +
        "production default), forces and REQUIREs the injected " +
        "BloomFilterMightContain in the memoized optimized plan, " +
        "then RESTORES the confs — the hash gate itself is " +
        "plan-independent, which is the point: the filter is pure " +
        "I/O elision, never a semantics change",
      (s, dir) => {
        val confs = Seq(
          "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        try {
          val fact = t(s, dir, "lineitem")
            .select(col("l_partkey"), col("l_quantity"),
              col("l_extendedprice"))
          val dim = t(s, dir, "part")
            .filter(col("p_size") === 1)
            .select(col("p_partkey"), col("p_brand"))
          val q = fact.join(dim, col("l_partkey") === col("p_partkey"))
            .groupBy(col("p_brand"))
            .agg(count(lit(1)).as("n_items"),
              sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
              sum(dec2(col("l_extendedprice"))).cast("double")
                .as("sum_price"))
            .orderBy(col("p_brand"))
          val hasBloom = q.queryExecution.optimizedPlan.collectFirst {
            case p if p.expressions.exists(_.exists(
                _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
                  .BloomFilterMightContain])) => p
          }.nonEmpty
          require(hasBloom, "fact side must carry an injected " +
            "bloom-filter runtime filter; got:\n" +
            q.queryExecution.optimizedPlan)
          q
        } finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
      },
      Some("""SELECT p.p_brand, count(*) AS n_items,
             |  CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_qty,
             |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
             |    AS DOUBLE) AS sum_price
             |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |WHERE p.p_size = 1
             |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin)),

    QuerySpec("x58_mojibake_repair",
      "double-encoded-UTF-8 (mojibake) detection + repair — the most " +
        "common crawl encoding corruption, and a silent dedup killer " +
        "(corrupted and clean forms of one document never hash " +
        "equal): the fixture appends a deterministically mis-decoded " +
        "accented suffix to every third document, detection is the " +
        "shared C2/C3-lead regexp, repair is the native single-pass " +
        "byte expression (plans.MojibakeRepair: Latin-1 re-encode " +
        "accepted only if strictly-valid multi-byte UTF-8 — natural " +
        "text never repairs by accident); builder REQUIRES every " +
        "flagged row actually changed under repair; oracle states " +
        "the expected repaired form from the same constants",
      (s, dir) => {
        val suffix = MOJIBAKE_CLEAN_SUFFIX
        val moji = new String(
          suffix.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val base = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(moji)))
            .otherwise(col("text")).as("corrupted"))
        val repaired = base.select(col("doc_id"), col("corrupted"),
          TextAnalysis.mojibakeFlag(col("corrupted")).as("flagged"),
          TextAnalysis.repairMojibake(col("corrupted")).as("repaired"))
        // repair must be REAL on every flagged row, not a no-op that
        // happens to hash-match a fixture accident
        val unrepaired = repaired
          .filter(col("flagged") && col("repaired") === col("corrupted"))
          .count()
        require(unrepaired == 0,
          s"$unrepaired flagged rows survived repair unchanged")
        repaired.select(col("doc_id"), col("flagged"),
            md5(col("corrupted")).as("corrupt_md5"),
            md5(col("repaired")).as("repaired_md5"),
            length(col("repaired")).cast("long").as("repaired_chars"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH c AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 3 = 0
             |      THEN text || '${new String(
                      MOJIBAKE_CLEAN_SUFFIX.getBytes(
                        java.nio.charset.StandardCharsets.UTF_8),
                      java.nio.charset.StandardCharsets.ISO_8859_1)}'
             |      ELSE text END AS corrupted,
             |    CASE WHEN doc_id % 3 = 0
             |      THEN text || '$MOJIBAKE_CLEAN_SUFFIX'
             |      ELSE text END AS repaired
             |  FROM documents)
             |SELECT doc_id,
             |  regexp_matches(corrupted,
             |    '${TextAnalysis.mojibakePattern}') AS flagged,
             |  md5(corrupted) AS corrupt_md5,
             |  md5(repaired) AS repaired_md5,
             |  CAST(length(repaired) AS BIGINT) AS repaired_chars
             |FROM c ORDER BY doc_id""".stripMargin)),

    QuerySpec("x60_nfc_normalize",
      "Unicode NFC canonicalization (UAX #15) — NFD and NFC " +
        "spellings of one document are codepoint-distinct while " +
        "rendering identically, so un-normalized crawl text " +
        "silently defeats exact/near dedup keys and splits BPE " +
        "vocabulary (`café` vs `cafe`+U+0301 learn separate " +
        "merges); the fixture appends a Normalizer-NFD-derived " +
        "decomposed suffix plus two canonical singletons (U+212B, " +
        "U+2126 — composition-exclusion folds to U+00C5/U+03A9) to " +
        "every third document, normalization is the native " +
        "single-pass expression (plans.NfcNormalize: codegen'd, " +
        "ASCII and already-NFC fast paths return the input " +
        "zero-copy); builder REQUIRES every synthesized row " +
        "actually changed; the oracle derives NFC independently " +
        "via DuckDB's own nfc_normalize (utf8proc) — two " +
        "implementations of UAX #15 must agree bit-for-bit",
      (s, dir) => {
        val base = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 3 === 1,
            concat(col("text"), lit(NFD_CORRUPT_SUFFIX)))
            .otherwise(col("text")).as("raw"))
        val n = base.select(col("doc_id"), col("raw"),
          TextAnalysis.nfcNormalize(col("raw")).as("norm"))
        // composition must be REAL on every synthesized row, not a
        // no-op that happens to hash-match a fixture accident
        val untouched = n
          .filter(col("doc_id") % 3 === 1 && col("norm") === col("raw"))
          .count()
        require(untouched == 0,
          s"$untouched decomposed rows survived NFC unchanged")
        n.select(col("doc_id"),
            (col("raw") === col("norm")).as("was_nfc"),
            md5(col("raw")).as("raw_md5"),
            md5(col("norm")).as("nfc_md5"),
            (length(col("raw")) - length(col("norm"))).cast("long")
              .as("composed_away"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH c AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 3 = 1
             |      THEN text || '$NFD_CORRUPT_SUFFIX'
             |      ELSE text END AS raw
             |  FROM documents)
             |SELECT doc_id, raw = nfc_normalize(raw) AS was_nfc,
             |  md5(raw) AS raw_md5,
             |  md5(nfc_normalize(raw)) AS nfc_md5,
             |  CAST(length(raw) - length(nfc_normalize(raw)) AS BIGINT)
             |    AS composed_away
             |FROM c ORDER BY doc_id""".stripMargin)),

    QuerySpec("x61_hll_cardinality",
      "sketch-based distinct-cardinality governance (HLL, Apache " +
        "DataSketches via Spark's hll_sketch_agg family) — the 100 TB " +
        "answer to `how many distinct tokens/URLs/doc keys`: exact " +
        "COUNT(DISTINCT) shuffles every distinct key, a sketch " +
        "shuffles a fixed-KB binary per group with map-side partials, " +
        "and sketches MERGE — built once per shard (per day, per " +
        "crawl segment), any rollup is a union of sketches, never a " +
        "rescan. The entry builds per-(lang, shard) sketches, unions " +
        "them per lang (two-level merge, the pattern that matters), " +
        "REQUIRES the estimate within 5% of exact per group (HLL " +
        "lgK=12 ≈ 1.6% rsd — deterministic given fixed input, so " +
        "green stays green), and hash-gates the exact side against " +
        "DuckDB; the ok flag reaching the oracle as literal TRUE " +
        "means an out-of-bounds sketch fails the hash, not a log line",
      (s, dir) => {
        // the token frame feeds BOTH the sketch build and the exact
        // side (different aggregations — exchange reuse cannot fire),
        // and the returned plan re-executes at harness time: one
        // tokenize+explode, every consumer reads the scratch table
        val toks = scratch(t(s, dir, "documents")
          .select(col("lang"), pmod(col("doc_id"), lit(4)).as("shard"),
            explode(wsTokens(col("text"))).as("tok")), "x61_toks")
        val shardSketches = toks.groupBy(col("lang"), col("shard"))
          .agg(hll_sketch_agg(col("tok"), lit(12)).as("sk"))
        val merged = shardSketches.groupBy(col("lang"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
            .as("n_approx"))
        val exact = toks.groupBy(col("lang"))
          .agg(countDistinct(col("tok")).as("n_exact"))
        val j = exact.join(merged, Seq("lang")).select(col("lang"),
          col("n_exact"),
          (abs(col("n_approx") - col("n_exact")).cast("double") /
            col("n_exact").cast("double")).as("rel_err"))
        val bad = j.filter(col("rel_err") > 0.05).collect()
        require(bad.isEmpty, "sketch estimate out of bounds: " +
          bad.map(r => s"${r.get(0)} err=${r.get(2)}").mkString(", "))
        j.select(col("lang"), col("n_exact"),
            (col("rel_err") <= 0.05).as("approx_ok"))
          .orderBy(col("lang"))
      },
      Some(s"""SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact,
             |  TRUE AS approx_ok
             |FROM (SELECT lang, unnest($duckWsTokens) AS tok
             |      FROM documents)
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    QuerySpec("x63_cms_frequency",
      "sketch-based per-key frequency governance (count-min sketch, " +
        "Cormode & Muthukrishnan 2005; Spark's count_min_sketch " +
        "aggregate + the native cms_estimate probe, which Spark does " +
        "not ship — without it the aggregate is write-only) — HLL " +
        "(x61) answers `how many distinct`, CMS answers `how often " +
        "does THIS key occur` without materializing a distinct-key " +
        "frequency table: a fixed-size counter grid per shard with " +
        "map-side partials, merged cell-wise (lossless, enforced " +
        "same-params), probed per key at depth hashes per probe. " +
        "Keyed on adjacent-token bigrams against a DELIBERATELY " +
        "narrow grid (eps=0.005 → width 400 < the bigram vocabulary) " +
        "so collisions are real and the one-sided contract is " +
        "exercised, not vacuous: estimates never BELOW exact, above " +
        "by ≤ ceil(eps·N). Both bounds REQUIREd per key over the " +
        "top-25 bigrams and routed to the oracle as literal-TRUE " +
        "flags — an out-of-contract sketch fails the hash gate, and " +
        "the exact side is hash-gated against DuckDB",
      (s, dir) => {
        val eps = 0.005; val conf = 0.99; val seed = 42
        // the bigram frame feeds the sketch build (collected eagerly),
        // the exact top-25 (computed at the REQUIRE gate) AND the
        // returned plan's re-execution: one tokenize+pair pass,
        // scratch-read by every consumer
        val bg = scratch(t(s, dir, "documents")
          .select(pmod(col("doc_id"), lit(4)).as("shard"),
            explode(adjacentBigrams(wsTokens(col("text")))).as("bg")),
          "x63_bigrams")
        // shard→merge is the pattern that matters at 100 TB: one grid
        // per shard/day/segment, KB-scale binaries driver-merged, any
        // rollup probed without a rescan (the x61 HLL shape, for
        // frequencies); the collect is 4 × O(depth·width) bytes
        val shardSk = bg.groupBy(col("shard"))
          .agg(count_min_sketch(col("bg"), lit(eps), lit(conf),
            lit(seed)).as("sk"))
          .collect().toSeq.map(_.getAs[Array[Byte]]("sk"))
        val merged = graft.plans.CmsEstimate.merge(shardSk)
        val bound = math.ceil(eps * org.apache.spark.util.sketch
          .CountMinSketch.readFrom(merged).totalCount).toLong
        val top = bg.groupBy(col("bg"))
          .agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("bg")).limit(25)
          .withColumn("n_est",
            SketchFunctions.cmsEstimate(merged, col("bg")))
        val bad = top.filter(col("n_est") < col("n_exact") ||
          col("n_est") > col("n_exact") + lit(bound)).collect()
        require(bad.isEmpty, "cms estimate out of contract: " +
          bad.map(r => s"${r.get(0)} exact=${r.get(1)} est=${r.get(2)}")
            .mkString(", "))
        top.select(col("bg"), col("n_exact"),
            (col("n_est") >= col("n_exact")).as("never_under"),
            (col("n_est") <= col("n_exact") + lit(bound))
              .as("within_bound"))
          .orderBy(col("n_exact").desc, col("bg"))
      },
      Some(s"""WITH base AS (
             |  SELECT $duckWsTokens AS tk FROM documents),
             |pos AS (
             |  SELECT tk, unnest(range(1, len(tk))) AS i FROM base
             |  WHERE len(tk) >= 2)
             |SELECT tk[i] || ' ' || tk[i+1] AS bg,
             |  CAST(count(*) AS BIGINT) AS n_exact,
             |  TRUE AS never_under, TRUE AS within_bound
             |FROM pos GROUP BY bg
             |ORDER BY n_exact DESC, bg LIMIT 25""".stripMargin)),

    QuerySpec("x64_pmi_cooccurrence",
      "windowed co-occurrence + pointwise mutual information (Church " +
        "& Hanks 1990; the statistic SGNS embeddings implicitly " +
        "factorize — Levy & Goldberg 2014), the embedding-prep / " +
        "collocation-mining stage of a corpus pipeline: directional " +
        "(word, context) pairs within a forward window of 3, " +
        "pmi = ln(c_ab·T / (c_a·c_b)) with marginals from the pair " +
        "table itself. Pair generation is NARROW — posexplode + an " +
        "in-row slice of the token array already in the row, never a " +
        "positional self-join (which at 100 TB is a second " +
        "full-corpus shuffle + a range join); the corpus pays ONE " +
        "pair-keyed aggregation SHAPE and the marginals + T derive " +
        "from the distinct-pair table (vocabulary²-sized) — at scale " +
        "the operator's materialize hook persists that table so the " +
        "corpus is scanned once (inferred null filters defeat " +
        "exchange reuse, verified on the executed plan) — corpus " +
        "text never shuffles. Top-50 by support with a " +
        "lexicographic tiebreak; integer products exact in long, one " +
        "double division then ln, rounded to 6 dp (the x36 boundary " +
        "trick) and hash-gated against DuckDB's independent " +
        "position-based rederivation",
      (s, dir) => LanguageModel.cooccurrencePmi(
          t(s, dir, "documents"), "text", window = 3,
          // the distinct-pair table feeds marginals a, b, T and the
          // final join (4 consumers; inferred null filters defeat
          // exchange reuse, verified r12): one corpus pair-gen pass,
          // every consumer reads the vocabulary²-sized scratch table
          materialize = df => scratch(df, "x64_cab"))
        .orderBy(col("c_ab").desc, col("a"), col("b")).limit(50)
        .orderBy(col("c_ab").desc, col("a"), col("b")),
      Some(s"""WITH base AS (
             |  SELECT $duckWsTokens AS tk FROM documents),
             |pos AS (
             |  SELECT tk, unnest(range(1, len(tk) + 1)) AS i FROM base),
             |pairs AS (
             |  SELECT tk[i] AS a, unnest(list_slice(tk, i + 1, i + 3)) AS b
             |  FROM pos),
             |cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
             |        FROM pairs GROUP BY a, b),
             |ca AS (SELECT a, CAST(count(*) AS BIGINT) AS c_a
             |       FROM pairs GROUP BY a),
             |cb AS (SELECT b, CAST(count(*) AS BIGINT) AS c_b
             |       FROM pairs GROUP BY b),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM pairs)
             |SELECT a, b, c_ab,
             |  round(ln(CAST(c_ab * t AS DOUBLE) /
             |           CAST(c_a * c_b AS DOUBLE)), 6) AS pmi_r
             |FROM cab JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN tot
             |ORDER BY c_ab DESC, a, b LIMIT 50""".stripMargin)),

    QuerySpec("x65_kll_quantiles",
      "sketch-based quantile governance (compactor stack in the " +
        "Manku-Rajagopalan-Lindsay 1998 / Karnin-Lang-Liberty 2016 " +
        "family with deterministic alternating-offset compaction; " +
        "plans.KllSketchAgg / KllUnionAgg — Spark ships " +
        "hll_sketch_agg for distincts and count_min_sketch for " +
        "frequencies but NO mergeable quantile aggregate) — the " +
        "100 TB answer to `what is the p99 per segment`: an exact " +
        "per-group quantile sorts the full value column per group " +
        "and two shards' exact answers do not combine, while the " +
        "sketch is a few KB per group with map-side partials and " +
        "MERGES (build per shard/day/segment once, roll up to any " +
        "scope without a rescan — the x61/x63 shard→rollup shape). " +
        "k=256 is DELIBERATELY small against ~20k values/group so " +
        "compaction fires for real (builder REQUIREs retained < n); " +
        "governance gates on the measured TRUE rank of every " +
        "estimate over the data itself (|rank(est) - p| <= 0.02 per " +
        "group x probe), routed to the oracle as literal-TRUE " +
        "flags; the exact side is hash-gated (Spark percentile and " +
        "DuckDB quantile_cont are both p*(n-1) linear interpolation)",
      (s, dir) => {
        val kParam = 256
        val probes = Seq(0.1, 0.5, 0.9, 0.99)
        val tol = 0.02
        val vals = t(s, dir, "lineitem").select(
          col("l_returnflag").as("grp"),
          pmod(col("l_orderkey"), lit(8)).as("shard"),
          col("l_extendedprice").cast("double").as("v"))
        // shard sketches -> per-group rollup; the collect is one
        // KB-scale binary per group, never the value column
        val merged = vals.groupBy(col("grp"), col("shard"))
          .agg(SketchFunctions.kllAgg(col("v"), kParam).as("sk"))
          .groupBy(col("grp"))
          .agg(SketchFunctions.kllUnionAgg(col("sk")).as("sk"))
          .collect()
        val ests = merged.toSeq.flatMap { r =>
          val sk = graft.plans.QuantileSketch
            .deserialize(r.getAs[Array[Byte]]("sk"))
          require(sk.retained < sk.n,
            s"sketch never compacted (n=${sk.n}, k=$kParam vacuous)")
          probes.map(p => (r.getString(0), p, sk.quantile(p)))
        }
        import s.implicits._
        val estDf = ests.toDF("grp", "p", "est")
        val bad = vals.join(broadcast(estDf), Seq("grp"))
          .groupBy(col("grp"), col("p"))
          .agg((sum(when(col("v") <= col("est"), 1L).otherwise(0L))
            .cast("double") / count(lit(1))).as("true_rank"))
          .filter(abs(col("true_rank") - col("p")) > tol).collect()
        require(bad.isEmpty, "kll rank error out of bounds: " +
          bad.map(r => s"${r.get(0)}@p=${r.get(1)} rank=${r.get(2)}")
            .mkString(", "))
        vals.groupBy(col("grp"))
          .agg(expr(s"percentile(v, array(${probes.mkString(", ")}))")
            .as("qs"))
          .select(col("grp"), posexplode(col("qs")))
          .select(col("grp"),
            element_at(array(probes.map(lit): _*), col("pos") + 1)
              .as("p"),
            round(col("col"), 6).as("q_exact"),
            lit(true).as("rank_ok"))
          .orderBy(col("grp"), col("p"))
      },
      Some("""WITH v AS (
             |  SELECT l_returnflag AS grp,
             |    CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem)
             |SELECT grp, CAST(0.1 AS DOUBLE) AS p,
             |  round(quantile_cont(v, 0.1), 6) AS q_exact,
             |  TRUE AS rank_ok FROM v GROUP BY grp
             |UNION ALL
             |SELECT grp, CAST(0.5 AS DOUBLE),
             |  round(quantile_cont(v, 0.5), 6), TRUE FROM v GROUP BY grp
             |UNION ALL
             |SELECT grp, CAST(0.9 AS DOUBLE),
             |  round(quantile_cont(v, 0.9), 6), TRUE FROM v GROUP BY grp
             |UNION ALL
             |SELECT grp, CAST(0.99 AS DOUBLE),
             |  round(quantile_cont(v, 0.99), 6), TRUE FROM v GROUP BY grp
             |ORDER BY grp, p""".stripMargin)),

    QuerySpec("x66_weighted_sample",
      "deterministic weighted sampling without replacement " +
        "(Efraimidis & Spirakis 2006): per-lang top-10 by the " +
        "md5-derived priority ln(u)/w with w = whitespace token " +
        "count — token-budget-proportional document selection, the " +
        "corpus-mix subset step where longer (or higher-quality) " +
        "documents should be proportionally likelier to survive. No " +
        "rand() anywhere: u is exact 60-bit md5 integer arithmetic " +
        "and the priority rounds to 9 dp BEFORE ranking (ln differs " +
        "across libms by ~1 ulp — the temperatureSample pow note) " +
        "with id tiebreaks, so runs, engines, and cluster layouts " +
        "draw the IDENTICAL sample. Skew shape: two-phase " +
        "(lang, id-hash shard) then lang ranking (the x30 " +
        "domain-quota pattern — no task holds more than shards x k " +
        "rows of one lang), and the hash gate against DuckDB's " +
        "ONE-phase window proves the shard discard lossless " +
        "cross-engine. Builder REQUIREs the sample's mean weight " +
        "exceeds the corpus mean — the bias weighted sampling " +
        "exists to produce",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val w = greatest(lit(1L), size(col("__tk")).cast("long"))
        val sampled = Sampling.weightedSample(
          docs.select(col("lang"), col("doc_id"),
            wsTokens(col("text")).as("__tk")),
          "lang", "doc_id", w, k = 10)
        val corpusMean = docs.agg(avg(greatest(lit(1L),
          size(wsTokens(col("text"))).cast("long")))).head.getDouble(0)
        val sampleMean = sampled.agg(avg(col("w"))).head.getDouble(0)
        require(sampleMean > corpusMean,
          f"weighted sample mean weight $sampleMean%.2f does not " +
            f"exceed corpus mean $corpusMean%.2f")
        sampled.select(col("lang"), col("doc_id"),
            col("w").cast("long").as("w_tokens"), col("priority_r"),
            col("rk").cast("long").as("rk"))
          .orderBy(col("lang"), col("rk"))
      },
      Some(s"""WITH d AS (
             |  SELECT lang, doc_id,
             |    CAST(greatest(1, len($duckWsTokens)) AS DOUBLE) AS w,
             |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             |      ::BIGINT + 1) / 1152921504606846976.0 AS u
             |  FROM documents),
             |r AS (
             |  SELECT lang, doc_id, w,
             |    round(ln(u) / w, 9) AS priority_r,
             |    row_number() OVER (PARTITION BY lang
             |      ORDER BY round(ln(u) / w, 9) DESC, doc_id) AS rk
             |  FROM d)
             |SELECT lang, doc_id, CAST(w AS BIGINT) AS w_tokens,
             |  priority_r, CAST(rk AS BIGINT) AS rk
             |FROM r WHERE rk <= 10 ORDER BY lang, rk""".stripMargin)),

    QuerySpec("x62_jl_margin_prefilter",
      "Johnson-Lindenstrauss random-projection prefilter governance " +
        "(Johnson & Lindenstrauss 1984; Achlioptas 2003 ±1 form) — " +
        "project 64-dim embeddings to 32 dims and MEASURE what the " +
        "cut preserves: synthesized near-dup twins (deterministic " +
        "±0.05 md5-signed perturbation, full-dim cos ≈ 0.93) must ALL " +
        "stay above the reduced-space candidate threshold (JL " +
        "distortion scales with pair distance, so near pairs survive " +
        "tightly), while the background candidate rate stays ≤ 2% " +
        "(measured 0.6%) — the two numbers that size a " +
        "project-bucket-adjudicate semantic-dedup pass at 100 TB " +
        "(half the shuffle bytes and dot-product cost, full-dim " +
        "re-verify only on candidates). Fully hash-gated: DuckDB " +
        "re-derives twins, projections (literal Rademacher planes), " +
        "and both cosines bit-for-bit",
      (s, dir) => {
        val dim = 64; val dOut = 32
        val signs = Seq("0", "2", "4", "6", "8", "a", "c", "e")
        val withTwin = t(s, dir, "embeddings")
          .filter(pmod(col("vec_id"), lit(3)) === 0)
          .select(col("vec_id"), col("embedding"),
            transform(col("embedding"), (x, i) =>
              x.cast("double") + when(substring(md5(concat(
                col("vec_id").cast("string"), lit("-"),
                i.cast("string"))), 32, 1).isin(signs: _*),
                lit(0.05)).otherwise(lit(-0.05))).as("twin"))
        // the projection pipeline feeds the dup leg, both bg join
        // sides, and three executions (two REQUIRE gates + the
        // returned plan): one compute, scratch-read everywhere
        val proj = scratch(withTwin.select(col("vec_id"),
          col("embedding"), col("twin"),
          Similarity.jlProject(col("embedding"), dOut, dim).as("jl_v"),
          Similarity.jlProject(col("twin"), dOut, dim).as("jl_t")),
          "x62_proj")
        val dup = proj.select(lit("dup").as("kind"),
          col("vec_id").as("id_a"), col("vec_id").as("id_b"),
          cosine(col("embedding"), col("twin")).as("cos_full"),
          cosine(col("jl_v"), col("jl_t")).as("cos_jl"))
        val aSide = proj.select(col("vec_id").as("id_a"),
          col("embedding").as("va"), col("jl_v").as("ja"))
        val bSide = proj.select(col("vec_id").as("id_b"),
          col("embedding").as("vb"), col("jl_v").as("jb"))
        // equi-keyed rewrite of the background 1/37 pair sample:
        // (id_a + id_b) % 37 == 0  ⟺  id_a % 37 == (37 - id_b % 37)
        // % 37 — bucketing both sides turns the raw theta predicate
        // (a BroadcastNestedLoopJoin, O(n²) predicate evaluations)
        // into a 37-bucket shuffled equi-join with an id_a < id_b
        // residual, selecting the IDENTICAL pair set the oracle
        // re-derives
        val bg = aSide
          .withColumn("__bk", pmod(col("id_a"), lit(37)))
          .join(bSide.withColumn("__bk",
            pmod(lit(37) - pmod(col("id_b"), lit(37)), lit(37))),
            Seq("__bk"))
          .filter(col("id_a") < col("id_b"))
          .select(lit("bg").as("kind"), col("id_a"), col("id_b"),
            cosine(col("va"), col("vb")).as("cos_full"),
            cosine(col("ja"), col("jb")).as("cos_jl"))
        val all = dup.unionByName(bg).select(col("kind"), col("id_a"),
          col("id_b"), col("cos_full"), col("cos_jl"),
          (col("cos_jl") >= 0.5).as("candidate"))
        // prefilter governance: a dup the reduced space loses is a
        // dedup MISS (unrecoverable downstream); bg candidates are
        // only COST (full-dim re-verification volume)
        val dupMiss = all
          .filter(col("kind") === "dup" && !col("candidate")).count()
        require(dupMiss == 0,
          s"$dupMiss near-dup twins fell below the JL threshold")
        val bgStats = all.filter(col("kind") === "bg")
          .agg(count(lit(1)).as("n"),
            sum(when(col("candidate"), 1L).otherwise(0L)).as("c")).head
        require(bgStats.getLong(1) * 50L <= bgStats.getLong(0),
          s"background candidate rate ${bgStats.getLong(1)}/" +
            s"${bgStats.getLong(0)} exceeds 2%")
        all.select(col("kind"), col("id_a"), col("id_b"),
            round(col("cos_full"), 6).as("cos_full_r"),
            round(col("cos_jl"), 6).as("cos_jl_r"), col("candidate"))
          .orderBy(col("kind"), col("id_a"), col("id_b"))
      },
      Some(jlMarginOracle)),

    QuerySpec("x59_bpe_merge_learn",
      "distributed BPE merge learning (Sennrich et al. 2016) — the " +
        "step that LEARNS a subword vocabulary from the corpus " +
        "(x29 applies one): three merges learned over the normalized " +
        "word-frequency table, ties broken lexicographically so the " +
        "trajectory is engine-independent. Scale factorization: the " +
        "corpus is scanned once into the vocabulary; every iteration " +
        "shuffles only DISTINCT-pair counts and collects exactly one " +
        "argmax row. The oracle is late-bound but NON-circular: " +
        "DuckDB RE-DERIVES each level's argmax over the vocabulary " +
        "with the previous merges applied (recursive-CTE " +
        "replace-to-fixpoint per level) — the stashed merges only " +
        "drive the applications, so a wrongly-learned merge at any " +
        "level diverges that level's recomputed argmax and count",
      (s, dir) => {
        import s.implicits._
        val words = graft.operators.Bpe.wordFrequencies(
          t(s, dir, "documents"), "text")
        val merges = graft.operators.Bpe.learnMerges(words, 3)
        graft.operators.Bpe.recordMerges(3, "documents", merges)
        merges.zipWithIndex.map { case ((l, r, n), i) =>
          (i + 1L, l, r, l + r, n)
        }.toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
          .orderBy(col("merge_rank"))
      },
      None,
      oracleGen = () => graft.operators.Bpe.learnedMerges
        .get((3, "documents"))
        .map(m => graft.operators.Bpe.trajectoryOracleSql(
          "documents", "text", m))),

    QuerySpec("x55_pagerank_centrality",
      "link-graph centrality for crawl/corpus curation (Page et al. " +
        "1999; Common Crawl ranks hosts by centrality to prioritize " +
        "its frontier, and domain rank is a standard pretraining " +
        "quality prior): 3 power iterations over the symmetrized " +
        "supplier-part graph, every FP reduction a two-phase " +
        "src-then-shard SORTED fold (order-pinned against the oracle " +
        "AND bounded under in-degree skew — a hot node folds as 64 " +
        "bounded lists, never one giant one); per iteration one " +
        "src-keyed join + two keyed aggregations, nothing all-pairs",
      (s, dir) => {
        // fixture graph sized by a partkey cut (a scan-pushed
        // predicate): centrality semantics are fully exercised while
        // the entry's bench line stays join-sized, not suite-dominating
        val sp = t(s, dir, "lineitem")
          .filter(col("l_partkey") <= 2000)
          .select(col("l_suppkey").cast("long").as("s"),
            (col("l_partkey").cast("long") + 1000000L).as("p"))
          .distinct()
        val edges = sp.select(col("s").as("src"), col("p").as("dst"))
          .unionByName(sp.select(col("p").as("src"), col("s").as("dst")))
        graft.operators.Graph.pageRank(edges, iters = 3)
          .orderBy(col("id"))
      },
      Some(graft.operators.Graph.pageRankOracleSql(
        """WITH sp AS (
          |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
          |    CAST(l_partkey AS BIGINT) + 1000000 AS p
          |  FROM lineitem WHERE l_partkey <= 2000)
          |SELECT s AS src, p AS dst FROM sp
          |UNION ALL SELECT p AS src, s AS dst FROM sp""".stripMargin,
        iters = 3) + "\nORDER BY id")),

    QuerySpec("x73_pagerank_converged",
      "PageRank with the PRODUCTION stopping rule — iterate until the " +
        "L1 delta sum |r_i - r_(i-1)| drops under tol, not a fixed " +
        "round count (x55): the delta metric rides each round's " +
        "materialization job via observe() + one noop write (no " +
        "second pass), each round's rank vector is lineage-truncated " +
        "(ranks feeds the next round twice — an un-truncated plan " +
        "doubles per round), and steady state holds exactly two rank " +
        "vectors. The oracle re-derives the stop round independently: " +
        "it unrolls maxIters rounds in DuckDB, recomputes every " +
        "round's L1 delta, and picks the first round under tol — a " +
        "wrong Spark-side stop diverges the hash through BOTH the " +
        "emitted iters_run and the rank values. tol sits >= 2e-4 from " +
        "the nearest achievable delta (measured), dwarfing the ULP " +
        "noise of the unordered delta sums; rank values stay " +
        "bit-exact via the x55 sorted folds",
      (s, dir) => {
        val sp = t(s, dir, "lineitem")
          .filter(col("l_partkey") <= 600)
          .select(col("l_suppkey").cast("long").as("s"),
            (col("l_partkey").cast("long") + 1000000L).as("p"))
          .distinct()
        val edges = sp.select(col("s").as("src"), col("p").as("dst"))
          .unionByName(sp.select(col("p").as("src"), col("s").as("dst")))
        // damping 0.5 halves the delta per round, so the rule fires
        // within a small budget; measured deltas on the fixture:
        // round 9 ~ 2.8-3.5e-3, round 10 ~ 1.4-1.8e-3 → tol 2e-3
        // stops at round 10 at both gate SFs with >= 2e-4 margin
        val run = graft.operators.Graph.pageRankConverged(edges,
          maxIters = 12, tol = 2e-3, damping = 0.5)
        require(run.iters >= 1 && run.iters < 12,
          s"the L1 stopping rule must fire BEFORE the iteration budget " +
            s"(converged=${run.iters}, budget=12) — hitting the cap " +
            "means the entry no longer exercises convergence")
        require(run.l1Delta <= 2e-3,
          s"converged run must end under tol, got ${run.l1Delta}")
        run.ranks.withColumn("iters_run", lit(run.iters.toLong))
          .orderBy(col("id"))
      },
      Some(graft.operators.Graph.pageRankConvergedOracleSql(
        """SELECT s AS src, p AS dst FROM (
          |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
          |    CAST(l_partkey AS BIGINT) + 1000000 AS p
          |  FROM lineitem WHERE l_partkey <= 600)
          |UNION ALL SELECT p AS src, s AS dst FROM (
          |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
          |    CAST(l_partkey AS BIGINT) + 1000000 AS p
          |  FROM lineitem WHERE l_partkey <= 600)""".stripMargin,
        maxIters = 12, tol = 2e-3, damping = 0.5))),

    QuerySpec("x56_url_canonicalize",
      "crawl-curation URL keying: RFC 3986 §6 canonicalization " +
        "(scheme/host case, default-port elision, §6.2.2.2 " +
        "percent-encoding normalization — uppercase hex, unreserved " +
        "octets decoded, reserved kept encoded, bare % preserved) " +
        "plus the de-facto crawl extensions — fragment/userinfo " +
        "drop, tracking-param removal, query-param sort, slash and " +
        "trailing-host-dot normalization, punycode-stable xn-- " +
        "labels — and registered-domain extraction with FULL " +
        "public-suffix-list rule semantics (plain, *.wildcard and " +
        "!exception rules, exceptions first then longest); the " +
        "fixture derives nine messy URL shapes per document " +
        "deterministically. A pure chain of codegen'd regexp/array " +
        "projections, zero shuffle before the gate's ORDER BY: at " +
        "100 TB the ~40-byte canonical key is what shuffles for " +
        "URL-level dedup and per-domain quotas (x30), never the " +
        "page bytes",
      (s, dir) => {
        import graft.operators.Web
        val id = col("doc_id").cast("string")
        val m = col("doc_id") % 9
        val url = when(m === 0, concat(lit("HTTP://WWW."),
            upper(col("source")), lit(".Example.TEST:80/Docs/"), id,
            lit("//a/?utm_source=x&b=2&a=1#frag")))
          .when(m === 1, concat(lit("https://"), col("source"),
            lit(".example.test:443/docs/"), id))
          .when(m === 2, concat(lit("https://u:p@"), col("source"),
            lit(".example.test/a//b/"), id, lit("/?gclid=zz&z=1&a=2")))
          .when(m === 3, concat(lit("http://"), col("source"),
            lit(".example.test:8080/p/"), id, lit("?z=9&a=1&fbclid=t&")))
          .when(m === 4, concat(lit("https://www."), col("source"),
            lit(".example.test/docs/"), id, lit("/#sec")))
          .when(m === 5, concat(lit("https://"), col("source"),
            lit(".example.test/%7Edocs%2fx/"), id,
            lit("?a=%41%2d1&utm_campaign=c&b=%3a&c=100%")))
          .when(m === 6, concat(lit("HTTPS://WWW.XN--BCHER-KVA."),
            upper(col("source")), lit(".Example.TEST.:443/b/"), id,
            lit("#x")))
          .when(m === 7 && col("doc_id") % 2 === 0,
            concat(lit("https://a."), col("source"),
              lit(".cdn.example.test/w/"), id))
          .when(m === 7, concat(
            lit("https://sub.origin.cdn.example.test/e/"), id))
          .otherwise(concat(lit("doc "), id))
        t(s, dir, "documents")
          .select(col("doc_id"), url.as("url"))
          .select(col("doc_id"), col("url"),
            Web.canonicalUrl(col("url")).as("canonical"),
            Web.canonicalHost(col("url")).as("host"))
          // registeredDomain over the COMPUTED host column (the twin's
          // CTE shape): its rule fold references the host many times,
          // and CollapseProject keeps the non-cheap host pipeline from
          // being inlined into each reference
          .select(col("doc_id"), col("url"), col("canonical"),
            col("host"),
            Web.registeredDomain(col("host"), x56Suffixes)
              .as("reg_domain"))
          .orderBy(col("doc_id"))
      },
      Some {
        import graft.operators.Web
        s"""WITH u AS (
           |  SELECT doc_id,
           |    CASE
           |      WHEN doc_id % 9 = 0 THEN 'HTTP://WWW.' || upper(source) ||
           |        '.Example.TEST:80/Docs/' || CAST(doc_id AS VARCHAR) ||
           |        '//a/?utm_source=x&b=2&a=1#frag'
           |      WHEN doc_id % 9 = 1 THEN 'https://' || source ||
           |        '.example.test:443/docs/' || CAST(doc_id AS VARCHAR)
           |      WHEN doc_id % 9 = 2 THEN 'https://u:p@' || source ||
           |        '.example.test/a//b/' || CAST(doc_id AS VARCHAR) ||
           |        '/?gclid=zz&z=1&a=2'
           |      WHEN doc_id % 9 = 3 THEN 'http://' || source ||
           |        '.example.test:8080/p/' || CAST(doc_id AS VARCHAR) ||
           |        '?z=9&a=1&fbclid=t&'
           |      WHEN doc_id % 9 = 4 THEN 'https://www.' || source ||
           |        '.example.test/docs/' || CAST(doc_id AS VARCHAR) ||
           |        '/#sec'
           |      WHEN doc_id % 9 = 5 THEN 'https://' || source ||
           |        '.example.test/%7Edocs%2fx/' || CAST(doc_id AS VARCHAR) ||
           |        '?a=%41%2d1&utm_campaign=c&b=%3a&c=100%'
           |      WHEN doc_id % 9 = 6 THEN 'HTTPS://WWW.XN--BCHER-KVA.' ||
           |        upper(source) || '.Example.TEST.:443/b/' ||
           |        CAST(doc_id AS VARCHAR) || '#x'
           |      WHEN doc_id % 9 = 7 AND doc_id % 2 = 0
           |        THEN 'https://a.' || source ||
           |          '.cdn.example.test/w/' || CAST(doc_id AS VARCHAR)
           |      WHEN doc_id % 9 = 7
           |        THEN 'https://sub.origin.cdn.example.test/e/' ||
           |          CAST(doc_id AS VARCHAR)
           |      ELSE 'doc ' || CAST(doc_id AS VARCHAR)
           |    END AS url
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, url,
           |    ${Web.canonicalUrlSql("url")} AS canonical,
           |    ${Web.canonicalHostSql("url")} AS host
           |  FROM u)
           |SELECT doc_id, url, canonical, host,
           |  ${Web.registeredDomainSql("host", x56Suffixes)}
           |    AS reg_domain
           |FROM c ORDER BY doc_id""".stripMargin
      }),

    QuerySpec("x72_psl_join_registered_domain",
      "registered-domain extraction via the broadcast rule-table JOIN " +
        "(Web.withRegisteredDomain) — the production PSL path, and " +
        "the ONLY shape viable at the real publicsuffix.org size: the " +
        "per-rule expression fold (x56's form) overflows the analyzer " +
        "stack at ~300 rules, two orders of magnitude under the " +
        "~9,250-rule list. The fixture is a " +
        "publicsuffix.org-FORMAT file (comments, blank lines, a " +
        "trailing-comment rule) parsed by parsePslFile into 422 rules " +
        "covering every kind: plain TLDs, two-level registries, " +
        "nested wildcards, exceptions, and raw-unicode rules that " +
        "must IDNA-normalize to match punycoded hosts. Each DISTINCT " +
        "host explodes to its dot-suffix chain in-row; ONE broadcast " +
        "(mode,key) equi-join matches candidates against the KB-sized " +
        "rule table (REQUIREd to plan as a BroadcastHashJoin, never a " +
        "nested-loop rule walk); the prevailing rule per host is a " +
        "struct-min on the PSL algorithm's exact precedence key. The " +
        "DuckDB twin re-derives every host through the per-rule CASE " +
        "spec (registeredDomainSql), so the hash gate checks the join " +
        "ALGORITHM against the straightforward per-rule semantics " +
        "cross-engine. At 100 TB the corpus pays one host-keyed " +
        "distinct + one equi-join back; hosts never walk the rule list",
      (s, dir) => {
        import graft.operators.Web
        // >300: the regime where only the join form can run (the
        // fixture must actually be past the expression ceiling)
        require(x72Rules.size == 422,
          s"PSL fixture must parse to 422 rules, got ${x72Rules.size}")
        val id = col("doc_id").cast("string")
        val m = col("doc_id") % 9
        val t320 = (col("doc_id") % 320).cast("string")
        val t40 = (col("doc_id") % 40).cast("string")
        val t20 = (col("doc_id") % 20).cast("string")
        val host =
          // plain TLD, 2 labels → rd = host
          when(m === 0, concat(lit("site"), id, lit(".tld"), t320))
          // deeper under plain → rd = last 2 labels
          .when(m === 1, concat(lit("a"), id, lit(".site"), id,
            lit(".tld"), t320))
          // two-level registry → rd = last 3 labels
          .when(m === 2, concat(lit("site"), id, lit(".co.tld"), t40))
          // host IS a listed suffix → rd = itself
          .when(m === 3, concat(lit("co.tld"), t40))
          // under a wildcard: 4 labels → rd = whole host; 3 labels →
          // host IS a (wildcard-defined) public suffix → rd = itself
          .when(m === 4 && col("doc_id") % 2 === 0, concat(lit("x"), id,
            lit(".site"), id, lit(".w.tld"), t40))
          .when(m === 4, concat(lit("site"), id, lit(".w.tld"), t40))
          // exception carve-out → rd = the exception body
          .when(m === 5, concat(lit("site"), id, lit(".keep.w.tld"), t20))
          // punycoded hosts under the raw-unicode rules
          .when(m === 6 && col("doc_id") % 2 === 0,
            concat(lit("site"), id, lit("." + x72UniPlainBody)))
          .when(m === 6, concat(lit("s"), id, lit(".b." + x72UniWildBody)))
          // unlisted → fallback last-2-labels
          .when(m === 7, concat(lit("site"), id, lit(".zz"), t320))
          // dotless → itself
          .otherwise(concat(lit("host"), id))
        val out = Web.withRegisteredDomain(
            t(s, dir, "documents").select(col("doc_id"), host.as("host")),
            "host", x72Rules, "reg_domain")
          .select(col("doc_id"), col("host"), col("reg_domain"))
          .orderBy(col("doc_id"))
        // plan contract (WebSpec's assertion, enforced per run): the
        // rule match must be a pure hash join on (mode, key) — a
        // nested-loop walk of 422 rules per candidate is the shape
        // this operator exists to avoid
        val plan = out.queryExecution.sparkPlan.toString
        require(plan.contains("BroadcastHashJoin"),
          s"rule match must plan as a BroadcastHashJoin:\n$plan")
        require(!plan.contains("BroadcastNestedLoopJoin"),
          s"no nested-loop join may appear in the plan:\n$plan")
        out
      },
      Some {
        import graft.operators.Web
        s"""WITH h AS (
           |  SELECT doc_id,
           |    CASE
           |      WHEN doc_id % 9 = 0 THEN 'site' || CAST(doc_id AS VARCHAR)
           |        || '.tld' || CAST(doc_id % 320 AS VARCHAR)
           |      WHEN doc_id % 9 = 1 THEN 'a' || CAST(doc_id AS VARCHAR)
           |        || '.site' || CAST(doc_id AS VARCHAR)
           |        || '.tld' || CAST(doc_id % 320 AS VARCHAR)
           |      WHEN doc_id % 9 = 2 THEN 'site' || CAST(doc_id AS VARCHAR)
           |        || '.co.tld' || CAST(doc_id % 40 AS VARCHAR)
           |      WHEN doc_id % 9 = 3
           |        THEN 'co.tld' || CAST(doc_id % 40 AS VARCHAR)
           |      WHEN doc_id % 9 = 4 AND doc_id % 2 = 0
           |        THEN 'x' || CAST(doc_id AS VARCHAR)
           |          || '.site' || CAST(doc_id AS VARCHAR)
           |          || '.w.tld' || CAST(doc_id % 40 AS VARCHAR)
           |      WHEN doc_id % 9 = 4 THEN 'site' || CAST(doc_id AS VARCHAR)
           |        || '.w.tld' || CAST(doc_id % 40 AS VARCHAR)
           |      WHEN doc_id % 9 = 5 THEN 'site' || CAST(doc_id AS VARCHAR)
           |        || '.keep.w.tld' || CAST(doc_id % 20 AS VARCHAR)
           |      WHEN doc_id % 9 = 6 AND doc_id % 2 = 0
           |        THEN 'site' || CAST(doc_id AS VARCHAR)
           |          || '.$x72UniPlainBody'
           |      WHEN doc_id % 9 = 6 THEN 's' || CAST(doc_id AS VARCHAR)
           |        || '.b.$x72UniWildBody'
           |      WHEN doc_id % 9 = 7 THEN 'site' || CAST(doc_id AS VARCHAR)
           |        || '.zz' || CAST(doc_id % 320 AS VARCHAR)
           |      ELSE 'host' || CAST(doc_id AS VARCHAR)
           |    END AS host
           |  FROM documents)
           |SELECT doc_id, host,
           |  ${Web.registeredDomainSql("host", x72Rules)
                .replace("\n", "\n  ")}
           |    AS reg_domain
           |FROM h ORDER BY doc_id""".stripMargin
      }),

    QuerySpec("x74_robots_txt_gate",
      "robots.txt crawl-permission gating (RFC 9309) — the politeness " +
        "filter every crawl pipeline runs between frontier and fetch, " +
        "and retroactively over an acquired corpus when a robots " +
        "snapshot arrives: group selection per §2.2.1 (consecutive " +
        "User-agent headers form one group, blank lines do NOT split " +
        "a header, matching groups MERGE, star groups apply only when " +
        "no exact group exists, empty-value rule lines close the " +
        "header but contribute no rule, pre-header rules are ignored) " +
        "and the §2.2.2 decision (most-specific = longest pattern " +
        "wins, Allow beats Disallow on ties, * wildcard, trailing-$ " +
        "anchor, no-match = allowed). Scale shape: bodies parse ONCE " +
        "on the tiny per-host robots table via one in-row aggregate " +
        "fold (a narrow projection), the rule arrays broadcast-join " +
        "to the URL corpus on host class (REQUIREd BroadcastHashJoin), " +
        "and the per-URL decision is an in-row fold over ≤ dozens of " +
        "rules using LIKE translation (*→%, escaped %/_) — no per-row " +
        "regex compilation, page bytes never shuffle. The DuckDB twin " +
        "takes the INDEPENDENT relational route (lines with " +
        "ordinality, lag/running-sum block detection, bool_or group " +
        "applicability, row_number winner), so the hash gate crosses " +
        "two different algorithms",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Web
        val robots = x74RobotsBodies.toDF("kind", "body")
          .select(col("kind"),
            Web.robotsGroup(col("body"), "GraftBot").as("rules"))
        // parse audit: body0 keeps 5 rules (empty Disallow dropped),
        // body1 falls back to the 2-rule star group, body2's exact
        // group exists but is EMPTY (star moot)
        val counts = robots.select(col("kind"), size(col("rules")))
          .as[(Long, Int)].collect().toMap
        require(counts == Map(0L -> 5, 1L -> 2, 2L -> 0),
          s"robots parse audit failed: $counts")
        val id = col("doc_id").cast("string")
        val m = col("doc_id") % 8
        val path =
          when(m === 0, concat(lit("/docs/d"), id))
          .when(m === 1, concat(lit("/docs/public/p"), id))
          .when(m === 2, concat(lit("/files/f"), id, lit(".zip")))
          .when(m === 3, concat(lit("/files/f"), id, lit(".zipx")))
          .when(m === 4, concat(lit("/ti/x"), id))
          .when(m === 5, concat(lit("/private/ok/o"), id))
          .when(m === 6, concat(lit("/private/p"), id))
          .otherwise(concat(lit("/free/f"), id))
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), (col("doc_id") % 3).as("kind"),
            path.as("path"))
        val out = docs.join(broadcast(robots), Seq("kind"))
          .select(col("doc_id"), col("kind"), col("path"),
            Web.robotsDecision(col("path"), col("rules")).as("d"))
          .select(col("doc_id"), col("kind"), col("path"),
            col("d.allowed").as("allowed"),
            col("d.win_len").as("win_len"), col("d.win_p").as("win_p"))
          .orderBy(col("doc_id"))
        val plan = out.queryExecution.sparkPlan.toString
        require(plan.contains("BroadcastHashJoin"),
          s"robots rules must broadcast-join to the corpus:\n$plan")
        out
      },
      Some {
        import graft.operators.Web
        def sq(x: String): String = "'" + x.replace("'", "''") + "'"
        val bodies = x74RobotsBodies
          .map { case (k, b) => s"($k, ${sq(b)})" }.mkString(",\n    ")
        val lk = Web.robotsLikeSql("core", "endsd")
        s"""WITH robots(kind, body) AS (VALUES
           |    $bodies),
           |${Web.robotsRulesSqlCtes("robots", "GraftBot", "rr")},
           |docs AS (
           |  SELECT doc_id, doc_id % 3 AS kind,
           |    CASE doc_id % 8
           |      WHEN 0 THEN '/docs/d' || CAST(doc_id AS VARCHAR)
           |      WHEN 1 THEN '/docs/public/p' || CAST(doc_id AS VARCHAR)
           |      WHEN 2 THEN '/files/f' || CAST(doc_id AS VARCHAR)
           |        || '.zip'
           |      WHEN 3 THEN '/files/f' || CAST(doc_id AS VARCHAR)
           |        || '.zipx'
           |      WHEN 4 THEN '/ti/x' || CAST(doc_id AS VARCHAR)
           |      WHEN 5 THEN '/private/ok/o' || CAST(doc_id AS VARCHAR)
           |      WHEN 6 THEN '/private/p' || CAST(doc_id AS VARCHAR)
           |      ELSE '/free/f' || CAST(doc_id AS VARCHAR)
           |    END AS path
           |  FROM documents),
           |cand AS (
           |  SELECT d.doc_id, d.kind, d.path, r.p, r.a,
           |    CASE WHEN r.p LIKE '%$$' THEN substr(r.p, 1,
           |      length(r.p) - 1) ELSE r.p END AS core,
           |    (r.p LIKE '%$$') AS endsd
           |  FROM docs d JOIN rr r ON d.kind = r.kind),
           |win AS (
           |  SELECT doc_id, p, a,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY length(p) DESC, CAST(a AS INT) DESC, p DESC)
           |      AS rn
           |  FROM cand WHERE path LIKE $lk ESCAPE '\\'),
           |best AS (SELECT doc_id, p, a FROM win WHERE rn = 1)
           |SELECT d.doc_id, CAST(d.kind AS BIGINT) AS kind, d.path,
           |  coalesce(b.a, true) AS allowed,
           |  CAST(coalesce(length(b.p), -1) AS BIGINT) AS win_len,
           |  coalesce(b.p, '') AS win_p
           |FROM docs d LEFT JOIN best b ON d.doc_id = b.doc_id
           |ORDER BY d.doc_id""".stripMargin
      }),

    QuerySpec("x75_paragraph_dedup",
      "CCNet-style paragraph-level dedup with document reassembly " +
        "(Wenzek et al. 2020): split on newline, keep each " +
        "paragraph's FIRST corpus-wide occurrence under the CCNet " +
        "normalization key (lowercase, digits+punctuation stripped, " +
        "whitespace collapsed — so 'Promo 2024!' and 'promo' " +
        "collide), reassemble survivors in position order; blank/" +
        "separator paragraphs whose key normalizes to EMPTY are " +
        "exempt (deduping them corpus-wide would rip every " +
        "document's structure apart). The stage that removes " +
        "headers/nav/cookie banners from INSIDE documents — " +
        "different from x1 (whole-doc), x35 (substring spans within " +
        "pairs): this rewrites the corpus. Scale shape: the winner " +
        "election shuffles md5(key) fingerprints with a map-side " +
        "partial min(struct), so at most one paragraph text per " +
        "distinct key leaves each partition; reassembly is one " +
        "groupBy(doc) with an IN-ROW array_sort (never a global " +
        "window); empty-key rows bypass the election on a narrow " +
        "union branch. Fixture wraps each document in a global " +
        "header (survives ONCE corpus-wide), 7 promo classes " +
        "(survive once each), a within-doc repeat (never survives), " +
        "a blank line and a digits/punct-only row (survive " +
        "everywhere), and 5 tail classes; builder REQUIREs those " +
        "exact survivor counts. DuckDB twin takes the independent " +
        "route: direct string-keyed row_number() window over the " +
        "exploded paragraphs, no fingerprints",
      (s, dir) => {
        val id = col("doc_id").cast("string")
        val promo = concat(lit("Promo block "),
          lit("abcdefg").substr((col("doc_id") % 7 + 1).cast("int"), lit(1)))
        val fixture = concat_ws("\n",
          lit("Shared header boilerplate."),
          promo,
          concat(lit("doc "), id, lit(" "), col("text")),
          lit(""),
          promo,
          lit("#42 --- 2024!!"),
          concat(lit("Tail "),
            lit("vwxyz").substr((col("doc_id") % 5 + 1).cast("int"), lit(1))))
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), fixture.as("text"))
        val out = scratch(
          Corpus.paragraphDedup(docs, "doc_id", "text"), "x75_out")
        // survivor audit: every fixture class lands where the
        // first-occurrence rule says it must
        val audit = out.select(
          sum(when(col("text_dedup")
            .startsWith("Shared header boilerplate."), 1L).otherwise(0L)),
          sum(when(col("text_dedup").contains("Promo block"), 1L)
            .otherwise(0L)),
          sum(when(col("text_dedup").contains("Tail "), 1L).otherwise(0L)),
          sum(when(col("text_dedup").contains("#42 --- 2024!!"), 1L)
            .otherwise(0L)),
          count(lit(1))).collect()(0)
        val nDocs = audit.getLong(4)
        require(audit.getLong(0) == 1L,
          s"global header must survive exactly once, got ${audit.getLong(0)}")
        require(audit.getLong(1) == math.min(7L, nDocs),
          s"one survivor per promo class, got ${audit.getLong(1)}")
        require(audit.getLong(2) == math.min(5L, nDocs),
          s"one survivor per tail class, got ${audit.getLong(2)}")
        require(audit.getLong(3) == nDocs,
          "empty-key separator row must survive in every document")
        out.orderBy(col("doc_id"))
      },
      Some {
        val paraKey = Corpus.paraKeySql("para")
        s"""WITH base AS (
           |  SELECT doc_id,
           |    'Shared header boilerplate.'
           |    || chr(10) || 'Promo block '
           |      || substr('abcdefg', CAST(doc_id % 7 AS INT) + 1, 1)
           |    || chr(10) || 'doc ' || CAST(doc_id AS VARCHAR)
           |      || ' ' || text
           |    || chr(10) || ''
           |    || chr(10) || 'Promo block '
           |      || substr('abcdefg', CAST(doc_id % 7 AS INT) + 1, 1)
           |    || chr(10) || '#42 --- 2024!!'
           |    || chr(10) || 'Tail '
           |      || substr('vwxyz', CAST(doc_id % 5 AS INT) + 1, 1)
           |      AS text
           |  FROM documents),
           |p AS (
           |  SELECT doc_id, unnest(range(0, len(ls))) AS pos,
           |    unnest(ls) AS para
           |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
           |        FROM base)),
           |k AS (
           |  SELECT doc_id, pos, para, $paraKey AS key FROM p),
           |w AS (
           |  SELECT doc_id, pos, para,
           |    row_number() OVER (PARTITION BY key
           |      ORDER BY doc_id, pos) AS rn
           |  FROM k WHERE key <> ''),
           |kept AS (
           |  SELECT doc_id, pos, para FROM w WHERE rn = 1
           |  UNION ALL
           |  SELECT doc_id, pos, para FROM k WHERE key = ''),
           |agg AS (
           |  SELECT doc_id,
           |    string_agg(para, chr(10) ORDER BY pos) AS text_dedup,
           |    count(*) AS n_kept
           |  FROM kept GROUP BY doc_id),
           |tot AS (
           |  SELECT doc_id,
           |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_paras
           |  FROM base)
           |SELECT t.doc_id, coalesce(a.text_dedup, '') AS text_dedup,
           |  t.n_paras, CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept
           |FROM tot t LEFT JOIN agg a USING (doc_id)
           |ORDER BY t.doc_id""".stripMargin
      }),

    QuerySpec("x76_wet_roundtrip",
      "WET (WARC conversion-record) source/sink round-trip — the " +
        "format crawl corpora ship in (ISO 28500 / Common Crawl " +
        ".wet): corpus rendered as version-line-framed records with " +
        "CRLF headers, a deterministic md5 WARC-Record-ID and a " +
        "byte-exact Content-Length, written as text part files, read " +
        "back via the multi-byte lineSep scan (Hadoop's delimited " +
        "reader keeps records whole across input-split boundaries, " +
        "so a 100 TB dump parallelizes by block with zero shuffle — " +
        "the builder REQUIREs a shuffle-free parse plan) and parsed " +
        "by pure codegen'd projections: bounded split, per-header " +
        "regex extracts, and a BINARY substring so the payload slice " +
        "honors the OCTET count on non-ASCII text (the fixture " +
        "appends unicode to every document to force bytes≠chars). " +
        "frame_ok REQUIREd true for every record (declared length " +
        "lands exactly on the CRLF terminator). The DuckDB twin " +
        "never sees the file: it re-derives every parsed field " +
        "straight from the documents table, so any corruption in " +
        "write, framing, split, or byte-slicing diverges the hash",
      (s, dir) => {
        import graft.sources.Warc
        val path = sys.props.getOrElse("graft.wet.tmp",
          s"/tmp/graft_wet_docs_${new java.io.File(dir).getName}")
        val id = col("doc_id").cast("string")
        val fixture = t(s, dir, "documents").select(
          concat(lit("https://s"), id, lit(".example.test/d")).as("uri"),
          concat(lit("2024-01-0"), (col("doc_id") % 9 + 1).cast("string"),
            lit("T00:00:00Z")).as("dt"),
          concat(col("text"), lit(" — café №"), id).as("text"))
        Warc.writeWet(fixture, path, "uri", "dt", "text")
        val parsed = Warc.readWet(s, path)
        val plan = parsed.queryExecution.sparkPlan.toString
        require(!plan.contains("Exchange"),
          s"WET parse must be a shuffle-free scan+project:\n$plan")
        val nDocs = t(s, dir, "documents").count()
        val audit = parsed.agg(count(lit(1)),
          sum(when(col("frame_ok"), 0L).otherwise(1L))).collect()(0)
        require(audit.getLong(0) == nDocs,
          s"record count ${audit.getLong(0)} != corpus size $nDocs")
        require(audit.getLong(1) == 0L,
          s"${audit.getLong(1)} records failed byte framing")
        parsed.orderBy(col("uri"))
      },
      Some("""WITH f AS (
             |  SELECT
             |    'https://s' || CAST(doc_id AS VARCHAR)
             |      || '.example.test/d' AS uri,
             |    '2024-01-0' || CAST(doc_id % 9 + 1 AS VARCHAR)
             |      || 'T00:00:00Z' AS rec_date,
             |    text || ' — café №' || CAST(doc_id AS VARCHAR) AS text
             |  FROM documents)
             |SELECT uri, 'conversion' AS rec_type,
             |  '<urn:md5:' || md5(uri) || '>' AS rec_id,
             |  rec_date, CAST(strlen(text) AS BIGINT) AS content_length,
             |  text, TRUE AS frame_ok
             |FROM f ORDER BY uri""".stripMargin)),

    QuerySpec("x77_dsir_selection",
      "DSIR data selection (Xie et al. 2023): pick the k raw-corpus " +
        "documents that look most like a TARGET distribution (here " +
        "the English slice) under hashed unigram+bigram bag-of-" +
        "features — importance log-weight Σ n_b·ln(p̂_tgt(b)/" +
        "p̂_raw(b)) over 1024 md5 buckets with add-0.5 smoothing, " +
        "then Gumbel-top-k (noise from the namespaced id hash, so " +
        "the paper's without-replacement softmax draw is fully " +
        "derandomized). The quality-targeting counterpart of x34's " +
        "classifier and x38's perplexity buckets, and the standard " +
        "cheap pretraining-data targeting method. Scale: corpus text " +
        "never shuffles (one narrow feature explosion; only " +
        "(id,bucket,n) frames move), both histograms are bucket-" +
        "sized broadcasts, per-doc folds run in bucket order (bit-" +
        "identical cross-engine), selection is the distributed " +
        "top-k (REQUIREd TakeOrderedAndProject — never a global " +
        "window/sort). Builder REQUIREs the selection actually " +
        "enriches the target: the English fraction among the k " +
        "winners must be at least the corpus base rate. Twin mirrors " +
        "constants, fold order and 6/9-dp rounding via " +
        "Sampling.dsirOracleSql",
      (s, dir) => {
        val out = Sampling.dsirSelect(t(s, dir, "documents"),
          "doc_id", "text", "lang = 'en'",
          materialize = df => scratch(df, "x77_db"))
        val plan = out.queryExecution.sparkPlan.toString
        require(plan.contains("TakeOrderedAndProject"),
          s"top-k selection must be distributed take-ordered:\n$plan")
        val sel = scratch(out, "x77_out")
        val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"))
        val enFrac = (df: DataFrame) => df.agg(
          avg(when(col("lang") === "en", 1.0).otherwise(0.0))).collect()(0)
          .getDouble(0)
        val selEn = enFrac(sel.join(docs, Seq("doc_id")))
        val baseEn = enFrac(docs)
        require(selEn >= baseEn,
          s"DSIR selection must enrich the target: selected en-frac " +
            s"$selEn < corpus base rate $baseEn")
        // sel IS the k-row selection; re-sorting the scratch table is
        // the total order, no second limit (the checker would have to
        // distrust a limit over an unsorted scan)
        sel.orderBy(col("gkey_r").desc, col("doc_id"))
      },
      Some(Sampling.dsirOracleSql(
        "documents", "doc_id", "text", "lang = 'en'"))),

    QuerySpec("x78_unimax_mixture",
      "UniMax budget allocation (Chung et al., ICLR 2023): split a " +
        "token budget across domains so every domain repeats as " +
        "uniformly as possible under a hard epoch cap — the " +
        "principled fix for temperature mixing's (x24b) over-" +
        "sampling of tiny domains. Closed-form waterfill over the " +
        "CONFIG-SCALE domain table (sorted ascending, capped prefix, " +
        "water level fixed at the first uncapped domain — exact-" +
        "double prefix sums since caps are n·E with E a binary " +
        "fraction), then applied to the corpus as floor(epochs) " +
        "repeats plus a namespaced-hash draw for the fractional " +
        "epoch. Fixture folds the 20 sources into 5 domains with " +
        "1/5/14/35/45% doc-id mass so BOTH branches exercise " +
        "(REQUIREd: at least one capped and one uncapped domain, " +
        "budget spent exactly across allocs); corpus-side apply is a " +
        "broadcast join + narrow projection — only the domain table " +
        "ever sorts. Twin re-derives the waterfill and the reps rule " +
        "from the same CTE generators (Mixing.unimaxAllocSqlCtes)",
      (s, dir) => {
        import graft.operators.Mixing
        val m = col("doc_id") % 100
        val domain = when(m < 1, "d0").when(m < 6, "d1")
          .when(m < 20, "d2").when(m < 55, "d3").otherwise("d4")
        val docs = t(s, dir, "documents").select(col("doc_id"),
          domain.as("domain"), wsTokenCount(col("text")).as("n_tok"))
        val dt = docs.groupBy(col("domain"))
          .agg(sum(col("n_tok")).cast("long").as("n_tok"))
        val total = dt.agg(sum(col("n_tok"))).collect()(0).getLong(0)
        val alloc = scratch(Mixing.unimaxAllocate(dt, "domain", "n_tok",
          budgetTokens = total * 3 / 5, maxEpochs = 2.0), "x78_alloc")
        val audit = alloc.agg(
          sum(when(col("epochs") === 2.0, 1L).otherwise(0L)),
          sum(when(col("epochs") < 2.0, 1L).otherwise(0L)),
          sum(col("alloc"))).collect()(0)
        require(audit.getLong(0) >= 1 && audit.getLong(1) >= 1,
          s"fixture must exercise both waterfill branches: " +
            s"${audit.getLong(0)} capped / ${audit.getLong(1)} leveled")
        require(math.abs(audit.getDouble(2) - (total * 3 / 5)) < 1e-6,
          s"budget must be spent exactly: ${audit.getDouble(2)} vs " +
            s"${total * 3 / 5}")
        Mixing.unimaxApply(docs, "doc_id", "domain", alloc)
          .select(col("doc_id"), col("domain"), col("n_tok"),
            round(col("epochs"), 6).as("epochs_r"), col("reps"))
          .orderBy(col("doc_id"))
      },
      Some {
        import graft.operators.Mixing
        val ws = "string_split_regex(trim(text), '\\s+')"
        val budget =
          "(SELECT CAST(sum(n_tok) AS BIGINT) FROM dt) * 3 // 5"
        s"""WITH docs AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 100 < 1 THEN 'd0'
           |         WHEN doc_id % 100 < 6 THEN 'd1'
           |         WHEN doc_id % 100 < 20 THEN 'd2'
           |         WHEN doc_id % 100 < 55 THEN 'd3'
           |         ELSE 'd4' END AS domain,
           |    CAST(len($ws) AS BIGINT) AS n_tok
           |  FROM documents),
           |dt AS (
           |  SELECT domain, CAST(sum(n_tok) AS BIGINT) AS n_tok
           |  FROM docs GROUP BY 1),
           |${Mixing.unimaxAllocSqlCtes("dt", budget, 2.0, "um")}
           |SELECT d.doc_id, d.domain, d.n_tok,
           |  round(a.epochs, 6) AS epochs_r,
           |  ${Mixing.unimaxRepsSql("d.doc_id", "a.epochs")
                .replace("\n", "\n  ")} AS reps
           |FROM docs d JOIN um_alloc a USING (domain)
           |ORDER BY d.doc_id""".stripMargin
      }),

    QuerySpec("x79_hits_authority",
      "HITS hubs & authorities (Kleinberg 1999) — the second classic " +
        "link-centrality signal beside PageRank (x55/x73) for crawl " +
        "seed selection and frontier prioritization, where hub " +
        "quality (directory/index pages) and authority quality " +
        "(content pages) are distinct curation signals: 3 mutual-" +
        "reinforcement rounds over an asymmetric directed graph " +
        "(supplier→part edges plus back-edges for suppkey%3=0, so " +
        "cycles exist and hub/authority structure is non-trivial). " +
        "Each half-step MAX-normalizes (ranking-equivalent to " +
        "Kleinberg's L2 norm, but max is the one corpus-wide FP " +
        "reduction that is order-INdependent — and it keeps scores " +
        "in [0,1] where the 12-dp round is faithful; unnormalized " +
        "degree-scale sums measurably split the engines at 1e-6). " +
        "Every reduction is the two-phase from-then-shard sorted " +
        "fold (order-pinned cross-engine AND bounded under degree " +
        "skew), 12 dp per round, 6 dp published. Builder REQUIREs " +
        "truths: no-in-edge suppliers have authority exactly 0, " +
        "back-edges give some suppliers authority and some parts " +
        "hub mass",
      (s, dir) => {
        val sp = t(s, dir, "lineitem")
          .filter(col("l_partkey") <= 2000)
          .select(col("l_suppkey").cast("long").as("s"),
            (col("l_partkey").cast("long") + 1000000L).as("p"))
          .distinct()
        val edges = sp.select(col("s").as("src"), col("p").as("dst"))
          .unionByName(sp.filter(col("s") % 3 === 0)
            .select(col("p").as("src"), col("s").as("dst")))
        val out = scratch(
          graft.operators.Graph.hits(edges, iters = 3), "x79_out")
        val audit = out.agg(
          sum(when(col("id") < 1000000L && col("id") % 3 =!= 0 &&
            col("auth_r") =!= 0.0, 1L).otherwise(0L)),
          sum(when(col("id") < 1000000L && col("auth_r") > 0.0, 1L)
            .otherwise(0L)),
          sum(when(col("id") >= 1000000L && col("hub_r") > 0.0, 1L)
            .otherwise(0L))).collect()(0)
        require(audit.getLong(0) == 0L,
          s"${audit.getLong(0)} suppliers without in-edges got nonzero " +
            "authority")
        require(audit.getLong(1) > 0L && audit.getLong(2) > 0L,
          s"back-edges must create supplier authority " +
            s"(${audit.getLong(1)}) and part hub mass (${audit.getLong(2)})")
        out.orderBy(col("id"))
      },
      Some(graft.operators.Graph.hitsOracleSql(
        """WITH sp AS (
          |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
          |    CAST(l_partkey AS BIGINT) + 1000000 AS p
          |  FROM lineitem WHERE l_partkey <= 2000)
          |SELECT s AS src, p AS dst FROM sp
          |UNION ALL SELECT p AS src, s AS dst FROM sp
          |WHERE s % 3 = 0""".stripMargin,
        iters = 3) + "\nORDER BY id")),

    QuerySpec("x79b_hits_converged",
      "HITS with the PRODUCTION stopping rule — the same closure x73 " +
        "gave PageRank: full rounds (authority half-step, then hub " +
        "half-step) iterate until the combined L1 delta " +
        "sum|a_i-a_(i-1)| + sum|h_i-h_(i-1)| drops under tol, not a " +
        "fixed count (x79). The delta rides each round's " +
        "materialization via observe() + one noop write (no second " +
        "pass); both score vectors are lineage-truncated per round " +
        "(each feeds the next round twice). The oracle re-derives " +
        "the stop round independently: it unrolls maxIters rounds in " +
        "DuckDB (round CTEs MATERIALIZED — plain CTE inlining is " +
        "exponential in double-referenced rounds), recomputes every " +
        "round's delta against the h0=1/a0=0 start vectors, and " +
        "picks the first round under tol — a wrong Spark-side stop " +
        "diverges the hash through BOTH iters_run and the scores. " +
        "Measured round deltas on this fixture: sf0.01 runs " +
        "553.8, 266.8, 195.8, 25.4, 9.1, ... — tol 30 stops at " +
        "round 4 with margins 165.8 above / 4.6 below (sf0.001 " +
        "stops at 6, sf0.1 at 4, all inside the 7-round budget), " +
        "dwarfing the ~1e-12 ULP noise of the unordered delta sums",
      (s, dir) => {
        val sp = t(s, dir, "lineitem")
          .filter(col("l_partkey") <= 600)
          .select(col("l_suppkey").cast("long").as("s"),
            (col("l_partkey").cast("long") + 1000000L).as("p"))
          .distinct()
        val edges = sp.select(col("s").as("src"), col("p").as("dst"))
          .unionByName(sp.filter(col("s") % 3 === 0)
            .select(col("p").as("src"), col("s").as("dst")))
        val run = graft.operators.Graph.hitsConverged(edges,
          maxIters = 7, tol = 30.0)
        require(run.iters >= 1 && run.iters < 7,
          s"the L1 stopping rule must fire BEFORE the iteration budget " +
            s"(converged=${run.iters}, budget=7) — hitting the cap " +
            "means the entry no longer exercises convergence")
        require(run.l1Delta <= 30.0,
          s"converged run must end under tol, got ${run.l1Delta}")
        run.scores.withColumn("iters_run", lit(run.iters.toLong))
          .orderBy(col("id"))
      },
      Some(graft.operators.Graph.hitsConvergedOracleSql(
        """WITH sp AS (
          |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
          |    CAST(l_partkey AS BIGINT) + 1000000 AS p
          |  FROM lineitem WHERE l_partkey <= 600)
          |SELECT s AS src, p AS dst FROM sp
          |UNION ALL SELECT p AS src, s AS dst FROM sp
          |WHERE s % 3 = 0""".stripMargin,
        maxIters = 7, tol = 30.0))),

    QuerySpec("x80_bitext_margin_mining",
      "margin-based parallel-pair mining (Artetxe & Schwenk 2019 — " +
        "the CCMatrix/CCAligned method): for two embedding sets " +
        "(vec_id parity as the two languages), every source row " +
        "emits its best target by the RATIO margin cos/((avgF+avgB)" +
        "/2) — each side's mean top-4 cosine into the other corrects " +
        "the hubness that raw cosine mining suffers — plus a mutual " +
        "flag (pair is also the target's best: the paper's highest-" +
        "precision intersection strategy). Cosines are the same " +
        "codegen'd dot products the ANN family gates; top-k means " +
        "fold in rank order, margins round to 9 dp with id tiebreaks " +
        "before ranking; windows partition per side id, never " +
        "global. The all-pairs scoring here is the exact gate-SF " +
        "baseline — at corpus scale the scored frame swaps for IVF " +
        "candidates (x6d machinery) with identical downstream " +
        "margin/mutual logic. Builder REQUIREs one row per source " +
        "and a non-trivial mutual intersection",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val out = scratch(Similarity.bitextMarginMine(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 4), "x80_out")
        val nSrc = emb.filter(col("vec_id") % 2 === 0).count()
        val audit = out.agg(count(lit(1)),
          sum(when(col("mutual"), 1L).otherwise(0L))).collect()(0)
        require(audit.getLong(0) == nSrc,
          s"one mined row per source: ${audit.getLong(0)} vs $nSrc")
        require(audit.getLong(1) >= 1 && audit.getLong(1) < nSrc,
          s"mutual intersection must be non-trivial and non-total: " +
            s"${audit.getLong(1)} of $nSrc")
        out.orderBy(col("src_id"))
      },
      Some(Similarity.bitextMarginOracleSql("embeddings", "vec_id",
        "embedding", 4, "vec_id % 2 = 0", "vec_id % 2 = 1") +
        "\nORDER BY src_id")),

    QuerySpec("x80b_bitext_margin_mining_ivf",
      "the AT-SCALE composed form of x80 — CCMatrix-scale bitext " +
        "mining over IVF CANDIDATES instead of all pairs: each " +
        "direction retrieves top-8 candidates through the capped IVF " +
        "server (per-side trained centroids, nProbes=2, " +
        "perCellCap=64 — candidates/query ≤ nProbes×cap by " +
        "construction, never |src|×|tgt|), the two directional " +
        "candidate sets union/dedup on the pair key, and the " +
        "IDENTICAL margin/mutual tail runs downstream. The oracle " +
        "re-derives BOTH retrievals inside DuckDB from the embedded " +
        "trained centroids (rank-filtered per query, capped cells, " +
        "probe equi-join) — gating the retrieval composition, not " +
        "just the tail. Builder REQUIREs: no nested-loop/cartesian " +
        "join anywhere in the plan (the all-pairs shape this form " +
        "exists to avoid), per-query candidate bound audited, " +
        "non-empty mining output",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val srcSide = emb.filter(col("vec_id") % 2 === 0)
        val tgtSide = emb.filter(col("vec_id") % 2 === 1)
        val srcCents = trainOnce(dir, "ivf-cents-bitext-src-4-2") {
          Similarity.ivfTrain(srcSide, "vec_id", "embedding",
            nCells = 4, iters = 2, tag = "bitext-src")
        }
        val tgtCents = trainOnce(dir, "ivf-cents-bitext-tgt-4-2") {
          Similarity.ivfTrain(tgtSide, "vec_id", "embedding",
            nCells = 4, iters = 2, tag = "bitext-tgt")
        }
        val fwd = Similarity.ivfTopKWithCapped(tgtSide, srcSide,
          "vec_id", "embedding", k = 8, tgtCents, nProbes = 2,
          perCellCap = 64)
        val bwd = Similarity.ivfTopKWithCapped(srcSide, tgtSide,
          "vec_id", "embedding", k = 8, srcCents, nProbes = 2,
          perCellCap = 64)
        val mined = Similarity.bitextMarginMineWith(fwd, bwd, k = 4)
          .orderBy(col("src_id"))
        // plan contract: candidate retrieval + tail must be pure
        // hash/sort-merge joins — the composed form may never fall
        // back to the exact form's nested-loop all-pairs scoring
        val plan = mined.queryExecution.sparkPlan.toString
        require(!plan.contains("BroadcastNestedLoopJoin") &&
          !plan.contains("CartesianProduct"),
          s"composed bitext mining must not plan an all-pairs join:\n" +
            plan.linesIterator.take(40).mkString("\n"))
        val out = scratch(mined, "x80b_out")
        // the serving bound the rehearsal measures at 1M×1M, audited
        // here at gate SF: candidates per query ≤ nProbes × perCellCap
        val maxCand = fwd.groupBy(col("qid")).count()
          .unionByName(bwd.groupBy(col("qid")).count())
          .agg(max(col("count"))).collect()(0).getLong(0)
        require(maxCand <= 2L * 64L,
          s"candidates/query must be ≤ nProbes×perCellCap, got $maxCand")
        val n = out.count()
        require(n >= 1, "composed mining must emit at least one pair")
        out.orderBy(col("src_id"))
      },
      None,
      oracleGen = () => for {
        srcCents <- Similarity.trainedCentroids.get((4, 2, "bitext-src"))
        tgtCents <- Similarity.trainedCentroids.get((4, 2, "bitext-tgt"))
      } yield Similarity.bitextMarginMineWithOracleSql("embeddings",
        "vec_id", "embedding", k = 4, kCand = 8,
        "vec_id % 2 = 0", "vec_id % 2 = 1",
        srcCents, tgtCents, nProbes = 2, perCellCap = 64) +
        "\nORDER BY src_id"),

    QuerySpec("x81_streaming_wet_ingest",
      "STREAMING WET ingest — the crawl-delivery shape: new .wet " +
        "part files land in a directory and ingest incrementally " +
        "(file streaming source with the multi-byte lineSep scan, " +
        "maxFilesPerTrigger=2 over an 8-part dump, so the " +
        "availableNow run genuinely spans multiple micro-batches — " +
        "REQUIREd via the checkpoint's commit log). The parse is the " +
        "SAME codegen projection chain batch x76 gates (stateless, " +
        "so exactly-once falls out of the file source + checkpoint " +
        "alone — no state store), and the result must equal the " +
        "batch derivation: the DuckDB twin never sees the files OR " +
        "the stream, re-deriving every field from documents",
      (s, dir) => {
        import graft.sources.Warc
        val path = sys.props.getOrElse("graft.wet.stream.tmp",
          s"/tmp/graft_wet_stream_${new java.io.File(dir).getName}")
        val id = col("doc_id").cast("string")
        val fixture = t(s, dir, "documents").select(
          concat(lit("https://s"), id, lit(".example.test/d")).as("uri"),
          concat(lit("2024-01-0"), (col("doc_id") % 9 + 1).cast("string"),
            lit("T00:00:00Z")).as("dt"),
          concat(col("text"), lit(" — café №"), id).as("text"))
        Warc.writeWet(fixture.repartition(8), path, "uri", "dt", "text")
        val parsed = Warc
          .readWetStream(s, path, maxFilesPerTrigger = Some(2))
          .select(col("uri"), col("content_length"),
            md5(col("text")).as("text_md5"), col("frame_ok"))
        val out = graft.streaming.Streams.runAvailableNowToDir(
          s, parsed, "x81_out", statePartitions = Some(8))
        val commits = java.nio.file.Paths.get("target", "stream_gate",
          "x81_out", "ckpt", "commits")
        val nBatches = java.nio.file.Files.list(commits)
          .filter(p => !p.getFileName.toString.startsWith("."))
          .count()
        require(nBatches >= 3,
          s"rate limit must split the run into micro-batches, got " +
            s"$nBatches commits")
        out.orderBy(col("uri"))
      },
      Some("""WITH f AS (
             |  SELECT
             |    'https://s' || CAST(doc_id AS VARCHAR)
             |      || '.example.test/d' AS uri,
             |    text || ' — café №' || CAST(doc_id AS VARCHAR) AS text
             |  FROM documents)
             |SELECT uri, CAST(strlen(text) AS BIGINT) AS content_length,
             |  md5(text) AS text_md5, TRUE AS frame_ok
             |FROM f ORDER BY uri""".stripMargin)),

    QuerySpec("x82_frontier_assembly",
      "composed crawl-frontier assembly — the end-to-end pipeline a " +
        "crawler runs between URL discovery and fetch, every stage " +
        "one of this library's individually-gated operators: " +
        "canonicalize (x56/x67 machinery: case/port/www/tracking-" +
        "param normalization), registered-domain via the PRODUCTION " +
        "PSL broadcast-join (x72's withRegisteredDomain over a " +
        "parsePslFile fixture; BroadcastHashJoin REQUIREd), robots " +
        "permission gate (x74's bodies, broadcast-joined per domain " +
        "class), then per-registered-domain POLITENESS WAVES: allowed " +
        "URLs rank into fetch rounds so no domain is hit twice in a " +
        "wave — the frontier scheduling shape; the window partitions " +
        "by registered domain only, never global. The DuckDB twin is " +
        "cross-ALGORITHM on two stages: registered domain re-derives " +
        "through the per-rule CASE expression semantics (not a join) " +
        "and robots through the independent relational route. " +
        "Builder REQUIREs exactly 3 registered domains, a non-empty " +
        "deny set, and gap-free waves (max wave + 1 == allowed count " +
        "in EVERY domain)",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Web
        val rules = Web.parsePslFile(
          "// frontier fixture suffixes\ntest\nexample.test\n")
        val robots = x74RobotsBodies.toDF("kind", "body")
          .select(col("kind"),
            Web.robotsGroup(col("body"), "GraftBot").as("rules"))
        val id = col("doc_id").cast("string")
        val m = col("doc_id") % 8
        val path =
          when(m === 0, concat(lit("/docs/d"), id))
          .when(m === 1, concat(lit("/docs/public/p"), id))
          .when(m === 2, concat(lit("/files/f"), id, lit(".zip")))
          .when(m === 3, concat(lit("/files/f"), id, lit(".zipx")))
          .when(m === 4, concat(lit("/ti/x"), id))
          .when(m === 5, concat(lit("/private/ok/o"), id))
          .when(m === 6, concat(lit("/private/p"), id))
          .otherwise(concat(lit("/free/f"), id))
        val url = concat(lit("https://www.s"),
          (col("doc_id") % 40).cast("string"),
          lit(".shop"), (col("doc_id") % 3).cast("string"),
          lit(".example.test:443"), path,
          lit("?utm_source=x&id="), id)
        val base = t(s, dir, "documents").select(col("doc_id"),
            (col("doc_id") % 3).as("kind"), path.as("path"),
            Web.canonicalUrl(url).as("url_canon"),
            Web.canonicalHost(url).as("host"))
        val withRd = Web.withRegisteredDomain(base, "host", rules,
          "reg_domain")
        val gated = withRd.join(broadcast(robots), Seq("kind"))
          .select(col("doc_id"), col("url_canon"), col("reg_domain"),
            Web.robotsDecision(col("path"), col("rules"))
              .getField("allowed").as("allowed"))
        val plan = gated.queryExecution.sparkPlan.toString
        require(plan.contains("BroadcastHashJoin"),
          s"PSL rule match and robots must broadcast-join:\n$plan")
        val w = Window.partitionBy(col("reg_domain"), col("allowed"))
          .orderBy(col("doc_id"))
        val out = scratch(gated.withColumn("wave",
          when(col("allowed"), row_number().over(w).cast("long") - 1)
            .otherwise(lit(-1L))), "x82_out")
        val domAudit = out.filter(col("allowed"))
          .groupBy(col("reg_domain"))
          .agg((max(col("wave")) + 1 === count(lit(1))).as("ok"))
        require(domAudit.count() == 3 &&
          domAudit.filter(!col("ok")).count() == 0,
          "waves must be gap-free across exactly 3 registered domains")
        val denied = out.filter(!col("allowed")).count()
        require(denied > 0, "the robots gate must deny something")
        out.orderBy(col("doc_id"))
      },
      Some {
        import graft.operators.Web
        def sq(x: String): String = "'" + x.replace("'", "''") + "'"
        val bodies = x74RobotsBodies
          .map { case (k, b) => s"($k, ${sq(b)})" }.mkString(",\n    ")
        val lk = Web.robotsLikeSql("core", "endsd")
        val rd = Web.registeredDomainSql("host",
          Seq("test", "example.test")).replace("\n", "\n  ")
        s"""WITH robots(kind, body) AS (VALUES
           |    $bodies),
           |${Web.robotsRulesSqlCtes("robots", "GraftBot", "rr")},
           |docs AS (
           |  SELECT doc_id, doc_id % 3 AS kind,
           |    CASE doc_id % 8
           |      WHEN 0 THEN '/docs/d' || CAST(doc_id AS VARCHAR)
           |      WHEN 1 THEN '/docs/public/p' || CAST(doc_id AS VARCHAR)
           |      WHEN 2 THEN '/files/f' || CAST(doc_id AS VARCHAR)
           |        || '.zip'
           |      WHEN 3 THEN '/files/f' || CAST(doc_id AS VARCHAR)
           |        || '.zipx'
           |      WHEN 4 THEN '/ti/x' || CAST(doc_id AS VARCHAR)
           |      WHEN 5 THEN '/private/ok/o' || CAST(doc_id AS VARCHAR)
           |      WHEN 6 THEN '/private/p' || CAST(doc_id AS VARCHAR)
           |      ELSE '/free/f' || CAST(doc_id AS VARCHAR)
           |    END AS path
           |  FROM documents),
           |u AS (
           |  SELECT doc_id, kind, path,
           |    'https://www.s' || CAST(doc_id % 40 AS VARCHAR)
           |      || '.shop' || CAST(doc_id % 3 AS VARCHAR)
           |      || '.example.test:443' || path
           |      || '?utm_source=x&id=' || CAST(doc_id AS VARCHAR)
           |      AS url
           |  FROM docs),
           |c AS (
           |  SELECT doc_id, kind, path,
           |    ${Web.canonicalUrlSql("url").replace("\n", "\n    ")}
           |      AS url_canon,
           |    ${Web.canonicalHostSql("url").replace("\n", "\n    ")}
           |      AS host
           |  FROM u),
           |r AS (
           |  SELECT doc_id, kind, path, url_canon,
           |    $rd AS reg_domain
           |  FROM c),
           |cand AS (
           |  SELECT d.doc_id, d.path, r2.p, r2.a,
           |    CASE WHEN r2.p LIKE '%$$' THEN substr(r2.p, 1,
           |      length(r2.p) - 1) ELSE r2.p END AS core,
           |    (r2.p LIKE '%$$') AS endsd
           |  FROM r d JOIN rr r2 ON d.kind = r2.kind),
           |win AS (
           |  SELECT doc_id, p, a,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY length(p) DESC, CAST(a AS INT) DESC, p DESC)
           |      AS rn
           |  FROM cand WHERE path LIKE $lk ESCAPE '\\'),
           |best AS (SELECT doc_id, a FROM win WHERE rn = 1),
           |gated AS (
           |  SELECT r.doc_id, r.url_canon, r.reg_domain,
           |    coalesce(b.a, TRUE) AS allowed
           |  FROM r LEFT JOIN best b ON r.doc_id = b.doc_id),
           |wv AS (
           |  SELECT doc_id, url_canon, reg_domain, allowed,
           |    CAST(CASE WHEN allowed THEN row_number() OVER (
           |      PARTITION BY reg_domain, allowed ORDER BY doc_id) - 1
           |      ELSE -1 END AS BIGINT) AS wave
           |  FROM gated)
           |SELECT doc_id, url_canon, reg_domain, allowed, wave
           |FROM wv ORDER BY doc_id""".stripMargin
      }),

    QuerySpec("x83_invisible_scrub",
      "invisible/control-character scrub — the hygiene stage between " +
        "mojibake repair (x58) and NFC (x60): C0 controls + DEL " +
        "(binary contamination), the C1 block (mojibake residue), " +
        "zero-width joints (ZWSP/ZWNJ/ZWJ/BOM/soft-hyphen — they " +
        "split tokens and poison dedup keys invisibly), and bidi " +
        "embeddings/overrides/isolates (the Trojan-Source class: " +
        "text that renders differently than it parses — scrubbing " +
        "training data is a supply-chain guard). One shared pattern " +
        "table drives the Spark chain, the DuckDB twin, and the " +
        "audit counts, so the classes cannot drift; the scrub is a " +
        "pure codegen'd regexp projection, zero shuffle. Fixture " +
        "injects each class on a doc_id%4 rotation (source stays " +
        "ASCII: Scala unicode escapes / DuckDB chr()); builder " +
        "REQUIREs every class detected in exactly its rotation's " +
        "docs and the scrubbed text free of ALL classes",
      (s, dir) => {
        val m = col("doc_id") % 4
        // unicode ESCAPES, not raw bytes: the source file must stay
        // ASCII-greppable (the x58/TopBigramFraction lesson)
        val inj = when(m === 0, lit("\u0001ctl\u007F"))
          .when(m === 1, lit("\u0085cone\u009C"))
          .when(m === 2, lit("\u200Bzw\uFEFF\u00AD"))
          .otherwise(lit("\u202Ebidi\u2066"))
        val dirty = t(s, dir, "documents")
          .select(col("doc_id"), concat(col("text"), inj).as("text"))
        val out = scratch(dirty.select(
          (col("doc_id") +: (graft.operators.Corpus
            .invisibleCounts(col("text")) :+
            graft.operators.Corpus.scrubInvisible(col("text"))
              .as("text_clean"))): _*), "x83_out")
        val audit = out.agg(
          sum(col("n_controls")), sum(col("n_c1")),
          sum(col("n_zerowidth")), sum(col("n_bidi")),
          count(lit(1)),
          sum(when(col("doc_id") % 4 === 0 &&
            col("n_controls") =!= 2, 1L).otherwise(0L))).collect()(0)
        val n = audit.getLong(4)
        val per = Seq(0L, 1L, 2L, 3L).map(r =>
          (n + 3 - r) / 4) // docs with doc_id % 4 == r for ids 0..n-1
        require(audit.getLong(0) == 2 * per(0) &&
          audit.getLong(1) == 2 * per(1) &&
          audit.getLong(2) == 3 * per(2) &&
          audit.getLong(3) == 2 * per(3),
          s"class counts must match the injection rotation: $audit")
        require(audit.getLong(5) == 0,
          "every %4==0 doc must count exactly its injected controls")
        val residue = out.filter(
          graft.operators.Corpus.invisibleCounts(col("text_clean"))
            .map(_ > 0L).reduce(_ || _)).count()
        require(residue == 0, s"$residue docs kept invisible chars")
        out.orderBy(col("doc_id"))
      },
      Some {
        import graft.operators.Corpus
        val counts = Corpus.invisibleCountsSql("text")
          .mkString(",\n  ")
        s"""WITH dirty AS (
           |  SELECT doc_id, text ||
           |    CASE CAST(doc_id % 4 AS INT)
           |      WHEN 0 THEN chr(1) || 'ctl' || chr(127)
           |      WHEN 1 THEN chr(133) || 'cone' || chr(156)
           |      WHEN 2 THEN chr(8203) || 'zw' || chr(65279)
           |        || chr(173)
           |      ELSE chr(8238) || 'bidi' || chr(8294)
           |    END AS text
           |  FROM documents)
           |SELECT doc_id,
           |  $counts,
           |  ${Corpus.scrubInvisibleSql("text")} AS text_clean
           |FROM dirty ORDER BY doc_id""".stripMargin
      }),

    QuerySpec("x84_fim_transform",
      "fill-in-the-middle transformation (Bavarian et al. 2022): " +
        "each document splits at two namespaced-id-hash cut points " +
        "and reorders as PSM <PRE>p<SUF>s<MID>m or SPM (hash-chosen " +
        "~50/50) — the data-side op that teaches a causal LM to " +
        "infill, applied to ~half of code corpora at pretraining " +
        "time; sub-minChars documents pass through as mode 'none'. " +
        "Derandomized like every draw in this library (cuts stable " +
        "across runs/engines/re-shards); a pure narrow projection — " +
        "text never shuffles. Builder REQUIREs all three modes " +
        "present, cut sanity (1 <= c1 <= c2 < len), and LOSSLESSNESS: " +
        "re-parsing every emitted fim_text through the sentinel " +
        "regex and reassembling pre+mid+suf must reproduce the " +
        "original text exactly",
      (s, dir) => {
        import graft.operators.Packing
        val fixture = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 97 === 5, "tiny doc")
            .otherwise(col("text")).as("text"))
        val out = scratch(
          Packing.fimTransform(fixture, "doc_id", "text"), "x84_out")
        val modes = out.groupBy(col("mode")).count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        require(Set("psm", "spm", "none").subsetOf(modes.keySet),
          s"all three modes must appear, got $modes")
        // losslessness: reassemble from the emitted string alone
        val re = "(?s)^<PRE>(.*)<SUF>(.*)<MID>(.*)$"
        val reSpm = "(?s)^<SUF>(.*)<PRE>(.*)<MID>(.*)$"
        val rebuilt = when(col("mode") === "psm",
          concat(regexp_extract(col("fim_text"), re, 1),
            regexp_extract(col("fim_text"), re, 3),
            regexp_extract(col("fim_text"), re, 2)))
          .when(col("mode") === "spm",
            concat(regexp_extract(col("fim_text"), reSpm, 2),
              regexp_extract(col("fim_text"), reSpm, 3),
              regexp_extract(col("fim_text"), reSpm, 1)))
          .otherwise(col("fim_text"))
        val bad = out.join(fixture, Seq("doc_id"))
          .filter(rebuilt =!= col("text") ||
            (col("mode") =!= "none" &&
              !(col("c1") >= 1 && col("c1") <= col("c2") &&
                col("c2") < length(col("text")))))
          .count()
        require(bad == 0, s"$bad rows failed FIM losslessness/cut sanity")
        out.orderBy(col("doc_id"))
      },
      Some(graft.operators.Packing.fimTransformSql(
        "documents", "doc_id",
        "CASE WHEN doc_id % 97 = 5 THEN 'tiny doc' ELSE text END") +
        "\nORDER BY doc_id")),

    QuerySpec("x85_calibration_bins",
      "reliability-diagram calibration bins (the terms of Guo et al. " +
        "2017's ECE) for a classifier-spread blend of the x9 quality " +
        "score (the fixture's scores concentrate in two deciles; a " +
        "namespaced-hash blend restores a realistic distribution) " +
        "against an 'is English' label — the audit run before a " +
        "quality filter's threshold " +
        "is trusted: per equal-width bin, count, positives, mean " +
        "CONFIDENCE vs empirical ACCURACY, and their gap. The only " +
        "floating sum (per-bin mean score) goes through an exact " +
        "DECIMAL(18,6) sum of 6-dp-rounded scores — order-" +
        "independent, map-side partial, a million-row bin folds as " +
        "decimal partials, NO collect_list — cast to DOUBLE only at " +
        "the boundary (the catalog's money convention applied to " +
        "probabilities); accuracy is an integer ratio. Builder " +
        "REQUIREs bin totals reconciling with the corpus, bins in " +
        "range, and a sane weighted gap (the ECE) in [0,1]",
      (s, dir) => {
        import graft.functions.HashFunctions.md5Hash60
        // the word-soup fixture's x9 scores concentrate in two
        // deciles; blend in a namespaced-hash spread so the bins
        // behave like a real classifier's score distribution (the
        // calibration MECHANISM is what the gate verifies)
        val scored = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"),
            wsTokens(col("text")).as("toks"))
          .select(col("doc_id"),
            (TextAnalysis.qualityScoreFromTokens(col("text"), col("toks"))
              * 0.5 +
              (md5Hash60(concat(lit("cal:"), col("doc_id").cast("string")))
                % 1000).cast("double") / 1999.0).as("p"),
            (col("lang") === "en").as("lab"))
        val out = scratch(
          graft.operators.Stats.calibrationBins(scored, "p", "lab"),
          "x85_out")
        val nDocs = t(s, dir, "documents").count()
        val audit = out.agg(sum(col("n")), min(col("bin")),
          max(col("bin")), count(lit(1)),
          (sum(col("gap_r") * col("n")) / sum(col("n"))).as("ece"))
          .collect()(0)
        require(audit.getLong(0) == nDocs,
          s"bin totals ${audit.getLong(0)} != corpus $nDocs")
        require(audit.getLong(1) >= 0 && audit.getLong(2) <= 9,
          s"bins out of range: ${audit.getLong(1)}..${audit.getLong(2)}")
        require(audit.getLong(3) >= 3,
          s"fixture must populate >= 3 bins, got ${audit.getLong(3)}")
        val ece = audit.getDouble(4)
        require(ece >= 0 && ece <= 1, s"ECE out of [0,1]: $ece")
        out.orderBy(col("bin"))
      },
      Some(graft.operators.Stats.calibrationBinsOracleSql(
        "documents",
        s"($duckQuality) * 0.5 + CAST(('0x' || substr(md5('cal:' || " +
          "CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS DOUBLE)" +
          " / 1999.0",
        "lang = 'en'") + "\nORDER BY bin")),

    QuerySpec("x86_sentence_segmentation",
      "sentence segmentation — the splitter under sentence-level " +
        "dedup and context chunking: terminator [.!?] + whitespace " +
        "ends a sentence, trailing fragment included; deliberately " +
        "the RE2-portable heuristic (no lookbehind — RE2 has none; " +
        "no abbreviation dictionary, and the doc says so) via a " +
        "boundary rewrite to a U+001F marker + split + empty-drop — " +
        "a pure in-row projection chain, zero shuffle before the " +
        "explode. Fixture wraps each document in three terminated " +
        "sentences plus the word-soup tail; builder REQUIREs exactly " +
        "4 sentences per document and terminators retained at " +
        "sentence ends",
      (s, dir) => {
        val id = col("doc_id").cast("string")
        val fixture = t(s, dir, "documents").select(col("doc_id"),
          concat(lit("First fact about doc "), id,
            lit(". Second claim stands here! Is it really doc "), id,
            lit("? Tail fragment "), col("text")).as("t"))
        val out = scratch(fixture
          .select(col("doc_id"),
            posexplode(TextAnalysis.splitSentences(col("t")))
              .as(Seq("sent_id", "sentence")))
          .select(col("doc_id"), col("sent_id").cast("long").as("sent_id"),
            col("sentence"),
            length(col("sentence")).cast("long").as("n_chars")),
          "x86_out")
        val audit = out.groupBy(col("doc_id")).agg(
          count(lit(1)).as("ns"),
          sum(when(col("sent_id") === 0 &&
            col("sentence").endsWith("."), 1L).otherwise(0L)).as("dot"),
          sum(when(col("sent_id") === 1 &&
            col("sentence").endsWith("!"), 1L).otherwise(0L)).as("bang"))
          .agg(sum(when(col("ns") =!= 4, 1L).otherwise(0L)),
            sum(col("dot")), sum(col("bang")), count(lit(1))).collect()(0)
        require(audit.getLong(0) == 0,
          s"${audit.getLong(0)} docs did not split into 4 sentences")
        require(audit.getLong(1) == audit.getLong(3) &&
          audit.getLong(2) == audit.getLong(3),
          "terminators must be retained at sentence ends")
        out.orderBy(col("doc_id"), col("sent_id"))
      },
      Some {
        val sents = TextAnalysis.splitSentencesSql("t")
        s"""WITH f AS (
           |  SELECT doc_id,
           |    'First fact about doc ' || CAST(doc_id AS VARCHAR)
           |    || '. Second claim stands here! Is it really doc '
           |    || CAST(doc_id AS VARCHAR) || '? Tail fragment ' || text
           |      AS t
           |  FROM documents),
           |ls AS (SELECT doc_id, $sents AS ss FROM f),
           |p AS (
           |  SELECT doc_id, unnest(range(0, len(ss))) AS sent_id,
           |    unnest(ss) AS sentence
           |  FROM ls)
           |SELECT doc_id, CAST(sent_id AS BIGINT) AS sent_id, sentence,
           |  CAST(length(sentence) AS BIGINT) AS n_chars
           |FROM p ORDER BY doc_id, sent_id""".stripMargin
      }),

    QuerySpec("x87_span_corruption",
      "T5-style span corruption (Raffel et al. 2020) — the denoising-" +
        "objective data builder: tokens partition into 6-token " +
        "blocks, each corrupts at 15% under a namespaced id+block " +
        "hash (derandomized: a document's corruption is identical " +
        "across runs/engines/re-shards), the INPUT replaces corrupted " +
        "blocks with consecutive <extra_id_K> sentinels and the " +
        "TARGET pairs each sentinel with its span. One in-row HOF " +
        "chain over the token array — narrow, zero shuffle. Builder " +
        "REQUIREs exact token conservation (tokens(input) + " +
        "tokens(target) == tokens(doc) + 2·n_corr, summed corpus-" +
        "wide) and the global corruption rate inside [5%, 25%]",
      (s, dir) => {
        import graft.operators.Packing
        val out = scratch(
          Packing.spanCorrupt(t(s, dir, "documents"), "doc_id", "text"),
          "x87_out")
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), wsTokenCount(col("text")).as("n_tok"))
        val audit = out.join(docs, Seq("doc_id")).agg(
          sum(wsTokenCount(col("input")) +
            when(col("target") === "", 0L)
              .otherwise(wsTokenCount(col("target")))).as("lhs"),
          sum(col("n_tok") + col("n_corr") * 2).as("rhs"),
          sum(col("n_corr")), sum(col("n_blocks"))).collect()(0)
        require(audit.getLong(0) == audit.getLong(1),
          s"token conservation failed: ${audit.getLong(0)} vs " +
            s"${audit.getLong(1)}")
        val rate = audit.getLong(2).toDouble / audit.getLong(3)
        require(rate > 0.05 && rate < 0.25,
          s"corruption rate $rate outside the sane band")
        out.orderBy(col("doc_id"))
      },
      Some(graft.operators.Packing.spanCorruptSql(
        "documents", "doc_id", "text") + "\nORDER BY doc_id")),

    QuerySpec("x88_retrieval_eval",
      "per-query MRR@10 and nDCG@10 (Järvelin & Kekäläinen 2002) for " +
        "two BM25 runs against graded term-containment relevance " +
        "labels — the eval loop every retrieval stage (x36/x36b, the " +
        "ANN family) is tuned by, as a first-class gated operator. " +
        "Gains are exponential 2^rel−1 computed EXACTLY by integer " +
        "shift; discounts use ln — any log base cancels in the nDCG " +
        "ratio and ln is the one log the fold entries already agree " +
        "on (the x44 contract); DCG and ideal DCG fold in rank order " +
        "over at most k terms (never a corpus-scale list), the ideal " +
        "ranking is a query-partitioned window, MRR a single exact " +
        "division. Builder REQUIREs both queries present with full " +
        "rank lists and metrics in (0, 1]",
      (s, dir) => {
        val queries = Seq(
          ("q1", Seq("spark", "window", "merge")),
          ("q2", Seq("customer", "table", "join")))
        val docs = t(s, dir, "documents")
        val ranked = queries.map { case (q, terms) =>
          Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 20)
            .withColumn("qid", lit(q))
            .withColumn("rank", row_number().over(Window
              .partitionBy(col("qid"))
              .orderBy(col("score_r").desc, col("doc_id"))).cast("long"))
            .select(col("qid"), col("doc_id"), col("rank"))
        }.reduce(_.unionByName(_))
        val rels = queries.map { case (q, terms) =>
          docs.select(lit(q).as("qid"), col("doc_id"),
            terms.map(term =>
              when(col("text").contains(term), 1).otherwise(0))
              .reduce(_ + _).as("rel"))
        }.reduce(_.unionByName(_)).filter(col("rel") > 0)
        val out = scratch(Retrieval.rankingEval(ranked, rels,
          "qid", "doc_id", "rank", "rel", k = 10), "x88_out")
        val audit = out.agg(count(lit(1)),
          sum(when(col("n_ranked") =!= 10, 1L).otherwise(0L)),
          min(col("mrr_r")), max(col("mrr_r")),
          min(col("ndcg_r")), max(col("ndcg_r"))).collect()(0)
        require(audit.getLong(0) == 2 && audit.getLong(1) == 0,
          s"two full-rank-list queries expected: $audit")
        require(audit.getDouble(2) > 0 && audit.getDouble(3) <= 1.0 &&
          audit.getDouble(4) > 0 && audit.getDouble(5) <= 1.0 + 1e-9,
          s"metrics out of (0,1]: $audit")
        out.orderBy(col("qid"))
      },
      Some {
        def leg(q: String, terms: Seq[String]): String = {
          val inner = Retrieval.bm25OracleSql("documents", "doc_id",
            "text", terms, k = 20).replace("\n", "\n  ")
          s"""${q}_raw AS (
             |  $inner),
             |${q}_rk AS (
             |  SELECT '$q' AS qid, doc_id,
             |    CAST(row_number() OVER (ORDER BY score_r DESC, doc_id)
             |      AS BIGINT) AS rank
             |  FROM ${q}_raw)""".stripMargin
        }
        def relLeg(q: String, terms: Seq[String]): String = {
          val relExpr = terms.map(term =>
            s"CASE WHEN contains(text, '$term') THEN 1 ELSE 0 END")
            .mkString(" + ")
          s"SELECT '$q' AS qid, doc_id, $relExpr AS rel FROM documents"
        }
        s"""WITH ${leg("q1", Seq("spark", "window", "merge"))},
           |${leg("q2", Seq("customer", "table", "join"))},
           |ranked AS (
           |  SELECT * FROM q1_rk UNION ALL SELECT * FROM q2_rk),
           |rels AS (
           |  SELECT * FROM (
           |    ${relLeg("q1", Seq("spark", "window", "merge"))}
           |    UNION ALL
           |    ${relLeg("q2", Seq("customer", "table", "join"))})
           |  WHERE rel > 0),
           |${Retrieval.rankingEvalSql("ranked", "rels", "qid", "doc_id",
              "rank", "rel", k = 10)}
           |ORDER BY qid""".stripMargin
      }),

    QuerySpec("x89_token_kl_shift",
      "token-level KL divergence between a corpus slice and the rest " +
        "— the drift / domain-shift quantifier run when a new source " +
        "lands or a crawl refreshes (and the distribution half of " +
        "DSIR's importance ratio, x77, read as a diagnostic): add-0.5 " +
        "smoothed unigram distributions on the UNION vocabulary (both " +
        "normalize to exactly 1; no zero division), output the PER-" +
        "TOKEN contribution table — the artifact an engineer reads " +
        "for WHICH tokens drive the shift; the scalar KL is one sum " +
        "away and deliberately stays out of the hashed output (a " +
        "corpus-wide float fold is the one thing this catalog never " +
        "hashes). One tokenize pass + one token-keyed count aggregate " +
        "+ a 1-row totals broadcast; probabilities are per-row " +
        "projections of exact integer counts. Builder REQUIREs both " +
        "distributions to sum to 1 (1e-9) and KL >= 0 (Gibbs), " +
        "computed as audits",
      (s, dir) => {
        val out = scratch(LanguageModel.tokenKlContributions(
          t(s, dir, "documents"), "text", "lang = 'zh'"), "x89_out")
        val audit = out.agg(sum(col("p_r")), sum(col("q_r")),
          sum(col("contrib_r")), count(lit(1))).collect()(0)
        require(math.abs(audit.getDouble(0) - 1.0) < 1e-6 &&
          math.abs(audit.getDouble(1) - 1.0) < 1e-6,
          s"smoothed distributions must normalize: $audit")
        require(audit.getDouble(2) >= -1e-9,
          s"KL must be non-negative (Gibbs): ${audit.getDouble(2)}")
        require(audit.getLong(3) > 10, "union vocabulary too small")
        out.orderBy(col("token"))
      },
      Some(LanguageModel.tokenKlOracleSql(
        "documents", "text", "lang = 'zh'") + "\nORDER BY token")),

    QuerySpec("x90_corpus_build_pipeline",
      "composed corpus-build pipeline — the end-to-end text-side " +
        "flagship, the x82 treatment for curation: ONE entry chains " +
        "WET ingest (x76 framing) → invisible-char scrub (x83) → " +
        "corpus-wide paragraph dedup (x75) → classifier quality " +
        "scoring (x34/x43) → token-budget selection at half the " +
        "post-dedup corpus (x43) → fixed-budget sequence packing " +
        "(x23), with every stage's counts REQUIREd to reconcile: " +
        "records in == docs out at ingest with frame_ok everywhere, " +
        "injected invisibles present before the scrub and zero " +
        "after, the shared cookie banner surviving exactly once " +
        "corpus-wide, kept+dropped == total at selection with the " +
        "kept prefix inside budget and the first loser outside. The " +
        "DuckDB twin re-derives all six stages from the documents " +
        "table (it never sees the WET files), taking the " +
        "CROSS-ALGORITHM route for dedup (string-keyed row_number, " +
        "not fingerprint election) and the one-line window " +
        "formulations for selection/packing (vs Spark's distributed " +
        "two-phase prefix sums) — composition-level hash gating, " +
        "not same-shape twinning",
      (s, dir) => {
        import graft.sources.Warc
        import graft.operators.Packing
        val path = sys.props.getOrElse("graft.x90.wet.tmp",
          s"/tmp/graft_x90_wet_${new java.io.File(dir).getName}")
        val id = col("doc_id").cast("string")
        // boilerplate carrying invisible chars (zero-width space,
        // soft hyphen, BOM) that scrub must remove BEFORE dedup keys
        // are computed; the banner is corpus-global, the promo line
        // has 7 classes (x75's shapes), the body line is per-doc
        val banner = lit("Cookie\u200B Notice: this site\u00AD uses cookies")
        val promo = concat(lit("Promo\uFEFF block "),
          lit("abcdefg").substr((col("doc_id") % 7 + 1).cast("int"),
            lit(1)))
        val raw = concat_ws("\n", banner,
          concat(lit("doc "), id, lit(" "), col("text")), promo)
        val fixture = t(s, dir, "documents").select(
          concat(lit("https://d"), id, lit(".example.test/p")).as("uri"),
          concat(lit("2024-02-0"), (col("doc_id") % 9 + 1).cast("string"),
            lit("T00:00:00Z")).as("dt"),
          raw.as("text"))
        val nDocs = t(s, dir, "documents").count()
        Warc.writeWet(fixture.repartition(4), path, "uri", "dt", "text")
        // stage 1: WET ingest — framing must be byte-exact
        val wet = scratch(Warc.readWet(s, path)
          .select(col("uri"), col("text"), col("frame_ok")), "x90_wet")
        val wetAudit = wet.agg(count(lit(1)),
          sum(when(col("frame_ok"), 1L).otherwise(0L)),
          sum(regexp_count(col("text"), lit("[\u200B\u00AD\uFEFF]")))
            .cast("long")).collect()(0)
        require(wetAudit.getLong(0) == nDocs &&
          wetAudit.getLong(1) == nDocs,
          s"ingest must frame all $nDocs records: $wetAudit")
        require(wetAudit.getLong(2) >= 3 * nDocs,
          s"fixture must carry invisibles into the scrub: $wetAudit")
        // stage 2: scrub
        val scrubbed = scratch(wet.select(
          regexp_extract(col("uri"), "https://d([0-9]+)\\.", 1)
            .cast("long").as("doc_id"),
          Corpus.scrubInvisible(col("text")).as("text")), "x90_scrub")
        val remInv = scrubbed.agg(
          sum(regexp_count(col("text"), lit("[\u200B\u00AD\uFEFF]")))
            .cast("long")).collect()(0).getLong(0)
        require(remInv == 0L, s"scrub must remove every invisible: $remInv")
        // stage 3: corpus-wide paragraph dedup
        val dedup = scratch(
          Corpus.paragraphDedup(scrubbed, "doc_id", "text"), "x90_dedup")
        val dAudit = dedup.agg(count(lit(1)),
          sum(when(col("text_dedup")
            .startsWith("Cookie Notice"), 1L).otherwise(0L)),
          sum(col("n_kept")), sum(col("n_paras"))).collect()(0)
        require(dAudit.getLong(0) == nDocs,
          "dedup must emit every document")
        require(dAudit.getLong(1) == 1L,
          s"scrubbed banner must survive exactly once, got " +
            s"${dAudit.getLong(1)}")
        require(dAudit.getLong(2) < dAudit.getLong(3),
          "dedup must drop at least one paragraph corpus-wide")
        // stages 4+5: quality scoring and budget selection at half
        // the post-dedup token mass (scale-relative, so the boundary
        // is non-trivial at every SF)
        val scored = dedup.select(col("doc_id"),
            col("text_dedup").as("text"))
          .select(col("doc_id"), wsTokens(col("text")).as("__tk"),
            col("text"))
          .select(col("doc_id"),
            round(TextAnalysis.classifierMargin(col("text"), col("__tk")),
              6).as("margin_r"),
            size(col("__tk")).cast("long").as("n_tok"))
        val totTok = scored.agg(sum(col("n_tok")).cast("long"))
          .collect()(0).getLong(0)
        val budget = totTok / 2
        val sel = scratch(Corpus.budgetSelect(scored, "doc_id",
          "margin_r", "n_tok", budget), "x90_sel")
        val sAudit = sel.agg(count(lit(1)),
          sum(when(col("keep"), 1L).otherwise(0L)),
          max(when(col("keep"), col("cum_tok"))),
          min(when(!col("keep"), col("cum_tok")))).collect()(0)
        require(sAudit.getLong(0) == nDocs,
          "selection must emit every document (losers auditable)")
        require(sAudit.getLong(1) >= 1 && sAudit.getLong(1) < nDocs,
          s"half-mass budget must keep a strict subset: $sAudit")
        require(sAudit.getLong(2) <= budget,
          s"kept prefix must fit the budget: ${sAudit.getLong(2)} > $budget")
        require(sAudit.getLong(3) > budget,
          s"first loser must sit past the budget: ${sAudit.getLong(3)}")
        // stage 6: pack the kept docs into 512-token shards
        val packs = Packing.assignPacks(
          sel.filter(col("keep")).select(col("doc_id"), col("n_tok")),
          "doc_id", "n_tok", budget = 512L)
        sel
          .join(dedup.select(col("doc_id"), col("n_paras"),
            col("n_kept")), Seq("doc_id"))
          .join(packs.select(col("doc_id"), col("pack_id")),
            Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_paras"), col("n_kept"),
            col("margin_r"), col("n_tok"), col("cum_tok"), col("keep"),
            coalesce(col("pack_id"), lit(-1L)).as("pack_id"))
          .orderBy(col("doc_id"))
      },
      Some {
        val margin =
          s"-1.2 + (CAST($duckSwCount AS DOUBLE) / $duckNTok) * 2.0 + " +
            s"($duckAlpha) * 1.5 + " +
            s"(CASE WHEN $duckMeanLen >= 3 AND $duckMeanLen <= 10 " +
            "THEN 0.8 ELSE 0.0 END) + " +
            s"CAST(least($duckNTok, 400) AS DOUBLE) / 400.0 * 0.5"
        // \u escapes only reliably process in single-quoted literals \u2014
        // hoist the invisible-char fragments out of the template
        val bannerSql =
          "'Cookie\u200B Notice: this site\u00AD uses cookies'"
        val promoSql = "'Promo\uFEFF block '"
        s"""WITH f AS (
           |  SELECT doc_id,
           |    $bannerSql
           |    || chr(10) || 'doc ' || CAST(doc_id AS VARCHAR)
           |      || ' ' || text
           |    || chr(10) || $promoSql
           |      || substr('abcdefg', CAST(doc_id % 7 AS INT) + 1, 1)
           |      AS raw
           |  FROM documents),
           |sc AS (
           |  SELECT doc_id, ${Corpus.scrubInvisibleSql("raw")} AS clean
           |  FROM f),
           |p AS (
           |  SELECT doc_id, unnest(range(0, len(ls))) AS pos,
           |    unnest(ls) AS para
           |  FROM (SELECT doc_id, string_split(clean, chr(10)) AS ls
           |        FROM sc)),
           |k AS (
           |  SELECT doc_id, pos, para, ${Corpus.paraKeySql("para")} AS key
           |  FROM p),
           |w AS (
           |  SELECT doc_id, pos, para,
           |    row_number() OVER (PARTITION BY key
           |      ORDER BY doc_id, pos) AS rn
           |  FROM k WHERE key <> ''),
           |kept AS (
           |  SELECT doc_id, pos, para FROM w WHERE rn = 1
           |  UNION ALL
           |  SELECT doc_id, pos, para FROM k WHERE key = ''),
           |agg AS (
           |  SELECT doc_id,
           |    string_agg(para, chr(10) ORDER BY pos) AS text_dedup,
           |    count(*) AS n_kept
           |  FROM kept GROUP BY doc_id),
           |tot AS (
           |  SELECT doc_id,
           |    CAST(len(string_split(clean, chr(10))) AS BIGINT) AS n_paras
           |  FROM sc),
           |d0 AS (
           |  SELECT t.doc_id, coalesce(a.text_dedup, '') AS text,
           |    t.n_paras, CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept
           |  FROM tot t LEFT JOIN agg a USING (doc_id)),
           |q AS (
           |  SELECT doc_id, n_paras, n_kept, round($margin, 6) AS margin_r,
           |    $duckNTok AS n_tok
           |  FROM d0),
           |b AS (SELECT CAST(sum(n_tok) AS BIGINT) // 2 AS budget FROM q),
           |s1 AS (
           |  SELECT q.*,
           |    CAST(sum(n_tok) OVER (ORDER BY margin_r DESC, doc_id
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
           |  FROM q),
           |s2 AS (
           |  SELECT s1.*, (cum_tok <= b.budget) AS keep
           |  FROM s1 CROSS JOIN b),
           |pk AS (
           |  SELECT doc_id,
           |    (CAST(sum(n_tok) OVER (ORDER BY doc_id
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tok) // 512
           |      AS pack_id
           |  FROM s2 WHERE keep)
           |SELECT s2.doc_id, s2.n_paras, s2.n_kept, s2.margin_r,
           |  s2.n_tok, s2.cum_tok, s2.keep,
           |  coalesce(pk.pack_id, -1) AS pack_id
           |FROM s2 LEFT JOIN pk USING (doc_id)
           |ORDER BY s2.doc_id""".stripMargin
      }),

    QuerySpec("x67_html_extract",
      "HTML→text + outlink extraction — the crawl-ingest stage " +
        "BEFORE every text operator in this library (quality, " +
        "lang-ID, dedup keys and token counts over raw markup " +
        "measure the boilerplate, not the document; outlinks feed " +
        "x56 canonicalization and the x55 link graph). Script/style " +
        "containers drop WITH their payload in container-specific " +
        "passes (RE2 has no backreferences for a combined " +
        "alternation — and the script body legitimately contains <, " +
        "quotes and &), comments drop before both text and href " +
        "extraction (a commented-out anchor contributes no edge), " +
        "remaining tags become spaces, the six common entities " +
        "decode (&amp; last, so &amp;lt; cannot double-decode), " +
        "whitespace collapses. A pure chain of codegen'd " +
        "regexp/replace projections — zero shuffle; at 100 TB this " +
        "is the narrow projection that turns a fetched-page table " +
        "into the text column. The fixture wraps each document in " +
        "deterministic markup (adversarial script with `if (x < " +
        "2)`, entity sentinel, a ghost link inside a comment); " +
        "builder REQUIREs the decoded sentinel present, " +
        "script/style/comment payloads absent and exactly 2 links " +
        "per doc; the first link roundtrips through canonicalUrl " +
        "(port elision, www strip, slash collapse, tracking-param " +
        "drop) and everything hash-gates against the same-constants " +
        "DuckDB twins",
      (s, dir) => {
        import graft.operators.Web
        val id = col("doc_id").cast("string")
        val html = concat(
          lit("<html><head><title>d"), id,
          lit("</title><style type=\"text/css\">p { color: red }" +
            "</style><script type=\"text/javascript\">var x = 1; " +
            "if (x < 2) { x = \"a&b\"; }</script></head><body>" +
            "<!-- nav boilerplate --><h1>Doc "), id,
          lit("</h1><p>"), col("text"),
          lit("</p><p>R&amp;D &lt;spec&gt; &quot;q&quot; " +
            "&#39;s&#39;&nbsp;end</p><a href=\"https://www.s"),
          pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".example.test:443/p//"), id,
          lit("/?utm_source=x&id=1\">first</a> " +
            "<a href=\"http://mirror"),
          pmod(col("doc_id"), lit(3)).cast("string"),
          lit(".example.test/q?b=2&a=1\">second</a><!-- <a href=" +
            "\"https://ghost.example.test/never\">ghost</a> -->" +
            "</body></html>"))
        val parsed = t(s, dir, "documents")
          .select(col("doc_id"), html.as("html"))
          .select(col("doc_id"),
            Web.htmlToText(col("html")).as("text_clean"),
            Web.extractLinks(col("html")).as("links"))
        val sentinel = "R&D <spec> \"q\" 's' end"
        val bad = parsed.filter(
          !col("text_clean").contains(sentinel) ||
            col("text_clean").contains("var x") ||
            col("text_clean").contains("color") ||
            col("text_clean").contains("boilerplate") ||
            col("text_clean").contains("ghost") ||
            size(col("links")) =!= 2).count()
        require(bad == 0,
          s"$bad rows failed the HTML extraction invariants")
        parsed
          .select(col("doc_id"), col("text_clean"), col("links"),
            element_at(col("links"), 1).as("first_link"))
          .select(col("doc_id"),
            md5(col("text_clean")).as("text_md5"),
            length(col("text_clean")).cast("long").as("n_chars"),
            size(col("links")).cast("long").as("n_links"),
            Web.canonicalUrl(col("first_link")).as("first_canonical"),
            array_join(col("links"), " ").as("links_all"))
          .orderBy(col("doc_id"))
      },
      Some {
        import graft.operators.Web
        s"""WITH h AS (
           |  SELECT doc_id,
           |    '<html><head><title>d' || CAST(doc_id AS VARCHAR) ||
           |    '</title><style type="text/css">p { color: red }' ||
           |    '</style><script type="text/javascript">var x = 1; ' ||
           |    'if (x < 2) { x = "a&b"; }</script></head><body>' ||
           |    '<!-- nav boilerplate --><h1>Doc ' ||
           |    CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
           |    '</p><p>R&amp;D &lt;spec&gt; &quot;q&quot; ' ||
           |    '&#39;s&#39;&nbsp;end</p><a href="https://www.s' ||
           |    CAST(doc_id % 7 AS VARCHAR) ||
           |    '.example.test:443/p//' || CAST(doc_id AS VARCHAR) ||
           |    '/?utm_source=x&id=1">first</a> ' ||
           |    '<a href="http://mirror' || CAST(doc_id % 3 AS VARCHAR) ||
           |    '.example.test/q?b=2&a=1">second</a><!-- <a href=' ||
           |    '"https://ghost.example.test/never">ghost</a> -->' ||
           |    '</body></html>' AS html
           |  FROM documents),
           |p AS (
           |  SELECT doc_id,
           |    ${Web.htmlToTextSql("html")} AS text_clean,
           |    ${Web.extractLinksSql("html")} AS links
           |  FROM h),
           |l AS (
           |  SELECT doc_id, text_clean, links, links[1] AS first_link
           |  FROM p)
           |SELECT doc_id, md5(text_clean) AS text_md5,
           |  CAST(length(text_clean) AS BIGINT) AS n_chars,
           |  CAST(len(links) AS BIGINT) AS n_links,
           |  ${Web.canonicalUrlSql("first_link")} AS first_canonical,
           |  array_to_string(links, ' ') AS links_all
           |FROM l ORDER BY doc_id""".stripMargin
      }),

    QuerySpec("x68_char_entropy",
      "character-entropy quality signal (Shannon entropy in nats " +
        "over the character distribution; native codegen'd " +
        "plans.CharEntropy, one in-row pass with an ASCII fast " +
        "path) — the information-theoretic cut of the quality " +
        "family: keyboard mash, padding runs and template " +
        "boilerplate have alphabets far narrower than prose " +
        "(~2.7-3.0 nats), and a low-entropy gate catches them where " +
        "length/stopword signals (x9) and n-gram REPETITION ratios " +
        "(x26, repeated structure) miss shuffled low-variety soup. " +
        "The declarative form explodes one row per CHARACTER — a " +
        "100 TB corpus becomes a corpus-of-characters shuffle — " +
        "which is exactly what the oracle twin does in DuckDB " +
        "(unnest chars → per-doc frequency → fold), making the " +
        "hash gate a genuine two-implementation check; the fold " +
        "order (ascending codepoint, left-to-right) is part of the " +
        "cross-engine contract since floating addition is not " +
        "associative. Every fifth document is replaced with a " +
        "deterministic 3-letter-alphabet run (entropy ln 3 ≈ 1.10); " +
        "builder REQUIREs every synthesized row gates below 2.0 " +
        "nats, every natural row above, over the ASCII projection " +
        "(DuckDB splits graphemes, Java counts codepoints — ASCII " +
        "makes them the same thing; the non-ASCII path is " +
        "spec-pinned instead)",
      (s, dir) => {
        val raw = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            expr("repeat('ab ', CAST(40 + doc_id % 3 AS INT))"))
            .otherwise(col("text")).as("t0"))
        val a = raw.select(col("doc_id"),
          regexp_replace(col("t0"), "[^ -~]", "").as("ta"))
        val scored = a.select(col("doc_id"),
            length(col("ta")).cast("long").as("n_chars"),
            size(array_distinct(array_remove(split(col("ta"), ""), "")))
              .cast("long").as("n_distinct"),
            round(TextAnalysis.charEntropy(col("ta")), 6)
              .as("entropy_r"))
          .withColumn("is_degenerate", col("entropy_r") < 2.0)
        val misses = scored.filter(
          (col("doc_id") % 5 === 0 && !col("is_degenerate")) ||
            (col("doc_id") % 5 =!= 0 && col("is_degenerate")) ||
            col("n_chars") === 0).count()
        require(misses == 0,
          s"$misses rows on the wrong side of the entropy gate")
        scored.orderBy(col("doc_id"))
      },
      Some("""WITH raw AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 5 = 0
             |      THEN repeat('ab ', CAST(40 + doc_id % 3 AS INTEGER))
             |      ELSE text END AS t0
             |  FROM documents),
             |a AS (
             |  SELECT doc_id,
             |    regexp_replace(t0, '[^ -~]', '', 'g') AS ta FROM raw),
             |c AS (
             |  SELECT doc_id, unnest(string_split(ta, '')) AS ch FROM a),
             |f AS (
             |  SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS n
             |  FROM c GROUP BY doc_id, ch),
             |tt AS (SELECT doc_id, sum(n) AS tot FROM f GROUP BY doc_id),
             |e AS (
             |  SELECT f.doc_id,
             |    CAST(sum(n) AS BIGINT) AS n_chars,
             |    CAST(count(*) AS BIGINT) AS n_distinct,
             |    round(list_reduce(
             |      list(-((n / tot) * ln(n / tot)) ORDER BY ch),
             |      (x, y) -> x + y), 6) AS entropy_r
             |  FROM f JOIN tt USING (doc_id) GROUP BY f.doc_id)
             |SELECT doc_id, n_chars, n_distinct, entropy_r,
             |  entropy_r < 2.0 AS is_degenerate
             |FROM e ORDER BY doc_id""".stripMargin)),

    QuerySpec("x69_anchor_text",
      "anchor-text aggregation per canonical link target — the " +
        "inbound-description signal: anchor text is how the REST of " +
        "the web describes a page (the classic ranking/" +
        "retrieval-training-pair signal a page's own text cannot " +
        "provide), so the operator inverts the link graph: extract " +
        "(href, anchor) pairs per page (Web.extractAnchors — " +
        "script/comment noise stripped first, the x67 contract), " +
        "canonicalize the href (x56 — WITHOUT canonicalization " +
        "`:443/p//5/?utm_source=x` and `/p/5` split one page's " +
        "anchor evidence across keys), and aggregate per target. " +
        "Scale shape: pair extraction is narrow in-row regexp work; " +
        "the ONE shuffle is keyed on the ~40-byte canonical target " +
        "carrying short anchor strings — page bytes never move; a " +
        "boilerplate-anchor hot target (every page linking `hub`) " +
        "concentrates rows, which map-side partial aggregation " +
        "absorbs (count/count-distinct/set-collect all fold " +
        "per-partition first; the fixture's hub key, linked from " +
        "EVERY document, is the deliberate hot-key probe). Builder " +
        "REQUIREs the hub target aggregates every source doc into " +
        "exactly 5 distinct anchor variants and no ghost/script " +
        "anchor leaks; hash-gated against the same-constants DuckDB " +
        "twins end-to-end (extraction, canonicalization, " +
        "aggregation)",
      (s, dir) => {
        import graft.operators.Web
        val id = col("doc_id").cast("string")
        val html = concat(
          lit("<html><body><p>intro</p><a href=\"https://www.s"),
          pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".example.test:443/p//"),
          pmod(col("doc_id"), lit(40)).cast("string"),
          lit("/?utm_source=x\">guide "),
          pmod(col("doc_id"), lit(3)).cast("string"),
          lit(" for s"), pmod(col("doc_id"), lit(7)).cast("string"),
          lit("</a><a href=\"http://hub.example.test/\"> hub  "),
          pmod(col("doc_id"), lit(5)).cast("string"),
          lit(" </a><!-- <a href=\"http://x.test/g\">ghost</a> -->" +
            "<script>var a = '<a href=\"http://x.test/j\">js</a>';" +
            "</script></body></html>"))
        val pairs = t(s, dir, "documents")
          .select(col("doc_id"), html.as("html"))
          .select(col("doc_id"),
            explode(Web.extractAnchors(col("html"))).as("a"))
          .select(col("doc_id"),
            Web.canonicalUrl(col("a.href")).as("target"),
            col("a.anchor").as("anchor"))
        val agg = pairs.groupBy(col("target"))
          .agg(count(lit(1)).as("n_anchors"),
            countDistinct(col("doc_id")).as("n_sources"),
            array_join(array_sort(collect_set(col("anchor"))), " | ")
              .as("anchors_set"))
        val nDocs = t(s, dir, "documents").count()
        val hub = agg.filter(col("target") === "http://hub.example.test/")
          .collect()
        require(hub.length == 1 &&
          hub.head.getAs[Long]("n_sources") == nDocs &&
          hub.head.getAs[String]("anchors_set").split(" \\| ").length == 5,
          s"hot-key target must aggregate all $nDocs docs into 5 " +
            s"anchor variants: ${hub.toSeq}")
        val leaked = pairs.filter(col("anchor").contains("ghost") ||
          col("anchor").contains("js")).count()
        require(leaked == 0, s"$leaked commented/script anchors leaked")
        agg.orderBy(col("target"))
      },
      Some {
        import graft.operators.Web
        s"""WITH h AS (
           |  SELECT doc_id,
           |    '<html><body><p>intro</p><a href="https://www.s' ||
           |    CAST(doc_id % 7 AS VARCHAR) || '.example.test:443/p//' ||
           |    CAST(doc_id % 40 AS VARCHAR) || '/?utm_source=x">guide ' ||
           |    CAST(doc_id % 3 AS VARCHAR) || ' for s' ||
           |    CAST(doc_id % 7 AS VARCHAR) ||
           |    '</a><a href="http://hub.example.test/"> hub  ' ||
           |    CAST(doc_id % 5 AS VARCHAR) ||
           |    ' </a><!-- <a href="http://x.test/g">ghost</a> -->' ||
           |    '<script>var a = ''<a href="http://x.test/j">js</a>'';' ||
           |    '</script></body></html>' AS html
           |  FROM documents),
           |p AS (
           |  SELECT doc_id,
           |    unnest(${Web.extractAnchorsSql("html")}) AS a
           |  FROM h),
           |c AS (
           |  SELECT doc_id, a.anchor AS anchor, a.href AS href FROM p),
           |k AS (
           |  SELECT doc_id, anchor,
           |    ${Web.canonicalUrlSql("href")} AS target
           |  FROM c)
           |SELECT target, CAST(count(*) AS BIGINT) AS n_anchors,
           |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_sources,
           |  array_to_string(list_sort(list(DISTINCT anchor)), ' | ')
           |    AS anchors_set
           |FROM k GROUP BY target ORDER BY target""".stripMargin
      }),

    QuerySpec("x70_prefix_filter_join",
      "EXACT-threshold set-similarity self-join via prefix filtering " +
        "(Chaudhuri et al. 2006; Bayardo et al. 2007 All-Pairs; Xiao " +
        "et al. 2008 PPJoin) — the exact complement to the " +
        "probabilistic MinHash path (x3): every pair with word-" +
        "3-shingle-set Jaccard >= 0.7 is found with NO false " +
        "negatives, because a document's PREFIX (its " +
        "|d| - ceil(t|d|) + 1 globally-RAREST shingles) must " +
        "intersect the prefix of any set within threshold — recall " +
        "is a theorem, candidate volume is the knob. Scale shape: " +
        "one shingle-keyed frequency agg, one doc-keyed ordered-set " +
        "agg (persisted: one corpus scan serves candidates AND " +
        "verify), one prefix-shingle equi-join — the rarest-first " +
        "ordering bounds exactly the posting lists that explode in a " +
        "naive token join — then per-pair exact-Jaccard " +
        "adjudication. Builder REQUIREs candidates <= 5% of " +
        "all-pairs (the filter must actually filter) and every " +
        "synthesized twin pair found (doc_id%10==0 twinned with its " +
        "first token dropped: shingle Jaccard (n-1)/n >= 0.7); " +
        "DuckDB re-derives the whole pipeline — frequencies, " +
        "ordering, prefixes, candidates, verification — from the " +
        "same constants",
      (s, dir) => {
        val base = t(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val twins = base.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            expr("substring(text, instr(text, ' ') + 1)").as("text"))
        val corpus = base.unionByName(twins)
        // The shingle+global-frequency+ordered-set aggregation is the
        // entry's heaviest subtree and is consumed FOUR times (the
        // candidate join's two sides, verify, and the returned plan).
        // A persist released in `finally` runs before the harness
        // executes the RETURNED frame (r12 verdict: 3-4 redundant
        // corpus-wide shuffles per run) — so materialize to parquet
        // once and read it back for every consumer (the
        // Quarantine.ingest pattern). At 100 TB this IS the design:
        // the sets table is the reusable index artifact.
        val sets = scratch(
          Dedup.prefixFilterSets(corpus, "doc_id", "text", 3),
          "x70_sets")
        // candidates and the verified relation are each consumed by a
        // REQUIRE gate AND a downstream stage/returned plan — scratch
        // both so the prefix join and the exact-Jaccard adjudication
        // each execute exactly ONCE per run
        val cands = scratch(
          Dedup.prefixFilterCandidates(sets, "doc_id", 0.7),
          "x70_cands")
        val verified = scratch(
          Dedup.prefixFilterVerify(sets, cands, "doc_id", 0.7),
          "x70_verified")
        val nCand = cands.count()
        val m = corpus.count()
        require(nCand * 20 <= m * (m - 1) / 2,
          s"prefix filter degenerated: $nCand candidates vs " +
            s"${m * (m - 1) / 2} all-pairs")
        val missed = base.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id").as("id_a"),
            (col("doc_id") + 1000000).as("id_b"))
          .join(verified, Seq("id_a", "id_b"), "left_anti").count()
        require(missed == 0,
          s"$missed twin pairs missed — completeness broken")
        verified.select(col("id_a"), col("id_b"),
            round(col("jac"), 6).as("jac_r"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000,
             |    substring(text, strpos(text, ' ') + 1)
             |  FROM documents WHERE doc_id % 10 = 0),
             |tk AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk,
             |    trim(text) AS t
             |  FROM base),
             |sh AS (
             |  SELECT doc_id, unnest(list_distinct(
             |    CASE WHEN len(tk) >= 3 THEN list_transform(
             |      range(1, len(tk) - 1),
             |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
             |    ELSE [t] END)) AS g
             |  FROM tk),
             |f AS (SELECT g, CAST(count(*) AS BIGINT) AS f
             |      FROM sh GROUP BY g),
             |sets AS (
             |  SELECT doc_id, list(g ORDER BY f, g) AS toks,
             |    CAST(count(*) AS BIGINT) AS sz
             |  FROM sh JOIN f USING (g) GROUP BY doc_id),
             |pref AS (
             |  SELECT doc_id, unnest(
             |    toks[1 : CAST(sz - ceil(0.7 * sz) + 1 AS INT)]) AS p
             |  FROM sets),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM pref a JOIN pref b
             |    ON a.p = b.p AND a.doc_id < b.doc_id),
             |v AS (
             |  SELECT id_a, id_b,
             |    CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE) /
             |      (x.sz + y.sz - len(list_intersect(x.toks, y.toks)))
             |      AS jac
             |  FROM cand
             |  JOIN sets x ON x.doc_id = id_a
             |  JOIN sets y ON y.doc_id = id_b)
             |SELECT id_a, id_b, round(jac, 6) AS jac_r
             |FROM v WHERE jac >= 0.7 ORDER BY id_a, id_b""".stripMargin)),

    QuerySpec("x71_vocab_coverage",
      "vocabulary-coverage / OOV-rate curve (Zipf-mass governance) — " +
        "the tokenizer-sizing question: what fraction of corpus " +
        "token mass does a top-V vocabulary cover, and what OOV " +
        "rate does the budget leave? Unit here is adjacent-token " +
        "bigrams (the fixture's unigram vocabulary is a degenerate " +
        "31 words; the unit is pluggable — words, subwords, " +
        "shingles). Scale shape: the corpus reduces ONCE to a " +
        "vocabulary-sized frequency table (persisted; vocabulary is " +
        "orders of magnitude smaller than the corpus), then each " +
        "cutoff is a distributed top-V (TakeOrdered — deliberately " +
        "NOT a global row_number window, which would pull the whole " +
        "vocabulary through one task) plus a scalar sum; the " +
        "returned frame is three audited scalars per cutoff. " +
        "Builder REQUIREs the curve is monotone and non-vacuous " +
        "(coverage strictly grows across cutoffs); DuckDB " +
        "re-derives the curve via an independent rank-based route " +
        "(window + rk <= cutoff join) — two implementations, one " +
        "answer",
      (s, dir) => {
        val cutoffs = Seq(10L, 100L, 500L)
        val bg = t(s, dir, "documents")
          .select(explode(adjacentBigrams(wsTokens(col("text"))))
            .as("g"))
        // vocabulary-sized (not corpus-sized) and consumed 2+|cutoffs|
        // times — the scratch table replaces a persist the returned
        // plan could never see (every consumer here runs eagerly, but
        // the convention is one compute per heavy subtree, period)
        val freq = scratch(
          bg.groupBy(col("g")).agg(count(lit(1)).as("f")), "x71_freq")
        val total = freq.agg(sum(col("f"))).head.getLong(0)
        val vocab = freq.count()
        val rows = cutoffs.map { v =>
          val covered = freq.orderBy(col("f").desc, col("g"))
            .limit(v.toInt)
            .agg(coalesce(sum(col("f")), lit(0L))).head.getLong(0)
          (v, covered)
        }
        require(rows.sliding(2).forall(w => w(0)._2 <= w(1)._2) &&
          rows.last._2 > rows.head._2,
          s"coverage curve must be monotone and non-vacuous: $rows")
        import s.implicits._
        rows.toDF("cutoff", "covered")
          .select(col("cutoff"), lit(vocab).as("vocab_total"),
            lit(total).as("n_grams"),
            round(col("covered").cast("double") / lit(total.toDouble),
              6).as("coverage_r"),
            round(lit(1.0) - col("covered").cast("double") /
              lit(total.toDouble), 6).as("oov_rate_r"))
          .orderBy(col("cutoff"))
      },
      Some(s"""WITH base AS (
             |  SELECT $duckWsTokens AS tk FROM documents),
             |pos AS (
             |  SELECT tk, unnest(range(1, len(tk))) AS i FROM base
             |  WHERE len(tk) >= 2),
             |f AS (
             |  SELECT tk[i] || ' ' || tk[i+1] AS g,
             |    CAST(count(*) AS BIGINT) AS f
             |  FROM pos GROUP BY g),
             |t AS (
             |  SELECT CAST(sum(f) AS BIGINT) AS total,
             |    CAST(count(*) AS BIGINT) AS vocab FROM f),
             |r AS (
             |  SELECT f, row_number() OVER (ORDER BY f DESC, g) AS rk
             |  FROM f),
             |c AS (
             |  SELECT CAST(v AS BIGINT) AS cutoff
             |  FROM (VALUES (10), (100), (500)) AS x(v))
             |SELECT c.cutoff, t.vocab AS vocab_total,
             |  t.total AS n_grams,
             |  round(CAST(sum(r.f) AS DOUBLE) / t.total, 6)
             |    AS coverage_r,
             |  round(1.0 - CAST(sum(r.f) AS DOUBLE) / t.total, 6)
             |    AS oov_rate_r
             |FROM c JOIN r ON r.rk <= c.cutoff CROSS JOIN t
             |GROUP BY c.cutoff, t.vocab, t.total
             |ORDER BY c.cutoff""".stripMargin)),

    QuerySpec("x57_ann_index_roundtrip",
      "ANN index lifecycle, IVF persistence leg: centroids trained " +
        "once, persisted as parquet tables with a manifest (kind, " +
        "n_cells, dim, caller provenance), LOADED BACK, and the full " +
        "corpus assigned via the LOADED index — while the late-bound " +
        "oracle embeds the ORIGINAL in-memory centroids, so any " +
        "roundtrip corruption (row loss, precision loss, cell " +
        "reorder) diverges the hash; the manifest is what makes a " +
        "100 TB index auditable (which snapshot trained it, with " +
        "what params) and the loader validates tables against it",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cents = Similarity.ivfTrain(emb, "vec_id", "embedding",
          nCells = 8, iters = 2, tag = "persist")
        Similarity.saveIvfIndex(s, "ivf_roundtrip", cents,
          Map("snapshot" -> "fixture-embeddings", "iters" -> "2"))
        val (loaded, man) = Similarity.loadIvfIndex(s, "ivf_roundtrip")
        require(man("n_cells") == "8" && man("iters") == "2" &&
          man("snapshot") == "fixture-embeddings",
          s"manifest must round-trip; got $man")
        Similarity.ivfAssign(emb, "vec_id", "embedding", loaded)
          .orderBy(col("vec_id"))
      },
      None,
      oracleGen = () => Similarity.trainedCentroids.get((8, 2, "persist"))
        .map(cents => Similarity.ivfAssignOracleSql("embeddings",
          "vec_id", "embedding", cents, newPred = "TRUE"))),

    QuerySpec("x57b_pq_index_roundtrip",
      "ANN index lifecycle, PQ persistence leg: codebooks persisted " +
        "with their manifest and loaded back; the gate dumps every " +
        "LOADED codeword value against the ORIGINAL trained values " +
        "embedded as SQL literals — a bit-exactness proof through " +
        "the parquet roundtrip (parquet doubles are binary-exact; " +
        "Double.toString round-trips through DuckDB's " +
        "correctly-rounded parse), the property compressed-index " +
        "serving silently loses if an export path ever goes through " +
        "text truncation",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        val books = Similarity.pqTrain(emb, "vec_id", "embedding",
          m = 8, ksub = 8, iters = 2, tag = "persist")
        Similarity.savePqIndex(s, "pq_roundtrip", books,
          Map("snapshot" -> "fixture-embeddings"))
        val (loaded, man) = Similarity.loadPqIndex(s, "pq_roundtrip")
        require(man("m") == "8" && man("ksub") == "8" &&
          man("snapshot") == "fixture-embeddings",
          s"manifest must round-trip; got $man")
        (for {
          sb <- loaded.indices
          j <- loaded(sb).indices
          d <- loaded(sb)(j).indices
        } yield (sb, j, d, loaded(sb)(j)(d)))
          .toDF("sub", "code", "dim_idx", "cw_val")
          .orderBy(col("sub"), col("code"), col("dim_idx"))
      },
      None,
      oracleGen = () => Similarity.trainedCodebooks.get((8, 8, 2, "persist"))
        .map { books =>
          val rows = for {
            sb <- books.indices
            j <- books(sb).indices
            d <- books(sb)(j).indices
          } yield s"($sb, $j, $d, CAST('${books(sb)(j)(d)}' AS DOUBLE))"
          s"""SELECT sub, code, dim_idx, cw_val
             |FROM (VALUES ${rows.mkString(",\n  ")})
             |  t(sub, code, dim_idx, cw_val)
             |ORDER BY sub, code, dim_idx""".stripMargin
        }),

    QuerySpec("x47_streaming_dedup",
      "transitive oracle for the streaming watermarked dedup: " +
        "dropDuplicatesWithinWatermark over the fixture events read " +
        "as a file stream (Trigger.AvailableNow, append-mode PARQUET " +
        "sink + read-back — no emitted row crosses the driver, the " +
        "shape that survives sf10's maxResultSize ceiling), " +
        "projected to the dedup key so the output is the " +
        "deterministic kept-key set — which must equal batch " +
        "DISTINCT, the form DuckDB verifies directly",
      (s, dir) => {
        val stream = Tables.loadStream(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        val deduped = graft.streaming.Streams.streamingDedup(stream,
            Seq("user_id", "event_type"), watermarkCol = "ts",
            delay = "365 days")
          .select(col("user_id"), col("event_type"))
        graft.streaming.Streams.runAvailableNowToDir(s, deduped, "x47_out", statePartitions = Some(8))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""SELECT DISTINCT user_id, event_type FROM events
             |ORDER BY user_id, event_type""".stripMargin)),

    QuerySpec("x48_streaming_interval_join",
      "transitive oracle for the watermarked stream-stream interval " +
        "self-join: same key/tolerance as batch x16, run with " +
        "Trigger.AvailableNow over the fixture events stream — the " +
        "emitted pair set must equal the batch range join DuckDB " +
        "already verifies",
      (s, dir) => {
        val stream = Tables.loadStream(s, dir, "events")
        val joined = graft.streaming.Streams.streamingIntervalSelfJoin(
          stream, keyCol = "user_id", idCol = "event_id", tsCol = "ts",
          delay = "1 hour", withinSec = 600L)
        graft.streaming.Streams.runAvailableNowToDir(s, joined, "x48_out", statePartitions = Some(8))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b
             |FROM events a JOIN events b
             |  ON a.user_id = b.user_id AND a.event_id < b.event_id
             | AND b.ts >= a.ts - INTERVAL 10 MINUTE
             | AND b.ts <= a.ts + INTERVAL 10 MINUTE
             |ORDER BY id_a, id_b""".stripMargin)),

    QuerySpec("x49_streaming_enrich",
      "transitive oracle for stream-static enrichment: each " +
        "micro-batch of the events stream left-joins the broadcast " +
        "customer dimension (events never shuffle; missing dim rows " +
        "survive as nulls) — output must equal the batch left join",
      (s, dir) => {
        val stream = Tables.loadStream(s, dir, "events")
          .select(col("event_id"), col("user_id"))
        val dim = t(s, dir, "customer")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        val enriched = graft.streaming.Streams.enrichWithDim(
          stream, dim, Seq("user_id"))
        graft.streaming.Streams.runAvailableNowToDir(s, enriched, "x49_out", statePartitions = Some(8))
          .orderBy(col("event_id"))
      },
      Some("""SELECT e.event_id, e.user_id, c.c_mktsegment
             |FROM events e LEFT JOIN customer c
             |  ON e.user_id = c.c_custkey
             |ORDER BY e.event_id""".stripMargin)),

    QuerySpec("x50_streaming_quality_gate",
      "transitive oracle for the streaming perplexity gate: the " +
        "frozen-vocab cross-entropy projection (stateless, no model " +
        "join — the same Column scores batch or stream) gates the " +
        "documents file stream under Trigger.AvailableNow; kept " +
        "(doc_id, h_r) must equal DuckDB computing the identical " +
        "sorted left fold. All model ln-probs are quarter-step " +
        "literals, so every partial sum is IEEE-exact and the fold " +
        "is bit-identical across engines",
      (s, dir) => {
        val lnP = Map("hash" -> -2.0, "order" -> -2.25, "table" -> -2.5,
          "window" -> -2.75, "row" -> -3.0, "batch" -> -3.25,
          "spark" -> -3.5, "join" -> -3.75)
        val stream = Tables.loadStream(s, dir, "documents")
          .select(col("doc_id"), col("text"))
          .filter(length(trim(col("text"))) > 0)
        val gated = stream.withColumn("h_r",
            round(graft.operators.LanguageModel.frozenVocabCrossEntropy(
              col("text"), lnP, -4.5), 6))
          .filter(col("h_r") <= lit(4.05))
          .select(col("doc_id"), col("h_r"))
        graft.streaming.Streams.runAvailableNowToDir(s, gated, "x50_out", statePartitions = Some(8))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
             |  FROM documents WHERE length(trim(text)) > 0),
             |scored AS (
             |  SELECT doc_id,
             |    round(-list_reduce(
             |      list_prepend(CAST(0.0 AS DOUBLE),
             |        list_transform(list_sort(toks), t -> CASE t
             |          WHEN 'hash' THEN -2.0 WHEN 'order' THEN -2.25
             |          WHEN 'table' THEN -2.5 WHEN 'window' THEN -2.75
             |          WHEN 'row' THEN -3.0 WHEN 'batch' THEN -3.25
             |          WHEN 'spark' THEN -3.5 WHEN 'join' THEN -3.75
             |          ELSE -4.5 END)),
             |      (acc, x) -> acc + x) / CAST(len(toks) AS DOUBLE), 6)
             |      AS h_r
             |  FROM d)
             |SELECT doc_id, h_r FROM scored WHERE h_r <= 4.05
             |ORDER BY doc_id""".stripMargin)),

    QuerySpec("x52_streaming_sessionize",
      "transitive oracle for STREAMING sessionization: the native " +
        "session_window aggregate over the fixture events stream " +
        "(Trigger.AvailableNow, complete mode through a per-batch " +
        "OVERWRITE parquet sink + read-back — every session is final " +
        "once the bounded fixture drains, and no emitted row crosses " +
        "the driver; unbounded deployments pass a watermark and run " +
        "append, where state evicts per finalized session) — output " +
        "must equal batch x14b, whose boundary derivation DuckDB " +
        "verifies directly",
      (s, dir) => {
        val stream = Tables.loadStream(s, dir, "events")
          .select(col("user_id"), col("ts"),
            dec2(col("value")).as("value2"))
        val sessions = graft.streaming.Streams.streamingSessionize(
          stream, keyCol = "user_id", tsCol = "ts", valueCol = "value2",
          gap = "1800 seconds")
        graft.streaming.Streams.runAvailableNowToDirComplete(s,
            sessions, "x52_out", statePartitions = Some(8))
          .withColumn("sum_value", col("sum_value").cast("double"))
          .orderBy(col("user_id"), col("session_start"))
      },
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             |         THEN 1 ELSE 0 END AS is_new
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT *, sum(is_new) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS sess_id
             |  FROM flagged)
             |SELECT user_id, min(ts) AS session_start,
             |       max(ts) + INTERVAL 1800 SECONDS AS session_end,
             |       count(*) AS n_events,
             |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM sess GROUP BY user_id, sess_id
             |ORDER BY user_id, session_start""".stripMargin)),

    QuerySpec("x53_streaming_ingest_screen",
      "transitive oracle for INGESTION-TIME dedup against history: " +
        "the documents stream anti-joins the historical fingerprint " +
        "inventory (stream-static left_anti on 32-char digests, " +
        "re-broadcast per micro-batch; history text is never read — " +
        "only its persisted fingerprint column, the shape that " +
        "screens a daily delta against a 100 TB corpus) — stateless, " +
        "shuffle-free on the stream side; output must equal batch " +
        "x1b, which DuckDB verifies directly",
      (s, dir) => {
        val hist = t(s, dir, "documents").filter(col("doc_id") < 250)
          .select(md5Fingerprint(col("text")).as("md5_fp"))
        val stream = Tables.loadStream(s, dir, "documents")
          .filter(col("doc_id") >= 250)
        val screened = Dedup.incrementalExactNew(stream, "text", hist)
          .select(col("doc_id"))
        graft.streaming.Streams.runAvailableNowToDir(s, screened, "x53_out",
            statePartitions = Some(8))
          .orderBy(col("doc_id"))
      },
      Some("""WITH fp AS (
             |  SELECT doc_id,
             |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
             |  FROM documents)
             |SELECT b.doc_id FROM fp b
             |WHERE b.doc_id >= 250 AND NOT EXISTS (
             |  SELECT 1 FROM fp h WHERE h.doc_id < 250 AND h.f = b.f)
             |ORDER BY doc_id""".stripMargin)),

    QuerySpec("x54_streaming_exactly_once_sink",
      "data oracle for the EXACTLY-ONCE foreachBatch parquet sink: " +
        "stream the events fixture through idempotentParquetSink " +
        "(per-batch-id overwrite directories), then FORCE the " +
        "at-least-once replay window — delete the newest checkpoint " +
        "commit and restart, so the last batch genuinely re-executes " +
        "through foreachBatch — and return the sink's contents. The " +
        "DuckDB oracle is the ORIGINAL events table: hash equality " +
        "proves the post-replay sink holds every input row exactly " +
        "once (no duplicates from the replay, no loss from the " +
        "overwrite)",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val sink = java.nio.file.Paths.get("target/x54_sink")
          .toAbsolutePath.toString
        val ckpt = java.nio.file.Paths.get("target/x54_ckpt")
          .toAbsolutePath.toString
        def rmTree(root: String): Unit = {
          val p = java.nio.file.Paths.get(root)
          if (java.nio.file.Files.exists(p)) {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(p).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.delete)
          }
        }
        rmTree(sink); rmTree(ckpt)
        def pipeline() = graft.streaming.Streams.idempotentParquetSink(
          Tables.loadStream(s, dir, "events")
            .select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value")),
          sink, ckpt, trigger = Some(Trigger.AvailableNow()))
        val q1 = pipeline()
        graft.streaming.Streams.awaitTerminationAndUnregister(s, q1)
        val replayed = graft.streaming.Streams.forceLastBatchReplay(ckpt)
        val before = s.read.parquet(s"$sink/batch_id=$replayed").count()
        val q2 = pipeline()
        graft.streaming.Streams.awaitTerminationAndUnregister(s, q2)
        require(s.read.parquet(s"$sink/batch_id=$replayed").count()
            == before,
          s"replayed batch $replayed must overwrite to the same rows")
        s.read.parquet(sink)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, ts, user_id, event_type, value
             |FROM events ORDER BY event_id""".stripMargin))
  )
}
