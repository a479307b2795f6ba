package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions._
import graft.functions.TextFunctions._

/** Deduplication operators for large-scale text pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. All hash math is
  * md5-derived so the DuckDB oracle reproduces it bit-for-bit
  * (HashFunctions scaladoc).
  *
  * Scale design: every stage is a shuffle-on-key groupBy or an
  * equi-join on (band, bucket) — no cross joins, no driver-side
  * loops, no global windows. At 100 TB the explode(shingles) stage
  * dominates; it is map-side only and AQE handles the skew of the
  * band-bucket join.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical key. One shuffle
    * on the (hashed) key.
    *
    * Election is a single map-side-partial `min_by(row, id)`
    * aggregate, NOT a per-key window: a viral exact duplicate (blank
    * page, boilerplate template — millions of rows with one
    * fingerprint) would pull its whole group through a single
    * WindowExec task, while the aggregate reduces it map-side before
    * the shuffle (the marginMineTail rule). min_by (not min-of-struct)
    * so only the ID needs to be orderable — payload columns may be
    * maps or other unorderable types, exactly as the removed
    * min(id)-over-key window allowed. NULL-id rows are skipped and an
    * all-NULL-id group drops entirely, matching the removed window's
    * `id === min(id)` filter; rows with duplicate ids (against the
    * contract) elect nondeterministically. */
  def exactKeepFirst(df: DataFrame, keyCol: Column, idCol: Column): DataFrame = {
    val cols = df.columns.toSeq
    df.groupBy(keyCol.as("__k"))
      .agg(min_by(struct(cols.map(col): _*), idCol).as("__row"))
      .filter(col("__row").isNotNull)
      .select(cols.map(c => col("__row").getField(c).as(c)): _*)
  }

  // ---- MinHash + LSH ------------------------------------------------

  /** MinHash parameters: k signatures in `bands` bands of `rows` each,
    * over word `shingleN`-grams. Defaults are near-dup tuned: 2 bands
    * of 6 rows → per-band collision probability j^6, so dissimilar
    * pairs (j≈0.3) almost never become candidates (LSH S-curve
    * threshold (1/b)^(1/r) ≈ 0.89) — candidate volume, not signature
    * computation, is what dominates at scale. */
  final case class MinHashParams(k: Int = 12, bands: Int = 2, shingleN: Int = 3) {
    require(k % bands == 0, "k must divide into equal bands")
    val rows: Int = k / bands
  }

  /** Per-document MinHash signature columns s0..s(k-1).
    * One md5 per distinct shingle; the k family members are
    * Carter–Wegman combinations of its two 60-bit halves. */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
      p: MinHashParams): DataFrame = {
    // materialize the token array BEFORE the shingle transform so the
    // lambda reads a bound attribute (see wordShinglesFromTokens note)
    val toks = docs.select(col(idCol), trim(col(textCol)).as("__t"),
      wsTokens(col(textCol)).as("__tk"))
    val grams = toks.select(col(idCol),
        explode(wordShinglesFromTokens(col("__tk"), col("__t"), p.shingleN))
          .as("g"))
      .select(col(idCol), md5Hash60(col("g")).as("a"), md5Hash60b(col("g")).as("b"))
    grams.groupBy(col(idCol))
      .agg(min(cwHash(col("a"), col("b"), 0)).as("s0"),
        (1 until p.k).map(j => min(cwHash(col("a"), col("b"), j)).as(s"s$j")): _*)
  }

  /** LSH band keys: md5 over the '|'-joined signature slice per band;
    * output long-form (id, band, band_key). */
  def lshBands(sigs: DataFrame, idCol: String, p: MinHashParams): DataFrame = {
    val bandCols = (0 until p.bands).map { b =>
      val slice = (b * p.rows until (b + 1) * p.rows)
        .map(j => col(s"s$j").cast("string"))
      md5(concat_ws("|", slice: _*)).as(s"band$b")
    }
    sigs.select(col(idCol) +: bandCols: _*)
      .unpivot(Array(col(idCol)),
        (0 until p.bands).map(b => col(s"band$b")).toArray, "band", "band_key")
  }

  /** Candidate pairs (id_a < id_b) sharing ≥1 LSH bucket, with the
    * MinHash Jaccard estimate (= fraction of matching signature slots),
    * filtered to `minEst`. The pair join is an equi-join on
    * (band, band_key) — bucket-local, never all-pairs.
    *
    * Two guards bound the classic web-dedup hot-bucket blowup (a
    * cluster of identical documents shares every band, making one
    * bucket O(n²) in pairs):
    *  - an EXACT-dedup prefilter (one groupBy on the text) collapses
    *    identical documents to their lowest id before any hashing —
    *    exact duplicates are x1's job, not LSH's;
    *  - each bucket is capped at its `maxBucket` lowest ids via the
    *    two-phase sharded rank ([[cappedBands]] — a viral bucket
    *    never funnels through one window task; the final rank keys on
    *    the same (band, band_key) the join shuffles on). Overflow is
    *    NOT silent: [[minHashBucketOverflow]] reports capped buckets.
    *
    * No caching and no re-joins: the signature ARRAY rides along
    * through the band unpivot and the bucket self-join, so joined rows
    * already hold both sides' signatures and the estimate is a pure
    * projection — the signature subplan exists only as the two sides
    * of one self-join instead of three computations plus two joins,
    * and no full-corpus signature table is pinned in memory.
    *
    * PRECONDITION: `idCol` uniquely identifies a document (one text per
    * id). The pair-dedup aggregation groups on the two ids alone and
    * takes min(est) — exact because a pair's estimate is a pure
    * function of its two signatures, which the unique-id contract
    * makes a pure function of the id pair. Duplicate ids with
    * DIFFERING texts would make min(est) adjudicate the pair by its
    * weakest text combination (the DuckDB oracle assumes the same
    * contract); run [[exactKeepFirst]]-style id assignment upstream if
    * a corpus cannot guarantee it.
    *
    * The self-join carries a MERGE hint: left to the planner, the
    * (small at gate SF) capped side lands under a BroadcastExchange
    * and the whole signature pipeline (shingle explode, k hash mins,
    * banding, two-phase cap) is computed TWICE — broadcast builds
    * cannot reuse the other side's exchange (verified on the r18 x3
    * plan dump: zero ReusedExchange, the full subtree planned once
    * per side). As a sort-merge join, both sides are the IDENTICAL
    * exchange on (band, band_key) that the cap's phase-2 window
    * already establishes — ReusedExchange computes the pipeline
    * once, and the window's (keys..., id) sort already satisfies the
    * join's sort order, so the hint adds no exchange and no sort. At
    * corpus scale SMJ is what the planner picks anyway (no side fits
    * a broadcast); the hint aligns the gate-SF shape with it.
    * (An eager checkpoint of the capped frame was measured first and
    * rejected: x19 4.1→6.9 s, x21b 3.4→14 s solo warm — build-time
    * barriers plus ~3 s/entry extra driver planning.) */
  def minHashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams(), minEst: Double = 0.75,
      maxBucket: Int = 1000, preDeduped: Boolean = false): DataFrame = {
    val capped = cappedBands(docs, idCol, textCol, p, maxBucket,
      carrySig = true, preDeduped = preDeduped).hint("merge")
    // Adjudicate in the projection ABOVE the join, dedup band
    // collisions on the slim (id_a, id_b) keys, and threshold ABOVE
    // the aggregation. Each placement is load-bearing:
    //  - est in the join output's Project: one codegen'd evaluation
    //    per band collision (≤ bands× per pair). A filter placed
    //    directly on that projection gets PUSHED INTO THE JOIN
    //    CONDITION, where the k-term expression runs per hash-probe
    //    pair ahead of the cheap id ordering cut — measured 6× slower
    //    on the sf10/sf1 rehearsal corpora than this shape;
    //  - the distinct is a groupBy on the two id longs with min(est)
    //    (est is a pure function of the pair, identical across its
    //    band duplicates, so min is exact) — the widest hash
    //    aggregation of the query carries 24-byte rows instead of two
    //    k-int signature arrays;
    //  - the threshold filter sits above the aggregation, where no
    //    rule can sink it into the join.
    capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        (sigMatches(col("x.sig"), col("y.sig"), p).cast("double") / p.k)
          .as("__est"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("__est")).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
  }

  /** Near-duplicate LINKS between two corpora (train vs freshly
    * crawled, train vs licensed, shard vs shard): candidates share an
    * LSH band bucket across the two sides, each candidate adjudicated
    * by the MinHash estimate — the cross-corpus form of
    * [[minHashNearDupPairs]]. Where [[Dedup.decontaminate]] answers
    * "does this doc OVERLAP the eval set anywhere" (n-gram
    * containment), this answers "is this doc a near-COPY of some
    * specific other-corpus doc", and names the partner.
    *
    * Both sides are exact-deduped and bucket-capped by the shared
    * [[cappedBands]] stage; the join is an equi-join on
    * (band, band_key) — never all-pairs — and the signature arrays
    * ride the join so no re-join against raw texts is needed. At
    * 100 TB each side shuffles once on band keys; candidate volume is
    * bounded by the bucket cap with the overflow reporter naming any
    * truncation.
    *
    * PRECONDITION: `idCol` is unique within EACH side (one text per id
    * per corpus) — same min(est) groupBy contract as
    * [[minHashNearDupPairs]]. */
  def crossCorpusNearDupPairs(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String, p: MinHashParams = MinHashParams(),
      minEst: Double = 0.75, maxBucket: Int = 1000): DataFrame = {
    val ca = cappedBands(a, idCol, textCol, p, maxBucket, carrySig = true)
    val cb = cappedBands(b, idCol, textCol, p, maxBucket, carrySig = true)
    // Same project / slim-groupBy / filter-above-agg shape as
    // minHashNearDupPairs (see the placement rationale there — a
    // filter on the projection would sink into the join condition).
    ca.as("x").join(cb.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        (sigMatches(col("x.sig"), col("y.sig"), p).cast("double") / p.k)
          .as("__est"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("__est")).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
  }

  /** Shared cap stage of the pair and candidate paths: long-form band
    * keys ranked within their (band, band_key) bucket, keeping each
    * bucket's `maxBucket` lowest ids — ONE definition of the cap/key
    * shape so [[minHashNearDupPairs]] and [[lshCandidatePairs]] (and
    * through them the x1d/x2b gates) can never drift apart.
    *
    * Two-phase sharded rank (the r17 election rule, same shape as
    * semanticDedup's cap): the cap binds exactly when one bucket is
    * viral — a templated-doc family sharing band signatures — and a
    * plain bucket-keyed window would pull that whole bucket through
    * one task. Phase 1 ranks within (band, band_key, id-hash shard)
    * and keeps ≤ maxBucket per shard (lossless: a row with maxBucket
    * lower-id rows in its OWN shard cannot be in the bucket's overall
    * lowest maxBucket); phase 2 ranks the ≤ 64×maxBucket survivors
    * on the same (band, band_key) key the pair join shuffles on. */
  private def cappedBands(docs: DataFrame, idCol: String, textCol: String,
      p: MinHashParams, maxBucket: Int, carrySig: Boolean,
      preDeduped: Boolean = false): DataFrame =
    Caps.twoPhaseRank(
      bandKeys(minHashArraySigs(docs, idCol, textCol, p, preDeduped),
        idCol, p, carrySig),
      Seq(col("band"), col("band_key")), Seq(col(idCol)),
      md5Hash60b(col(idCol).cast("string")), maxBucket)

  /** Matching-slot count between two k-length signature arrays,
    * unrolled into k element_at comparisons: stays inside whole-stage
    * codegen on the candidate hot path (a higher-order
    * aggregate-over-zip_with is interpreted per pair) — the Spark twin
    * of [[sigMatchSql]]. */
  private def sigMatches(a: Column, b: Column, p: MinHashParams): Column =
    (0 until p.k)
      .map(j => when(element_at(a, j + 1) === element_at(b, j + 1), 1)
        .otherwise(0))
      .reduce(_ + _)

  /** Diagnostic for the bucket cap: (band, band_key, n_docs) for every
    * bucket larger than `maxBucket` — run alongside the pair query so
    * capping is never a silent truncation. Recomputes signatures from
    * raw docs; on a shared pass persist [[minHashBandKeys]] once and
    * use [[minHashBucketOverflowFromBands]]. */
  def minHashBucketOverflow(docs: DataFrame, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams(), maxBucket: Int = 1000): DataFrame =
    minHashBucketOverflowFromBands(
      minHashBandKeys(docs, idCol, textCol, p), maxBucket)

  /** Overflow diagnostic over a precomputed [[minHashBandKeys]] frame. */
  def minHashBucketOverflowFromBands(bands: DataFrame,
      maxBucket: Int = 1000): DataFrame =
    bands.groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBucket)

  /** Long-form (id[, sig], band, band_key) keys over exact-deduped
    * docs — the shared input of the pair join and the overflow
    * diagnostic (set `carrySig` when feeding the pair path). */
  def minHashBandKeys(docs: DataFrame, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams(), carrySig: Boolean = false): DataFrame =
    bandKeys(minHashArraySigs(docs, idCol, textCol, p), idCol, p, carrySig)

  /** Array-form signatures over exact-deduped docs (lowest id kept per
    * identical text): one `sig` column instead of k, string-identical
    * to the per-column formulation so the DuckDB oracle reproduces it.
    * `preDeduped` skips the prefilter groupBy when the caller already
    * guarantees distinct texts (e.g. after a fingerprint dedup, whose
    * normalization subsumes byte identity) — the prefilter would be a
    * full-text shuffle that re-establishes a held invariant. */
  private def minHashArraySigs(docs: DataFrame, idCol: String,
      textCol: String, p: MinHashParams,
      preDeduped: Boolean = false): DataFrame = {
    val deduped =
      if (preDeduped) docs.select(col(textCol), col(idCol))
      else docs.groupBy(col(textCol)).agg(min(col(idCol)).as(idCol))
    val toks = deduped.select(col(idCol), trim(col(textCol)).as("__t"),
      wsTokens(col(textCol)).as("__tk"))
    val grams = toks.select(col(idCol),
        explode(wordShinglesFromTokens(col("__tk"), col("__t"), p.shingleN))
          .as("g"))
      .select(col(idCol), md5Hash60(col("g")).as("a"),
        md5Hash60b(col("g")).as("b"))
    grams.groupBy(col(idCol))
      .agg(array((0 until p.k).map(j => min(cwHash(col("a"), col("b"), j))): _*)
        .as("sig"))
  }

  /** Long-form (id[, sig], band, band_key) keys from array signatures;
    * `carrySig` keeps the signature column alongside so downstream
    * consumers need no re-join. */
  private def bandKeys(sigs: DataFrame, idCol: String, p: MinHashParams,
      carrySig: Boolean = false): DataFrame = {
    val bandCols = (0 until p.bands).map { b =>
      md5(concat_ws("|", transform(
        slice(col("sig"), b * p.rows + 1, p.rows), x => x.cast("string"))))
        .as(s"band$b")
    }
    val ids = if (carrySig) Seq(col(idCol), col("sig")) else Seq(col(idCol))
    sigs.select(ids ++ bandCols: _*)
      .unpivot(ids.toArray,
        (0 until p.bands).map(b => col(s"band$b")).toArray, "band", "band_key")
  }

  /** DuckDB CTE chain computing (id, band, band_key) for an arbitrary
    * `(id, text)` source CTE — the building block for oracles over the
    * incremental band screen. Emits CTEs named `<a>_toks`, `<a>_grams`,
    * `<a>_hashed`, `<a>_sigs`, `<a>_bands`; reference the last. */
  def bandsSqlCtes(sourceCte: String, a: String,
      p: MinHashParams = MinHashParams()): String = {
    val n = p.shingleN
    val joined = (0 until n).map(k => s"tk[i + $k]").mkString(" || ' ' || ")
    val sigExprs = (0 until p.k).map(j =>
      s"CAST(min((a + $j * (b % ${1L << 40})) % ${1L << 60}) AS BIGINT) AS s$j")
      .mkString(", ")
    val bandExprs = (0 until p.bands).map { b =>
      val slice = (b * p.rows until (b + 1) * p.rows)
        .map(j => s"CAST(s$j AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT id, $b AS band, md5($slice) AS band_key FROM ${a}_sigs"
    }.mkString(" UNION ALL ")
    s"""${a}_toks AS (
       |  SELECT id, text, string_split_regex(trim(text), '\\s+') AS tk
       |  FROM $sourceCte),
       |${a}_grams AS (
       |  SELECT DISTINCT id, unnest(
       |    CASE WHEN len(tk) >= $n THEN
       |      list_transform(range(1, len(tk) - ${n - 1} + 1), i -> $joined)
       |    ELSE [trim(text)] END) AS g
       |  FROM ${a}_toks),
       |${a}_hashed AS (
       |  SELECT id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS a,
       |         ('0x' || substr(md5(g), 17, 15))::BIGINT AS b
       |  FROM ${a}_grams),
       |${a}_sigs AS (SELECT id, $sigExprs FROM ${a}_hashed GROUP BY id),
       |${a}_bands AS ($bandExprs)""".stripMargin
  }

  /** DuckDB CTE chain `docs → toks → grams → hashed → sigs → bands →
    * capped → cand(id_a, id_b)` mirroring [[lshCandidatePairs]] over
    * `table` (exact-dedup prefilter and bucket cap included) — shared
    * by [[minHashOracleSql]] and the x2b adjudication oracle so the
    * candidate-generation SQL cannot drift from the Spark path. */
  def lshCandSqlCtes(table: String, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams(), maxBucket: Int = 1000): String = {
    val n = p.shingleN
    val sigExprs = (0 until p.k).map(j =>
      s"CAST(min((a + $j * (b % ${1L << 40})) % ${1L << 60}) AS BIGINT) AS s$j").mkString(", ")
    val bandExprs = (0 until p.bands).map { b =>
      val slice = (b * p.rows until (b + 1) * p.rows)
        .map(j => s"CAST(s$j AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT $idCol AS id, $b AS band, md5($slice) AS band_key FROM sigs"
    }.mkString(" UNION ALL ")
    val joined = (0 until n).map(k => s"tk[i + $k]").mkString(" || ' ' || ")
    s"""docs AS (
       |  SELECT min($idCol) AS $idCol, $textCol
       |  FROM $table GROUP BY $textCol),
       |toks AS (
       |  SELECT $idCol, $textCol,
       |         string_split_regex(trim($textCol), '\\s+') AS tk
       |  FROM docs),
       |grams AS (
       |  SELECT DISTINCT $idCol, unnest(
       |    CASE WHEN len(tk) >= $n THEN
       |      list_transform(range(1, len(tk) - ${n - 1} + 1), i -> $joined)
       |    ELSE [trim($textCol)] END) AS g
       |  FROM toks),
       |hashed AS (
       |  SELECT $idCol, ('0x' || substr(md5(g), 1, 15))::BIGINT AS a,
       |         ('0x' || substr(md5(g), 17, 15))::BIGINT AS b
       |  FROM grams),
       |sigs AS (SELECT $idCol, $sigExprs FROM hashed GROUP BY $idCol),
       |bands AS ($bandExprs),
       |capped AS (
       |  SELECT id, band, band_key FROM (
       |    SELECT *, row_number() OVER (PARTITION BY band, band_key
       |                                 ORDER BY id) AS rn
       |    FROM bands) ranked
       |  WHERE rn <= $maxBucket),
       |cand AS (
       |  SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |  FROM capped x JOIN capped y
       |    ON x.band = y.band AND x.band_key = y.band_key AND x.id < y.id)""".stripMargin
  }

  /** DuckDB oracle SQL mirroring minHashNearDupPairs exactly,
    * including the exact-dedup prefilter and the bucket cap. */
  def minHashOracleSql(table: String, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams(), minEst: Double = 0.75,
      maxBucket: Int = 1000): String = {
    val matchSum = (0 until p.k)
      .map(j => s"(CASE WHEN sa.s$j = sb.s$j THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH ${lshCandSqlCtes(table, idCol, textCol, p, maxBucket)}
       |SELECT c.id_a, c.id_b,
       |       CAST($matchSum AS DOUBLE) / ${p.k} AS est_jaccard
       |FROM cand c
       |JOIN sigs sa ON sa.$idCol = c.id_a
       |JOIN sigs sb ON sb.$idCol = c.id_b
       |WHERE CAST($matchSum AS DOUBLE) / ${p.k} >= $minEst
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** The candidate-GENERATION stage of [[minHashNearDupPairs]] alone:
    * distinct (id_a, id_b) sharing ≥1 capped LSH bucket over
    * exact-deduped docs, no estimate filter — the pair source to feed
    * any pairwise adjudicator (Levenshtein, exact Jaccard, embedding
    * cosine). Same scale shape: equi-join on (band, band_key), capped
    * buckets, never all-pairs. */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams(), maxBucket: Int = 1000): DataFrame = {
    // MERGE-hinted for the same reason as minHashNearDupPairs' self-
    // join (see its scaladoc): as an SMJ both sides reuse ONE
    // exchange and the signature pipeline computes once
    val capped = cappedBands(docs, idCol, textCol, p, maxBucket,
      carrySig = false).hint("merge")
    capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
  }

  // ---- incremental (delta-vs-history) dedup ------------------------

  /** Incremental ingestion dedup, exact form: keep only batch rows
    * whose normalized fingerprint does not appear in the HISTORICAL
    * fingerprint set. One anti-join keyed on 32-char digests — the
    * shape that lets a 100 TB corpus ingest daily deltas without
    * recomputing or even reading historical text (only its stored
    * fingerprint column). `seen` needs a `md5_fp` column (the
    * md5Fingerprint output persisted at prior ingests). */
  def incrementalExactNew(batch: DataFrame, textCol: String,
      seen: DataFrame): DataFrame =
    batch.withColumn("__fp", md5Fingerprint(col(textCol)))
      .join(seen.select(col("md5_fp").as("__fp")).distinct(),
        Seq("__fp"), "left_anti")
      .drop("__fp")

  /** Incremental near-dup screen: drop batch rows landing in any LSH
    * bucket the historical corpus already occupies (`seen` is a
    * [[bandInventory]] persisted at prior ingests). Stricter than
    * pairwise estimation — a shared bucket is treated as dup
    * evidence — which is the cheap first-pass filter; when precision
    * matters, use [[incrementalNearAdjudicated]] (against a
    * [[signatureInventory]]) to adjudicate each bucket hit by its
    * actual MinHash estimate instead.
    *
    * The screen is keyed by TEXT digest, not row id, so EVERY batch
    * copy of a flagged text drops (band keys are computed once per
    * distinct text; the exact-dedup inside signature building can
    * therefore never hide a duplicate copy from the screen). If the
    * inventory carries a `minhash_params` column, a mismatch with the
    * current params throws instead of silently screening nothing. */
  def incrementalNearNew(batch: DataFrame, idCol: String, textCol: String,
      seen: DataFrame, p: MinHashParams = MinHashParams()): DataFrame = {
    val seenBands = guardParams(seen, p).select(col("band"), col("band_key"))
    val keyedTexts = batch.select(md5(col(textCol)).as("__tid"),
      col(textCol)).distinct()
    val hitTexts = bandKeys(
        minHashArraySigs(keyedTexts, "__tid", textCol, p), "__tid", p)
      .join(seenBands.distinct(), Seq("band", "band_key"), "left_semi")
      .select(col("__tid")).distinct()
    batch.withColumn("__tid", md5(col(textCol)))
      .join(hitTexts, Seq("__tid"), "left_anti")
      .drop("__tid")
  }

  /** Two-stage incremental near-dup ingest — the precision path the
    * band screen's scaladoc promises: the cheap (band, band_key)
    * equi-join still generates candidates, but instead of treating a
    * shared bucket as dup evidence, each candidate (batch text,
    * historical signature) pair is ADJUDICATED by the MinHash Jaccard
    * estimate, and only texts with an adjudicated match ≥ `minEst`
    * drop. `seen` is a [[signatureInventory]] persisted at prior
    * ingests — signatures ride the inventory, so history text is never
    * re-read OR re-hashed. Keyed by text digest like the screen (every
    * batch copy of an adjudicated-dup text drops), with the same
    * params-drift guard. Scale shape: one equi-join on the band key, a
    * pure-projection estimate, one anti-join on the digest. */
  def incrementalNearAdjudicated(batch: DataFrame, idCol: String,
      textCol: String, seen: DataFrame, p: MinHashParams = MinHashParams(),
      minEst: Double = 0.75): DataFrame = {
    val seenSigs = guardParams(seen, p)
      .select(col("band"), col("band_key"), col("sig").as("__hsig"))
    val keyedTexts = batch.select(md5(col(textCol)).as("__tid"),
      col(textCol)).distinct()
    val qBands = bandKeys(
      minHashArraySigs(keyedTexts, "__tid", textCol, p), "__tid", p,
      carrySig = true)
    val cand = qBands.join(seenSigs, Seq("band", "band_key"))
      .select(col("__tid"), col("sig"), col("__hsig"))
      .distinct()
    val hitTexts = cand
      .filter(sigMatches(col("sig"), col("__hsig"), p).cast("double") / p.k
        >= minEst)
      .select(col("__tid")).distinct()
    batch.withColumn("__tid", md5(col(textCol)))
      .join(hitTexts, Seq("__tid"), "left_anti")
      .drop("__tid")
  }

  /** The (id, sig, band, band_key) inventory of a corpus with its
    * MinHash parameter tag — the richer sibling of [[bandInventory]]:
    * persisting signatures alongside the band keys is what lets the
    * next delta's screen hits be adjudicated pairwise
    * ([[incrementalNearAdjudicated]]) without touching history text. */
  def signatureInventory(docs: DataFrame, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams()): DataFrame =
    bandKeys(minHashArraySigs(docs, idCol, textCol, p), idCol, p,
      carrySig = true)
      .withColumn("minhash_params", lit(paramsTag(p)))

  /** Shared params-drift guard: an inventory tagged with different
    * MinHashParams than the caller's throws instead of silently
    * screening nothing. Untagged inventories pass through. */
  private def guardParams(seen: DataFrame, p: MinHashParams): DataFrame =
    if (!seen.columns.contains("minhash_params")) seen
    else {
      val matching = seen.filter(col("minhash_params") === paramsTag(p))
      if (matching.isEmpty && !seen.isEmpty)
        throw new IllegalStateException(
          s"inventory was built with different MinHashParams " +
            s"than ${paramsTag(p)}; rebuild it (a mismatched screen " +
            "would silently pass every duplicate)")
      matching
    }

  private def paramsTag(p: MinHashParams): String =
    s"k${p.k}b${p.bands}n${p.shingleN}"

  /** DuckDB expression: count of matching signature slots between sig
    * CTE aliases `a` and `b` (the pairwise MinHash match sum). */
  def sigMatchSql(a: String, b: String,
      p: MinHashParams = MinHashParams()): String =
    (0 until p.k)
      .map(j => s"(CASE WHEN $a.s$j = $b.s$j THEN 1 ELSE 0 END)")
      .mkString(" + ")

  /** The (band, band_key) inventory of a corpus, tagged with the
    * MinHash parameters it was built under — persist this at each
    * ingest so the next delta screens against it (and cannot silently
    * screen with drifted parameters). */
  def bandInventory(docs: DataFrame, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams()): DataFrame =
    bandKeys(minHashArraySigs(docs, idCol, textCol, p), idCol, p)
      .select(col("band"), col("band_key")).distinct()
      .withColumn("minhash_params", lit(paramsTag(p)))

  // ---- near-dup clustering -----------------------------------------

  /** Connected components over dedup pair edges: every id gets the
    * smallest id reachable through the pair graph — the canonical
    * cluster label that turns pairwise near-dup evidence into
    * per-document keep/drop decisions (keep = id == cluster_id).
    *
    * Iterative min-label propagation: each round takes, per node, the
    * minimum of its own label and its neighbors' labels; converges in
    * O(component diameter) rounds (near-dup clusters are
    * short-diameter in practice). Each round is one equi-join + one
    * groupBy — both shuffle on node id — and each round's frame goes
    * through `materialize` so successive rounds read the previous
    * round's result instead of recomputing the whole chain (which
    * would be quadratic in rounds). The default hook
    * ([[defaultMaterialize]]) truncates the plan per round in whatever
    * way is safe for the environment — localCheckpoint on a local
    * master, reliable checkpoint when a checkpoint dir is set,
    * lineage-keeping persist otherwise — because under plain persist
    * round k's logical plan still nests all k-1 predecessors and
    * analysis cost grows every round. Convergence is
    * detected by counting changed labels (zero changes = fixpoint),
    * one tiny existence probe per round that works for ANY id type —
    * numeric, string, or otherwise. The fixpoint (min id per
    * component) is unique, so the result is deterministic regardless
    * of iteration schedule.
    *
    * `maxIters` is a safety valve, not a truncation: if the fixpoint
    * is not reached within it (a component whose min-label distance
    * exceeds it, e.g. a 100+-doc drift chain), the call THROWS rather
    * than silently returning non-minimal labels. Raise `maxIters` (or
    * pre-bridge long chains) in that case; labels always converge in
    * at most the largest component diameter rounds.
    *
    * `shortcut = true` adds one POINTER-HALVING join per round
    * (label ← label-of-label, the Hash-to-Min / large-star family's
    * path compression, Rastogi et al. 2012): the min-label distance
    * then roughly halves per round, so a d-link chain converges in
    * O(log d) rounds instead of d — the long-drift-chain insurance.
    * The fixpoint (min id per component) is IDENTICAL, so results
    * match the plain form bit-for-bit; the cost is a second shuffle
    * join and a second per-round materialization, which is why it is
    * opt-in: near-dup clusters are short-diameter in the common case
    * and the plain form's single join per round wins there
    * (ChainRehearse has the measured crossover — a 200-link chain
    * converges in 9 rounds with the shortcut vs 200+ without).
    * The label self-join's hot key (a near-converged component's
    * shared label) is an AQE-splittable equi-join, not a window. */
  def connectedComponents(ids: DataFrame, idCol: String, pairs: DataFrame,
      maxIters: Int = 50,
      materialize: DataFrame => DataFrame = defaultMaterialize,
      shortcut: Boolean = false): DataFrame = {
    // The edge list is re-joined every round, always on v: one explicit
    // repartition here means every round's edge side reuses this single
    // exchange (checkpoint/localCheckpoint materialization preserves
    // outputPartitioning, and so does persist's InMemoryRelation)
    // instead of re-shuffling the — at corpus scale, huge — edge list
    // per round.
    val edges = materialize(
      pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .union(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
        .distinct()
        .repartition(col("v")))
    // prevRound tracks the frame the hook actually materialized (a
    // derived select would make unpersist a silent no-op)
    var prevRound = materialize(
      ids.select(col(idCol).as("u"), col(idCol).as("label")))
    var labels = prevRound
    var i = 0
    var done = edges.isEmpty
    while (!done && i < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("u").as("v"), col("label").as("nl")), "v")
        .groupBy(col("u")).agg(min(col("nl")).as("nbr"))
      val base = labels.join(nbrMin, Seq("u"), "left")
        .select(col("u"), col("label").as("__prev"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
      // the intermediate the shortcut path materializes; freed only
      // AFTER the round's noop-sink action — on a cluster without a
      // checkpoint dir the materialize hook degrades to a LAZY
      // persist, so an eager unpersist here would re-introduce the
      // double evaluation of `base` the intermediate exists to prevent
      var roundScratch: Option[DataFrame] = None
      val stepped = if (!shortcut) materialize(base) else {
        // pointer halving: label ← min(label, label-of-label). Labels
        // are always ids of same-component nodes, so the lookup side
        // is total over them (left join + coalesce only defends the
        // ids/pairs-disjoint edge case). base feeds both sides of the
        // self-join — materialize first or the round's join+agg
        // evaluates twice.
        val b = materialize(base)
        val halved = materialize(b
          .join(b.select(col("u").as("label"), col("label").as("__l2")),
            Seq("label"), "left")
          .select(col("u"), col("__prev"),
            least(col("label"), coalesce(col("__l2"), col("label")))
              .as("label")))
        roundScratch = Some(b)
        halved
      }
      // The materializing action must touch EVERY partition: a take(1)
      // probe (isEmpty) stops at the first changed label, caching only
      // the partitions it read — every later round then recomputes the
      // uncached rest from full lineage (quadratic; measured 2x on x19
      // at sf0.1 when persist replaced the old eager localCheckpoint).
      // One noop-sink write populates the whole cache, and an observe()
      // metric rides that same job to decide convergence — no second
      // pass, no extra count Exchange.
      val obs = new org.apache.spark.sql.Observation()
      stepped.observe(obs, sum(when(col("label") =!= col("__prev"), 1L)
          .otherwise(0L)).as("changed"))
        .write.format("noop").mode("overwrite").save()
      // null metric = zero rows observed = nothing left to change
      done = obs.get.get("changed")
        .forall(v => v == null || v.asInstanceOf[Long] == 0L)
      roundScratch.foreach(_.unpersist())
      prevRound.unpersist()
      prevRound = stepped
      // Build the next round directly on the persisted frame: the
      // InMemoryRelation substituted for it PRESERVES the join's hash
      // partitioning on u, so later rounds reuse it instead of
      // re-exchanging. (A createDataFrame(df.rdd, schema) plan
      // truncation was tried here and rejected: it discards
      // outputPartitioning, adding an Exchange per round.)
      labels = stepped.select(col("u"), col("label"))
      i += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIters rounds; " +
          "raise maxIters (labels converge in <= component diameter rounds)")
    edges.unpersist()
    labels.select(col("u").as(idCol), col("label").as("cluster_id"))
  }

  /** Default `materialize` hook for FORKED (multi-consumer) lineages:
    * persist MEMORY_AND_DISK — computed once, spills instead of
    * OOMing, and (unlike eager localCheckpoint) keeps full lineage so
    * a lost executor's blocks recompute from source instead of
    * killing the job. The InMemoryRelation also keeps column pruning,
    * which iterative truncation would lose. */
  val defaultPersist: DataFrame => DataFrame =
    df => df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Default `materialize` hook for ITERATIVE lineages (each round
    * builds on the last): the loop needs PLAN TRUNCATION, not just
    * caching — under plain persist, round k's logical plan still nests
    * all k-1 predecessors (cache substitution is physical), so
    * analysis/optimizer cost grows every round: measured 2x on x19 at
    * sf0.1. The safe way to truncate depends on where we run, so this
    * hook picks per environment:
    *
    *  - local master: eager `localCheckpoint` — flat lineage per
    *    round, and its one weakness (blocks pinned to executors, an
    *    executor loss kills the job) cannot occur in a single-JVM
    *    master, where any "executor" loss is already job loss;
    *  - cluster WITH a checkpoint dir: eager reliable `checkpoint` —
    *    same flat lineage, blocks in fault-tolerant storage (the
    *    GraphX/graphframes recipe for iterative passes);
    *  - cluster WITHOUT a checkpoint dir: persist MEMORY_AND_DISK —
    *    keeps full lineage (safe), accepts the growing-plan analysis
    *    cost. Set a checkpoint dir for long iterative runs.
    */
  val defaultMaterialize: DataFrame => DataFrame = df => {
    val sc = df.sparkSession.sparkContext
    // MEMORY_AND_DISK_SER, not the default deserialized level: the
    // local checkpoint's unroll buffer is then serialized bytes (the
    // ~5x smaller Tungsten row form) and evicts to disk under
    // pressure, so label propagation DEGRADES TO SPILL instead of
    // dying — at sf10 the deserialized form OOMed a 32 GiB single JVM
    // (32 concurrent tasks unrolling ~550 MiB blocks, SCALE.md); the
    // serialized form completes there with headroom. The extra
    // deser cost per round is noise next to the round's join+agg.
    if (sc.isLocal) df.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    else if (sc.getCheckpointDir.isDefined) df.checkpoint(true)
    else defaultPersist(df)
  }

  /** [[defaultMaterialize]] whose result is guaranteed to have been
    * MATERIALIZED BY AN ACTION before this returns — required by
    * every site that rides an `observe()` metric on the
    * materialization job (the Graph.scala convergence probes and
    * max-normalizer): an Observation only completes when a query
    * execution actually RUNS over the observed plan. The local and
    * checkpoint-dir paths already run one (eager localCheckpoint /
    * reliable checkpoint); the cluster-without-checkpoint-dir
    * fallback was a LAZY persist, which runs no job — the observed
    * metric would never materialize and the caller's loud
    * empty-metric guard would throw on every call in that
    * environment. Here that fallback persists and then drains the
    * plan through one noop-sink write (touches every partition, so
    * the cache is fully populated AND the observation completes),
    * keeping lineage exactly as [[defaultPersist]] does. */
  val defaultMaterializeActioned: DataFrame => DataFrame = df => {
    val sc = df.sparkSession.sparkContext
    if (sc.isLocal || sc.getCheckpointDir.isDefined) defaultMaterialize(df)
    else {
      val p = defaultPersist(df)
      p.write.format("noop").mode("overwrite").save()
      p
    }
  }

  // ---- SimHash ------------------------------------------------------

  /** SimHash banding parameters: a 64-bit signature split into `bands`
    * equal-width bands. Pigeonhole recall guarantee: a pair within
    * Hamming distance d ≤ bands-1 differs in at most d bands, so it
    * shares ≥ 1 INTACT band and meets in that band's bucket — exact
    * recall for the ≤ maxHamming ball as long as maxHamming < bands
    * (enforced). Default 4 bands of 16 bits = 65536 buckets per band
    * (the Manku/Google web-dedup shape): bucket occupancy is ~n/2^16,
    * versus the n/256 a byte-banded 32-bit signature degrades to —
    * that difference is what keeps the bucket self-join from going
    * quadratic at web scale. `maxBucket` caps each bucket at its
    * lowest ids (see [[simHashBucketOverflow]] — capping is never
    * silent). */
  final case class SimHashParams(bands: Int = 4, maxHamming: Int = 3,
      maxBucket: Int = 1000) {
    require(bands >= 2 && 64 % bands == 0,
      "bands must be a divisor of 64, >= 2")
    require(maxHamming >= 0 && maxHamming < bands,
      "exact recall by pigeonhole needs maxHamming < bands")
    /** Band width in bits. */
    val width: Int = 64 / bands
    /** Low-`width`-bits mask; applied AFTER the arithmetic shift so
      * sign-extension bits never reach the band key (same trick in the
      * DuckDB oracle, making the key shift-semantics-agnostic). */
    val mask: Long = (1L << width) - 1
  }

  /** 64-bit SimHash over distinct whitespace tokens: bit j of the
    * signature is the sign of sum over tokens of ±1 according to bit j
    * of the token's hash. Bits 0-31 draw from the first 60-bit md5
    * half, bits 32-63 from the independent second half, so all 64 bits
    * come out of ONE md5 evaluation per distinct token. The signature
    * is assembled with bitwise OR of disjoint powers of two (no
    * additive overflow to reason about under ANSI mode; bit 63 makes
    * the long negative by two's complement, which both engines'
    * xor/bit_count treat identically). */
  def simHash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(array_distinct(wsTokens(col(textCol)))).as("t"))
      .select(col(idCol), md5Hash60(col("t")).as("ha"),
        md5Hash60b(col("t")).as("hb"))
    val aggCols = (0 until 32).map(j => bitSum("ha", j).as(s"c$j")) ++
      (0 until 32).map(j => bitSum("hb", j).as(s"c${32 + j}"))
    val sums = toks.groupBy(col(idCol)).agg(aggCols.head, aggCols.tail: _*)
    val sig = (0 until 64)
      .map(j => when(col(s"c$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    sums.select(col(idCol), sig.as("simhash"))
  }

  private def bitSum(h: String, j: Int): Column =
    sum(when(shiftright(col(h), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))

  /** SimHash near-dup pairs: band-bucketed candidate generation over
    * the 64-bit signature + exact Hamming filter. The pair join is an
    * equi-join on (band, band key) — never all-pairs — and recall for
    * Hamming ≤ p.maxHamming is exact by pigeonhole (SimHashParams).
    * Signatures ride the join (no re-join), and each bucket is capped
    * at its `p.maxBucket` lowest ids by the two-phase sharded rank
    * (see [[cappedBands]] — a viral bucket never funnels through one
    * window task; phase 2 ranks on the SAME (band, bkey) key the
    * join shuffles on) — mirroring minHashNearDupPairs. Overflow is
    * not silent: run [[simHashBucketOverflow]] alongside. */
  def simHashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      p: SimHashParams = SimHashParams()): DataFrame =
    simHashNearDupPairsFromBands(simHashBandKeys(docs, idCol, textCol, p),
      idCol, p)

  /** Pair generation over a precomputed [[simHashBandKeys]] frame —
    * persist the banded frame once and feed BOTH this and
    * [[simHashBucketOverflowFromBands]], so the signature pipeline
    * (the dominant cost) runs once per dedup pass, not twice. */
  def simHashNearDupPairsFromBands(bands: DataFrame, idCol: String,
      p: SimHashParams = SimHashParams()): DataFrame = {
    // MERGE-hinted for the same reason as minHashNearDupPairs' self-
    // join (see its scaladoc): as an SMJ both sides reuse ONE
    // exchange and the signature pipeline computes once
    val capped = Caps.twoPhaseRank(bands,
      Seq(col("band"), col("bkey")), Seq(col(idCol)),
      md5Hash60b(col(idCol).cast("string")), p.maxBucket).hint("merge")
    val cand = capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .distinct()
    cand.select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= p.maxHamming)
  }

  /** Diagnostic for the SimHash bucket cap: (band, bkey, n_docs) for
    * every band bucket larger than `p.maxBucket` — run alongside the
    * pair query so capping is never a silent truncation. Recomputes
    * signatures from raw docs; on a shared pass use
    * [[simHashBucketOverflowFromBands]] with the same banded frame. */
  def simHashBucketOverflow(docs: DataFrame, idCol: String, textCol: String,
      p: SimHashParams = SimHashParams()): DataFrame =
    simHashBucketOverflowFromBands(simHashBandKeys(docs, idCol, textCol, p), p)

  /** Overflow diagnostic over a precomputed [[simHashBandKeys]] frame. */
  def simHashBucketOverflowFromBands(bands: DataFrame,
      p: SimHashParams = SimHashParams()): DataFrame =
    bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > p.maxBucket)

  /** Long-form (id, simhash, band, bkey) band keys: band b's key is
    * signature bits [b*width, (b+1)*width) — arithmetic shift then
    * mask, so the sign bit never leaks into a key. The shared input
    * of the pair join and the overflow diagnostic. */
  def simHashBandKeys(docs: DataFrame, idCol: String, textCol: String,
      p: SimHashParams = SimHashParams()): DataFrame = {
    val bandCols = (0 until p.bands).map(b =>
      shiftright(col("simhash"), p.width * b).bitwiseAND(lit(p.mask))
        .as(s"b$b"))
    simHash64(docs, idCol, textCol)
      .select(Seq(col(idCol), col("simhash")) ++ bandCols: _*)
      .unpivot(Array(col(idCol), col("simhash")),
        (0 until p.bands).map(b => col(s"b$b")).toArray, "band", "bkey")
  }

  /** `1L << j` as a DuckDB BIGINT literal. DuckDB refuses `1 << 63`
    * (overflow check), so bit 63 is spelled as the two's-complement
    * min-long expression instead. */
  private def duckBitLit(j: Int): String =
    if (j == 63) "(-9223372036854775807 - 1)" else (1L << j).toString

  /** DuckDB oracle SQL mirroring simHash64. */
  def simHashOracleSql(table: String, idCol: String, textCol: String): String = {
    val sums = ((0 until 32).map(j =>
      s"CAST(sum(CASE WHEN (ha >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS c$j") ++
      (0 until 32).map(j =>
        s"CAST(sum(CASE WHEN (hb >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS c${32 + j}"))
      .mkString(", ")
    val sig = (0 until 64)
      .map(j => s"(CASE WHEN c$j >= 0 THEN ${duckBitLit(j)} ELSE 0 END)")
      .mkString(" | ")
    s"""WITH toks AS (
       |  SELECT DISTINCT $idCol, unnest(string_split_regex(trim($textCol), '\\s+')) AS t
       |  FROM $table),
       |hashed AS (
       |  SELECT $idCol, ('0x' || substr(md5(t), 1, 15))::BIGINT AS ha,
       |         ('0x' || substr(md5(t), 17, 15))::BIGINT AS hb
       |  FROM toks),
       |sums AS (SELECT $idCol, $sums FROM hashed GROUP BY $idCol)
       |SELECT $idCol, CAST($sig AS BIGINT) AS simhash FROM sums
       |ORDER BY $idCol""".stripMargin
  }

  /** DuckDB oracle SQL mirroring simHashNearDupPairs exactly,
    * including the band parameterization and the bucket cap. */
  def simHashPairsOracleSql(table: String, idCol: String, textCol: String,
      p: SimHashParams = SimHashParams()): String = {
    val sig = simHashOracleSql(table, idCol, textCol)
      .replace("\n", "\n    ")
    val bandExprs = (0 until p.bands).map(b =>
      s"SELECT $idCol AS id, simhash, $b AS band, " +
        s"(simhash >> ${p.width * b}) & ${p.mask} AS bkey FROM sig")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH sig AS (
       |  SELECT * FROM (
       |    $sig)),
       |bands AS (
       |  $bandExprs),
       |capped AS (
       |  SELECT id, simhash, band, bkey FROM (
       |    SELECT *, row_number() OVER (PARTITION BY band, bkey
       |                                 ORDER BY id) AS rn
       |    FROM bands) ranked
       |  WHERE rn <= ${p.maxBucket}),
       |cand AS (
       |  SELECT DISTINCT x.id AS id_a, y.id AS id_b,
       |         x.simhash AS sa, y.simhash AS sb
       |  FROM capped x JOIN capped y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id)
       |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= ${p.maxHamming}
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---- line-level boilerplate removal ------------------------------

  /** Lines occurring in at least `minDocs` DISTINCT documents — the
    * C4-style boilerplate set (navigation chrome, license banners,
    * cookie notices repeat across a crawl; real prose does not).
    * Blank/whitespace-only lines are structure, not boilerplate —
    * they are excluded, or every paragraph separator in the corpus
    * would be classified boilerplate and stripped. One explode + one
    * groupBy on the line text. */
  def boilerplateLines(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Long = 2L): DataFrame =
    boilerplateFromLines(docLines(docs, idCol, textCol), idCol, minDocs)

  private def boilerplateFromLines(lines: DataFrame, idCol: String,
      minDocs: Long): DataFrame =
    lines.filter(trim(col("line")) =!= "")
      .groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Rebuild each document keeping only its non-boilerplate lines (in
    * original order; documents reduced to nothing keep an empty
    * text). The exploded lines frame feeds BOTH the boilerplate
    * aggregate and the removal anti-join — two consumers, so by
    * default the scan + explode runs twice; recomputation keeps full
    * lineage (the [[exactSubstringDedup]] policy — an eager
    * localCheckpoint would pin blocks to executor-local storage and
    * die with the executor). Callers for whom the double scan
    * dominates pass `materialize = _.persist(...)` or a checkpoint
    * hook. The anti-join is broadcast-friendly on the line text, and
    * reassembly sorts each doc's surviving (pos, line) pairs locally
    * — state per group is one document's lines. */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Long = 2L,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    val lines = materialize(docLines(docs, idCol, textCol))
    val bp = boilerplateFromLines(lines, idCol, minDocs).select(col("line"))
    val rebuilt = lines.join(bp, Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")),
        "\n").as("__kept"))
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__kept"), lit("")).as(textCol))
  }

  /** (id, pos, line) — documents exploded into 0-indexed lines. */
  private def docLines(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))

  // ---- exact n-gram Jaccard ----------------------------------------

  /** Exact character-n-gram Jaccard for given candidate pairs.
    * `pairs` must have columns (id_a, id_b). */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, n: Int,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    // the per-doc gram-set frame feeds BOTH join sides (a doc appears
    // as id_a and id_b), and the sides join on different keys, so no
    // exchange is shareable — under the identity default the
    // charShingles projection over the corpus text runs twice;
    // `materialize` cuts it to one pass
    val g = materialize(
      docs.select(col(idCol), charShingles(col(textCol), n).as("grams")))
    val ga = g.select(col(idCol).as("id_a"), col("grams").as("grams_a"))
    val gb = g.select(col(idCol).as("id_b"), col("grams").as("grams_b"))
    pairs.join(ga, "id_a").join(gb, "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("grams_a"), col("grams_b"))).as("i"),
        size(col("grams_a")).as("na"), size(col("grams_b")).as("nb"))
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i")))
          .as("jaccard"))
  }

  // ---- benchmark decontamination -----------------------------------

  /** Distinct (id, 60-bit word-n-gram hash) pairs of a corpus. The
    * per-document gram set is already distinct from the shingle
    * transform (array_distinct), so no extra shuffle-distinct is
    * needed — explode is map-side only. */
  private def gramHashes(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val toks = docs.select(col(idCol), trim(col(textCol)).as("__t"),
      wsTokens(col(textCol)).as("__tk"))
    toks.select(col(idCol),
        explode(wordShinglesFromTokens(col("__tk"), col("__t"), n)).as("g"))
      .select(col(idCol), md5Hash60(col("g")).as("gram_h"))
  }

  /** Benchmark-decontamination scores: for each training document, the
    * fraction of its distinct word `n`-grams that appear ANYWHERE in
    * the eval/benchmark set — the standard "n-gram overlap" test-set
    * leakage check run before LLM training.
    *
    * Output: (id, n_grams, n_matched, overlap_frac).
    *
    * Scale shape: eval suites are MBs while corpora are TBs, so the
    * distinct eval gram-hash set (60-bit longs, deduped) is BROADCAST;
    * scoring is then a map-side hash join on gram_h plus one keyed
    * groupBy on doc id — the corpus text itself is never shuffled and
    * nothing is ever all-pairs. */
  def contaminationScores(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val evalGrams = gramHashes(evalSet, idCol, textCol, n)
      .select(col("gram_h")).distinct()
      .withColumn("__hit", lit(1L))
    gramHashes(corpus, idCol, textCol, n)
      .join(broadcast(evalGrams), Seq("gram_h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_matched"))
      .withColumn("overlap_frac",
        col("n_matched").cast("double") / col("n_grams"))
  }

  /** Drop contaminated training documents: rows whose
    * [[contaminationScores]] overlap reaches `maxOverlap` are removed
    * by one anti-join on the id. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int = 3, maxOverlap: Double = 0.5): DataFrame =
    corpus.join(
      contaminationScores(corpus, evalSet, idCol, textCol, n)
        .filter(col("overlap_frac") >= maxOverlap)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** The overflow-style companion report: which EVAL items were hit,
    * by how many training docs, and how hard. A training doc "hits" an
    * eval doc when they share ≥ `minShared` distinct gram hashes.
    * Output: (eval_id, n_train_hits, max_shared).
    *
    * Same broadcast shape as [[contaminationScores]] — the per-pair
    * groupBy keys on (eval_id, train id), which is bounded by
    * candidate pairs that actually share grams, not by |corpus|×|eval|. */
  def contaminationReport(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      minShared: Int = 3): DataFrame = {
    val evalGrams = gramHashes(evalSet, idCol, textCol, n)
      .select(col(idCol).as("eval_id"), col("gram_h"))
    gramHashes(corpus, idCol, textCol, n)
      .join(broadcast(evalGrams), Seq("gram_h"))
      .groupBy(col("eval_id"), col(idCol))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_train_hits"),
        max(col("n_shared")).as("max_shared"))
  }

  // ---- exact-substring (span) dedup --------------------------------

  /** Exact duplicated-SPAN removal: any `l`-token window whose text
    * occurs more than once in the corpus (across documents or repeated
    * within one) is a duplicated span; every occurrence except the
    * globally first — lowest (id, position) — is removed token-wise
    * from its document, and the survivors are reassembled in order.
    *
    * This is the ExactSubstr operation of Lee et al., "Deduplicating
    * Training Data Makes Language Models Better" (ACL 2022), §4.1,
    * re-expressed for a shuffle engine: the paper builds a corpus-wide
    * suffix array (inherently sequential, memory-heavy) to find
    * duplicated substrings of length ≥ L; hashing every L-token
    * rolling window and grouping on the 60-bit window hash finds the
    * same ≥ L duplications as pure keyed dataflow — window extraction
    * is an in-row projection, duplicate detection is ONE shuffle keyed
    * on the window hash, and removal is one groupBy(id) whose state is
    * a single document's duplicate starts. Nothing is ever pairwise
    * and no task ever holds more than one document.
    *
    * Output: (id, n_tokens, n_dup_tokens, textCol) with textCol the
    * cleaned document — surviving tokens joined by single spaces
    * (whitespace is canonicalized for every row, so cleaned and
    * untouched documents are directly comparable).
    *
    * Documents shorter than `l` tokens pass through unchanged. Token
    * coverage is computed in-row from the (few) duplicate starts via
    * position-set membership; a pathological row where duplicates
    * cover most of a very long document costs O(n_tokens × n_starts)
    * in that row only — switch to a sorted-interval merge fold if a
    * corpus ever exhibits that shape.
    *
    * The tokenized base frame feeds BOTH the window-extraction arm and
    * the final reassembly join, so by default the scan + split runs
    * twice — deliberate: recomputation keeps full lineage (any lost
    * partition is rebuilt from source), whereas an eager
    * localCheckpoint would pin blocks to executor-local storage and
    * die with the executor. Callers for whom the double scan is the
    * dominant cost can pass `materialize = _.persist(StorageLevel.
    * DISK_ONLY)` (and unpersist afterwards) — persist caches WITHOUT
    * truncating lineage. */
  def exactSubstringDedup(docs: DataFrame, idCol: String, textCol: String,
      l: Int = 8, materialize: DataFrame => DataFrame = identity)
      : DataFrame = {
    require(l >= 2, s"window length must be >= 2, got $l")

    // (id, tokens, n) — feeds window extraction AND reassembly.
    val base = materialize(docs
      .select(col(idCol), wsTokens(col(textCol)).as("__tk"))
      .withColumn("__n", size(col("__tk")).cast("int")))

    // All L-token window hashes, in-row. sequence(1, 0) would count
    // DOWNWARD, so short docs get an explicit empty array.
    val winArr = when(col("__n") >= l,
        transform(sequence(lit(1), col("__n") - (l - 1)),
          i => md5Hash60(array_join(slice(col("__tk"), i, lit(l)), " "))))
      .otherwise(array().cast("array<bigint>"))
    // wins feeds TWO consumers since the r17 de-windowing (the
    // per-hash stats aggregate and the join-back), so it goes through
    // `materialize` like base — identity by default (recompute keeps
    // full lineage; the work is embarrassingly parallel map-side
    // tokenize+hash), persist via the hook where the double compute
    // dominates.
    val wins = materialize(base
      .select(col(idCol), posexplode(winArr).as(Seq("__p0", "win_h")))
      .select(col(idCol), (col("__p0") + 1).cast("int").as("pos"),
        col("win_h")))

    // Occurrences beyond the globally first of a >1-occurrence window
    // are removals. The per-hash count and first-occurrence election
    // are ONE map-side-partial aggregate joined back on win_h — NOT a
    // pair of hash-keyed window functions: a viral L-token window
    // (license boilerplate in hundreds of millions of docs) would pull
    // every occurrence through a single WindowExec task, while the
    // aggregate reduces it map-side and the join-back is
    // AQE-skew-splittable (the class doc's "AQE handles the skew"
    // holds for joins; it never held for windows).
    val stats = wins.groupBy(col("win_h"))
      .agg(count(lit(1)).as("__cnt"),
        min(struct(col(idCol), col("pos"))).as("__first"))
    val removals = wins.join(stats, Seq("win_h"))
      .filter(col("__cnt") > 1 &&
        struct(col(idCol), col("pos")) =!= col("__first"))
      .select(col(idCol), col("pos"))

    // Per-doc covered token positions (distinct union of the removed
    // windows' [pos, pos+l-1] ranges), then in-row rebuild.
    val covered = removals.groupBy(col(idCol))
      .agg(array_distinct(flatten(collect_list(
        sequence(col("pos"), col("pos") + (l - 1))))).as("__cov"))
    val cov = coalesce(col("__cov"), array().cast("array<int>"))
    base.join(covered, Seq(idCol), "left")
      .select(col(idCol),
        col("__n").cast("long").as("n_tokens"),
        size(cov).cast("long").as("n_dup_tokens"),
        array_join(
          transform(
            filter(sequence(lit(1), col("__n")),
              i => !array_contains(cov, i)),
            i => element_at(col("__tk"), i)),
          " ").as(textCol))
  }

  /** MAXIMAL duplicated spans — the multi-length form of the
    * ExactSubstr machinery (Lee et al. 2022 §4.1): where
    * [[exactSubstringDedup]] reports fixed-`l` window coverage, this
    * returns, per document, each maximal run of tokens every position
    * of which lies inside SOME duplicated `l`-window occurrence — i.e.
    * the duplicated substrings of length ≥ l themselves, at their full
    * length (a 100-token copied paragraph is ONE span row of
    * span_tokens=100, not 93 window hits). This is the audit/report
    * companion: removal policy stays [[exactSubstringDedup]]'s.
    *
    * Two-pass, same shuffle budget as the fixed form: pass 1 finds
    * seed windows (one exchange keyed on the 60-bit window hash —
    * `firstOnly` controls whether the globally-first occurrence
    * counts as duplicated); pass 2 EXTENDS-AND-MERGES seeds into
    * maximal spans with the gaps-and-islands pattern over one
    * per-document window (one exchange keyed on id; island state is a
    * single document's seed starts). Overlapping and back-to-back
    * windows merge because consecutive seed starts p, p' with
    * p' ≤ p + l cover a contiguous token range.
    *
    * Output: (id, span_start, span_end, span_tokens, n_windows) —
    * positions 1-based inclusive, n_windows = seed windows merged
    * into the span. */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      l: Int = 8, firstOnly: Boolean = false,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(l >= 2, s"window length must be >= 2, got $l")
    import org.apache.spark.sql.expressions.Window

    val base = docs
      .select(col(idCol), wsTokens(col(textCol)).as("__tk"))
      .withColumn("__n", size(col("__tk")).cast("int"))
    val winArr = when(col("__n") >= l,
        transform(sequence(lit(1), col("__n") - (l - 1)),
          i => md5Hash60(array_join(slice(col("__tk"), i, lit(l)), " "))))
      .otherwise(array().cast("array<bigint>"))
    // two consumers since the r17 de-windowing (stats + join-back) —
    // see exactSubstringDedup's wins note
    val wins = materialize(base
      .select(col(idCol), posexplode(winArr).as(Seq("__p0", "win_h")))
      .select(col(idCol), (col("__p0") + 1).cast("int").as("pos"),
        col("win_h")))

    // pass 1: duplicated seed windows. firstOnly=true reproduces the
    // removal policy's view (globally-first occurrence not a dup);
    // false is the audit view (EVERY occurrence of a duplicated
    // window is part of a duplicated span, including the original).
    // Same skew-safe shape as [[exactSubstringDedup]]'s removal
    // election: one map-side-partial aggregate per hash, joined back
    // (AQE-splittable) instead of hash-keyed window functions that
    // would funnel a viral window's occurrences through one task.
    val stats = wins.groupBy(col("win_h"))
      .agg(count(lit(1)).as("__cnt"),
        min(struct(col(idCol), col("pos"))).as("__first"))
    val joined = wins.join(stats, Seq("win_h"))
    val seeds = (if (firstOnly)
        joined.filter(col("__cnt") > 1 &&
          struct(col(idCol), col("pos")) =!= col("__first"))
      else joined.filter(col("__cnt") > 1))
      .select(col(idCol), col("pos"))

    // pass 2: gaps-and-islands per document. A seed at p covers
    // [p, p+l-1]; the running max of PRIOR covered ends decides
    // whether this seed extends the current span or opens a new one.
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prevEnd = max(col("pos") + (l - 1))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = seeds
      .withColumn("__new",
        when(prevEnd.isNull || col("pos") > prevEnd + 1, 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(byDoc))
    flagged.groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (l - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol),
        col("span_start").cast("long").as("span_start"),
        col("span_end").cast("long").as("span_end"),
        (col("span_end") - col("span_start") + 1).cast("long")
          .as("span_tokens"),
        col("n_windows"))
  }

  /** DuckDB twin of [[duplicateSpans]] over `table` — the same
    * seed-then-islands derivation in windowed SQL. */
  def duplicateSpansOracleSql(table: String, idCol: String,
      textCol: String, l: Int = 8, firstOnly: Boolean = false): String = {
    val seedPred = if (firstOnly) "cnt > 1 AND rn > 1" else "cnt > 1"
    s"""WITH base AS (
       |  SELECT $idCol, string_split_regex(trim($textCol), '\\s+') AS tk,
       |    len(string_split_regex(trim($textCol), '\\s+')) AS n
       |  FROM $table),
       |wins AS (
       |  SELECT $idCol, s AS pos,
       |    ('0x' || substr(md5(array_to_string(
       |       list_slice(tk, s, s + ${l - 1}), ' ')), 1, 15))::BIGINT AS win_h
       |  FROM (SELECT $idCol, tk, unnest(range(1, n - ${l - 1} + 1)) AS s
       |        FROM base WHERE n >= $l)),
       |marked AS (
       |  SELECT $idCol, pos,
       |    count(*) OVER (PARTITION BY win_h) AS cnt,
       |    row_number() OVER (PARTITION BY win_h
       |                       ORDER BY $idCol, pos) AS rn
       |  FROM wins),
       |seeds AS (SELECT $idCol, pos FROM marked WHERE $seedPred),
       |flagged AS (
       |  SELECT $idCol, pos,
       |    CASE WHEN max(pos + ${l - 1}) OVER (PARTITION BY $idCol
       |        ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND
       |        1 PRECEDING) IS NULL
       |      OR pos > max(pos + ${l - 1}) OVER (PARTITION BY $idCol
       |        ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND
       |        1 PRECEDING) + 1
       |      THEN 1 ELSE 0 END AS is_new
       |  FROM seeds),
       |islands AS (
       |  SELECT $idCol, pos,
       |    sum(is_new) OVER (PARTITION BY $idCol ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS island
       |  FROM flagged)
       |SELECT $idCol,
       |  CAST(min(pos) AS BIGINT) AS span_start,
       |  CAST(max(pos) + ${l - 1} AS BIGINT) AS span_end,
       |  CAST(max(pos) + ${l - 1} - min(pos) + 1 AS BIGINT)
       |    AS span_tokens,
       |  count(*) AS n_windows
       |FROM islands GROUP BY $idCol, island
       |ORDER BY $idCol, span_start""".stripMargin
  }

  /** DuckDB twin of [[exactSubstringDedup]] over `table`. */
  def exactSubstringOracleSql(table: String, idCol: String,
      textCol: String, l: Int = 8): String =
    s"""WITH base AS (
       |  SELECT $idCol, string_split_regex(trim($textCol), '\\s+') AS tk,
       |    len(string_split_regex(trim($textCol), '\\s+')) AS n
       |  FROM $table),
       |wins AS (
       |  SELECT $idCol, s AS pos,
       |    ('0x' || substr(md5(array_to_string(
       |       list_slice(tk, s, s + ${l - 1}), ' ')), 1, 15))::BIGINT AS win_h
       |  FROM (SELECT $idCol, tk, unnest(range(1, n - ${l - 1} + 1)) AS s
       |        FROM base WHERE n >= $l)),
       |marked AS (
       |  SELECT $idCol, pos,
       |    count(*) OVER (PARTITION BY win_h) AS cnt,
       |    row_number() OVER (PARTITION BY win_h
       |                       ORDER BY $idCol, pos) AS rn
       |  FROM wins),
       |cov AS (
       |  SELECT $idCol,
       |    list_distinct(flatten(list(range(pos, pos + $l)))) AS covered
       |  FROM marked WHERE cnt > 1 AND rn > 1 GROUP BY $idCol)
       |SELECT b.$idCol, CAST(b.n AS BIGINT) AS n_tokens,
       |  CAST(coalesce(len(c.covered), 0) AS BIGINT) AS n_dup_tokens,
       |  coalesce(array_to_string(
       |    list_transform(
       |      list_filter(range(1, b.n + 1),
       |        i -> NOT list_contains(coalesce(c.covered, []), i)),
       |      i -> b.tk[i]),
       |    ' '), '') AS $textCol
       |FROM base b LEFT JOIN cov c USING ($idCol)
       |ORDER BY $idCol""".stripMargin

  // ---- prefix-filter set-similarity join (exact Jaccard) -----------

  /** Per-document distinct word-shingle sets ordered by ascending
    * GLOBAL shingle frequency (rarest first, shingle tie-break) —
    * the input both [[prefixFilterCandidates]] and
    * [[prefixFilterVerify]] consume. Columns: (idCol, `toks`
    * frequency-ordered array, `sz`). Callers running both stages
    * should persist this frame (one corpus scan; the x64 materialize
    * pattern) — the functions take it as input precisely so
    * materialization stays in the caller's hands.
    *
    * The exploded (id, shingle) frame INSIDE this builder forks to
    * two consumers (the global frequency aggregate and the join-back
    * that orders each document's set), and the two subtrees cannot
    * share an exchange (one aggregates before its exchange) — so the
    * tokenize+shingle pass over the corpus text runs twice under the
    * identity default. `materialize` cuts it to one pass (persist or
    * scratch the narrow (id, g) rows); at 100 TB that is a full
    * corpus-text pass saved. */
  def prefixFilterSets(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    val sh = materialize(docs
      .select(col(idCol), wsTokens(col(textCol)).as("__tk"),
        trim(col(textCol)).as("__t"))
      .select(col(idCol), explode(
        wordShinglesFromTokens(col("__tk"), col("__t"), shingleN))
        .as("g")))
    val freq = sh.groupBy(col("g")).agg(count(lit(1)).as("f"))
    sh.join(freq, "g")
      .groupBy(col(idCol))
      .agg(transform(
          sort_array(collect_list(struct(col("f"), col("g")))),
          x => x.getField("g")).as("toks"),
        count(lit(1)).as("sz"))
  }

  /** Candidate pairs via prefix filtering (Chaudhuri et al. 2006;
    * Bayardo et al. 2007 All-Pairs; Xiao et al. 2008 PPJoin): a
    * document's PREFIX is its first `|d| - ceil(t·|d|) + 1`
    * frequency-ordered shingles, and two sets with Jaccard >= t MUST
    * share a prefix element — so this is the EXACT-threshold
    * complement to the probabilistic MinHash path: every true pair
    * is a candidate, no false negatives, and the knob is candidate
    * volume, not recall.
    *
    * Scale shape: the only quadratic-risk stage is the equi-join on
    * prefix shingles, and the rarest-first ordering is precisely
    * what bounds it — a shingle enters prefixes in proportion to its
    * rarity, so hot shingles (huge posting lists) are exactly the
    * ones prefixes exclude. A pathological flood (millions of
    * identical documents) still concentrates one key; the LSH-path
    * bucket caps apply unchanged if that regime is expected. */
  def prefixFilterCandidates(sets: DataFrame, idCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1], got $threshold")
    val prefLen =
      (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
    val pref = sets.select(col(idCol),
      explode(slice(col("toks"), lit(1), prefLen)).as("p"))
    pref.as("a").join(pref.as("b"),
        col("a.p") === col("b.p") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Exact-Jaccard adjudication of candidate pairs against the full
    * sets: one keyed join per side, `|a∩b| / (|a|+|b|-|a∩b|)`,
    * keep >= t. With [[prefixFilterCandidates]] this is a COMPLETE
    * similarity self-join at threshold t. */
  def prefixFilterVerify(sets: DataFrame, cands: DataFrame,
      idCol: String, threshold: Double): DataFrame = {
    val sa = sets.select(col(idCol).as("id_a"), col("toks").as("__ta"),
      col("sz").as("__sa"))
    val sb = sets.select(col(idCol).as("id_b"), col("toks").as("__tb"),
      col("sz").as("__sb"))
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("__i",
        size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
      .withColumn("jac", col("__i").cast("double") /
        (col("__sa") + col("__sb") - col("__i")).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }
}
