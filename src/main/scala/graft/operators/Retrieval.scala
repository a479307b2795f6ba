package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** BM25 ranked retrieval over a document corpus — the lexical scoring
  * half of a RAG / training-data search stack (Robertson & Zaragoza,
  * "The Probabilistic Relevance Framework: BM25 and Beyond", 2009).
  *
  * This is CLASSIC BM25, log idf included: `idf = ln((N-df+0.5)/
  * (df+0.5))` per term (negative for terms in more than half the
  * corpus — standard Robertson behaviour, kept as-is). An earlier
  * draft kept the idf un-logged for bit-exactness, but summing raw
  * odds ratios across terms is NOT order-equivalent to summing
  * log-idf scores — rare terms would dominate ~N/df instead of
  * ln(N/df) — so multi-term rankings could diverge materially from
  * real BM25. Instead, cross-engine determinism is handled at the
  * output boundary: the final score is rounded to 6 dp on BOTH
  * engines before it is ranked or compared (ln differs across libms
  * by ~1 ulp at most; at 6 dp both engines see the same number, the
  * same trick as the catalog's cos_r / margin_r columns).
  *
  * Cross-term summation order is pinned: per-doc term scores are
  * collected, sorted BY TERM, and folded left-to-right — floating
  * addition is not associative, so an unordered SUM() could differ
  * between engines/partitionings by an ULP. `aggregate` over a sorted
  * array makes the fold order part of the query's semantics.
  *
  * Scale shape: `terms` is a query literal (a handful of strings), so
  * the token scan filters to query terms BEFORE any shuffle — the
  * corpus text is never shuffled. Two keyed aggregations (tf per
  * (doc, term), df per term) + one broadcast of the tiny (term, df)
  * frame + one broadcast of the 1-row corpus stats. Top-k lands on
  * TakeOrderedAndProject, not a global sort.
  */
object Retrieval {

  /** BM25 top-`k` documents for the literal query `terms`.
    * Output: (id, score_r, n_terms_hit) with score_r the 6-dp-rounded
    * BM25 score, ordered by (score_r DESC, id), limited to `k`.
    * Documents matching no term are excluded (standard retrieval
    * semantics). Ranking and the k-boundary use the ROUNDED score so
    * both engines cut the same tail. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "query terms must be non-empty")
    require(terms.distinct.length == terms.length, "query terms must be unique")
    val id = col(idCol)

    // (id, dl, token) restricted to query terms — the only rows that
    // can contribute; everything else dies at the scan.
    val tok = docs
      .select(id, wsTokenCount(col(textCol)).as("dl"),
        explode(wsTokens(col(textCol))).as("token"))
      .filter(col("token").isin(terms: _*))

    val tf = tok.groupBy(id, col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tok.groupBy(col("token"))
      .agg(countDistinct(id).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(wsTokenCount(col(textCol))).as("sum_dl"))

    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log(((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)))
    val tfc = col("tf").cast("double") * (lit(k1) + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))

    val termScores = tf
      .join(broadcast(df), "token")
      .crossJoin(broadcast(stats))
      .select(id, col("token"), (idf * tfc).as("s"))

    // Deterministic fold: sort per-doc term scores by token, sum
    // left-to-right from 0.0; round once at the end.
    termScores.groupBy(id)
      .agg(count(lit(1)).as("n_terms_hit"),
        round(aggregate(
          transform(array_sort(collect_list(struct(col("token"), col("s")))),
            x => x.getField("s")),
          lit(0.0), (acc, x) => acc + x), 6).as("score_r"))
      .orderBy(col("score_r").desc, id)
      .limit(k)
      .select(id, col("score_r"), col("n_terms_hit"))
  }

  /** DuckDB twin of [[bm25TopK]] over table `table` — same ln idf,
    * same sorted left-to-right fold, same 6-dp rounding before rank.
    * Terms are SQL-escaped ('' doubling): this is a test-oracle
    * surface, but a term with a quote must not break the SQL. */
  def bm25OracleSql(table: String, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): String = {
    val termList = terms.map(t => s"'${t.replace("'", "''")}'")
      .mkString("[", ", ", "]")
    val k1s = java.lang.Double.toString(k1)
    val bs = java.lang.Double.toString(b)
    s"""WITH tok AS (
       |  SELECT $idCol,
       |    CAST(len(string_split_regex(trim($textCol), '\\s+')) AS BIGINT) AS dl,
       |    unnest(string_split_regex(trim($textCol), '\\s+')) AS token
       |  FROM $table),
       |qtok AS (SELECT * FROM tok WHERE list_contains($termList, token)),
       |tf AS (
       |  SELECT $idCol, dl, token, CAST(count(*) AS BIGINT) AS tf
       |  FROM qtok GROUP BY $idCol, dl, token),
       |df AS (
       |  SELECT token, CAST(count(DISTINCT $idCol) AS BIGINT) AS df
       |  FROM qtok GROUP BY token),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CAST(len(string_split_regex(trim($textCol), '\\s+'))
       |      AS BIGINT)) AS BIGINT) AS sum_dl
       |  FROM $table),
       |ts AS (
       |  SELECT t.$idCol, t.token,
       |    ln((CAST(s.n_docs - d.df AS DOUBLE) + 0.5) /
       |       (CAST(d.df AS DOUBLE) + 0.5)) *
       |    (CAST(t.tf AS DOUBLE) * ($k1s + 1.0) /
       |     (CAST(t.tf AS DOUBLE) +
       |      $k1s * (1.0 - $bs + $bs * CAST(t.dl AS DOUBLE) /
       |             (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))) AS s
       |  FROM tf t JOIN df d USING (token) CROSS JOIN stats s),
       |folded AS (
       |  SELECT $idCol, CAST(count(*) AS BIGINT) AS n_terms_hit,
       |    round(list_reduce(
       |      list_prepend(CAST(0.0 AS DOUBLE), list(s ORDER BY token)),
       |      (acc, x) -> acc + x), 6) AS score_r
       |  FROM ts GROUP BY $idCol)
       |SELECT $idCol, score_r, n_terms_hit FROM folded
       |ORDER BY score_r DESC, $idCol LIMIT $k""".stripMargin
  }

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, "Reciprocal
    * Rank Fusion outperforms Condorcet and individual Rank Learning
    * Methods", SIGIR 2009): combine several ranked lists for the SAME
    * query into one by `score(d) = Σ_lists 1/(k0 + rank_list(d))` —
    * the standard way a hybrid retrieval stack merges its lexical
    * (BM25) and dense (ANN) legs without score calibration, since RRF
    * consumes only RANK POSITIONS, never the incomparable raw scores.
    *
    * `lists` maps a tag to that retriever's ranked output, which must
    * carry columns `id` (document key) and `rank` (1-based). Output:
    * one row per document seen by ANY list — `id`, per-list ranks as
    * `<tag>_rn` (NULL where the list missed it), `rrf_r` (6-dp-rounded
    * fused score), `rn` (fused 1-based rank) — top `k` by
    * (rrf_r DESC, id).
    *
    * Determinism: the per-list terms are summed left-to-right in
    * `lists` order (a fixed expression tree, not a commutative SUM),
    * and the fused score is rounded before ranking, so both engines
    * rank the identical list. Scale shape: each input is a retriever's
    * top-k — k rows per list, NOT a corpus — so the full-outer fusion
    * joins touch ≤ Σk rows per query and the single-partition
    * row_number is over that same handful; at 100 TB the cost lives in
    * the retrievers, never here. */
  def rrfFuse(lists: Seq[(String, DataFrame)], k0: Int, k: Int): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(lists.map(_._1).distinct.length == lists.length,
      "list tags must be unique")
    require(k0 > 0 && k > 0, "k0 and k must be positive")
    val renamed = lists.map { case (tag, df) =>
      df.select(col("id"), col("rank").cast("long").as(s"${tag}_rn"))
    }
    val joined = renamed.reduceLeft(_.join(_, Seq("id"), "full_outer"))
    val score = lists.map { case (tag, _) =>
      coalesce(lit(1.0) / (lit(k0.toDouble) + col(s"${tag}_rn")), lit(0.0))
    }.reduceLeft(_ + _)
    // global row_number over ≤ Σ|lists|·k fused rows — intentionally
    // single-partition, same class as TakeOrderedAndProject's driver-k
    val w = Window.orderBy(col("rrf_r").desc, col("id"))
    joined.withColumn("rrf_r", round(score, 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** [[rrfFuse]] for a BATCH of queries — the deployment shape, where
    * a retrieval service fuses thousands of query results in one job.
    * Each list carries (`qid`, `id`, `rank`); lists join on (qid, id)
    * and the fused rank windows PARTITIONED BY qid, so per-query
    * state is ≤ Σ|lists|·k rows and queries spread across the
    * cluster — no global window, no single-partition funnel. Same
    * determinism contract as [[rrfFuse]] (fixed-order fold, 6-dp
    * rounding before the rank). */
  def rrfFusePerQuery(lists: Seq[(String, DataFrame)], k0: Int,
      k: Int): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(lists.map(_._1).distinct.length == lists.length,
      "list tags must be unique")
    require(k0 > 0 && k > 0, "k0 and k must be positive")
    val renamed = lists.map { case (tag, df) =>
      df.select(col("qid"), col("id"),
        col("rank").cast("long").as(s"${tag}_rn"))
    }
    val joined = renamed.reduceLeft(_.join(_, Seq("qid", "id"), "full_outer"))
    val score = lists.map { case (tag, _) =>
      coalesce(lit(1.0) / (lit(k0.toDouble) + col(s"${tag}_rn")), lit(0.0))
    }.reduceLeft(_ + _)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_r").desc, col("id"))
    joined.withColumn("rrf_r", round(score, 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }
}
