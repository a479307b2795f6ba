package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph centrality for crawl/corpus curation (Page et al. 1999;
  * Common Crawl ranks hosts by centrality to prioritize its frontier,
  * and domain rank is a standard quality prior in pretraining-data
  * weighting).
  *
  * PageRank here is a fixed-iteration power method expressed as keyed
  * dataflow, with every floating-point reduction ORDER-PINNED so the
  * DuckDB oracle reproduces the ranks bit-for-bit:
  *
  *  - per-iteration contributions `round(rank/out_deg, 12)` are summed
  *    per target in a TWO-PHASE sorted fold: phase 1 folds each
  *    (target, src-hash-shard) group in src order, phase 2 folds the
  *    shard partials in shard order. An unordered SUM() would differ
  *    between engines/partitionings by ULPs that the power iteration
  *    then amplifies; the two-phase shape simultaneously bounds
  *    aggregation state under IN-DEGREE SKEW — a hot page with 10^7
  *    in-links folds as `shards` bounded lists, never one giant one
  *    (the same decomposition as the g9b/x40 two-phase entries).
  *  - new ranks are `round((1-d)/n + d*sum, 12)`; the published rank
  *    is rounded once more to 6 dp, the catalog's cross-engine
  *    contract.
  *
  * Scale shape per iteration: one join of edges with ranks keyed on
  * `src` (both sides partition on src — at 100 TB pre-partition or
  * bucket the edge list and the join reuses it), one groupBy
  * (dst, shard), one groupBy dst. Nothing is ever all-pairs and no
  * task holds more than one shard of one node's in-links.
  */
object Graph {

  /** Fixed-iteration PageRank over a directed edge list (`src`,
    * `dst`), both BIGINT-like. Dangling nodes (no out-edges) simply
    * contribute nothing (their mass leaks — standard simplification
    * for fixed-iteration ranking; callers wanting strict stochastic
    * PageRank add back-edges, as x55 does by symmetrizing).
    * Returns (id, rank_r) for every node, rank_r rounded to 6 dp.
    *
    * Materialization policy (measured crossover, SCALE.md): the
    * default is IDENTITY — a fixed small iteration count evaluates as
    * ONE lazy DAG in which Catalyst's ReusedExchange dedups the
    * repeated edge/degree/node subplans and the pipeline runs without
    * per-round job barriers. Measured on the symmetrized supplier-
    * part graph at 3 iterations (32-thread JVM): lazy wins 1.9× at
    * 1.2M edges and is a wash at 12M; at 118M edges the lazy DAG goes
    * SUPER-LINEAR (fold spill + recompute pressure) and per-round
    * `Dedup.defaultMaterialize` wins 1.6× (190 s vs 303 s). Rule:
    * identity below ~10^7 edges per executor-JVM-equivalent, the
    * checkpoint hook above — and always for deep iteration counts,
    * where the un-truncated plan nests every predecessor and
    * analysis cost grows per round. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      shards: Int = 64,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val (e, nodes, n, deg) = prepare(edges, damping, shards, materialize)
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("r"))
    (0 until iters).foreach { _ =>
      ranks = materialize(nextRanks(e, deg, nodes, n, ranks, damping, shards))
    }
    ranks.select(col("id"), round(col("r"), 6).as("rank_r"))
  }

  /** One [[pageRank]] run's convergence outcome. */
  final case class PageRankRun(ranks: DataFrame, iters: Int,
      l1Delta: Double)

  /** PageRank with an L1-delta convergence probe instead of a fixed
    * iteration count: iterates until `sum |r_i - r_{i-1}| <= tol` or
    * `maxIters`, whichever first. Each round's rank vector is
    * persisted and the delta metric rides the SAME materialization
    * job via `observe()` + one noop-sink write (the x19 pattern) — no
    * second pass and no extra count Exchange per round. The persisted
    * previous round is released as soon as its successor lands, so
    * steady state holds exactly two rank vectors (2×|nodes| rows).
    *
    * Convergence mode implies per-round actions by construction, so
    * the lazy-DAG option [[pageRank]] defaults to does not exist
    * here. Each round's rank vector is also LINEAGE-TRUNCATED
    * (`Dedup.defaultMaterialize`, non-negotiable): `ranks` feeds the
    * next round TWICE (contributions and the delta join), so an
    * un-truncated plan doubles per round — exponential, an
    * analysis-time OOM by round ~30 regardless of caching. The
    * `materialize` hook covers the STATIC inputs (edges/degrees/
    * nodes), as in [[pageRank]]. Returns the final ranks (6 dp),
    * rounds run, and the last observed delta. */
  def pageRankConverged(edges: DataFrame, maxIters: Int, tol: Double,
      damping: Double = 0.85, shards: Int = 64,
      materialize: DataFrame => DataFrame = identity): PageRankRun = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    require(tol > 0, s"tol must be positive, got $tol")
    // fail fast where truncation is impossible AND the iteration
    // budget reaches the danger zone: defaultMaterialize silently
    // degrades to persist on a cluster with no checkpoint dir, and
    // persist does NOT truncate — the doubling plan would resurface
    // as the analysis-time OOM this operator exists to prevent. For
    // small budgets (a handful of rounds) the un-truncated plan is
    // harmless, so a short-run cluster caller keeps working and gets
    // a warning instead of a regression.
    val sc = edges.sparkSession.sparkContext
    val truncatable = sc.isLocal || sc.getCheckpointDir.isDefined
    if (!truncatable && maxIters > 10)
      throw new IllegalArgumentException(
        "pageRankConverged needs lineage truncation every round at " +
          s"maxIters=$maxIters; on a cluster set a checkpoint dir " +
          "(sparkContext.setCheckpointDir) first — without one the " +
          "per-round plan doubles (ranks feeds the next round twice) " +
          "and analysis OOMs by ~30 rounds")
    else if (!truncatable)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"pageRankConverged: no checkpoint dir — plan truncation " +
          s"degrades to persist; fine for maxIters=$maxIters, set " +
          "sparkContext.setCheckpointDir before raising the budget")
    val (e, nodes, n, deg) = prepare(edges, damping, shards, materialize)
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("r"))
    var itersRun = 0
    var delta = Double.MaxValue
    while (itersRun < maxIters && delta > tol) {
      val stepped = nextRanks(e, deg, nodes, n, ranks, damping, shards)
        .join(ranks.select(col("id"), col("r").as("__prev")), Seq("id"))
      val obs = new org.apache.spark.sql.Observation()
      // ONE action per round: the delta probe rides the truncation
      // job itself (observe under the projection the checkpoint
      // materializes — CollectMetrics completes with the checkpoint's
      // internal action), replacing the former persist + separate
      // noop-sink pass + unpersist (hitsConverged's shape; measured
      // ~13% on the x79b solo A/B, same win here). The ACTIONED
      // materializer, because the probe needs a completed job even on
      // the persist fallback (plain persist is lazy — no job, no
      // metric, spurious empty-metric throw).
      ranks = Dedup.defaultMaterializeActioned(
        stepped.observe(obs, sum(abs(col("r") - col("__prev"))).as("l1"))
          .select(col("id"), col("r")))
      delta = {
        val m = org.apache.spark.sql.GraftBridge.observedOrEmpty(obs)
        if (m.isEmpty) throw new IllegalStateException(
          "pageRankConverged: L1 delta metric did not materialize " +
            "with the round's truncation job")
        m.get("l1") match {
          case Some(v: java.lang.Double) => v.doubleValue()
          // null metric = zero observed rows = an empty graph; converged
          case _ => 0.0
        }
      }
      itersRun += 1
    }
    PageRankRun(ranks.select(col("id"), round(col("r"), 6).as("rank_r")),
      itersRun, delta)
  }

  /** Shared setup: normalized src-partitioned edges, node set, node
    * count, out-degrees (exchange-free — co-partitioned with e). */
  private def prepare(edges: DataFrame, damping: Double, shards: Int,
      materialize: DataFrame => DataFrame)
      : (DataFrame, DataFrame, Double, DataFrame) = {
    require(damping > 0 && damping < 1, s"damping in (0,1), got $damping")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val e = materialize(
      edges.select(col("src").cast("long"), col("dst").cast("long"))
        .repartition(col("src")))
    val nodes = materialize(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    val n = nodes.count().toDouble
    // e is already partitioned on src, so this aggregate is
    // exchange-free and stays co-partitioned with the join below
    val deg = materialize(e.groupBy(col("src")).agg(count(lit(1)).as("__deg")))
    (e, nodes, n, deg)
  }

  /** One power iteration: the two-phase src-then-shard sorted fold. */
  private def nextRanks(e: DataFrame, deg: DataFrame, nodes: DataFrame,
      n: Double, ranks: DataFrame, damping: Double,
      shards: Int): DataFrame = {
    val contribs = e
      .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
      .join(deg, Seq("src"))
      .select(col("dst").as("id"), col("src"),
        (col("src") % shards).as("__shard"),
        round(col("r") / col("__deg"), 12).as("c"))
    // phase 1: fold each (id, shard) slice in src order
    val p1 = contribs.groupBy(col("id"), col("__shard"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("src"), col("c")))),
          x => x.getField("c")),
        lit(0.0), (acc, x) => acc + x).as("ps"))
    // phase 2: fold shard partials in shard order
    val sums = p1.groupBy(col("id"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("__shard"), col("ps")))),
          x => x.getField("ps")),
        lit(0.0), (acc, x) => acc + x).as("s"))
    nodes.join(sums, Seq("id"), "left_outer")
      .select(col("id"),
        round(lit((1.0 - damping) / n) +
          lit(damping) * coalesce(col("s"), lit(0.0)), 12).as("r"))
  }

  /** Shared CTE scaffolding for the DuckDB twins: base tables plus
    * `iters` unrolled power-iteration rounds r1..rN, each the same
    * two-phase src-then-shard sorted fold and rounding sequence as
    * [[nextRanks]]. `edgesSql` must yield columns (src, dst). */
  private def pageRankCtes(edgesSql: String, iters: Int,
      damping: Double, shards: Int,
      materializedRounds: Boolean = false): String = {
    val d = java.lang.Double.toString(damping)
    // DuckDB inlines plain CTEs; when a round is referenced more than
    // once (next round + delta + final pick, the converged twin) the
    // recursive inlining is EXPONENTIAL in rounds — r_i must be
    // MATERIALIZED there (values unchanged; a planner directive only)
    val mat = if (materializedRounds) "MATERIALIZED " else ""
    val base =
      s"""e AS (
         |  ${edgesSql.replace("\n", "\n  ")}),
         |nodes AS (
         |  SELECT DISTINCT src AS id FROM e
         |  UNION SELECT DISTINCT dst FROM e),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |deg AS (
         |  SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
         |r0 AS (SELECT id, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS id, e.src, e.src % $shards AS shard,
         |    round(r${i - 1}.r / deg.d, 12) AS c
         |  FROM e JOIN r${i - 1} ON e.src = r${i - 1}.id
         |  JOIN deg ON e.src = deg.src),
         |p$i AS (
         |  SELECT id, shard,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(c ORDER BY src)), (a, x) -> a + x) AS ps
         |  FROM c$i GROUP BY id, shard),
         |s$i AS (
         |  SELECT id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(ps ORDER BY shard)), (a, x) -> a + x) AS s
         |  FROM p$i GROUP BY id),
         |r$i AS $mat(
         |  SELECT nodes.id,
         |    round((1.0 - $d) / nn.n +
         |      $d * coalesce(s$i.s, 0.0), 12) AS r
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN s$i ON nodes.id = s$i.id)""".stripMargin
    }
    s"""$base,
       |${iterCtes.mkString(",\n")}""".stripMargin
  }

  /** DuckDB twin of [[pageRank]]: same fixed iterations unrolled as
    * CTEs, same two-phase src-then-shard sorted folds, same rounding
    * sequence. `edgesSql` must yield columns (src, dst). */
  def pageRankOracleSql(edgesSql: String, iters: Int,
      damping: Double = 0.85, shards: Int = 64): String =
    s"""WITH ${pageRankCtes(edgesSql, iters, damping, shards)}
       |SELECT id, round(r, 6) AS rank_r FROM r$iters""".stripMargin

  /** DuckDB twin of [[pageRankConverged]]: unrolls `maxIters` rounds,
    * RE-DERIVES the per-round L1 delta sum |r_i - r_{i-1}|, and picks
    * the FIRST round whose delta is <= tol (else maxIters) — so a
    * wrong Spark-side stop round diverges the hash both through the
    * emitted `iters_run` and through the rank values themselves.
    *
    * The delta sums are unordered double folds on BOTH engines
    * (Spark's Observation metric is an unordered partial-agg sum), so
    * the comparison is exact only up to ULP noise (~1e-15 relative);
    * callers must pick `tol` with a margin to the nearest achievable
    * delta that dwarfs that — x73 sits >= 2e-4 away on a tol of 2e-3.
    * The rank values inside each round stay bit-exact (sorted folds,
    * 12-dp rounds), so the gate's precision is the stop ROUND, which
    * the margin pins. */
  def pageRankConvergedOracleSql(edgesSql: String, maxIters: Int,
      tol: Double, damping: Double = 0.85, shards: Int = 64): String = {
    val t = java.lang.Double.toString(tol)
    val deltas = (1 to maxIters).map { i =>
      s"""  SELECT $i AS it,
         |    (SELECT sum(abs(a.r - b.r))
         |     FROM r$i a JOIN r${i - 1} b ON a.id = b.id) AS dlt"""
        .stripMargin
    }.mkString("\n  UNION ALL\n")
    val allR = (1 to maxIters)
      .map(i => s"  SELECT $i AS it, id, r FROM r$i")
      .mkString("\n  UNION ALL\n")
    s"""WITH ${pageRankCtes(edgesSql, maxIters, damping, shards,
         materializedRounds = true)},
       |deltas AS (
       |$deltas),
       |stop AS (
       |  SELECT coalesce(min(it), $maxIters) AS it FROM deltas
       |  WHERE dlt <= CAST($t AS DOUBLE)),
       |allr AS (
       |$allR)
       |SELECT allr.id, round(allr.r, 6) AS rank_r,
       |  CAST(stop.it AS BIGINT) AS iters_run
       |FROM allr JOIN stop ON allr.it = stop.it
       |ORDER BY id""".stripMargin
  }

  // ---- HITS (hubs & authorities) -------------------------------------

  /** One HITS half-step: fold `vals` (keyed `fromCol` -> value `v`)
    * into per-`toCol` sums over the edge list — the same two-phase
    * from-then-shard sorted fold as [[nextRanks]], so the reduction is
    * order-pinned cross-engine and bounded under degree skew — then
    * MAX-normalize: the raw per-node sums divide by their global max
    * BEFORE the 12-dp round, keeping every score in [0,1] where the
    * round is faithful (12 fractional digits on a degree-scale sum
    * overflow a double's 53-bit significand and round differently per
    * engine — measured: a 6.19e9 hub score split the engines by 1e-6).
    * max() is the one corpus-wide reduction that IS order-independent
    * in floating point, so the normalizer adds no determinism debt —
    * and it is scale-safe (map-side partial max). Nodes with no
    * incoming contribution get 0. */
  private def foldOver(e: DataFrame, nodes: DataFrame, vals: DataFrame,
      fromCol: String, toCol: String, shards: Int): DataFrame = {
    val contribs = e
      .join(vals.withColumnRenamed("id", fromCol), Seq(fromCol))
      .select(col(toCol).as("id"), col(fromCol).as("__from"),
        (col(fromCol) % shards).as("__shard"), col("v").as("c"))
    val p1 = contribs.groupBy(col("id"), col("__shard"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("__from"), col("c")))),
          x => x.getField("c")),
        lit(0.0), (acc, x) => acc + x).as("ps"))
    // sums feeds TWO consumers (the normalizer max and the node join):
    // un-truncated, each half-step's whole predecessor DAG evaluates
    // twice and the doubling compounds across 2·iters half-steps —
    // measured 22-27 s vs 6-7 s truncated on the x79 graph. Always
    // materialize; this is the pageRankConverged double-consumption
    // rule, not an option. The normalizer max RIDES the truncation
    // job via observe() (max is the one order-INdependent corpus-wide
    // FP reduction, so the observed scalar is bit-equal to the former
    // broadcast-subquery form) and lands in the plan as a literal —
    // one job per half-step instead of two. Actioned materializer:
    // the observed max needs a completed job even where truncation
    // degrades to persist (lazy — no job would ever complete the
    // metric and EVERY hits() call on such a cluster would throw).
    val obs = new org.apache.spark.sql.Observation()
    val sums = Dedup.defaultMaterializeActioned(p1.groupBy(col("id"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("__shard"), col("ps")))),
          x => x.getField("ps")),
        lit(0.0), (acc, x) => acc + x).as("s"))
      .observe(obs, max(col("s")).as("m")))
    val m = {
      val metrics = org.apache.spark.sql.GraftBridge.observedOrEmpty(obs)
      if (metrics.isEmpty) throw new IllegalStateException(
        "foldOver: normalizer max did not materialize with the " +
          "half-step's truncation job")
      metrics.get("m") match {
        case Some(v: java.lang.Double) => lit(v.doubleValue())
        // null max = empty score frame (empty edge set): keep the
        // former broadcast form's null-division semantics
        case _ => lit(null).cast("double")
      }
    }
    nodes.join(sums, Seq("id"), "left_outer")
      .select(col("id"),
        round(coalesce(col("s"), lit(0.0)) / m, 12).as("v"))
  }

  /** Fixed-iteration HITS (Kleinberg 1999): authority(v) sums the hub
    * scores of v's in-neighbors, hub(u) then sums the fresh authority
    * scores of u's out-neighbors; `iters` such rounds from h_0 = 1,
    * each half-step MAX-normalized (top score = 1.0; ranking-
    * equivalent to Kleinberg's L2 normalization, whose norm would be
    * a corpus-wide order-SENSITIVE floating-point sum — max is the
    * normalizer that stays bit-deterministic at any scale, see
    * [[foldOver]]). Same determinism contract as [[pageRank]]: every
    * reduction a two-phase sorted fold, 12-dp per round, 6-dp
    * published.
    *
    * Scale shape per round: two keyed joins + two two-phase
    * aggregations (one per direction) + one map-side-partial max;
    * nothing all-pairs, no global window, no task holds more than one
    * shard of one node's edges. Returns (id, auth_r, hub_r) for every
    * node. */
  def hits(edges: DataFrame, iters: Int, shards: Int = 64,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    // the pageRankConverged cluster guard, extended here: each
    // half-step's sums frame is lineage-truncated inside foldOver,
    // and on a cluster without a checkpoint dir that truncation
    // degrades to persist (plans nest round over round)
    val sc0 = edges.sparkSession.sparkContext
    if (!(sc0.isLocal || sc0.getCheckpointDir.isDefined) && iters > 10)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"hits: no checkpoint dir — per-half-step plan truncation " +
          s"degrades to persist at iters=$iters; set " +
          "sparkContext.setCheckpointDir before raising the budget")
    val e = materialize(
      edges.select(col("src").cast("long"), col("dst").cast("long")))
    val nodes = materialize(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    var hubs = nodes.select(col("id"), lit(1.0).as("v"))
    var auths = nodes.select(col("id"), lit(0.0).as("v"))
    // No per-half-step materialization of the returned score frame:
    // foldOver already lineage-truncates its `sums` inside (the frame
    // this returns is one thin nodes-join + projection over that
    // checkpoint), each intermediate vector is consumed exactly once
    // per round (the opposite half-step), and the final pair is
    // consumed once by the closing join — so plans stay flat without
    // it, and wrapping the thin join in the hook only added one
    // checkpoint job per half-step (2·iters extra jobs; measured
    // ~25% of x79's wall at iters=3 on the bench fixture).
    (1 to iters).foreach { _ =>
      auths = foldOver(e, nodes, hubs, "src", "dst", shards)
      hubs = foldOver(e, nodes, auths, "dst", "src", shards)
    }
    nodes
      .join(auths.withColumnRenamed("v", "__a"), Seq("id"))
      .join(hubs.withColumnRenamed("v", "__h"), Seq("id"))
      .select(col("id"), round(col("__a"), 6).as("auth_r"),
        round(col("__h"), 6).as("hub_r"))
  }

  /** Shared CTE scaffolding for the HITS twins: base tables plus
    * `iters` unrolled rounds, each direction the same two-phase
    * from-then-shard sorted fold, max-normalization and rounding
    * sequence as [[foldOver]]. Every `a$i`/`h$i` round CTE is
    * referenced more than once (the other half-step, the final pick
    * — and in the converged twin the delta re-derivation), so they
    * are MATERIALIZED: DuckDB inlines plain CTEs recursively, which
    * is exponential in rounds for double-referenced chains (values
    * unchanged — a planner directive only, the pageRankCtes rule). */
  private def hitsCtes(edgesSql: String, iters: Int,
      shards: Int): String = {
    def fold(i: Int, out: String, from: String, to: String,
        src: String): String =
      s"""${out}c$i AS (
         |  SELECT e.$to AS id, e.$from AS f, e.$from % $shards AS shard,
         |    $src.v AS c
         |  FROM e JOIN $src ON e.$from = $src.id),
         |${out}p$i AS (
         |  SELECT id, shard,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(c ORDER BY f)), (a, x) -> a + x) AS ps
         |  FROM ${out}c$i GROUP BY id, shard),
         |${out}s$i AS (
         |  SELECT id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(ps ORDER BY shard)), (a, x) -> a + x) AS s
         |  FROM ${out}p$i GROUP BY id),
         |${out}m$i AS (SELECT max(s) AS m FROM ${out}s$i),
         |$out$i AS MATERIALIZED (
         |  SELECT nodes.id,
         |    round(coalesce(${out}s$i.s, 0.0) / ${out}m$i.m, 12) AS v
         |  FROM nodes LEFT JOIN ${out}s$i ON nodes.id = ${out}s$i.id
         |  CROSS JOIN ${out}m$i)""".stripMargin
    val rounds = (1 to iters).map { i =>
      val hPrev = if (i == 1) "h0" else s"h${i - 1}"
      s"""${fold(i, "a", "src", "dst", hPrev)},
         |${fold(i, "h", "dst", "src", s"a$i")}""".stripMargin
    }.mkString(",\n")
    s"""e AS (
       |  ${edgesSql.replace("\n", "\n  ")}),
       |nodes AS (
       |  SELECT DISTINCT src AS id FROM e
       |  UNION SELECT DISTINCT dst FROM e),
       |h0 AS (SELECT id, 1.0 AS v FROM nodes),
       |a0 AS (SELECT id, 0.0 AS v FROM nodes),
       |$rounds""".stripMargin
  }

  /** DuckDB twin of [[hits]]: `iters` unrolled rounds, each direction
    * the same two-phase from-then-shard sorted fold and rounding
    * sequence. `edgesSql` must yield columns (src, dst). */
  def hitsOracleSql(edgesSql: String, iters: Int,
      shards: Int = 64): String =
    s"""WITH ${hitsCtes(edgesSql, iters, shards)},
       |fin AS (
       |  SELECT nodes.id AS id, round(a$iters.v, 6) AS auth_r,
       |    round(h$iters.v, 6) AS hub_r
       |  FROM nodes JOIN a$iters ON nodes.id = a$iters.id
       |  JOIN h$iters ON nodes.id = h$iters.id)
       |SELECT id, auth_r, hub_r FROM fin""".stripMargin

  /** One [[hitsConverged]] run's outcome. */
  final case class HitsRun(scores: DataFrame, iters: Int,
      l1Delta: Double)

  /** HITS with an L1-delta convergence probe instead of a fixed
    * iteration count — the same closure [[pageRankConverged]] gave
    * [[pageRank]]: iterates full rounds (authority half-step, then
    * hub half-step) until
    * `sum |a_i - a_{i-1}| + sum |h_i - h_{i-1}| <= tol` or
    * `maxIters`, whichever first. The delta metric rides the SAME
    * materialization job via `observe()` + one noop-sink write (no
    * second pass); each round's score vectors are LINEAGE-TRUNCATED
    * (`Dedup.defaultMaterialize` — both vectors feed the next round
    * twice: the opposite half-step and the delta join; an
    * un-truncated plan doubles per round), and the round's explicit
    * persist (`stepped`) is released as its successor lands. The
    * truncated predecessors themselves are local-checkpoint RDDs
    * reclaimed by Spark's ContextCleaner once unreferenced (lazily,
    * at GC) — so live state is the current pair plus
    * cleanup-pending rounds, not the whole history; on the
    * cluster-without-checkpoint-dir fallback, where truncation
    * degrades to persist, caches DO accumulate for the session
    * (one more reason that path warns and caps the budget).
    * Max-normalization keeps every score in [0,1], so the delta is a
    * sum of ≤1 terms — `tol` scales with |nodes| like
    * pageRankConverged's.
    *
    * Same ULP caveat as [[pageRankConvergedOracleSql]]: the delta
    * fold is unordered on both engines, so pick `tol` with a margin
    * to the nearest achievable round delta that dwarfs ~1e-15
    * relative noise. Returns final (id, auth_r, hub_r) at 6 dp,
    * rounds run, and the last observed delta. */
  def hitsConverged(edges: DataFrame, maxIters: Int, tol: Double,
      shards: Int = 64,
      materialize: DataFrame => DataFrame = identity): HitsRun = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    require(tol > 0, s"tol must be positive, got $tol")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    // the pageRankConverged cluster guard: per-round truncation is
    // non-negotiable at deep budgets, and defaultMaterialize silently
    // degrades to persist (which does NOT truncate) without a
    // checkpoint dir
    val sc = edges.sparkSession.sparkContext
    val truncatable = sc.isLocal || sc.getCheckpointDir.isDefined
    if (!truncatable && maxIters > 10)
      throw new IllegalArgumentException(
        "hitsConverged needs lineage truncation every round at " +
          s"maxIters=$maxIters; on a cluster set a checkpoint dir " +
          "(sparkContext.setCheckpointDir) first — without one the " +
          "per-round plan doubles (each vector feeds the next round " +
          "twice) and analysis OOMs by ~30 rounds")
    else if (!truncatable)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"hitsConverged: no checkpoint dir — plan truncation " +
          s"degrades to persist; fine for maxIters=$maxIters, set " +
          "sparkContext.setCheckpointDir before raising the budget")
    val e = materialize(
      edges.select(col("src").cast("long"), col("dst").cast("long")))
    val nodes = materialize(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    var hubs = nodes.select(col("id"), lit(1.0).as("v"))
    var auths = nodes.select(col("id"), lit(0.0).as("v"))
    var itersRun = 0
    var delta = Double.MaxValue
    while (itersRun < maxIters && delta > tol) {
      // the fresh authority vector feeds BOTH the hub half-step and
      // the delta join, but foldOver already truncated its sums —
      // a1 is one thin nodes-join over that checkpoint, so the
      // fan-out re-evaluates only that join, not the half-step
      // (wrapping it in another checkpoint added one job per round;
      // removed with the x79 loop-materialize cleanup, same measure)
      val a1 = foldOver(e, nodes, hubs, "src", "dst", shards)
      val h1 = foldOver(e, nodes, a1, "dst", "src", shards)
      val stepped = a1.select(col("id"), col("v").as("a"))
        .join(h1.select(col("id"), col("v").as("h")), Seq("id"))
        .join(auths.select(col("id"), col("v").as("__pa")), Seq("id"))
        .join(hubs.select(col("id"), col("v").as("__ph")), Seq("id"))
      val obs = new org.apache.spark.sql.Observation()
      // ONE action per round past the half-steps: the L1 delta probe
      // rides the TRUNCATION job itself (observe under the projection
      // the checkpoint materializes — CollectMetrics completes with
      // the checkpoint's internal action), replacing the former
      // persist + separate noop-sink pass + unpersist. ONE truncation
      // for both vectors (narrow projections of the checkpointed pair
      // frame stay truncated) — half the checkpoint jobs and half the
      // cached-vector storage of truncating each side separately.
      // Actioned: the probe needs a completed job on the persist
      // fallback too (see defaultMaterializeActioned).
      val next = Dedup.defaultMaterializeActioned(
        stepped.observe(obs, sum(abs(col("a") - col("__pa")) +
            abs(col("h") - col("__ph"))).as("l1"))
          .select(col("id"), col("a"), col("h")))
      delta = {
        val m = org.apache.spark.sql.GraftBridge.observedOrEmpty(obs)
        // loud, not a silent 0.0: an empty metric map means the
        // truncation's action did not complete the observed metrics
        // (e.g. a future hook that stops running a real query
        // execution) — continuing would mis-stop the loop
        if (m.isEmpty) throw new IllegalStateException(
          "hitsConverged: L1 delta metric did not materialize with " +
            "the round's truncation job")
        m.get("l1") match {
          case Some(v: java.lang.Double) => v.doubleValue()
          case _ => 0.0 // null sum: empty node set, nothing to move
        }
      }
      auths = next.select(col("id"), col("a").as("v"))
      hubs = next.select(col("id"), col("h").as("v"))
      itersRun += 1
    }
    val scores = nodes
      .join(auths.withColumnRenamed("v", "__a"), Seq("id"))
      .join(hubs.withColumnRenamed("v", "__h"), Seq("id"))
      .select(col("id"), round(col("__a"), 6).as("auth_r"),
        round(col("__h"), 6).as("hub_r"))
    HitsRun(scores, itersRun, delta)
  }

  /** DuckDB twin of [[hitsConverged]]: unrolls `maxIters` rounds,
    * RE-DERIVES each round's L1 delta
    * `sum |a_i - a_{i-1}| + sum |h_i - h_{i-1}|` (round 1 against the
    * h_0 = 1 / a_0 = 0 start vectors, exactly as the Spark loop), and
    * picks the FIRST round whose delta is <= tol (else maxIters) — a
    * wrong Spark-side stop round diverges the hash both through the
    * emitted `iters_run` and through the scores. Round CTEs are
    * MATERIALIZED ([[hitsCtes]]) so the multi-referenced unroll stays
    * linear in rounds. Same tol-margin caveat as
    * [[pageRankConvergedOracleSql]]. */
  def hitsConvergedOracleSql(edgesSql: String, maxIters: Int,
      tol: Double, shards: Int = 64): String = {
    val t = java.lang.Double.toString(tol)
    // ONE fold over per-node (|Δa| + |Δh|) terms — the same
    // structural form as the Spark side's single Observation sum
    // (two separate sums added afterward would round differently in
    // FP, a second noise source on top of the documented unordered-
    // fold ULP caveat)
    val deltas = (1 to maxIters).map { i =>
      s"""  SELECT $i AS it,
         |    (SELECT sum(abs(a.v - pa.v) + abs(h.v - ph.v))
         |     FROM a$i a JOIN a${i - 1} pa ON a.id = pa.id
         |     JOIN h$i h ON a.id = h.id
         |     JOIN h${i - 1} ph ON a.id = ph.id) AS dlt"""
        .stripMargin
    }.mkString("\n  UNION ALL\n")
    val allAh = (1 to maxIters).map { i =>
      s"""  SELECT $i AS it, a$i.id, a$i.v AS av, h$i.v AS hv
         |  FROM a$i JOIN h$i ON a$i.id = h$i.id""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH ${hitsCtes(edgesSql, maxIters, shards)},
       |deltas AS (
       |$deltas),
       |stop AS (
       |  SELECT coalesce(min(it), $maxIters) AS it FROM deltas
       |  WHERE dlt <= CAST($t AS DOUBLE)),
       |allah AS (
       |$allAh)
       |SELECT allah.id, round(allah.av, 6) AS auth_r,
       |  round(allah.hv, 6) AS hub_r,
       |  CAST(stop.it AS BIGINT) AS iters_run
       |FROM allah JOIN stop ON allah.it = stop.it
       |ORDER BY id""".stripMargin
  }
}
