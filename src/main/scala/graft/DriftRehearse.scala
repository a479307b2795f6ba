package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev tool: frozen-index recall decay vs appended drifted fraction —
  * the number that turns "when should we retrain the ANN index?" from
  * a guess into a threshold (TUNING.md "ANN drift").
  *
  * The fixture's own appends are iid with the base corpus (x41's
  * frozen-centroid append path showed ZERO decay by construction) and
  * the fixture embeddings are near-isotropic, so an isometric
  * transform (tried first: dimension reversal) also produces zero
  * signal — the drifted rows spread over stale cells as evenly as the
  * base did. Drift is therefore injected as what real domain shift
  * is: a NEW TIGHT MODE (a new content vertical / language / model
  * version) — appended vectors are `0.3·v + 0.8` per dimension, a
  * dominant shared component with scaled-down residual diversity,
  * which the base-trained centroids have no cell boundary through.
  *
  * At each appended fraction f the corpus is base + f·|base| drifted
  * rows; queries are a fixed hash-slice of the CURRENT corpus (so the
  * query mix drifts with the data, like production traffic). Reported
  * per fraction, frozen vs retrained-on-current-corpus:
  *
  *   - recall@5 against brute force — the quality decay signal;
  *   - max cell share and effective cell count (inverse Herfindahl of
  *     the cell-size distribution) — the EFFICIENCY decay signal:
  *     drift that lands whole new modes inside a few stale cells can
  *     keep recall (drifted queries probe the same crowded cells
  *     their neighbors fell into) while candidate volume per probe
  *     grows toward a corpus scan, which at 100 TB is the failure
  *     that actually pages someone. Retrain thresholds must watch
  *     BOTH numbers.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.DriftRehearse
  */
object DriftRehearse {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val nBase = emb.count()
    // id offset for synthesized drift rows derives from the data —
    // a fixed constant would collide with base ids on a large-enough
    // fixture and silently corrupt the recall join
    val idOffset = emb.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val frozen = Similarity.ivfTrain(emb, "vec_id", "embedding",
      nCells = 16, iters = 2, tag = "drift-base")

    // (maxShare, effectiveCells) of the cell-size distribution under
    // `cents`: effective cells = 1 / sum(share^2); candidates per
    // probe scale ~ corpus/effectiveCells
    def imbalance(corpus: org.apache.spark.sql.DataFrame,
        cents: Array[Array[Double]]): (Double, Double) = {
      val shares = Similarity.ivfAssign(corpus, "vec_id", "embedding",
          cents)
        .groupBy(col("cell")).agg(count(lit(1)).cast("double").as("n"))
        .select(col("n")).collect().map(_.getDouble(0))
      val tot = shares.sum
      val frac = shares.map(_ / tot)
      (frac.max, 1.0 / frac.map(f => f * f).sum)
    }

    Seq(0, 25, 50, 100).foreach { fracPct =>
      // norm-matched tight mode: 0.3·v + 0.8 rescaled to each row's
      // ORIGINAL norm — without the rescale the mode's large norm
      // dominates every argmax-dot comparison and even a retrained
      // dot-quantizer collapses onto it (the known IP-k-means norm
      // pathology); norm-matching isolates the DIRECTION drift the
      // rehearsal is about. Scale is a bound column, not an inline
      // expression (hof lambdas re-evaluate captured expressions per
      // element).
      val appended = emb.filter(col("vec_id") % 100 < fracPct)
        .select((col("vec_id") + idOffset).as("vec_id"),
          transform(col("embedding"),
            x => (x * lit(0.3f) + lit(0.8f)).cast("float")).as("t"),
          col("embedding"))
        .select(col("vec_id"), col("t"),
          (graft.functions.VectorFunctions.l2Norm(col("embedding")) /
            graft.functions.VectorFunctions.l2Norm(col("t"))).as("sc"))
        .select(col("vec_id"),
          transform(col("t"),
            x => (x * col("sc")).cast("float")).as("embedding"))
      val corpus = emb.unionByName(appended)
      val queries = corpus.filter(col("vec_id") % 29 === 0)
      val t0 = System.nanoTime()
      val exact = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", 5)
      def recallWith(cents: Array[Array[Double]]): Double =
        Similarity.recallAtK(
            Similarity.ivfTopKWith(corpus, queries, "vec_id",
              "embedding", 5, cents, nProbes = 4), exact)
          .agg(avg(col("recall_at_k"))).head().getDouble(0)
      val retrained = Similarity.ivfTrain(corpus, "vec_id", "embedding",
        nCells = 16, iters = 2, tag = s"drift-retrain-$fracPct")
      // ivfTrain seeds from the K LOWEST-id rows — after a drifted
      // append those are all BASE rows, so a plain retrain never
      // seeds inside the new mode and Lloyd leaves it one cell.
      // Remapping ids to their md5 hash makes the same deterministic
      // trainer seed a representative sample (blob seeds proportional
      // to its share) — "diverse-init retrain", the actual remedy.
      val diverse = Similarity.ivfTrain(
        corpus.select(graft.functions.HashFunctions.md5Hash60(
            col("vec_id").cast("string")).as("vec_id"),
          col("embedding")),
        "vec_id", "embedding", nCells = 16, iters = 2,
        tag = s"drift-diverse-$fracPct")
      val (msF, ecF) = imbalance(corpus, frozen)
      val (msR, ecR) = imbalance(corpus, retrained)
      val (msD, ecD) = imbalance(corpus, diverse)
      // the remedy the rehearsal's own conclusion points at: frozen
      // centroids + a per-cell serving cap at the BALANCED cell
      // budget (corpus-at-train / nCells). Measured as the average
      // candidate count per query (k set huge so every probe-join
      // survivor is returned) — uncapped, this number is what drifts
      // toward a corpus scan; capped, it is bounded by construction.
      val cap = math.max(1, (nBase / 16L).toInt)
      val nQd = queries.count().toDouble
      // total rows / ALL queries — a groupBy("qid") average would
      // silently drop zero-candidate queries from the denominator,
      // making the capped and uncapped numbers averages over
      // DIFFERENT query sets
      def candsPerQuery(serve: org.apache.spark.sql.DataFrame): Double =
        serve.count().toDouble / nQd
      val candU = candsPerQuery(Similarity.ivfTopKWith(corpus, queries,
        "vec_id", "embedding", Int.MaxValue, frozen, nProbes = 4))
      val candC = candsPerQuery(Similarity.ivfTopKWithCapped(corpus,
        queries, "vec_id", "embedding", Int.MaxValue, frozen,
        nProbes = 4, perCellCap = cap))
      val recallCapped = Similarity.recallAtK(
          Similarity.ivfTopKWithCapped(corpus, queries, "vec_id",
            "embedding", 5, frozen, nProbes = 4, perCellCap = cap),
          exact)
        .agg(avg(col("recall_at_k"))).head().getDouble(0)
      // the COMPOSED remedy the capped table's conclusion names:
      // near-dup-screen the arriving mode (x31's semanticDedup —
      // keep-first within tau-cosine, cell-bucketed) BEFORE append,
      // then serve capped. A tight mode is near-dups of itself by
      // construction, so the screen collapses it to a handful of
      // representatives; the cap then prices as no-op insurance and
      // recall returns to the f=0 baseline instead of decaying with
      // (cap / crowded-cell size). maxCell is sized to the batch so
      // the screen is exhaustive here; at production scale the
      // arriving batch is screened shard-wise with the same capped
      // cells + overflow reporter (semanticCellOverflow).
      if (fracPct > 0) {
        val nRaw = appended.count()
        val survivors = Similarity.semanticDedup(appended, "vec_id",
            "embedding", nCells = 16, tau = 0.9,
            maxCell = math.max(2, nRaw.toInt))
          .filter(col("kept")).select(col("vec_id"))
          .join(appended, Seq("vec_id"))
          .select(col("vec_id"), col("embedding"))
        val nKept = survivors.count()
        val corpusS = emb.unionByName(survivors)
        val queriesS = corpusS.filter(col("vec_id") % 29 === 0)
        val exactS = Similarity.bruteForceTopK(corpusS, queriesS,
          "vec_id", "embedding", 5)
        val recallS = Similarity.recallAtK(
            Similarity.ivfTopKWithCapped(corpusS, queriesS, "vec_id",
              "embedding", 5, frozen, nProbes = 4, perCellCap = cap),
            exactS)
          .agg(avg(col("recall_at_k"))).head().getDouble(0)
        val nQs = queriesS.count().toDouble
        val candS = Similarity.ivfTopKWithCapped(corpusS, queriesS,
          "vec_id", "embedding", Int.MaxValue, frozen, nProbes = 4,
          perCellCap = cap).count().toDouble / nQs
        println(f"[drift-screen] appendedPct=$fracPct%d raw=$nRaw%d " +
          f"kept=$nKept%d recall_capped_screened=$recallS%.3f " +
          f"cand_capped_screened=$candS%.1f")
      }
      val nQ = nQd.toLong
      println(f"[drift] base=$nBase%d appendedPct=$fracPct%d " +
        f"queries=$nQ%d recall_frozen=${recallWith(frozen)}%.3f " +
        f"recall_retrained=${recallWith(retrained)}%.3f " +
        f"recall_diverse=${recallWith(diverse)}%.3f " +
        f"recall_capped=$recallCapped%.3f " +
        f"maxshare_frozen=$msF%.3f maxshare_retrained=$msR%.3f " +
        f"maxshare_diverse=$msD%.3f " +
        f"effcells_frozen=$ecF%.1f effcells_retrained=$ecR%.1f " +
        f"effcells_diverse=$ecD%.1f " +
        f"cap=$cap%d cand_frozen=$candU%.1f cand_capped=$candC%.1f " +
        f"secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
