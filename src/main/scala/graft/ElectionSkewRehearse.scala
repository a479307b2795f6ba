package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: the r17 election rewrites under adversarial KEY skew —
  * the measured before/after for converting the five per-key
  * WindowExec elections (r16 verdict item #1) to bounded map-side
  * aggregates. Each family gets the fixture its scale story feared:
  *
  *   - exact dedup: 1M rows, 90% sharing ONE fingerprint (the viral
  *     blank page) — `Dedup.exactKeepFirst`'s min-struct aggregate
  *     vs the old `min(id) OVER (PARTITION BY key)` window;
  *   - keep-best: 1M scored docs fused into ONE cluster (templated
  *     page family chained transitively) — `Corpus.cleanKeepBest`'s
  *     min(-q, id) aggregate election vs the old per-cluster
  *     row_number window;
  *   - cell cap: ONE IVF cell holding ~all 1M embeddings (the tight
  *     drift mode) — semanticDedup's two-phase sharded cap vs the
  *     old one-phase per-cell window;
  *   - viral L-token window: one win_h occurring in 900k docs
  *     (license boilerplate) — exactSubstringDedup/duplicateSpans'
  *     groupBy(win_h)+join-back seed election vs the old
  *     count+row_number window pair;
  *   - bot-key sessionization: 90% of events on ONE user —
  *     `Sessionize.batchSessionsSharded`'s segmented seam pass
  *     (per-task bound: one (user, hour) slice) vs the plain
  *     per-user window form;
  *   - hot-key as-of join: 90% of BOTH sides on ONE key —
  *     `Temporal.asOfJoinLeftSharded`'s segmented carry vs the
  *     plain per-key carry-forward window.
  *
  * Frames are synthesized at the REWRITTEN STAGE's input contract
  * (fingerprinted rows / clustered scores / cell assignments / window
  * hashes) so the rehearsal isolates the election and not the
  * upstream hashing. Each A/B also cross-checks the two forms return
  * IDENTICAL keep-sets (count + id checksum) — the hash-neutrality
  * argument the catalog gate re-proves at sf0.01.
  *
  * N is a SWEEP, not a point: at 10^6 the hot key fits one task and
  * the window's single exchange actually beats the aggregate's extra
  * shuffle — the funnel is a SCALING defect (one task's wall and
  * buffer grow with the key's share of the corpus while every other
  * core idles; WindowExec buffers the partition, so past executor
  * memory it dies, not just slows). The sweep shows the slope: the
  * window column grows ~linearly in N, the aggregate column stays
  * near-flat on idle cores.
  *
  * Usage: GRAFT_ELECT_NS=1000000,4000000,16000000 \
  *   runMain graft.ElectionSkewRehearse
  */
object ElectionSkewRehearse {
  def main(args: Array[String]): Unit = {
    val ns = sys.env.getOrElse("GRAFT_ELECT_NS",
      sys.env.getOrElse("GRAFT_ELECT_N", "1000000"))
      .split(",").map(_.trim.toLong).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def sig(df: DataFrame, idc: String): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col(idc))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    for (n <- ns) {
    println(s"[elect-rehearse] ---- n=$n per fixture ----")
    def timed(label: String)(body: => (Long, Long)): Unit = {
      val t0 = System.nanoTime()
      val (rows, sum) = body
      println(f"[elect-rehearse] n=$n $label: " +
        f"${(System.nanoTime() - t0) / 1e9}%5.1f s  " +
        f"rows=$rows%d idsum=$sum%d")
    }

    // ---- 1. viral exact duplicate: 90% of rows share one key -------
    val fp = spark.range(n).select(col("id"),
      when(col("id") % 10 < 9, lit("viral-blank-page"))
        .otherwise(concat(lit("u"), col("id"))).as("key"))
    timed("exactKeepFirst AGG (viral key)") {
      sig(graft.operators.Dedup.exactKeepFirst(fp, col("key"), col("id")),
        "id")
    }
    timed("exactKeepFirst WINDOW (old form)") {
      val w = Window.partitionBy(col("key"))
      sig(fp.withColumn("__keep", min(col("id")).over(w))
        .filter(col("id") === col("__keep")).drop("__keep"), "id")
    }

    // ---- 2. mega-cluster keep-best election -------------------------
    val clustered = spark.range(n).select(col("id"),
      lit(0L).as("cluster_id"),
      ((col("id") * 37 % 1000).cast("double") / 1000.0).as("__q"))
    timed("keepBest AGG (one cluster)") {
      sig(clustered.groupBy(col("cluster_id"))
        .agg(min(struct(negate(col("__q")).as("__nq"),
          col("id").as("__id"))).as("__w"))
        .select(col("__w").getField("__id").as("id")), "id")
    }
    timed("keepBest WINDOW (old form)") {
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("__q").desc, col("id"))
      sig(clustered.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).select(col("id")), "id")
    }

    // ---- 3. one-cell cap: all rows in cell 0, cap 1000 --------------
    val cells = spark.range(n).select(col("id").as("__id"),
      lit(0).as("cell"))
    val maxCell = 1000
    timed("cellCap TWO-PHASE (one cell)") {
      val shard = graft.functions.HashFunctions
        .md5Hash60b(col("__id").cast("string")) % 64
      val w1 = Window.partitionBy(col("cell"), shard).orderBy(col("__id"))
      val w2 = Window.partitionBy(col("cell")).orderBy(col("__id"))
      sig(cells.withColumn("__k1", row_number().over(w1))
        .filter(col("__k1") <= maxCell)
        .withColumn("__rn", row_number().over(w2))
        .filter(col("__rn") <= maxCell), "__id")
    }
    timed("cellCap ONE-PHASE WINDOW (old form)") {
      val w = Window.partitionBy(col("cell")).orderBy(col("__id"))
      sig(cells.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= maxCell), "__id")
    }

    // ---- 4. viral L-token window: one win_h in 90% of docs ----------
    // wins contract: (id, pos, win_h); every doc contributes a few
    // unique windows plus — for 90% of docs — THE viral hash.
    val wins = spark.range(n).select(col("id"),
        explode(array(lit(1), lit(2), lit(3))).as("pos"))
      .select(col("id"), col("pos"),
        when(col("pos") === 1 && col("id") % 10 < 9, lit(0L))
          .otherwise(col("id") * 7 + col("pos")).as("win_h"))
    timed("seedElection AGG+JOIN (viral win_h)") {
      val stats = wins.groupBy(col("win_h"))
        .agg(count(lit(1)).as("__cnt"),
          min(struct(col("id"), col("pos"))).as("__first"))
      sig(wins.join(stats, Seq("win_h"))
        .filter(col("__cnt") > 1 &&
          struct(col("id"), col("pos")) =!= col("__first"))
        .select(col("id"), col("pos")), "id")
    }
    timed("seedElection WINDOW (old form)") {
      val byHash = Window.partitionBy(col("win_h"))
      val ordered = byHash.orderBy(col("id"), col("pos"))
      sig(wins.withColumn("__cnt", count(lit(1)).over(byHash))
        .withColumn("__rn", row_number().over(ordered))
        .filter(col("__cnt") > 1 && col("__rn") > 1)
        .select(col("id"), col("pos")), "id")
    }

    // ---- 5. bot-key sessionization: 90% of events on ONE user -------
    // events contract: (event_id, ts, user_id, value); the bot's
    // timeline spans years at ~5s spacing, with a 120s silence every
    // 1000 events (> gap=60s), so sessions actually split (~n/1000
    // bot sessions — the checksum proves both forms split the same
    // way, not just count the same). The sharded form holds at most
    // one (user, hour) slice per task; the plain form funnels the
    // bot's whole history through one.
    def sessSig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(col("sess_id") * col("n_events"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val botEvents = spark.range(n).select(col("id").as("event_id"),
      timestamp_micros(col("id") * 5000000L +
        expr("(id div 1000) * 120000000")).as("ts"),
      when(col("id") % 10 < 9, lit(0L)).otherwise(col("id")).as("user_id"),
      lit(1.0).as("value"))
    timed("sessionize SHARDED (bot user)") {
      sessSig(graft.streaming.Sessionize
        .batchSessionsSharded(botEvents, gapSeconds = 60L,
          bucketSeconds = 3600L))
    }
    timed("sessionize WINDOW (plain form)") {
      sessSig(graft.streaming.Sessionize
        .batchSessions(botEvents, gapSeconds = 60L))
    }

    // ---- 6. hot-key as-of join: 90% of BOTH sides on ONE key --------
    // the plain form funnels the hot key's merged left+right timeline
    // through one WindowExec task; the sharded carry holds one
    // (key, hour) slice. Checksum = count + sum(asof_rid), so both
    // forms must MATCH the same right rows, not just count the same.
    def asofSig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("asof_rid"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val asofLeft = spark.range(n).select(col("id").as("event_id"),
      timestamp_micros(col("id") * 3000000L).as("ts"),
      when(col("id") % 10 < 9, lit(0L)).otherwise(col("id")).as("user_id"))
    val asofRight = spark.range(n / 20).select(col("id").as("rid"),
      timestamp_micros(col("id") * 60000000L + 1000000L).as("ts"),
      when(col("id") % 10 < 9, lit(0L)).otherwise(col("id")).as("user_id"))
    timed("asOfJoin SHARDED (hot key)") {
      asofSig(graft.operators.Temporal.asOfJoinLeftSharded(
        asofLeft, asofRight, "user_id", "ts", "rid", Seq("rid"),
        bucketSeconds = 3600L))
    }
    timed("asOfJoin WINDOW (plain form)") {
      asofSig(graft.operators.Temporal.asOfJoinLeft(
        asofLeft, asofRight, "user_id", "ts", "rid", Seq("rid")))
    }
    }

    spark.stop()
  }
}
