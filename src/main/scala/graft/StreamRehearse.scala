package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Dev tool: time the streaming family in its DEPLOYMENT shape — a
  * streaming `noop` sink, no driver materialization — as opposed to
  * the catalog entries' transitive-oracle shape (file/memory sink).
  *
  * Covers the watch items from the r9/r10 decade rehearsals:
  *   sessionize  — complete (state holds ALL sessions) vs
  *                 append + watermark (state holds OPEN sessions only;
  *                 finalized sessions emit and evict)
  *   interval    — the watermarked stream-stream interval self-join
  *   rate        — BACKPRESSURE: the dedup + ingest-screen pipelines
  *                 driven with a bounded `maxFilesPerTrigger` instead
  *                 of one AvailableNow gulp, reporting steady-state
  *                 per-batch durations — the sustained-ingest shape a
  *                 continuous 100 TB/day deployment actually runs.
  *
  * Rows are counted EXACTLY by a StreamingQueryListener accumulating
  * every progress event (q.recentProgress is a ring buffer capped at
  * spark.sql.streaming.numRecentProgressUpdates — summing it
  * undercounts any run with more micro-batches than the cap), so a
  * zero-row regression (the r9 pathGlobFilter class) is visible
  * without a driver collect.
  *
  * Usage: runMain graft.StreamRehearse <sfDir>
  *          [sessionize-complete|sessionize-append|interval|rate|all]
  * Env (one prefix for every rehearsal knob):
  *   SPARK_GRAFT_CPUS             local[] width (default 32)
  *   SPARK_GRAFT_STATE_PARTITIONS streaming state sizing (default 8,
  *                                the catalog's fixture-scale pin;
  *                                legacy GRAFT_STATE_PARTITIONS also
  *                                accepted, see Streams)
  *   SPARK_GRAFT_WATERMARK        append/join delay (default 1 hour)
  *   SPARK_GRAFT_FILES_PER_TRIGGER rate mode: files per micro-batch
  *                                (default 4)
  *   SPARK_GRAFT_STATE_STORE      rocksdb|hdfs (Streams override; the
  *                                RocksDB rehearsal knob)
  *   SPARK_GRAFT_ROCKSDB_TUNED_MB apply Streams.rocksDbTuningConfs
  *                                (bounded memory at this cap +
  *                                changelog checkpointing) — the r12
  *                                RocksDB tuning A/B knob
  */
object StreamRehearse {

  /** Exact per-query row accounting: listener sums sink.numOutputRows
    * over EVERY progress event and keeps per-batch durations, immune
    * to the recentProgress ring-buffer cap. */
  final class ProgressTally extends StreamingQueryListener {
    val rows = new java.util.concurrent.atomic.AtomicLong(0)
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    @volatile var lastBatchRows: Long = 0
    @volatile var maxStateBytes: Long = 0
    @volatile var maxStateRows: Long = 0
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      rows.addAndGet(p.sink.numOutputRows)
      lastBatchRows = p.sink.numOutputRows
      // peak state footprint across the run — memoryUsedBytes is the
      // provider's own accounting (heap estimate vs RocksDB
      // native+disk), the number the provider choice is about
      val st = p.stateOperators
      if (st != null && st.nonEmpty) {
        maxStateBytes = math.max(maxStateBytes, st.map(_.memoryUsedBytes).sum)
        maxStateRows = math.max(maxStateRows, st.map(_.numRowsTotal).sum)
      }
      val dur = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L)
      batches.add((p.batchId, dur))
    }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = if (args.length > 1) args(1) else "all"
    val watermark = sys.env.getOrElse("SPARK_GRAFT_WATERMARK", "1 hour")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val stateParts = graft.streaming.Streams.statePartitionsOverride()
      .getOrElse(8)
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.streaming.Streams.stateStoreProviderOverride().foreach(
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    sys.env.get("SPARK_GRAFT_ROCKSDB_TUNED_MB").foreach { v =>
      val mb = v.trim.toLongOption.filter(_ > 0).getOrElse(
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_ROCKSDB_TUNED_MB must be a positive int, got '$v'"))
      val confs = graft.streaming.Streams.rocksDbTuningConfs(mb)
      confs.foreach { case (k, vv) => spark.conf.set(k, vv) }
      Console.err.println(
        s"[rehearse] RocksDB tuning applied: $confs")
    }

    def events(): DataFrame =
      graft.sources.Tables.loadStream(spark, dir, "events")

    def time(tag: String, mk: () => DataFrame, outputMode: String,
        trigger: Trigger = Trigger.AvailableNow(),
        stopWhenCaughtUp: Boolean = false): Unit =
      (1 to 3).foreach { i =>
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", stateParts.toString)
        val tally = new ProgressTally
        spark.streams.addListener(tally)
        try {
          val t0 = System.nanoTime()
          val q = mk().writeStream
            .outputMode(outputMode)
            .format("noop")
            .trigger(trigger)
            .start()
          if (stopWhenCaughtUp) { q.processAllAvailable(); q.stop() }
          q.awaitTermination()
          val secs = (System.nanoTime() - t0) / 1e9
          val durs = {
            import scala.jdk.CollectionConverters._
            tally.batches.asScala.toSeq.sortBy(_._1).map(_._2)
          }
          // steady state = drop the first (cold) batch; median of rest
          val steady = {
            val post = durs.drop(1).sorted
            post.lift((post.length - 1) / 2).getOrElse(0L)
          }
          println(f"[rehearse] $tag sp=$stateParts run=$i " +
            f"rowsEmitted=${tally.rows.get}%d " +
            f"rowsLastBatch=${tally.lastBatchRows}%d " +
            f"nBatches=${durs.length}%d steadyBatchMs=$steady%d " +
            f"stateRowsPeak=${tally.maxStateRows}%d " +
            f"stateMBPeak=${tally.maxStateBytes / (1024 * 1024)}%d " +
            f"secs=$secs%.2f")
        } finally {
          spark.streams.removeListener(tally)
          spark.conf.set("spark.sql.shuffle.partitions", prev)
        }
      }

    def sessionize(wm: Option[String]): DataFrame =
      graft.streaming.Streams.streamingSessionize(
        events().select(col("user_id"), col("ts"),
          col("value").cast("decimal(18,2)").as("value2")),
        keyCol = "user_id", tsCol = "ts", valueCol = "value2",
        gap = "1800 seconds", watermark = wm)

    if (which == "all" || which == "sessionize-complete")
      time("sessionize-complete", () => sessionize(None), "complete")
    if (which == "all" || which == "sessionize-append")
      time("sessionize-append", () => sessionize(Some(watermark)), "append")
    if (which == "all" || which == "interval")
      time("interval", () => graft.streaming.Streams
        .streamingIntervalSelfJoin(events(), keyCol = "user_id",
          idCol = "event_id", tsCol = "ts", delay = watermark,
          withinSec = 600L), "append")

    // Backpressure mode: the same fixture is consumed in bounded
    // micro-batches (maxFilesPerTrigger) under a continuous trigger —
    // the sustained-ingest topology. steadyBatchMs vs files/trigger is
    // the capacity curve: a deployment is stable while steadyBatchMs
    // stays under the batch's arrival interval.
    if (which == "all" || which == "rate") {
      val fpt = sys.env.get("SPARK_GRAFT_FILES_PER_TRIGGER")
        .map(v => v.trim.toIntOption.filter(_ > 0).getOrElse(
          throw new IllegalArgumentException(
            s"SPARK_GRAFT_FILES_PER_TRIGGER must be a positive int, got '$v'")))
        .getOrElse(4)
      def eventsRated(): DataFrame = graft.sources.Tables.loadStreamRated(
        spark, dir, "events", maxFilesPerTrigger = fpt)
      time(s"rate-dedup fpt=$fpt", () =>
        graft.streaming.Streams.streamingDedup(
          eventsRated().select(col("user_id"), col("event_type"), col("ts")),
          Seq("user_id", "event_type"), watermarkCol = "ts",
          delay = watermark),
        "append", trigger = Trigger.ProcessingTime(0L),
        stopWhenCaughtUp = true)
      time(s"rate-sessionize-append fpt=$fpt", () =>
        graft.streaming.Streams.streamingSessionize(
          eventsRated().select(col("user_id"), col("ts"),
            col("value").cast("decimal(18,2)").as("value2")),
          keyCol = "user_id", tsCol = "ts", valueCol = "value2",
          gap = "1800 seconds", watermark = Some(watermark)),
        "append", trigger = Trigger.ProcessingTime(0L),
        stopWhenCaughtUp = true)
    }
    spark.stop()
  }
}
