package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev tool: time the streaming family in its DEPLOYMENT shape — a
  * streaming `noop` sink, no driver materialization — as opposed to
  * the catalog entries' transitive-oracle shape (memory sink, which
  * collects every emitted row to the driver and is therefore bounded
  * by spark.driver.maxResultSize; at sf10 the complete-mode
  * sessionize gate dies there by construction, not by operator cost).
  *
  * Covers the two watch items from the r9 decade rehearsal:
  *   sessionize  — complete (state holds ALL sessions) vs
  *                 append + watermark (state holds OPEN sessions only;
  *                 finalized sessions emit and evict)
  *   interval    — the watermarked stream-stream interval self-join
  *
  * Rows reported are the sink's numOutputRows summed over the run's
  * progress events, so a zero-row regression (the r9 pathGlobFilter
  * class) is still visible without a driver collect.
  *
  * Usage: runMain graft.StreamRehearse <sfDir> [sessionize-complete|sessionize-append|interval|all]
  * Env: GRAFT_STATE_PARTITIONS sizes streaming state (default 8, the
  *      catalog's fixture-scale pin); SPARK_GRAFT_WATERMARK sets the
  *      append/join delay (default 1 hour).
  */
object StreamRehearse {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = if (args.length > 1) args(1) else "all"
    val watermark = sys.env.getOrElse("SPARK_GRAFT_WATERMARK", "1 hour")
    val stateParts =
      sys.env.getOrElse("GRAFT_STATE_PARTITIONS", "8").toInt
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def events(): DataFrame =
      graft.sources.Tables.loadStream(spark, dir, "events")

    def time(tag: String, mk: () => DataFrame, outputMode: String): Unit =
      (1 to 3).foreach { i =>
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", stateParts.toString)
        try {
          val t0 = System.nanoTime()
          val q = mk().writeStream
            .outputMode(outputMode)
            .format("noop")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val secs = (System.nanoTime() - t0) / 1e9
          // complete mode re-emits the whole result per batch; the last
          // progress alone is the result size there, the sum is right
          // for append
          val emitted = q.recentProgress.map(_.sink.numOutputRows).sum
          val last = q.recentProgress.lastOption
            .map(_.sink.numOutputRows).getOrElse(0L)
          println(f"[rehearse] $tag sp=$stateParts run=$i " +
            f"rowsEmitted=$emitted%d rowsLastBatch=$last%d secs=$secs%.2f")
        } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
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
    spark.stop()
  }
}
