package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streams
import graft.streaming.Sessionize.Event

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streamingDedup drops duplicate keys arriving within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val deduped = Streams.streamingDedup(mem.toDS().toDF(),
      Seq("event_id"), "ts", "1 hour")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData(Event(1, t0, 7, 1.0), Event(1, t0, 7, 1.0), Event(2, t0, 8, 2.0))
      q.processAllAvailable()
      // same key again in a later batch, still inside the watermark
      mem.addData(Event(1, Timestamp.valueOf("2024-01-01 10:30:00"), 7, 9.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }
}
