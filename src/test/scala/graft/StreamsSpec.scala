package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.Streams

class StreamsSpec extends SparkSpec {

  test("streaming tumbling window equals batch result (memory sink)") {
    // batch oracle over the same events table
    val batchEvents = Tables.load(spark, sf(), "events")
    val expected = Streams.tumblingCounts(batchEvents, "1 hour")
      .orderBy("ws", "event_type").collect().toSeq

    // stream the SAME (nanos-normalized) frame through a temp parquet dir
    // so the file source sees micros timestamps
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    batchEvents.write.mode("overwrite").parquet(tmp)
    val streaming = Streams.streamingTumblingCounts(spark, tmp,
      batchEvents.schema, "1 hour", "2 hours")
    val got = Streams.runToMemorySink(spark, streaming, "stream_test")
      .orderBy("ws", "event_type").collect().toSeq

    assert(got == expected)
    assert(got.nonEmpty)
  }
}
