package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.Streams

class StreamsSpec extends SparkSpec {

  test("stream-stream interval self-join equals the batch range join") {
    val batchEvents = Tables.load(spark, sf(), "events")
      .select("user_id", "event_id", "ts")
      .filter(col("user_id") < 20) // keep the pair volume test-sized
    val expected = graft.operators.Temporal
      .rangeJoinWithin(batchEvents, "user_id", "event_id", "ts", 600)
      .orderBy("id_a", "id_b").collect().toSeq

    val tmp = java.nio.file.Files.createTempDirectory("graft-ssj").toString
    batchEvents.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(batchEvents.schema).parquet(tmp)
    val joined = Streams.streamingIntervalSelfJoin(stream, "user_id",
      "event_id", "ts", delay = "1 hour", withinSec = 600)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj_test").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj_test")
      .orderBy("id_a", "id_b").collect().toSeq

    assert(got.nonEmpty)
    assert(got == expected)
  }

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

  test("transitive-oracle catalog entries: AvailableNow streaming run " +
      "equals the batch twin (x47 dedup, x49 enrichment)") {
    import graft.queries.Catalog
    // x47: streaming watermarked dedup projected to keys == batch DISTINCT
    val dedupGot = Catalog.byName("x47_streaming_dedup")
      .run(spark, sf()).collect().toSeq
    val dedupExp = Tables.load(spark, sf(), "events")
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type").collect().toSeq
    assert(dedupGot.nonEmpty && dedupGot == dedupExp)

    // x49: stream-static broadcast enrichment == batch left join
    val enrichGot = Catalog.byName("x49_streaming_enrich")
      .run(spark, sf()).collect().toSeq
    val cust = Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val enrichExp = Tables.load(spark, sf(), "events")
      .select("event_id", "user_id")
      .join(broadcast(cust), Seq("user_id"), "left")
      .orderBy("event_id").collect().toSeq
    assert(enrichGot.nonEmpty && enrichGot == enrichExp)
  }
}
