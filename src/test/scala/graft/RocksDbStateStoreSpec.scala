package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.Streams

/** The RocksDB state store provider is the deployment-grade backend
  * for 100 TB streaming state (state lives in native memory + local
  * disk instead of executor heap); these tests pin that every stateful
  * operator family produces IDENTICAL results under it — provider
  * choice is an operational knob, never a semantic one. The heap
  * provider stays the fixture-scale default (RocksDB's per-store
  * commit overhead is pure cost while state fits in heap — measured
  * in SCALE.md's RocksDB rehearsal); SPARK_GRAFT_STATE_STORE=rocksdb
  * flips every gate run. */
class RocksDbStateStoreSpec extends SparkSpec {

  private val provKey = "spark.sql.streaming.stateStore.providerClass"

  private def underRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, Streams.RocksDbProvider)
    try body
    finally prev.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.toString)

  test("streaming dedup under RocksDB equals batch distinct") {
    val dir = sf("sf0.001")
    val stream = Tables.loadStream(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val got = underRocksDb {
      rows(Streams.runAvailableNowToDir(spark,
        Streams.streamingDedup(stream, Seq("user_id", "event_type"),
          "ts", "365 days").select(col("user_id"), col("event_type")),
        "rocks_dedup_out", statePartitions = Some(4)))
    }
    val want = rows(Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type")).distinct())
    assert(got == want)
  }

  test("streaming session_window under RocksDB equals heap provider") {
    val dir = sf("sf0.001")
    def sessions() = Streams.streamingSessionize(
      Tables.loadStream(spark, dir, "events")
        .select(col("user_id"), col("ts"),
          col("value").cast("decimal(18,2)").as("value2")),
      keyCol = "user_id", tsCol = "ts", valueCol = "value2",
      gap = "1800 seconds")
    val rocks = underRocksDb {
      rows(Streams.runAvailableNow(spark, sessions(), "rocks_sess_out",
        statePartitions = Some(4), outputMode = "complete"))
    }
    val heap = rows(Streams.runAvailableNow(spark, sessions(),
      "heap_sess_out", statePartitions = Some(4),
      outputMode = "complete"))
    assert(rocks.nonEmpty && rocks == heap)
  }

  test("stream-stream interval join under RocksDB equals heap provider") {
    val dir = sf("sf0.001")
    def joined() = Streams.streamingIntervalSelfJoin(
      Tables.loadStream(spark, dir, "events"), keyCol = "user_id",
      idCol = "event_id", tsCol = "ts", delay = "1 hour",
      withinSec = 600L)
    val rocks = underRocksDb {
      rows(Streams.runAvailableNowToDir(spark, joined(),
        "rocks_join_out", statePartitions = Some(4)))
    }
    val heap = rows(Streams.runAvailableNowToDir(spark, joined(),
      "heap_join_out", statePartitions = Some(4)))
    assert(rocks.nonEmpty && rocks == heap)
  }

  test("provider rule: aggregation state switches to RocksDB at 2% of " +
      "heap, join state holds heap until 10% (the measured JNI wall)") {
    val heapB = 32L << 30
    import Streams.{AggregationState, JoinState}
    // aggregation: parity wall -> switch early
    assert(Streams.chooseStateStoreProvider(AggregationState,
      (heapB * 0.01).toLong, heapB) == Streams.HeapProvider)
    assert(Streams.chooseStateStoreProvider(AggregationState,
      (heapB * 0.03).toLong, heapB) == Streams.RocksDbProvider)
    // join: 4x JNI wall -> pay only when heap survival is threatened
    assert(Streams.chooseStateStoreProvider(JoinState,
      (heapB * 0.05).toLong, heapB) == Streams.HeapProvider)
    assert(Streams.chooseStateStoreProvider(JoinState,
      (heapB * 0.13).toLong, heapB) == Streams.RocksDbProvider)
    // the r11 sf10 measurements land on the right side of the rule:
    // sessionize 3,276 MB state / 32 GB heap (10%) -> RocksDB (it
    // measured FASTER there); interval join in a 64 GB heap (6%) ->
    // heap (RocksDB was 4x slower while survivable)
    assert(Streams.chooseStateStoreProvider(AggregationState,
      3276L << 20, 32L << 30) == Streams.RocksDbProvider)
    assert(Streams.chooseStateStoreProvider(JoinState,
      4091L << 20, 64L << 30) == Streams.HeapProvider)
    intercept[IllegalArgumentException] {
      Streams.chooseStateStoreProvider(JoinState, -1L, heapB)
    }
  }

  test("applyStateStore sets the session provider conf to the rule's " +
      "choice and returns it") {
    val prev = spark.conf.getOption(provKey)
    try {
      val chosen = Streams.applyStateStore(spark,
        Streams.AggregationState, 8L << 30, 32L << 30)
      assert(chosen == Streams.RocksDbProvider)
      assert(spark.conf.get(provKey) == Streams.RocksDbProvider)
      val chosen2 = Streams.applyStateStore(spark,
        Streams.JoinState, 1L << 30, 32L << 30)
      assert(chosen2 == Streams.HeapProvider)
      assert(spark.conf.get(provKey) == Streams.HeapProvider)
    } finally prev.fold(spark.conf.unset(provKey))(
      spark.conf.set(provKey, _))
  }

  test("rocksDbTuningConfs emits the bounded-memory + changelog conf " +
      "set and validates the cap") {
    val confs = Streams.rocksDbTuningConfs(2048)
    val p = "spark.sql.streaming.stateStore.rocksdb."
    assert(confs(s"${p}boundedMemoryUsage") == "true")
    assert(confs(s"${p}maxMemoryUsageMB") == "2048")
    assert(confs(s"${p}changelogCheckpointing.enabled") == "true")
    intercept[IllegalArgumentException] {
      Streams.rocksDbTuningConfs(0)
    }
  }
}
