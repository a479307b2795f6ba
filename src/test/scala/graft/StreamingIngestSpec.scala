package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.Streams

case class IngestDoc(doc_id: Long, ts: Timestamp, text: String)

/** The hygiene path must compose with Structured Streaming: the same
  * CorpusKeep predicate that gates a batch ingest filters a stream,
  * and the watermark-bounded dedup drops in-window duplicate
  * fingerprints — a live micro-batch corpus ingest. */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest: CorpusKeep filter + watermarked fingerprint dedup") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[IngestDoc]
    val keep = TextAnalysis.corpusKeep(col("text"), 0.01, Seq("en", "und"))
    val cleaned = mem.toDS().toDF()
      .filter(keep)
      .withColumn("md5_fp",
        graft.functions.TextFunctions.md5Fingerprint(col("text")))
    val deduped = Streams.streamingDedup(cleaned, Seq("md5_fp"), "ts",
      "1 hour")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("ingest_out").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData(
        IngestDoc(1, t0, "the quick brown fox is in the house again"),
        IngestDoc(2, t0, ""), // junk: rejected by quality, must not crash
        IngestDoc(3, t0, "the quick brown fox is in the house again")) // dup of 1
      q.processAllAvailable()
      // later batch: whitespace variant of doc 1 (same fingerprint)
      mem.addData(IngestDoc(4, Timestamp.valueOf("2024-01-01 10:30:00"),
        "the quick brown  fox is in the house again"))
      q.processAllAvailable()
      val ids = spark.table("ingest_out").select("doc_id")
        .as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L))
    } finally q.stop()
  }

  test("stream-static enrichment: broadcast dim decorates the " +
      "cleaned stream, missing dim rows survive as nulls") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[IngestDoc]
    val dim = Seq(("the quick brown fox is in the house again", "en"))
      .toDF("text", "lang_pred")
    val enriched = Streams.enrichWithDim(mem.toDS().toDF(), dim,
      Seq("text"))
    val q = enriched.writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData(
        IngestDoc(1, t0, "the quick brown fox is in the house again"),
        IngestDoc(2, t0, "unseen text with no dimension row"))
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .select($"doc_id", $"lang_pred").as[(Long, Option[String])]
        .collect().toMap
      assert(got(1L).contains("en"))
      assert(got(2L).isEmpty, "missing dim row must yield NULL, not drop")
    } finally q.stop()
  }

  test("idempotent foreachBatch sink: replayed batch overwrites its " +
      "own directory instead of duplicating; batches union via " +
      "partition discovery") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sink").toString
    val chk = java.nio.file.Files.createTempDirectory("chk").toString
    val mem = MemoryStream[IngestDoc]
    val q = Streams.idempotentParquetSink(
      mem.toDS().toDF().select($"doc_id", $"text"), dir, chk)
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData(IngestDoc(1, t0, "a"), IngestDoc(2, t0, "b"))
      q.processAllAvailable()
      mem.addData(IngestDoc(3, t0, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val once = spark.read.parquet(dir)
    assert(once.select($"doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    // simulate the at-least-once replay: re-write batch 0's content
    // under its deterministic target — row count must NOT change
    Streams.writeBatchIdempotent(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), dir, 0L)
    assert(spark.read.parquet(dir).count() == 3,
      "replay must overwrite, not append")

    // maintenance composition: compact the aged batch_id layout with
    // the same operator the batch side uses — content preserved, the
    // per-batch small files collapse to one sorted file
    import graft.operators.Layout
    val compacted = Layout.compact(spark, dir, "sink_compacted",
      targetRowsPerFile = 1000L, sortCol = "doc_id")
    assert(spark.read.parquet(compacted).select($"doc_id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(Layout.parquetFileCount(spark, compacted) == 1)
  }

  test("forced checkpoint replay: deleting the newest commit makes a " +
      "restart re-execute that batch through foreachBatch, and the " +
      "idempotent sink converges to the same content (x54 shape)") {
    import org.apache.spark.sql.streaming.Trigger
    val src = java.nio.file.Files.createTempDirectory("replay-src").toString
    val dir = java.nio.file.Files.createTempDirectory("replay-sink").toString
    val chk = java.nio.file.Files.createTempDirectory("replay-chk").toString
    // two source files + maxFilesPerTrigger=1 -> two micro-batches
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/f1")
    Seq((3L, "c")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/f2")
    val schema = spark.read.parquet(s"$src/f1").schema
    def pipeline() = Streams.idempotentParquetSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$src/f*"),
      dir, chk, trigger = Some(Trigger.AvailableNow()))
    val q1 = pipeline()
    Streams.awaitTerminationAndUnregister(spark, q1)
    val ids1 = spark.read.parquet(dir).select($"doc_id")
      .as[Long].collect().sorted.toSeq
    assert(ids1 == Seq(1L, 2L, 3L))
    assert(new java.io.File(s"$chk/commits").listFiles()
      .count(_.getName.forall(_.isDigit)) == 2, "expected two batches")

    val replayed = Streams.forceLastBatchReplay(chk)
    assert(replayed == 1L)
    // fingerprint the replayed batch directory's parquet part files;
    // the restart must REWRITE them (new file names), not append
    def parts() = new java.io.File(s"$dir/batch_id=$replayed")
      .listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    val before = parts()
    val q2 = pipeline()
    Streams.awaitTerminationAndUnregister(spark, q2)
    assert(parts() != before, "replay must rewrite the batch directory")
    assert(spark.read.parquet(dir).select($"doc_id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L),
      "post-replay sink must hold every row exactly once")
  }

  test("streaming perplexity gate: frozen-vocab scoring filters " +
      "micro-batches, and agrees with the distributed batch scorer") {
    import graft.operators.LanguageModel
    implicit val sqlCtx = spark.sqlContext
    // frozen model trained on "aa bb cc dd": add-one, N=4, V=4
    val lnP = Seq("aa", "bb", "cc", "dd")
      .map(w => w -> math.log(2.0 / 8.0)).toMap
    val lnOov = math.log(1.0 / 8.0)
    val h = LanguageModel.frozenVocabCrossEntropy($"text", lnP, lnOov)
    val gate = -math.log(2.0 / 8.0) + 1e-9 // pass = fully in-vocab

    val mem = MemoryStream[IngestDoc]
    val q = mem.toDS().toDF().withColumn("h", h)
      .filter($"h" <= gate)
      .writeStream.outputMode("append").format("memory")
      .queryName("ppl_gate_out").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData(IngestDoc(1, t0, "aa bb cc"), IngestDoc(2, t0, "zz qq"))
      q.processAllAvailable()
      mem.addData(IngestDoc(3, t0, "dd dd aa"))
      q.processAllAvailable()
      val kept = spark.table("ppl_gate_out").select($"doc_id")
        .as[Long].collect().sorted.toSeq
      assert(kept == Seq(1L, 3L), "OOV-heavy doc 2 must be gated out")
    } finally q.stop()

    // batch agreement: the frozen projection matches the distributed
    // join-based scorer on the same model within fold-order ULPs
    val docs = Seq(
      (1L, "aa bb cc dd", "en", "ref"),
      (2L, "aa zz aa qq", "en", "web")
    ).toDF("doc_id", "text", "lang", "src")
    val dist = LanguageModel.crossEntropyBuckets(docs, "doc_id", "text",
        "lang", "src = 'ref'")
      .select($"doc_id", $"h_r").as[(Long, Double)].collect().toMap
    val frozen = docs.select($"doc_id", h.as("h"))
      .as[(Long, Double)].collect().toMap
    dist.foreach { case (id, hr) =>
      assert(math.abs(hr - frozen(id)) < 2e-6,
        s"doc $id: distributed=$hr frozen=${frozen(id)}")
    }
  }
}
