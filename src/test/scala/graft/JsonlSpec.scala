package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.Jsonl

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  test("write/read round-trips content, including JSON-escaped text") {
    val dir = Files.createTempDirectory("jsonl").toString + "/docs"
    val docs = Seq((1L, "plain text"), (2L, "quotes \" and \\ slashes"),
      (3L, "tabs\tand\nnewlines"), (4L, "")).toDF("doc_id", "text")
    Jsonl.write(docs, dir)
    val back = Jsonl.read(spark, dir, schema)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(back == Seq((1L, "plain text"), (2L, "quotes \" and \\ slashes"),
      (3L, "tabs\tand\nnewlines"), (4L, "")))
  }

  test("keepCorrupt quarantines malformed lines instead of failing") {
    val dir = Files.createTempDirectory("jsonl").toString
    Files.writeString(java.nio.file.Paths.get(dir, "part-00000.json"),
      """{"doc_id": 1, "text": "good"}
        |this is not json
        |{"doc_id": 2, "text": "also good"}
        |""".stripMargin)
    // Spark disallows querying ONLY the corrupt-record column from raw
    // JSON; cache the parsed frame first (the documented pattern)
    val read = Jsonl.read(spark, dir, schema, keepCorrupt = true).cache()
    val good = read.filter(col("_corrupt_record").isNull)
      .select("doc_id").as[Long].collect().sorted
    val bad = read.filter(col("_corrupt_record").isNotNull).count()
    assert(good.toSeq == Seq(1L, 2L) && bad == 1)
  }

  test("Quarantine.ingest splits clean from corrupt with per-reason " +
    "classification and reconciling counts") {
    import graft.sources.Quarantine
    val dir = Files.createTempDirectory("jsonl").toString
    Files.writeString(java.nio.file.Paths.get(dir, "part-00000.json"),
      """{"doc_id": 1, "text": "good"}
        |{"doc_id": 2, "text":
        |{"doc_id": "oops", "text": "well-formed, wrong type"}
        |not json at all
        |{"doc_id": 3, "text": "also good"}
        |""".stripMargin)
    val parsed = Jsonl.read(spark, dir, schema, keepCorrupt = true)
    val (clean, quar) = Quarantine.ingest(spark, parsed, "spec_jsonl",
      Quarantine.jsonReason)
    val cleanIds = clean.select("doc_id").as[Long].collect().sorted.toSeq
    val reasons = quar.groupBy("reason").count()
      .as[(String, Long)].collect().toMap
    assert(cleanIds == Seq(1L, 3L))
    assert(reasons == Map("malformed_json" -> 2L, "schema_mismatch" -> 1L))
    assert(clean.count() + quar.count() == 5L)
    // the quarantine table keeps the raw evidence verbatim
    val raw = quar.filter(col("reason") === "schema_mismatch")
      .select("raw").as[String].head()
    assert(raw == """{"doc_id": "oops", "text": "well-formed, wrong type"}""")
  }

  test("Quarantine.ingest on an all-clean file yields an empty " +
    "quarantine table, not a missing one") {
    import graft.sources.Quarantine
    val dir = Files.createTempDirectory("jsonl").toString
    Files.writeString(java.nio.file.Paths.get(dir, "part-00000.json"),
      """{"doc_id": 1, "text": "a"}
        |{"doc_id": 2, "text": "b"}
        |""".stripMargin)
    val parsed = Jsonl.read(spark, dir, schema, keepCorrupt = true)
    val (clean, quar) = Quarantine.ingest(spark, parsed, "spec_allclean")
    assert(clean.count() == 2L && quar.count() == 0L)
    assert(quar.columns.toSeq == Seq("raw", "reason"))
  }
}
