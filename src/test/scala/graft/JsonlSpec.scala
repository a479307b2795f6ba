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
}
