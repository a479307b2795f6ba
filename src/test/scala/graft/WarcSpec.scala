package graft

import org.apache.spark.sql.functions._

import graft.sources.Warc

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(uri: String, date: String, text: String,
      declaredLen: Option[Int] = None): String = {
    val n = declaredLen.getOrElse(
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
    "WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Length: $n\r\n" +
      "\r\n" +
      text + "\r\n\r\n"
  }

  test("writeWet/readWet roundtrip: byte-exact Content-Length framing " +
      "survives non-ASCII payloads and multi-part writes") {
    val dir = java.nio.file.Files.createTempDirectory("wet").toString
    val docs = Seq(
      (1L, "plain ascii body"),
      (2L, "unicode café naïve — 字"),
      (3L, "blank\n\nlines inside\nbody"),
      (4L, "")
    ).toDF("id", "text")
      .select(concat(lit("https://s"), col("id"), lit(".example.test/d"))
        .as("uri"), lit("2024-01-01T00:00:00Z").as("dt"), col("text"))
    Warc.writeWet(docs.repartition(3), dir, "uri", "dt", "text")
    val back = Warc.readWet(spark, dir)
      .select("uri", "rec_type", "rec_date", "content_length", "text",
        "frame_ok")
      .as[(String, String, String, Long, String, Boolean)]
      .collect().sortBy(_._1)
    assert(back.length == 4)
    assert(back.forall(_._2 == "conversion"))
    assert(back.forall(_._6), s"frame_ok must hold everywhere: ${back.toSeq}")
    val byUri = back.map(r => r._1 -> r).toMap
    assert(byUri("https://s2.example.test/d")._5 == "unicode café naïve — 字")
    assert(byUri("https://s2.example.test/d")._4 >
      "unicode café naïve — 字".length) // octets, not chars
    assert(byUri("https://s3.example.test/d")._5 ==
      "blank\n\nlines inside\nbody")
    assert(byUri("https://s4.example.test/d")._5 == "")
  }

  test("readWet flags framing violations instead of tearing: " +
      "overdeclared and underdeclared Content-Length both get " +
      "frame_ok=false with the declared-length slice") {
    val dir = java.nio.file.Files.createTempDirectory("wetbad").toString
    val good = rec("https://ok.example.test/", "2024-01-01T00:00:00Z",
      "good body")
    // declared 4 bytes but 9-byte payload: slack is not CRLF framing
    val over = rec("https://short.example.test/", "2024-01-01T00:00:00Z",
      "good body", declaredLen = Some(4))
    // declared 100 bytes but 9-byte payload: slice comes up short
    val under = rec("https://long.example.test/", "2024-01-01T00:00:00Z",
      "good body", declaredLen = Some(100))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-0.warc.wet"), good + over + under)
    val back = Warc.readWet(spark, dir)
      .select("uri", "content_length", "text", "frame_ok")
      .as[(String, Long, String, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(back("https://ok.example.test/") ==
      (("https://ok.example.test/", 9L, "good body", true)))
    assert(back("https://short.example.test/")._4 == false)
    assert(back("https://short.example.test/")._3 == "good")
    assert(back("https://long.example.test/")._4 == false)
  }

  test("readWet: a record missing headers yields nulls, not a torn " +
      "job; preamble before the first version line is ignored") {
    val dir = java.nio.file.Files.createTempDirectory("wethdr").toString
    val headerless = "WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n\r\nbody with no uri\r\n\r\n"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "f.wet"),
      "   \n" + headerless +
        rec("https://u.example.test/", "2024-02-02T00:00:00Z", "x"))
    val back = Warc.readWet(spark, dir)
      .orderBy(col("uri").asc_nulls_first)
      .select("uri", "content_length", "frame_ok")
      .collect()
    assert(back.length == 2)
    assert(back(0).isNullAt(0) && back(0).isNullAt(1) &&
      !back(0).getBoolean(2))
    assert(back(1).getString(0) == "https://u.example.test/" &&
      back(1).getLong(1) == 1L && back(1).getBoolean(2))
  }

  test("readWetStream over multiple part files equals the batch read, " +
      "with the rate limit splitting micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("wetstream").toString
    val docs = (1L to 40L).map(i => (i, s"body of record $i"))
      .toDF("id", "text")
      .select(concat(lit("https://r"), col("id"), lit(".example.test/"))
        .as("uri"), lit("2024-03-03T00:00:00Z").as("dt"), col("text"))
    Warc.writeWet(docs.repartition(4), dir, "uri", "dt", "text")
    val streamed = graft.streaming.Streams.runAvailableNowToDir(spark,
        Warc.readWetStream(spark, dir, maxFilesPerTrigger = Some(1)),
        "warc_spec_stream")
      .select("uri", "content_length", "text", "frame_ok")
      .as[(String, Long, String, Boolean)].collect().sortBy(_._1)
    val batch = Warc.readWet(spark, dir)
      .select("uri", "content_length", "text", "frame_ok")
      .as[(String, Long, String, Boolean)].collect().sortBy(_._1)
    assert(streamed.length == 40 && streamed.toSeq == batch.toSeq)
    assert(streamed.forall(_._4))
  }

  test("readWet parses the deterministic md5 record id written by " +
      "wetRecord") {
    val dir = java.nio.file.Files.createTempDirectory("wetid").toString
    val docs = Seq((7L, "t")).toDF("id", "text")
      .select(lit("https://id.example.test/").as("uri"),
        lit("2024-01-01T00:00:00Z").as("dt"), col("text"))
    Warc.writeWet(docs, dir, "uri", "dt", "text")
    val got = Warc.readWet(spark, dir).select("rec_id").as[String].head()
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("https://id.example.test/".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got == s"<urn:md5:$md5>")
  }
}
