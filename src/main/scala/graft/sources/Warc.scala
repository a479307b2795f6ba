package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** WET (WARC conversion-record) source/sink — the interchange format
  * crawl corpora arrive in (ISO 28500 / the Common Crawl `.wet`
  * layout): records framed by a `WARC/1.0` version line, CRLF-folded
  * named headers, one blank line, then a Content-Length-delimited
  * UTF-8 text payload terminated by two CRLFs.
  *
  * Read shape: the text datasource with a multi-byte `lineSep` of the
  * version line — Hadoop's delimited line reader handles a separator
  * straddling an input-split boundary, so records never tear across
  * tasks and a 100 TB WET dump parallelizes by HDFS block exactly
  * like plain text. Past the scan, parsing is a pure chain of
  * codegen'd projections (one bounded split, per-field regex
  * extracts, a BINARY substring for byte-exact payload framing):
  * zero shuffle, column-prunable, and the payload bytes never move
  * except into the output column.
  *
  * The lineSep framing assumes the version line appears only at
  * record starts — true of conversion (text) records, whose payloads
  * are extracted prose; `frame_ok=false` flags any record whose
  * post-payload slack is not CRLF padding (truncated payload,
  * length/byte drift, or an in-payload marker), so a quarantine
  * filter downstream sees every framing violation instead of a torn
  * job. A length-honoring custom InputFormat is the escape hatch if
  * a corpus legitimately embeds the marker; none of the public WET
  * dumps do.
  */
object Warc {

  /** Version line that opens (and, as a read delimiter, splits)
    * every record. */
  val RecordSep = "WARC/1.0"

  /** Header names emitted by [[writeWet]] and parsed by [[readWet]]. */
  private val HeaderRe: Map[String, String] = Map(
    "rec_type" -> "(?m)^WARC-Type:\\s*(\\S+)",
    "rec_id" -> "(?m)^WARC-Record-ID:\\s*(\\S+)",
    "rec_date" -> "(?m)^WARC-Date:\\s*(\\S+)",
    "uri" -> "(?m)^WARC-Target-URI:\\s*(\\S+)",
    "content_length" -> "(?m)^Content-Length:\\s*([0-9]+)")

  private def header(block: Column, field: String): Column = {
    val v = regexp_extract(block, HeaderRe(field), 1)
    when(v === "", lit(null)).otherwise(v)
  }

  /** Read a WET dump into (uri, rec_type, rec_id, rec_date,
    * content_length, text, frame_ok). Missing headers are null;
    * `text` is the first `content_length` BYTES of the payload
    * (UTF-8 — Content-Length is an octet count, so a char-based
    * substring would misframe any non-ASCII record); `frame_ok` is
    * false when the declared length does not land on the record's
    * CRLF terminator. */
  def readWet(spark: SparkSession, path: String): DataFrame =
    parseChunks(spark.read.option("lineSep", RecordSep).text(path))

  /** Streaming [[readWet]]: the same multi-byte-lineSep scan and
    * codegen parse over Spark's file streaming source — new WET part
    * files ingest incrementally as they land (the crawl-delivery
    * shape), `maxFilesPerTrigger` bounding each micro-batch. The
    * parse is stateless, so exactly-once falls out of the file
    * source + checkpoint alone. */
  def readWetStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val base = spark.readStream.option("lineSep", RecordSep)
    val withRate = maxFilesPerTrigger
      .fold(base)(n => base.option("maxFilesPerTrigger", n))
    parseChunks(withRate.text(path))
  }

  private def parseChunks(raw: DataFrame): DataFrame = {
    // Spark's one-arg trim strips SPACES only — strip the whole
    // whitespace family explicitly or blank preamble chunks survive
    val chunks = raw.filter(length(trim(col("value"), " \r\n\t")) > 0)
    val parts = split(col("value"), "\\r\\n\\r\\n", 2)
    val hdr = element_at(parts, 1)
    // a degenerate record with no blank line has no payload — null,
    // not an ANSI index error tearing the whole scan
    val payload = try_element_at(parts, lit(2))
    chunks
      .select(hdr.as("__hdr"), payload.as("__payload"))
      .select(
        header(col("__hdr"), "uri").as("uri"),
        header(col("__hdr"), "rec_type").as("rec_type"),
        header(col("__hdr"), "rec_id").as("rec_id"),
        header(col("__hdr"), "rec_date").as("rec_date"),
        header(col("__hdr"), "content_length").cast("long")
          .as("content_length"),
        col("__payload"))
      .withColumn("text",
        when(col("content_length").isNull || col("__payload").isNull,
          lit(null))
          .otherwise(expr(
            "cast(substring(cast(__payload as binary), 1, " +
              "content_length) as string)")))
      // the slack after the declared payload must be CRLF framing
      // only (the record-final CRLFCRLF, minus whatever the writer's
      // own row terminator contributed)
      .withColumn("frame_ok",
        col("content_length").isNotNull && col("__payload").isNotNull &&
          octet_length(col("text")) === col("content_length") &&
          trim(expr(
            "cast(substring(cast(__payload as binary), " +
              "content_length + 1) as string)"), " \r\n\t") === "")
      .select("uri", "rec_type", "rec_id", "rec_date", "content_length",
        "text", "frame_ok")
  }

  /** Render (uriCol, dateCol, textCol) rows as WET conversion
    * records — one record per row, byte-exact Content-Length, a
    * deterministic md5-derived WARC-Record-ID (crawl replays must
    * produce identical dumps; a random uuid would break the
    * roundtrip contract this library verifies). */
  def wetRecord(uri: Column, date: Column, text: Column): Column =
    concat(
      lit(RecordSep + "\r\n"),
      lit("WARC-Type: conversion\r\n"),
      lit("WARC-Record-ID: <urn:md5:"), md5(uri), lit(">\r\n"),
      lit("WARC-Date: "), date, lit("\r\n"),
      lit("WARC-Target-URI: "), uri, lit("\r\n"),
      lit("Content-Type: text/plain\r\n"),
      lit("Content-Length: "), octet_length(text).cast("string"),
      lit("\r\n\r\n"),
      text, lit("\r\n\r\n"))

  /** Write rows as a WET dump (uncompressed part files; record order
    * within and across parts is not meaningful — WET consumers key
    * on WARC-Target-URI). */
  def writeWet(df: DataFrame, path: String, uriCol: String,
      dateCol: String, textCol: String): Unit =
    df.select(wetRecord(col(uriCol), col(dateCol), col(textCol))
        .as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
}
