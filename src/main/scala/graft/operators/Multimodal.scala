package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and a batched decode /
  * feature-extract stage.
  *
  * The decode stage is the Scala analog of a PySpark `mapInPandas`
  * pipeline: a `mapPartitions` over a typed Dataset, so decoding
  * amortizes per-partition setup (codec init, model load) exactly the
  * way a pandas-batch UDF would. IMAGE decoding (PNG/JPEG) is REAL —
  * `javax.imageio` ships with the JDK, so image payloads yield actual
  * pixel dimensions and a validity bit from an actual decode. AUDIO
  * decoding is REAL for WAV — `javax.sound.sampled` also ships with
  * the JDK, so WAV payloads yield the actual sample rate / channel
  * count / frame length from a parsed container ([[decodeAudio]] /
  * [[decodeAudioFeatures]]). Video decoding remains a STUB (no video codecs
  * in this environment): `stubDecode` derives deterministic pseudo-features
  * from the payload's md5, so the plumbing — schema, encoders,
  * partitioning, batch shape — is identical for all modalities and
  * swapping in a real video codec later only touches `stubDecode`'s
  * dispatch arm.
  */
object Multimodal {

  /** One media payload: opaque bytes + typed metadata. */
  final case class MediaRecord(id: Long, bytes: Array[Byte], mime: String)

  /** Extracted features (decode stub: width/height/duration are
    * md5-derived pseudo-values standing in for real codec output). */
  final case class MediaFeatures(id: Long, n_bytes: Long, magic_hex: String,
      content_md5: String, width: Long, height: Long, is_valid: Boolean)

  private val HexChars = "0123456789abcdef".toCharArray

  private def hexLower(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach { b =>
      sb.append(HexChars((b >> 4) & 0xf)).append(HexChars(b & 0xf))
    }
    sb.toString
  }

  /** Magic-byte MIME sniffing over real container signatures. */
  def sniffMime(bytes: Array[Byte]): String = {
    def startsWith(sig: Int*): Boolean =
      bytes.length >= sig.length &&
        sig.zipWithIndex.forall { case (b, i) => (bytes(i) & 0xff) == b }
    if (startsWith(0x89, 0x50, 0x4e, 0x47)) "image/png"
    else if (startsWith(0xff, 0xd8, 0xff)) "image/jpeg"
    else if (startsWith(0x52, 0x49, 0x46, 0x46)) "audio/wav"
    else if (startsWith(0x1a, 0x45, 0xdf, 0xa3)) "video/webm"
    else "application/octet-stream"
  }

  /** REAL image decode via the JDK's javax.imageio: (width, height)
    * from an actual pixel decode of a PNG/JPEG payload, or None when
    * the bytes don't decode (truncated/corrupt image). */
  def decodeImage(bytes: Array[Byte]): Option[(Long, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else Some((img.getWidth.toLong, img.getHeight.toLong))
    } catch { case _: java.io.IOException => None }

  /** Decode one record. Image MIME types ([[sniffMime]]) go through
    * the REAL `javax.imageio` decode — actual dimensions, `is_valid` =
    * the decode succeeded (sniffed-as-image bytes that fail to decode
    * come back is_valid = false with the md5 pseudo-dims, so corrupt
    * payloads are flaggable without a row error). Audio/video/unknown
    * payloads take the md5 STUB arm: width = h % 640 + 16, height =
    * (h / 640) % 480 + 16 with h the first-15-hex-chars md5 value —
    * the DuckDB-expressible arithmetic the m2 oracle mirrors. */
  def stubDecode(r: MediaRecord): MediaFeatures = {
    val md = MessageDigest.getInstance("MD5").digest(r.bytes)
    val hex = hexLower(md)
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val stubW = h % 640 + 16
    val stubH = (h / 640) % 480 + 16
    val meta = (r.bytes.length.toLong, hexLower(r.bytes.take(4)), hex)
    if (r.mime.startsWith("image/"))
      decodeImage(r.bytes) match {
        case Some((w, ht)) =>
          MediaFeatures(r.id, meta._1, meta._2, meta._3, w, ht, true)
        case None =>
          MediaFeatures(r.id, meta._1, meta._2, meta._3, stubW, stubH, false)
      }
    else
      MediaFeatures(r.id, meta._1, meta._2, meta._3, stubW, stubH,
        r.bytes.nonEmpty)
  }

  /** Batched decode stage — one `stubDecode` per record, amortized per
    * partition (the mapInPandas analog). Narrow transformation: no
    * shuffle; partitioning of the input is preserved. */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition setup would go here (audio/video codec init;
      // ImageIO is stateless)
      it.map(stubDecode)
    }
  }

  /** Deterministic PNG payload: a w×h RGB image whose pixel (x, y) is
    * the 24-bit value (x·31 + y·17) — encoded with the same JDK
    * ImageIO the decode path reads back. Test/fixture generator for
    * the real-decode round trip (catalog m2b, MultimodalSpec). */
  def synthPng(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Extracted audio features: real container metadata for WAV
    * payloads, zeros + is_valid=false otherwise. */
  final case class AudioFeatures(id: Long, n_bytes: Long,
      sample_rate: Long, channels: Long, n_frames: Long,
      duration_ms: Long, is_valid: Boolean)

  /** REAL audio parse via the JDK's javax.sound.sampled: (sample rate
    * Hz, channel count, frame length) from an actual parse of the WAV
    * container — the frame length requires walking to the data chunk,
    * so a payload with a forged header fails here, not downstream.
    * None when the bytes aren't a parseable audio container. */
  def decodeAudio(bytes: Array[Byte]): Option[(Long, Long, Long)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val frames = in.getFrameLength
      in.close()
      if (frames < 0) None
      else Some((fmt.getSampleRate.toLong, fmt.getChannels.toLong, frames))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Batched REAL audio decode stage (the WAV analog of
    * [[decodeFeatures]]'s image arm): WAV-sniffed payloads parse via
    * [[decodeAudio]] — actual sample rate / channels / frame count,
    * duration_ms = frames * 1000 / rate in integer (floor) arithmetic
    * so the oracle can state it exactly; anything else (non-audio
    * MIME, corrupt RIFF bytes) comes back zeroed with is_valid =
    * false instead of erroring the row. Narrow stage: no shuffle,
    * input partitioning preserved. */
  def decodeAudioFeatures(ds: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val parsed =
        if (r.mime == "audio/wav") decodeAudio(r.bytes) else None
      parsed match {
        case Some((rate, ch, frames)) =>
          AudioFeatures(r.id, r.bytes.length.toLong, rate, ch, frames,
            frames * 1000L / rate, true)
        case None =>
          AudioFeatures(r.id, r.bytes.length.toLong, 0L, 0L, 0L, 0L, false)
      }
    })
  }

  /** Deterministic PCM-16 WAV payload: `nFrames` frames at
    * `sampleRate` Hz × `channels`, sample (frame f, channel c) =
    * ((f*31 + c*7) % 8192 - 4096) — encoded with the same JDK
    * javax.sound.sampled the decode path parses back. Test/fixture
    * generator for the real-decode round trip (catalog m2c,
    * MultimodalSpec). */
  def synthWav(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nFrames > 0,
      s"bad wav params $sampleRate/$channels/$nFrames")
    val pcm = new Array[Byte](nFrames * channels * 2)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        val v = ((f * 31 + c * 7) % 8192 - 4096).toShort
        val off = (f * channels + c) * 2
        pcm(off) = (v & 0xff).toByte          // little-endian PCM
        pcm(off + 1) = ((v >> 8) & 0xff).toByte
        c += 1
      }
      f += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** One sampled frame of a resized media item. */
  final case class MediaTransform(id: Long, width: Long, height: Long,
      resized_w: Long, resized_h: Long, frame_idx: Int,
      frame_offset_ms: Long)

  /** Pseudo duration (ms) from the content md5 — the stub standing in
    * for the container's real duration field. */
  def stubDurationMs(md5Hex: String): Long =
    java.lang.Long.parseLong(md5Hex.substring(0, 15), 16) % 120000L

  /** Resize + frame-sample stage: aspect-preserving fit-within resize
    * of the decoded dimensions and `nFrames` evenly spaced frame
    * offsets across the (stub) duration. The dimension/offset
    * arithmetic is the real thing (and exactly DuckDB-expressible —
    * IEEE double ops in identical order, integer frame offsets); the
    * pixel resample/frame grab would live in this same narrow
    * flatMap when a codec is available. No shuffle; partitioning
    * preserved; output is nFrames rows per item. */
  def transformStage(feats: Dataset[MediaFeatures], maxW: Long, maxH: Long,
      nFrames: Int): Dataset[MediaTransform] = {
    import feats.sparkSession.implicits._
    feats.flatMap { f =>
      val scale = math.min(1.0,
        math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
      val rw = math.floor(f.width * scale).toLong
      val rh = math.floor(f.height * scale).toLong
      val dur = stubDurationMs(f.content_md5)
      (0 until nFrames).map(i =>
        MediaTransform(f.id, f.width, f.height, rw, rh, i,
          i.toLong * dur / nFrames))
    }
  }

  /** Build a MediaRecord dataset from any (id, binary payload) frame —
    * the ingestion plumbing from raw columns into the typed pipeline. */
  def fromBinaryColumn(spark: SparkSession, df: DataFrame, idCol: String,
      bytesCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(bytesCol).cast("binary").as("bytes"))
      .withColumn("mime", lit("application/octet-stream"))
      .as[MediaRecord]
      .mapPartitions(_.map(r => r.copy(mime = sniffMime(r.bytes))))
  }
}
