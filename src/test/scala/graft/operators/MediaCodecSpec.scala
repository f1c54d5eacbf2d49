package graft.operators

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Real JDK media decode: javax.imageio images + javax.sound WAV-PCM,
  * checked against closed-form ground truth (fixtures constructed so every
  * decoded property is analytically known). */
class MediaCodecSpec extends SparkSpec {

  private def rampPng(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = x * 255 / (w - 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    MediaCodec.pngBytes(img)
  }

  test("image decode: dimensions, channels, analytic dHash") {
    val m = MediaCodec.decodeImage(rampPng(32, 16))
    assert(m.width === 32 && m.height === 16 && m.channels === 3)
    // horizontal ramp: every left<right cell comparison is true -> all 64 bits
    assert(m.dhash64 === -1L)
    // 8x8 gray features monotonically increase along each row
    val row0 = m.grayFeatures.slice(0, 8)
    assert(row0.zip(row0.tail).forall { case (a, b) => a < b })

    val flat = new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 8; x <- 0 until 8) flat.setRGB(x, y, 0x808080)
    val fm = MediaCodec.decodeImage(MediaCodec.pngBytes(flat))
    assert(fm.channels === 1 && fm.dhash64 === 0L)
  }

  test("dHash is robust to rescaling (perceptual, not exact)") {
    val small = MediaCodec.decodeImage(rampPng(32, 16))
    val big = MediaCodec.decodeImage(rampPng(128, 64))
    assert(small.dhash64 === big.dhash64)
  }

  test("wav decode: duration and RMS from PCM") {
    val square = MediaCodec.wavBytes(
      Array.tabulate[Short](4000)(i => if (i % 2 == 0) 8192 else -8192), 8000)
    val m = MediaCodec.decodeWavPcm(square)
    assert(m.sampleRate === 8000 && m.channels === 1 && m.frames === 4000L)
    assert(m.durationMs === 500L)
    assert(m.rmsQ === 250L) // |8192|/32768 = 0.25 exactly

    val silence = MediaCodec.decodeWavPcm(MediaCodec.wavBytes(Array.fill[Short](2000)(0), 8000))
    assert(m.sampleRate === 8000 && silence.durationMs === 250L && silence.rmsQ === 0L)
  }

  test("decodeMediaMeta runs partition-parallel and survives corrupt payloads") {
    import spark.implicits._
    val df = Seq(
      (1L, "image/png", rampPng(16, 16)),
      (2L, "audio/wav", MediaCodec.wavBytes(Array.fill[Short](800)(0), 8000)),
      (3L, "image/png", "not an image".getBytes), // corrupt: must not kill the job
      (4L, "application/octet-stream", Array[Byte](1, 2, 3))
    ).toDF("id", "kind", "content").repartition(3)
    val out = Multimodal.decodeMediaMeta(df, "id", "kind", "content").orderBy("id").collect()
    assert(out.length === 4)
    assert(out(0).getInt(2) === 16 && out(0).getInt(3) === 16)
    assert(out(1).getLong(6) === 100L)
    assert(out(2).isNullAt(2) && out(3).isNullAt(2))
  }

  test("decodeMp4Meta: box-tree walk yields dimensions, duration, tracks") {
    val m = MediaCodec.decodeMp4Meta(MediaCodec.mp4Bytes(1920, 1080, durationMs = 123456))
    assert(m === MediaCodec.VideoMeta(1920, 1080, 123456L, 1))
    // a non-1000 timescale converts through exactly
    val ts90k = MediaCodec.mp4Bytes(320, 240, durationMs = 2000, timescale = 90000)
    assert(MediaCodec.decodeMp4Meta(ts90k).durationMs === 2000L)
    // malformed payloads throw; the partition decoder surfaces nulls
    intercept[Exception](MediaCodec.decodeMp4Meta("notamp4".getBytes))
    intercept[Exception](MediaCodec.decodeMp4Meta(Array[Byte](0, 0, 0, 9, 'm', 'o', 'o', 'v')))
    import spark.implicits._
    val df = Seq(
      (1L, "video/mp4", MediaCodec.mp4Bytes(640, 360, 2500)),
      (2L, "video/mp4", "garbage".getBytes)
    ).toDF("id", "kind", "content")
    val out = Multimodal.decodeMediaMeta(df, "id", "kind", "content").orderBy("id").collect()
    assert(out(0).getInt(2) === 640 && out(0).getInt(3) === 360)
    assert(out(0).getInt(4) === 1 && out(0).getLong(6) === 2500L)
    assert(out(1).isNullAt(2) && out(1).isNullAt(6))
  }

  test("decodeMp4Meta: v1 boxes (64-bit times) and the size-0 last box") {
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(t: String, p: Array[Byte]) =
      be32(p.length + 8L) ++ t.getBytes("ISO-8859-1") ++ p
    // mvhd v1: ver=1, 8-byte times, timescale@20, 8-byte duration@24
    val mvhd = Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(90000) ++ be64(180000L) ++ new Array[Byte](80)
    // tkhd v1: widened times/duration put 16.16 width at payload offset 88
    val tkhd = Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(1) ++ be32(0) ++
      be64(180000L) ++ new Array[Byte](8 + 2 + 2 + 2 + 2 + 36) ++
      be32(1280L << 16) ++ be32(720L << 16)
    val moov = box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
    // trailing size-0 box "extends to end of file" — ISO-BMFF-legal
    val mdat0 = be32(0) ++ "mdat".getBytes("ISO-8859-1") ++ Array[Byte](1, 2, 3)
    assert(MediaCodec.decodeMp4Meta(moov ++ mdat0) ===
      MediaCodec.VideoMeta(1280, 720, 2000L, 1)) // 180000 / 90000 ticks = 2 s
  }

  test("decodeMediaMeta: audio-only mp4 reports null dimensions, real duration") {
    // strip the trak from the fixture: no visual track
    val full = MediaCodec.mp4Bytes(640, 360, 2500)
    val m = MediaCodec.decodeMp4Meta(full)
    assert(m.tracks === 1)
    import spark.implicits._
    // rebuild with zero-sized width/height track -> width stays 0 -> nulls
    val noVid = MediaCodec.mp4Bytes(0, 0, 2500)
    val out = Multimodal.decodeMediaMeta(
      Seq((1L, "video/mp4", noVid)).toDF("id", "kind", "content"),
      "id", "kind", "content").head()
    assert(out.isNullAt(2) && out.isNullAt(3))
    assert(out.getLong(6) === 2500L)
  }

  test("audioEnvelopeHash64: hand-set amplitude steps map to exact bits") {
    import MediaCodec.squareWav
    assert(MediaCodec.audioEnvelopeHash64(squareWav(w => 100 + w * 50)) === -1L)
    assert(MediaCodec.audioEnvelopeHash64(squareWav(_ => 500)) === 0L)
    assert(MediaCodec.audioEnvelopeHash64(
      squareWav(w => if (w == 40) 5000 else 500)) === (1L << 39))
    // one flattened step clears exactly that comparison's bit
    val oneFlat = MediaCodec.audioEnvelopeHash64(
      squareWav(w => if (w == 33) 100 + 32 * 50 else 100 + w * 50))
    assert(oneFlat === (-1L & ~(1L << 32)))
    // distributed helper drops undecodables, keeps hashes
    import spark.implicits._
    val out = Multimodal.audioEnvelopeHashes(
      Seq((1L, squareWav(_ => 500)), (2L, "junk".getBytes)).toDF("id", "content"),
      "id", "content").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 0L)))
  }

  test("resizeImage: exact area-average per block, round-trips through PNG") {
    // 4x4 grayscale quadrants 0 / 64 / 128 / 192 -> 2x2 of exactly those means
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) {
      val v = (if (y < 2) 0 else 128) + (if (x < 2) 0 else 64)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val small = MediaCodec.resizeImage(MediaCodec.pngBytes(img), 2, 2)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(small))
    assert(back.getWidth === 2 && back.getHeight === 2)
    val got = for (y <- 0 until 2; x <- 0 until 2) yield back.getRGB(x, y) & 0xff
    assert(got === Seq(0, 64, 128, 192))
    // distributed: resized dims visible through decode, garbage dropped
    import spark.implicits._
    val out = Multimodal.resizeImages(
      Seq((1L, MediaCodec.pngBytes(img)), (2L, "junk".getBytes)).toDF("id", "content"),
      "id", "content", w = 2, h = 2)
    val meta = Multimodal.decodeMediaMeta(
      out.withColumn("kind", org.apache.spark.sql.functions.lit("image/png")),
      "id", "kind", "content").collect()
    assert(meta.map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).toSeq === Seq((1L, 2, 2)))
  }

  test("decodeImageFeatures yields a 64-dim embedding column, drops undecodable rows") {
    import spark.implicits._
    val df = Seq(
      (1L, rampPng(32, 16)),
      (2L, "garbage".getBytes)
    ).toDF("id", "content")
    val out = Multimodal.decodeImageFeatures(df, "id", "content").collect()
    assert(out.length === 1 && out(0).getLong(0) === 1L)
    assert(out(0).getSeq[Float](1).size === 64)
  }

  test("mp4Samples: sample tables round-trip through the fixture builder") {
    val frames = (0 until 6).map(i => s"payload$i!".getBytes("UTF-8"))
    val mp4 = MediaCodec.mp4BytesWithSamples(
      320, 240, frames, frameDurMs = 200, syncEvery = 2)
    // the container still parses as plain metadata
    val meta = MediaCodec.decodeMp4Meta(mp4)
    assert(meta.width === 320 && meta.height === 240 && meta.durationMs === 1200)
    val refs = MediaCodec.mp4Samples(mp4)
    assert(refs.map(_.ptsMs) === Seq(0L, 200L, 400L, 600L, 800L, 1000L))
    assert(refs.map(_.sync) === Seq(true, false, true, false, true, false))
    // byte ranges point at the exact payloads inside mdat
    refs.zipWithIndex.foreach { case (f, i) =>
      val got = new String(mp4, f.offset.toInt, f.size.toInt, "UTF-8")
      assert(got === s"payload$i!", s"frame $i")
    }
  }

  test("sampleFrameRefs: seek-to-previous per interval; keyframesOnly restricts") {
    val frames = (0 until 10).map(i =>
      MediaCodec.FrameRef(i, i * 250L, i * 10L, 10L, sync = i % 3 == 0))
    // tail-inclusive: the final target one interval past lastPts picks 9
    val all = MediaCodec.sampleFrameRefs(frames, everyMs = 1000L, keyframesOnly = false)
    assert(all.map(_.index) === Seq(0, 4, 8, 9))
    val key = MediaCodec.sampleFrameRefs(frames, everyMs = 1000L, keyframesOnly = true)
    assert(key.map(_.index) === Seq(0, 3, 6, 9))
    // interval denser than frames: duplicates collapse, every frame at most once
    val dense = MediaCodec.sampleFrameRefs(frames, everyMs = 100L, keyframesOnly = false)
    assert(dense.map(_.index) === (0 until 10))
    assert(MediaCodec.sampleFrameRefs(Nil, 1000L, keyframesOnly = false) === Nil)
  }

  test("sliceWavSegments: sample-exact windows, tail kept, round-trips through decode") {
    val src = Array.tabulate[Short](8000)(i => if (i < 4000) 8192 else -8192)
    val wav = MediaCodec.wavBytes(src, 8000)
    val segs = MediaCodec.sliceWavSegments(wav, everyMs = 250, segmentMs = 250)
    assert(segs.map(s => (s._1, s._2)) === Seq((0L, 2000L), (250L, 2000L), (500L, 2000L), (750L, 2000L)))
    // byte-exact round trip: re-decoded segment samples == the source range
    val seg1 = AudioSystemHelpers.samples(segs(1)._3)
    assert(seg1 === src.slice(2000, 4000).toSeq)
    // tail partial window
    val tail = MediaCodec.sliceWavSegments(
      MediaCodec.wavBytes(Array.fill[Short](2400)(100), 8000), 250, 250)
    assert(tail.map(s => (s._1, s._2)) === Seq((0L, 2000L), (250L, 400L)))
    // distributed path drops undecodable rows
    import spark.implicits._
    val df = Seq((1L, wav), (2L, "junk".getBytes)).toDF("id", "content")
    val got = Multimodal.sliceAudioSegments(df, "id", "content", 250, 250).collect()
    assert(got.length === 4 && got.forall(_.getLong(0) === 1L))
  }

  private object AudioSystemHelpers {
    def samples(wav: Array[Byte]): Seq[Short] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      try {
        val data = in.readAllBytes()
        val fmt = in.getFormat
        (0 until data.length / 2).map { i =>
          if (fmt.isBigEndian) ((data(i * 2) << 8) | (data(i * 2 + 1) & 0xff)).toShort
          else ((data(i * 2 + 1) << 8) | (data(i * 2) & 0xff)).toShort
        }
      } finally in.close()
    }
  }

  test("sampleVideoFrames: distributed frame extraction, opaque payload column") {
    import spark.implicits._
    val mp4 = MediaCodec.mp4BytesWithSamples(
      320, 240, (0 until 4).map(i => s"F$i".getBytes("UTF-8")), frameDurMs = 500)
    val df = Seq((1L, mp4), (2L, "junk".getBytes)).toDF("id", "content")
    val got = Multimodal.sampleVideoFrames(df, "id", "content", everyMs = 1000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        new String(r.getAs[Array[Byte]](4), "UTF-8")))
    // junk row dropped; video 1 sampled at 0/1000/2000 (tail-inclusive)
    assert(got.toSeq === Seq((1L, 0, 0L, "F0"), (1L, 2, 1000L, "F2"), (1L, 3, 1500L, "F3")))
  }
}
