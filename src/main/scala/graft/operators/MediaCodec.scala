package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/**
 * JVM-only media codecs for multimodal columns — no external libraries:
 * `javax.imageio` (PNG/JPEG/BMP/GIF) and `javax.sound.sampled` (WAV PCM).
 * These are the per-row decode calls [[Multimodal]] runs inside its
 * partition-parallel harness; everything here is deterministic so decoded
 * metadata can be hash-compared against an oracle.
 */
object MediaCodec {

  final case class ImageMeta(
      width: Int,
      height: Int,
      channels: Int,
      dhash64: Long,
      grayFeatures: Array[Float])

  final case class AudioMeta(
      sampleRate: Int,
      channels: Int,
      frames: Long,
      durationMs: Long,
      rmsQ: Long) // round(rms * 1000), rms normalized to [0,1] of full scale

  // ------------------------------------------------------------- image side

  /** Decode an image and derive: dimensions, channel count, a dHash-style
    * 64-bit perceptual fingerprint (9x8 grayscale grid, bit set where the
    * right cell is brighter than the left), and an 8x8 mean-gray feature
    * vector (values in [0,1]) usable as a crude embedding. */
  def decodeImage(bytes: Array[Byte]): ImageMeta = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    val grid9 = grayGrid(img, 9, 8)
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (grid9(y)(x + 1) > grid9(y)(x)) h |= (1L << bit)
        bit += 1
        x += 1
      }
      y += 1
    }
    val grid8 = grayGrid(img, 8, 8)
    val feats = new Array[Float](64)
    var i = 0
    while (i < 64) {
      feats(i) = (grid8(i / 8)(i % 8) / 255.0).toFloat
      i += 1
    }
    ImageMeta(img.getWidth, img.getHeight, img.getColorModel.getNumComponents, h, feats)
  }

  /** Exact integer partition of `src` cells into `dst` blocks: block t
    * covers [start, end) with end > start and end <= src for t < dst — the
    * ONE partition rule shared by [[grayGrid]] (the dHash/feature grid) and
    * [[resizeImage]], so thumbnails and fingerprints can never desync. */
  private def blockBounds(t: Int, dst: Int, src: Int): (Int, Int) = {
    val p0 = t * src / dst
    (p0, math.max((t + 1) * src / dst, p0 + 1))
  }

  /** Area-averaged grayscale downscale to a `cols` x `rows` grid — exact
    * integer pixel partitions, so the result is identical on every JVM. */
  private def grayGrid(img: BufferedImage, cols: Int, rows: Int): Array[Array[Double]] = {
    val (w, hgt) = (img.getWidth, img.getHeight)
    val out = Array.ofDim[Double](rows, cols)
    var cy = 0
    while (cy < rows) {
      val (y0, y1) = blockBounds(cy, rows, hgt)
      var cx = 0
      while (cx < cols) {
        val (x0, x1) = blockBounds(cx, cols, w)
        var sum = 0L
        var n = 0
        var y = y0
        while (y < math.min(y1, hgt)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sum += (r * 299 + g * 587 + b * 114) / 1000
            n += 1
            x += 1
          }
          y += 1
        }
        out(cy)(cx) = if (n == 0) 0.0 else sum.toDouble / n
        cx += 1
      }
      cy += 1
    }
    out
  }

  /**
   * Deterministic area-averaged RGB resize, re-encoded as PNG — the
   * thumbnail/normalization step of an image-curation pipeline. Every
   * target pixel is the per-channel floor-mean of its exact integer-
   * partition source block (same partition rule as [[decodeImage]]'s
   * grayGrid): no Graphics2D interpolation, so the output is bit-identical
   * on any JVM. Throws on undecodable input (callers drop such rows).
   */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, "target dimensions must be positive")
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    val (sw, sh) = (img.getWidth, img.getHeight)
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var ty = 0
    while (ty < h) {
      val (y0, y1) = blockBounds(ty, h, sh)
      var tx = 0
      while (tx < w) {
        val (x0, x1) = blockBounds(tx, w, sw)
        var (r, g, b) = (0L, 0L, 0L)
        var n = 0 // always >= 1: blockBounds guarantees a non-empty block
        var y = y0
        while (y < math.min(y1, sh)) {
          var x = x0
          while (x < math.min(x1, sw)) {
            val p = img.getRGB(x, y)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
            n += 1
            x += 1
          }
          y += 1
        }
        out.setRGB(tx, ty,
          ((r / n).toInt << 16) | ((g / n).toInt << 8) | (b / n).toInt)
        tx += 1
      }
      ty += 1
    }
    pngBytes(out)
  }

  /** Encode a BufferedImage as PNG bytes (fixture/ingest helper). */
  def pngBytes(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ------------------------------------------------------------- audio side

  /** Decode a PCM WAV: format, frame count, duration, and RMS energy over
    * all samples normalized to full scale (quantized to 1/1000 so the value
    * is integral and portable for hash-compare). */
  def decodeWavPcm(bytes: Array[Byte]): AudioMeta = {
    val in: AudioInputStream = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(
        fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED && fmt.getSampleSizeInBits == 16,
        s"only 16-bit signed PCM supported, got $fmt"
      )
      val frames = in.getFrameLength
      val data = in.readAllBytes()
      var sumSq = 0.0
      var n = 0
      var i = 0
      while (i + 1 < data.length) {
        val s =
          if (fmt.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
          else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
        sumSq += s.toDouble * s.toDouble
        n += 1
        i += 2
      }
      val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n) / 32768.0
      AudioMeta(
        sampleRate = fmt.getSampleRate.toInt,
        channels = fmt.getChannels,
        frames = frames,
        durationMs = frames * 1000L / fmt.getSampleRate.toInt,
        rmsQ = math.round(rms * 1000.0)
      )
    } finally in.close()
  }

  /**
   * Cut a 16-bit mono PCM WAV into fixed `segmentMs` windows stepping
   * `everyMs` — the audio analog of video frame sampling (ASR/audio-model
   * training consumes fixed windows, not whole files). Sample-exact: each
   * segment is a frame-range slice of the decoded PCM re-encoded as WAV,
   * so a segment's samples are byte-identical to the source range. The
   * final partial window is kept (like the tail-inclusive frame sampler).
   * Returns (startMs, frames, wav bytes) per segment.
   */
  def sliceWavSegments(
      bytes: Array[Byte],
      everyMs: Long,
      segmentMs: Long
  ): Seq[(Long, Long, Array[Byte])] = {
    require(everyMs > 0 && segmentMs > 0, "everyMs and segmentMs must be positive")
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(
        fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"only 16-bit signed mono PCM supported, got $fmt")
      val rate = fmt.getSampleRate.toInt
      val data = in.readAllBytes()
      val frames = data.length / 2
      val out = Seq.newBuilder[(Long, Long, Array[Byte])]
      var startMs = 0L
      while (startMs * rate / 1000L < frames) {
        val from = (startMs * rate / 1000L).toInt
        val until = math.min(frames.toLong, (startMs + segmentMs) * rate / 1000L).toInt
        if (until > from) {
          val samples = new Array[Short](until - from)
          var i = 0
          while (i < samples.length) {
            val o = (from + i) * 2
            samples(i) =
              if (fmt.isBigEndian) ((data(o) << 8) | (data(o + 1) & 0xff)).toShort
              else ((data(o + 1) << 8) | (data(o) & 0xff)).toShort
            i += 1
          }
          out += ((startMs, (until - from).toLong, wavBytes(samples, rate)))
        }
        startMs += everyMs
      }
      out.result()
    } finally in.close()
  }

  /**
   * 64-bit loudness-envelope fingerprint of a PCM WAV — the audio analog of
   * the image dHash: the sample stream splits into 65 exact integer-
   * partition windows, and bit i is set when window i+1 is louder (higher
   * mean square) than window i. Robust to volume-preserving re-encodes,
   * cheap, and [[Dedup.dhashDups]] consumes it unchanged for banded
   * Hamming near-dup search. Mean squares compare as exact-rounded doubles
   * (sum/length), so the hash is deterministic on any JVM.
   */
  def audioEnvelopeHash64(bytes: Array[Byte]): Long = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      // same contract as decodeWavPcm: signed 16-bit PCM only, endianness
      // honored — AudioSystem also opens AIFF/AU (big-endian) and unsigned
      // PCM, which would silently byte-swap or sign-flip every sample
      require(
        fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED && fmt.getSampleSizeInBits == 16,
        s"only 16-bit signed PCM supported, got $fmt")
      val raw = in.readAllBytes()
      val n = raw.length / 2
      val windows = 65
      val ms = new Array[Double](windows)
      var w = 0
      while (w < windows) {
        val s0 = w.toLong * n / windows
        val s1 = math.max((w + 1).toLong * n / windows, s0 + 1)
        var sumSq = 0.0
        var j = s0
        while (j < math.min(s1, n)) {
          val v =
            if (fmt.isBigEndian) ((raw(2 * j.toInt) << 8) | (raw(2 * j.toInt + 1) & 0xff)).toShort
            else ((raw(2 * j.toInt + 1) << 8) | (raw(2 * j.toInt) & 0xff)).toShort
          sumSq += v.toDouble * v
          j += 1
        }
        val len = math.min(s1, n.toLong) - s0
        ms(w) = if (len <= 0) 0.0 else sumSq / len
        w += 1
      }
      var h = 0L
      var i = 0
      while (i < 64) {
        if (ms(i + 1) > ms(i)) h |= (1L << i)
        i += 1
      }
      h
    } finally in.close()
  }

  /** Square-wave WAV with one constant amplitude per equal window — the
    * fixture whose [[audioEnvelopeHash64]] bits are exactly the hand-set
    * per-window amplitude comparisons (shared by the `audio_neardup` oracle
    * entry and the spec goldens, so they can never drift apart). */
  def squareWav(
      amps: Int => Int,
      windows: Int = 65,
      perWindow: Int = 16,
      sampleRate: Int = 8000
  ): Array[Byte] =
    wavBytes(Array.tabulate[Short](windows * perWindow) { i =>
      val a = amps(i / perWindow); (if (i % 2 == 0) a else -a).toShort
    }, sampleRate)

  // ------------------------------------------------------------- video side

  final case class VideoMeta(width: Int, height: Int, durationMs: Long, tracks: Int)

  /**
   * Parse MP4 / ISO-BMFF container metadata WITHOUT any codec: walk the box
   * tree (32-bit size + fourcc headers, 64-bit extended sizes honored),
   * read `mvhd` (timescale + movie duration, versions 0 and 1) and every
   * `trak`/`tkhd` (16.16 fixed-point width/height; the first visual track
   * wins). The container structure alone yields the curation metadata a
   * 100 TB pipeline needs — dimensions, duration, track count; FRAME decode
   * needs codecs this environment does not ship and stays out of scope.
   * Malformed input throws; [[Multimodal.decodeMediaMeta]] surfaces nulls.
   */
  def decodeMp4Meta(bytes: Array[Byte]): VideoMeta = {
    val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian
    def u32(off: Int): Long = bb.getInt(off) & 0xffffffffL
    def boxes(from: Int, until: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var off = from
      while (off + 8 <= until) {
        val size = u32(off)
        val typ = new String(bytes, off + 4, 4, "ISO-8859-1")
        val (boxSize, hdr) =
          if (size == 1) (bb.getLong(off + 8), 16)
          else if (size == 0) ((until - off).toLong, 8) // spec: extends to end
          else (size, 8)
        require(boxSize >= hdr && off + boxSize <= until, s"malformed box '$typ' at $off")
        out += ((typ, off + hdr, off + boxSize.toInt))
        off += boxSize.toInt
      }
      out.result()
    }
    val moov = boxes(0, bytes.length).collectFirst { case ("moov", s, e) => (s, e) }
      .getOrElse(throw new IllegalArgumentException("no moov box"))
    val kids = boxes(moov._1, moov._2)
    val (mvhdS, _) = kids.collectFirst { case ("mvhd", s, e) => (s, e) }
      .getOrElse(throw new IllegalArgumentException("no mvhd box"))
    val mvhdV = bytes(mvhdS) & 0xff
    val (timescale, duration) =
      if (mvhdV == 1) (u32(mvhdS + 20), bb.getLong(mvhdS + 24))
      else (u32(mvhdS + 12), u32(mvhdS + 16))
    require(timescale > 0, "mvhd timescale is zero")
    var tracks = 0
    var w = 0
    var h = 0
    kids.foreach {
      case ("trak", s, e) =>
        tracks += 1
        boxes(s, e).collectFirst { case ("tkhd", ts, _) => ts }.foreach { ts =>
          // v0: 4 ver/flags + 4+4 times + 4 id + 4 res + 4 dur + 8 res +
          // 2+2+2+2 layer/alt/vol/res + 36 matrix = width at 76; v1 times
          // and duration widen by 12 total
          val base = if ((bytes(ts) & 0xff) == 1) 88 else 76
          val wi = (u32(ts + base) >> 16).toInt
          val hi = (u32(ts + base + 4) >> 16).toInt
          if (wi > 0 && w == 0) { w = wi; h = hi }
        }
      case _ => ()
    }
    VideoMeta(w, h, duration * 1000L / timescale, tracks)
  }

  /** One addressable video sample (frame) located by the container's
    * sample tables: presentation time, file byte range, sync flag. */
  final case class FrameRef(index: Int, ptsMs: Long, offset: Long, size: Long, sync: Boolean)

  /**
   * Enumerate a track's samples from the MP4 sample tables — `stts`
   * (decode deltas), `stsz` (sizes), `stsc`+`stco`/`co64` (chunk layout →
   * file offsets), `stss` (sync samples; absent = every sample is sync),
   * timed by the track's `mdhd` timescale. This is everything frame
   * SAMPLING needs: selection is pure container arithmetic; only the
   * selected frames' bytes are ever touched, and codec decode of those
   * bytes stays an external concern (this environment ships no codecs).
   * The first track that carries a sample table wins (the fixture builder
   * writes one visual track).
   */
  def mp4Samples(bytes: Array[Byte]): Seq[FrameRef] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    def u32(off: Int): Long = bb.getInt(off) & 0xffffffffL
    def boxes(from: Int, until: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var off = from
      while (off + 8 <= until) {
        val size = u32(off)
        val typ = new String(bytes, off + 4, 4, "ISO-8859-1")
        val (boxSize, hdr) =
          if (size == 1) (bb.getLong(off + 8), 16)
          else if (size == 0) ((until - off).toLong, 8)
          else (size, 8)
        require(boxSize >= hdr && off + boxSize <= until, s"malformed box '$typ' at $off")
        out += ((typ, off + hdr, off + boxSize.toInt))
        off += boxSize.toInt
      }
      out.result()
    }
    def child(kids: Seq[(String, Int, Int)], typ: String): Option[(Int, Int)] =
      kids.collectFirst { case (`typ`, s, e) => (s, e) }
    val moov = child(boxes(0, bytes.length), "moov")
      .getOrElse(throw new IllegalArgumentException("no moov box"))
    val stblTrack = boxes(moov._1, moov._2).collect { case ("trak", s, e) =>
      for {
        mdia <- child(boxes(s, e), "mdia")
        minf <- child(boxes(mdia._1, mdia._2), "minf")
        stbl <- child(boxes(minf._1, minf._2), "stbl")
      } yield (mdia, stbl)
    }.flatten.headOption.getOrElse(
      throw new IllegalArgumentException("no track with a sample table"))
    val (mdia, stbl) = stblTrack
    val mdhd = child(boxes(mdia._1, mdia._2), "mdhd")
      .getOrElse(throw new IllegalArgumentException("no mdhd box"))
    val timescale =
      if ((bytes(mdhd._1) & 0xff) == 1) u32(mdhd._1 + 20) else u32(mdhd._1 + 12)
    require(timescale > 0, "mdhd timescale is zero")
    val tbl = boxes(stbl._1, stbl._2)
    def full(typ: String): (Int, Int) = child(tbl, typ)
      .getOrElse(throw new IllegalArgumentException(s"no $typ box"))

    // stts -> absolute decode times per sample
    val (sttsS, _) = full("stts")
    val sttsN = u32(sttsS + 4).toInt
    val pts = Seq.newBuilder[Long]
    var t = 0L
    var off = sttsS + 8
    for (_ <- 0 until sttsN) {
      val n = u32(off).toInt; val delta = u32(off + 4)
      for (_ <- 0 until n) { pts += t * 1000L / timescale; t += delta }
      off += 8
    }
    val ptsArr = pts.result()

    // stsz -> per-sample byte sizes
    val (stszS, _) = full("stsz")
    val fixedSize = u32(stszS + 4)
    val count = u32(stszS + 8).toInt
    val sizes: IndexedSeq[Long] =
      if (fixedSize != 0) IndexedSeq.fill(count)(fixedSize)
      else (0 until count).map(i => u32(stszS + 12 + i * 4))

    // stsc + stco/co64 -> file offset per sample (chunk base + intra-chunk)
    val (stscS, _) = full("stsc")
    val stscN = u32(stscS + 4).toInt
    val stscEntries = (0 until stscN).map { i =>
      (u32(stscS + 8 + i * 12).toInt, u32(stscS + 12 + i * 12).toInt)
    } // (firstChunk 1-based, samplesPerChunk)
    val chunkOffsets: IndexedSeq[Long] = child(tbl, "stco") match {
      case Some((s, _)) =>
        val n = u32(s + 4).toInt; (0 until n).map(i => u32(s + 8 + i * 4))
      case None =>
        val (s, _) = full("co64")
        val n = u32(s + 4).toInt; (0 until n).map(i => bb.getLong(s + 8 + i * 8))
    }
    val offsets = new Array[Long](count)
    var sample = 0
    for (ci <- chunkOffsets.indices if sample < count) {
      val perChunk = stscEntries.reverse
        .collectFirst { case (first, n) if first <= ci + 1 => n }
        .getOrElse(stscEntries.head._2)
      var within = chunkOffsets(ci)
      for (_ <- 0 until perChunk if sample < count) {
        offsets(sample) = within
        within += sizes(sample)
        sample += 1
      }
    }
    require(sample == count, s"chunk layout covers $sample of $count samples")

    // stss -> sync set (absent: all sync)
    val sync: Int => Boolean = child(tbl, "stss") match {
      case None => _ => true
      case Some((s, _)) =>
        val n = u32(s + 4).toInt
        val set = (0 until n).map(i => u32(s + 8 + i * 4).toInt - 1).toSet // 1-based
        set.contains
    }
    (0 until count).map(i => FrameRef(i, ptsArr(i), offsets(i), sizes(i), sync(i)))
  }

  /**
   * Pick one frame per `everyMs` of presentation time: for each target
   * t = 0, everyMs, 2·everyMs, … the LAST candidate sample with pts ≤ t
   * (seek-to-previous semantics — what a player's keyframe seek does).
   * Targets run one interval PAST the last pts, so the stream tail is
   * always represented (sampling a 250 ms-spaced stream every 100 ms
   * returns every frame, including the last). `keyframesOnly` restricts
   * candidates to sync samples (decodable without inter-frame state — the
   * variant a training pipeline feeds straight to an image decoder).
   * Duplicate picks collapse.
   */
  def sampleFrameRefs(
      frames: Seq[FrameRef],
      everyMs: Long,
      keyframesOnly: Boolean
  ): Seq[FrameRef] = {
    require(everyMs > 0, "everyMs must be positive")
    if (frames.isEmpty) return Nil
    val candidates = if (keyframesOnly) frames.filter(_.sync) else frames
    if (candidates.isEmpty) return Nil
    val lastPts = frames.map(_.ptsMs).max
    val picks = Seq.newBuilder[FrameRef]
    var target = 0L
    while (target < lastPts + everyMs) {
      candidates.takeWhile(_.ptsMs <= target).lastOption.foreach(picks += _)
      target += everyMs
    }
    picks.result().distinctBy(_.index)
  }

  /** Build a minimal valid MP4 metadata skeleton — ftyp + moov(mvhd + one
    * visual trak(tkhd)) — the video fixture/test helper (the container
    * analog of [[pngBytes]]/[[wavBytes]]). */
  def mp4Bytes(width: Int, height: Int, durationMs: Long, timescale: Int = 1000): Array[Byte] = {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload
    val dur = durationMs * timescale / 1000L
    val mvhd = new Array[Byte](100) // v0 full box payload
    System.arraycopy(be32(timescale.toLong), 0, mvhd, 12, 4)
    System.arraycopy(be32(dur), 0, mvhd, 16, 4)
    val tkhd = new Array[Byte](84) // v0 full box payload
    System.arraycopy(be32(width.toLong << 16), 0, tkhd, 76, 4)
    System.arraycopy(be32(height.toLong << 16), 0, tkhd, 80, 4)
    box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0) ++ "isom".getBytes("ISO-8859-1")) ++
      box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
  }

  /**
   * Build a complete MP4 with real sample tables and payload — ftyp +
   * moov(mvhd + trak(tkhd + mdia(mdhd + hdlr + minf(stbl(stts stsz stsc
   * stco [stss]))))) + mdat holding `frames` back to back. `syncEvery`
   * marks every Nth frame (0-based multiples) as a sync sample; pass 1 for
   * all-keyframe streams. The frame-sampling fixture/test helper.
   */
  def mp4BytesWithSamples(
      width: Int,
      height: Int,
      frames: Seq[Array[Byte]],
      frameDurMs: Long,
      syncEvery: Int = 1,
      timescale: Int = 1000
  ): Array[Byte] = {
    require(frames.nonEmpty && frameDurMs > 0 && syncEvery > 0)
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload
    val n = frames.size
    val delta = frameDurMs * timescale / 1000L
    val dur = delta * n
    val mvhd = new Array[Byte](100)
    System.arraycopy(be32(timescale.toLong), 0, mvhd, 12, 4)
    System.arraycopy(be32(dur), 0, mvhd, 16, 4)
    val tkhd = new Array[Byte](84)
    System.arraycopy(be32(width.toLong << 16), 0, tkhd, 76, 4)
    System.arraycopy(be32(height.toLong << 16), 0, tkhd, 80, 4)
    val mdhd = new Array[Byte](24)
    System.arraycopy(be32(timescale.toLong), 0, mdhd, 12, 4)
    System.arraycopy(be32(dur), 0, mdhd, 16, 4)
    val hdlr = new Array[Byte](25) // ver/flags + predefined + 'vide' + 12 res + NUL name
    System.arraycopy("vide".getBytes("ISO-8859-1"), 0, hdlr, 8, 4)
    val stts = be32(0) ++ be32(1) ++ be32(n.toLong) ++ be32(delta)
    val stsz = be32(0) ++ be32(0) ++ be32(n.toLong) ++
      frames.flatMap(f => be32(f.length.toLong)).toArray
    val stsc = be32(0) ++ be32(1) ++ be32(1) ++ be32(n.toLong) ++ be32(1)
    val syncs = (0 until n).filter(_ % syncEvery == 0)
    val stss =
      if (syncEvery == 1) Array.emptyByteArray
      else box("stss", be32(0) ++ be32(syncs.size.toLong) ++
        syncs.flatMap(i => be32(i + 1L)).toArray)
    // stco needs the mdat payload's file offset: assemble with a
    // placeholder, then patch (moov size is independent of the value)
    def moovWith(stcoOffset: Long): Array[Byte] = {
      val stco = be32(0) ++ be32(1) ++ be32(stcoOffset)
      val stbl = box("stbl",
        box("stts", stts) ++ box("stsz", stsz) ++ box("stsc", stsc) ++
          box("stco", stco) ++ stss)
      val minf = box("minf", stbl)
      val mdia = box("mdia", box("mdhd", mdhd) ++ box("hdlr", hdlr) ++ minf)
      box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd) ++ mdia))
    }
    val ftyp = box("ftyp",
      "isom".getBytes("ISO-8859-1") ++ be32(0) ++ "isom".getBytes("ISO-8859-1"))
    val moovLen = moovWith(0L).length
    val mdatPayloadAt = ftyp.length + moovLen + 8L // after the mdat header
    ftyp ++ moovWith(mdatPayloadAt) ++ box("mdat", frames.flatten.toArray)
  }

  /** Encode 16-bit signed mono PCM samples as WAV bytes. */
  def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}
