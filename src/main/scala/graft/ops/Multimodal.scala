package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column processing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batched partition passes.
  *
  * The decode kernels are REAL for every format the JVM ships codecs for:
  *   - images: PNG/BMP/JPEG header parsing (pure byte reads — the
  *     metadata path never inflates pixels; JPEG dims come from a
  *     marker-walk to the first SOF segment) and full pixel decode via
  *     `javax.imageio` (PNG, BMP, GIF, JPEG) for features/stats/resize;
  *   - audio: WAV RIFF chunk-walk (fmt/data) + PCM16LE sample decode;
  *   - video: a length-prefixed frame container (`GFRM`) of real PNG
  *     frames — containers with licensed codecs (H.264 etc.) have no
  *     JVM-shipped decoder, so the SEEK/SAMPLE plumbing is exercised on
  *     a codec this library also writes. Swapping in javacv/JNI replaces
  *     [[sampleFrames]] only; every plan stays identical.
  * [[extractFeatures]] is a real pixel-space extractor (grid-pooled
  * channel means — the classic color-layout descriptor), not a learned
  * encoder; plugging a CNN/CLIP model in replaces that one function.
  *
  * The matching ENCODERS ([[encodePng]], [[encodeWav]],
  * [[encodeFrameContainer]]) are part of the surface: pipelines that
  * decode media also re-emit it (resize, transcode, frame dumps), and the
  * tests/oracles build real fixture bytes with them.
  *
  * Scale notes: media rows are large (MBs) — batch size is rows-bounded
  * AND the operators never shuffle raw bytes; features/metadata are
  * extracted in the same narrow stage that scans the binary column, and
  * only the small derived columns flow downstream.
  */
object Multimodal {

  final case class MediaMeta(
      format: String, width: Int, height: Int, n_frames: Int, valid: Boolean)

  final case class AudioMeta(
      codec: String, sample_rate: Int, n_samples: Int, valid: Boolean)

  final case class ImageStats(
      format: String, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, valid: Boolean)

  // ---- byte-order helpers ----

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 && PngSig.indices.forall(i => b(i) == PngSig(i))

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 26 && b(0) == 'B'.toByte && b(1) == 'M'.toByte

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  /** JPEG marker-segment walk to the first frame header (SOF0..SOF15
    * excluding DHT/JPG/DAC): height and width are big-endian at offsets
    * +5/+7 of the SOF segment. Header bytes only — no entropy decode.
    * None for truncated/markerless streams: invalid, never a guess.
    */
  private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    var off = 2
    while (off + 2 <= b.length) {
      if ((b(off) & 0xff) != 0xff) return None
      var mOff = off + 1
      while (mOff < b.length && (b(mOff) & 0xff) == 0xff) mOff += 1 // fill bytes
      if (mOff >= b.length) return None
      val m = b(mOff) & 0xff
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        off = mOff + 1 // standalone marker, no length field
      } else if (m == 0xd9) {
        return None // EOI before any SOF
      } else {
        if (mOff + 3 > b.length) return None
        val len = ((b(mOff + 1) & 0xff) << 8) | (b(mOff + 2) & 0xff)
        if (len < 2) return None
        val isSof =
          m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (mOff + 7 >= b.length) return None
          val h = ((b(mOff + 4) & 0xff) << 8) | (b(mOff + 5) & 0xff)
          val w = ((b(mOff + 6) & 0xff) << 8) | (b(mOff + 7) & 0xff)
          return Some((w, h))
        }
        off = mOff + 1 + len
      }
    }
    None
  }

  private def isFrameContainer(b: Array[Byte]): Boolean =
    b.length >= 8 && b(0) == 'G'.toByte && b(1) == 'F'.toByte &&
      b(2) == 'R'.toByte && b(3) == 'M'.toByte

  // ---- REAL image decode ----

  /** Container metadata from the HEADER BYTES ONLY — no pixel inflation:
    * PNG IHDR (width/height big-endian at offsets 16/20), BMP
    * BITMAPINFOHEADER (little-endian at 18/22; negative height = top-down
    * row order, magnitude is the pixel height), JPEG (SOF marker walk),
    * and the `GFRM` frame container (frame count + first frame's own
    * header, whose verdict propagates — a truncated or negative-length
    * first frame makes the container invalid). Anything else — including
    * truncated headers — is invalid, never a guess.
    */
  def decodeImageMeta(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.isEmpty)
      MediaMeta("empty", 0, 0, 0, valid = false)
    else if (isPng(bytes))
      MediaMeta("png", beInt(bytes, 16), beInt(bytes, 20), 1, valid = true)
    else if (isBmp(bytes))
      MediaMeta("bmp", leInt(bytes, 18), math.abs(leInt(bytes, 22)), 1,
        valid = true)
    else if (isJpeg(bytes))
      jpegDims(bytes) match {
        case Some((w, h)) => MediaMeta("jpeg", w, h, 1, valid = true)
        case None => MediaMeta("jpeg", 0, 0, 0, valid = false)
      }
    else if (isFrameContainer(bytes)) {
      val n = beInt(bytes, 4)
      // a corrupt first-frame length (negative or past the buffer) makes
      // the CONTAINER invalid — never Arrays.copyOfRange on hostile
      // lengths, and a truncated first frame's verdict propagates out
      val first =
        if (n > 0 && bytes.length >= 12) {
          val len = beInt(bytes, 8)
          if (len >= 0 && bytes.length - 12 >= len) // no 12+len int overflow
            decodeImageMeta(java.util.Arrays.copyOfRange(bytes, 12, 12 + len))
          else MediaMeta("gfrm", 0, 0, n, valid = false)
        } else MediaMeta("gfrm", 0, 0, n, valid = n == 0)
      MediaMeta("gfrm", first.width, first.height, n,
        valid = n >= 0 && first.valid)
    } else MediaMeta("unknown", 0, 0, 0, valid = false)
  }

  /** Full pixel decode via `javax.imageio` (PNG/BMP/GIF readers ship with
    * the JVM). None for undecodable bytes.
    */
  def decodePixels(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null || bytes.isEmpty) None
    else
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }

  /** REAL feature extraction: `grid`×`grid` cell means per RGB channel in
    * [0,1] (a color-layout descriptor) from the DECODED pixels —
    * `(cy*grid + cx) * 3 + channel` feature order. Cells are the integer
    * lattice `[cy*h/grid, (cy+1)*h/grid)`; a degenerate empty cell (image
    * smaller than the grid) contributes zeros. Undecodable bytes → zero
    * vector (pipelines treat it as "no signal", mirroring the zero vector
    * a null-safe encoder emits).
    */
  def extractFeatures(bytes: Array[Byte], grid: Int = 4): Array[Float] = {
    val out = new Array[Float](grid * grid * 3)
    decodePixels(bytes) match {
      case None => out
      case Some(img) =>
        val w = img.getWidth
        val h = img.getHeight
        var cy = 0
        while (cy < grid) {
          var cx = 0
          while (cx < grid) {
            val y0 = cy * h / grid; val y1 = (cy + 1) * h / grid
            val x0 = cx * w / grid; val x1 = (cx + 1) * w / grid
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            val n = (y1 - y0).toLong * (x1 - x0)
            val base = (cy * grid + cx) * 3
            if (n > 0) {
              out(base) = (sr.toDouble / (n * 255.0)).toFloat
              out(base + 1) = (sg.toDouble / (n * 255.0)).toFloat
              out(base + 2) = (sb.toDouble / (n * 255.0)).toFloat
            }
            cx += 1
          }
          cy += 1
        }
        out
    }
  }

  /** Decoded per-image channel sums + header metadata — integer-exact
    * (oracle-checkable with no FP at all). Invalid/undecodable → zeros
    * with the header verdict.
    */
  def imageStatsOf(bytes: Array[Byte]): ImageStats = {
    val meta = decodeImageMeta(bytes)
    decodePixels(bytes) match {
      case None =>
        ImageStats(meta.format, meta.width, meta.height, 0L, 0L, 0L,
          valid = false)
      case Some(img) =>
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        ImageStats(meta.format, meta.width, meta.height, sr, sg, sb,
          valid = meta.valid)
    }
  }

  /** REAL resize: decode, NEAREST-NEIGHBOR sample on the integer lattice
    * (`src = dst * srcDim / dstDim`, floor — deterministic across JVMs,
    * unlike Graphics2D filtering), re-encode as PNG (lossless: decoded
    * values round-trip exactly).
    */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    decodePixels(bytes) match {
      case None => Array.empty
      case Some(img) =>
        val sw = img.getWidth
        val sh = img.getHeight
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out.setRGB(x, y, img.getRGB(x * sw / w, y * sh / h))
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        bos.toByteArray
    }

  /** REAL frame sampling over the `GFRM` container: parse the frame
    * index, pick `n` evenly spaced frames (`frame j -> j*count/n`, the
    * standard PTS-lattice sample), return their payload bytes. Malformed
    * container → empty.
    */
  def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (bytes == null || !isFrameContainer(bytes) || n <= 0) return Seq.empty
    val count = beInt(bytes, 4)
    if (count <= 0) return Seq.empty
    val frames = new scala.collection.mutable.ArrayBuffer[Array[Byte]](count)
    var off = 8
    var k = 0
    while (k < count) {
      if (off + 4 > bytes.length) return Seq.empty
      val len = beInt(bytes, off)
      if (len < 0 || len > bytes.length - off - 4) return Seq.empty // no overflow
      frames += java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + len)
      off += 4 + len
      k += 1
    }
    (0 until n).map(j => frames(j * count / n))
  }

  // ---- REAL audio decode (WAV RIFF + PCM16LE) ----

  /** Walk the RIFF chunk list for `fmt ` and `data`. Returns the fmt
    * fields + the data chunk's byte range. Strict: PCM (format tag 1),
    * 16-bit only — anything else is invalid, not guessed at.
    */
  private def wavChunks(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    // (sampleRate, channels, dataOff, dataLen)
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var off = 12
    var rate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = leInt(b, off + 4)
      if (len < 0 || off + 8 + len > b.length) return None
      if (id == "fmt " && len >= 16) {
        if (leShort(b, off + 8) != 1) return None // PCM only
        channels = leShort(b, off + 10)
        rate = leInt(b, off + 12)
        bits = leShort(b, off + 22)
        if (bits != 16 || channels < 1) return None
      } else if (id == "data") {
        dataOff = off + 8; dataLen = len
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (rate > 0 && dataOff >= 0) Some((rate, channels, dataOff, dataLen))
    else None
  }

  def decodeAudioMeta(bytes: Array[Byte]): AudioMeta =
    wavChunks(bytes) match {
      case Some((rate, channels, _, dataLen)) =>
        AudioMeta("pcm_s16le", rate, dataLen / (2 * channels), valid = true)
      case None =>
        AudioMeta(if (bytes == null || bytes.isEmpty) "empty" else "unknown",
          0, 0, valid = false)
    }

  /** First `n` PCM16LE sample frames (channel 0 of interleaved audio) as
    * floats in [-1, 1): `short / 32768f` — the exact power-of-two scaling
    * every PCM float conversion uses.
    */
  def decodeSamples(bytes: Array[Byte], n: Int): Array[Float] =
    wavChunks(bytes) match {
      case None => new Array[Float](math.max(n, 0))
      case Some((_, channels, dataOff, dataLen)) =>
        val avail = dataLen / (2 * channels)
        val out = new Array[Float](math.max(n, 0))
        var i = 0
        while (i < n && i < avail) {
          val off = dataOff + i * 2 * channels
          val s = (leShort(bytes, off)).toShort
          out(i) = s / 32768.0f
          i += 1
        }
        out
    }

  // ---- fixture/output encoders (lossless, deterministic) ----

  private def rgbImage(
      w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode a `w`×`h` PNG with `px(x, y) = (r, g, b)`. Lossless: decoding
    * returns exactly these values.
    */
  def encodePng(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(rgbImage(w, h, px), "png", bos)
    bos.toByteArray
  }

  /** Encode a `w`×`h` JPEG via the JVM's shipped writer. LOSSY: decoding
    * returns the same dimensions but approximate pixel values — fixtures
    * hash-check JPEG header metadata and decode success, never decoded
    * sums (those are only exact for the lossless formats).
    */
  def encodeJpeg(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(rgbImage(w, h, px), "jpg", bos)
    bos.toByteArray
  }

  /** Pack frames into the `GFRM` container: magic, big-endian frame
    * count, then per frame a big-endian length + payload.
    */
  def encodeFrameContainer(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBytes("GFRM")
    out.writeInt(frames.size)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    bos.toByteArray
  }

  /** Minimal valid mono PCM16LE WAV: RIFF header + fmt + data. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bos = new ByteArrayOutputStream(44 + dataLen)
    val out = new java.io.DataOutputStream(bos)
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.writeBytes("RIFF"); le32(36 + dataLen); out.writeBytes("WAVE")
    out.writeBytes("fmt "); le32(16)
    le16(1) // PCM
    le16(1) // mono
    le32(sampleRate)
    le32(sampleRate * 2) // byte rate
    le16(2) // block align
    le16(16) // bits per sample
    out.writeBytes("data"); le32(dataLen)
    samples.foreach(s => le16(s & 0xffff))
    bos.toByteArray
  }

  // ---- Spark plumbing ----

  private val metaUdf = udf((b: Array[Byte]) => decodeImageMeta(b))
  private val featUdf = udf((b: Array[Byte]) => extractFeatures(b))
  private val statsUdf = udf((b: Array[Byte]) => imageStatsOf(b))
  private val framesUdf =
    udf((b: Array[Byte], n: Int) => sampleFrames(b, n))

  private val resizeUdf =
    udf((b: Array[Byte], w: Int, h: Int) => resizeImage(b, w, h))

  /** 56-bit DIFFERENCE HASH of the image's 8×8 thumbnail: bit (y·7+x)
    * set when the red channel strictly increases from thumbnail column
    * x to x+1 — the standard perceptual near-dup key. The thumbnail is
    * sampled HERE (the [[resizeImage]] nearest-neighbor formula, which
    * is the identity on an already-8×8 input), so the hash covers the
    * whole image at any size — a public helper must not silently
    * produce top-left-corner hashes when the caller forgets to resize
    * first. Undecodable or sub-8×8 media hashes to -1 so failures
    * group VISIBLY instead of silently joining bucket 0.
    */
  def dHash56(bytes: Array[Byte]): Long =
    decodePixels(bytes) match {
      case Some(img) if img.getWidth >= 8 && img.getHeight >= 8 =>
        val sw = img.getWidth
        val sh = img.getHeight
        def red(x: Int, y: Int): Int =
          (img.getRGB(x * sw / 8, y * sh / 8) >> 16) & 0xff
        var h = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 7) {
            if (red(x + 1, y) > red(x, y)) h |= 1L << (y * 7 + x)
            x += 1
          }
          y += 1
        }
        h
      case _ => -1L
    }

  private val dHashUdf = udf((b: Array[Byte]) => dHash56(b))

  /** Attach the perceptual hash to a binary column (narrow pass —
    * grouping on the hash afterwards is the image-dedup shuffle, keyed
    * on 8 bytes per image, never on pixels).
    */
  def perceptualHash(df: DataFrame, binCol: String = "media"): DataFrame =
    df.withColumn("dhash", dHashUdf(col(binCol)))

  /** Attach decoded metadata + pooled features to a binary column —
    * one narrow pass over the media bytes.
    */
  def describeMedia(df: DataFrame, binCol: String = "media"): DataFrame =
    df.withColumn("meta", metaUdf(col(binCol)))
      .withColumn("features", featUdf(col(binCol)))

  /** Decoded integer channel sums + header metadata per image — the
    * FP-free stats surface the image oracle hash-checks.
    */
  def imageStats(df: DataFrame, binCol: String = "media"): DataFrame =
    df.withColumn("istats", statsUdf(col(binCol)))

  /** Resize the media column to target dims (narrow pass; replaces the
    * binary in place — at scale, write the result partitioned rather
    * than carrying both generations of bytes).
    */
  def resizeMedia(
      df: DataFrame, binCol: String, w: Int, h: Int): DataFrame =
    df.withColumn(binCol, resizeUdf(col(binCol), lit(w), lit(h)))

  /** Batched variant of [[describeMedia]] — the Scala analog of the
    * `mapInPandas` batch shape: the partition iterator is consumed in
    * `batchSize`-row groups, so a vectorized/multi-image decode kernel
    * (GPU batch inference, JNI codec with amortized setup) drops in at
    * the marked call without touching the plan. Row-identical to the
    * per-row variant (spec-checked).
    */
  def describeMediaBatched(
      df: Dataset[(Long, Array[Byte])],
      batchSize: Int = 32
  ): Dataset[(Long, MediaMeta, Array[Float])] = {
    import df.sparkSession.implicits._
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // BATCH KERNEL CALL SITE: one invocation per batch, not per row
        batch.map { case (id, bytes) =>
          (id, decodeImageMeta(bytes), extractFeatures(bytes))
        }
      }
    }
  }

  private val audioWindowsUdf = udf { (b: Array[Byte], win: Int) =>
    // decode once, window in the same stage: only (window_no, rms) pairs
    // leave the scan — the PCM samples never enter the plan
    val meta = decodeAudioMeta(b)
    if (!meta.valid) Seq.empty[(Int, Double)]
    else {
      val samples = decodeSamples(b, meta.n_samples)
      samples.grouped(win).zipWithIndex.map { case (w, i) =>
        var acc = 0.0
        var j = 0
        while (j < w.length) { acc += w(j).toDouble * w(j); j += 1 }
        (i + 1, math.sqrt(acc / w.length))
      }.toSeq
    }
  }

  /** Fixed-window RMS energy over an audio binary column: decode +
    * window + pool in one narrow pass, explode only the per-window
    * scalars. The audio twin of [[sampleVideoFrames]] — raw bytes and
    * raw samples never shuffle.
    */
  def audioEnergy(
      df: DataFrame,
      idCol: String,
      binCol: String,
      windowSize: Int = 1024
  ): DataFrame =
    df.select(
        col(idCol).cast("long").as("media_id"),
        explode(audioWindowsUdf(col(binCol), lit(windowSize))).as("w"))
      .select(
        col("media_id"),
        col("w._1").as("window_no"),
        col("w._2").as("rms"))

  /** Explode a video binary into sampled frames with per-frame features:
    * (id, frame_number, frame_features). Frame bytes never leave the
    * stage — only features survive the explode.
    */
  def sampleVideoFrames(
      df: DataFrame,
      idCol: String,
      binCol: String,
      framesPerVideo: Int
  ): DataFrame =
    df.select(
        col(idCol).cast("long").as("media_id"),
        posexplode(framesUdf(col(binCol), lit(framesPerVideo)))
          .as(Seq("frame_number", "frame_bytes")))
      .select(
        col("media_id"),
        (col("frame_number") + 1).as("frame_number"),
        featUdf(col("frame_bytes")).as("frame_features"))
}
