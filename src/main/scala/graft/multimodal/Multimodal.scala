package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines.
  *
  * Media travel as opaque `binary` columns with typed metadata alongside —
  * the Spark-native layout for 100 TB multimodal corpora (content stays
  * columnar/compressed in parquet; metadata prunes without touching bytes).
  *
  * Decode comes in two tiers. [[PpmCodec]] (binary PPM / P6, pure byte
  * parsing, q144), [[PngCodec]] (PNG via `javax.imageio` — the mainstream
  * lossless crawl format, pure JDK, q174), [[JpegCodec]] (JPEG via the
  * same ImageIO stack — the most common crawl format of all, lossy, so
  * gated by bounded deviation from the lossless baseline, q192),
  * [[GifCodec]] (animated GIF — the multi-frame/video-shaped path, q187)
  * and [[WavCodec]] (PCM16 WAV, q145) are REAL codecs: decode, feature
  * extraction, and resize run for real on the executors. Formats needing
  * native libraries not present in this container (video codecs, exotic
  * raster formats) keep [[FakeCodec]], a deterministic stand-in with the
  * same signature a JNI/FFI decoder would have; the Spark-side plumbing —
  * schema, executor-side batch iteration via mapPartitions, partition
  * sizing — is identical and swapping in the true codec changes only the
  * decode body.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, content: Array[Byte])
  final case class DecodedRow(doc_id: Long, width: Int, height: Int,
      format: String, n_bytes: Long)

  /** STUB decoder — deterministic fake with a real decoder's shape.
    * A production build replaces this body with the actual codec call
    * (e.g. libjpeg/ffmpeg via FFI); everything downstream is unchanged. */
  object FakeCodec {
    def decode(bytes: Array[Byte]): (Int, Int, String) = {
      // Long arithmetic: len * 13 overflows Int past ~165 MB, and a
      // negative modulo would emit negative dimensions
      val len = bytes.length.toLong
      val first: Long = if (len > 0) bytes(0) & 0xff else 0
      val last: Long = if (len > 0) bytes(len.toInt - 1) & 0xff else 0
      val width = (64 + ((len * 7 + first) % 577)).toInt
      val height = (64 + ((len * 13 + last) % 385)).toInt
      val format = (len % 3) match {
        case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
      }
      (width, height, format)
    }
  }

  /** REAL codec for binary PPM (P6) images — pure byte-level parsing, no
    * native libs, so the decode path stops being a stub for this format:
    * the bytes on disk are an actual image encoding and the executor
    * decodes them for real. P6 layout: ASCII header `P6 <w> <h> <maxval>`
    * (whitespace-separated, `#` comments allowed) followed by one
    * whitespace byte and `w*h*3` raw RGB bytes. */
  object PpmCodec {

    def encode(w: Int, h: Int,
        pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + w * h * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var i = header.length
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = pix(x, y)
          out(i) = r.toByte; out(i + 1) = g.toByte; out(i + 2) = b.toByte
          i += 3; x += 1
        }
        y += 1
      }
      out
    }

    /** (width, height, rgb bytes). Throws on malformed input — corrupt
      * media routes through the quarantine pattern (q122), not here. */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      var p = 0
      def skipWs(): Unit = {
        var in = true
        while (in && p < bytes.length) {
          val c = bytes(p).toChar
          if (c == '#') while (p < bytes.length && bytes(p) != '\n') p += 1
          else if (c.isWhitespace) p += 1
          else in = false
        }
      }
      def int(): Int = {
        skipWs()
        var v = 0
        while (p < bytes.length && bytes(p).toChar.isDigit) {
          v = v * 10 + (bytes(p) - '0'); p += 1
        }
        v
      }
      require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
        "not a P6 PPM")
      p = 2
      val w = int(); val h = int(); val maxVal = int()
      require(maxVal == 255, s"unsupported maxval $maxVal")
      p += 1 // single whitespace after maxval
      // copyOfRange would silently ZERO-PAD a truncated body — enforce
      // the declared length so corrupt media hits the quarantine path
      require(bytes.length - p >= w * h * 3,
        s"truncated P6 body: need ${w * h * 3}, have ${bytes.length - p}")
      val px = java.util.Arrays.copyOfRange(bytes, p, p + w * h * 3)
      (w, h, px)
    }
  }

  /** REAL codec for PNG via `javax.imageio` (pure JDK, public API) — the
    * format an actual crawl corpus arrives in. PNG is lossless, so a
    * planted pixel schedule survives the encode→decode round trip exactly,
    * which is what lets the oracle gate recompute every decoded statistic
    * analytically (JPEG decodes through the very same `ImageIO.read` call,
    * but its lossy output can't be value-gated). */
  object PngCodec {

    // ImageIO defaults to a disk-backed stream cache; executors decode
    // thousands of small images, so keep the cache in memory.
    javax.imageio.ImageIO.setUseCache(false)

    def encode(w: Int, h: Int,
        pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      val wr = cachedWriter("png")
      wr.setOutput(ios)
      wr.write(rgbImage(w, h, pix))
      ios.flush(); ios.close()
      baos.toByteArray
    }

    /** Fill a TYPE_INT_RGB image through its int raster buffer — one
      * array store per pixel instead of a `setRGB` color-model dispatch
      * per pixel (same stored values: INT_RGB's data element IS the
      * packed rgb int). Shared by the PNG and JPEG encoders. */
    private[multimodal] def rgbImage(w: Int, h: Int,
        pix: (Int, Int) => (Int, Int, Int)): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val data = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferInt].getData
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = pix(x, y)
          data(y * w + x) =
            ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
          x += 1
        }
        y += 1
      }
      img
    }

    /** Per-thread reusable ImageWriters — the encode-side twin of the
      * reader cache below (fixture builders encode ~100k frames; a fresh
      * writer per `ImageIO.write` call is the same fixed cost the decode
      * path paid). Same writer class + same params ⇒ byte-identical
      * output for a given JVM, which is the determinism the fixture
      * oracles rely on. */
    private val writerCache =
      new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageWriter]] {
        override def initialValue()
            : java.util.HashMap[String, javax.imageio.ImageWriter] =
          new java.util.HashMap()
      }

    private[multimodal] def cachedWriter(fmt: String)
        : javax.imageio.ImageWriter = {
      val cache = writerCache.get()
      var w = cache.get(fmt)
      if (w == null) {
        w = javax.imageio.ImageIO.getImageWritersByFormatName(fmt).next()
        cache.put(fmt, w)
      }
      w
    }

    /** Per-thread reusable ImageReaders. `ImageIO.read` constructs (and
      * disposes) a fresh reader per call after an SPI registry probe over
      * the stream — at ~100k 64×64 frames per video-dedup pass that fixed
      * cost dominates the actual Huffman+IDCT work (guide §4.5:
      * heavyweight state once per task, amortized over every row). A
      * reused reader is the same decoder class over the same input, so
      * output is byte-identical; any reader failure falls back to the
      * stock `ImageIO.read` path and drops the cached instance so a
      * corrupted reader can't poison later decodes. */
    private val readerCache =
      new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageReader]] {
        override def initialValue()
            : java.util.HashMap[String, javax.imageio.ImageReader] =
          new java.util.HashMap()
      }

    private def magicFormat(b: Array[Byte]): String =
      if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
        "jpeg"
      else if (b.length >= 4 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G') "png"
      else ""

    private def readImage(bytes: Array[Byte])
        : java.awt.image.BufferedImage = {
      val fmt = magicFormat(bytes)
      if (fmt.nonEmpty) {
        val cache = readerCache.get()
        var r = cache.get(fmt)
        if (r == null) {
          val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
          if (it.hasNext) { r = it.next(); cache.put(fmt, r) }
        }
        if (r != null) {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            r.setInput(iis, true, true)
            return r.read(0)
          } catch {
            case _: Throwable =>
              cache.remove(fmt)
              try r.dispose() catch { case _: Throwable => () }
            // fall through to the stock path, which raises its own error
          } finally {
            try iis.close() catch { case _: Throwable => () }
          }
        }
      }
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    }

    /** (width, height, rgb bytes row-major). Throws on undecodable input —
      * corrupt media routes through the quarantine pattern (q122), not
      * here.
      *
      * Pixel extraction avoids the per-pixel `getRGB(x, y)` call (one
      * color-model dispatch + bounds check per pixel): TYPE_3BYTE_BGR —
      * what the JDK JPEG reader and non-alpha RGB PNGs decode to — copies
      * straight from the raster byte buffer (band order B,G,R; identical
      * values to getRGB's lookup for this standard sRGB type), and every
      * other type goes through ONE bulk `getRGB` call, which is defined as
      * the same per-pixel conversion. ExtensionsSpec pins fast-path ==
      * per-pixel-getRGB equality on both PNG and JPEG fixture bytes. */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      val img = readImage(bytes)
      require(img != null, "not a decodable image")
      val w = img.getWidth; val h = img.getHeight
      val px = new Array[Byte](w * h * 3)
      val raster = img.getRaster
      val direct3 =
        img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR &&
          raster.getDataBuffer.isInstanceOf[java.awt.image.DataBufferByte] &&
          raster.getDataBuffer.getSize == w * h * 3 &&
          raster.getSampleModel.isInstanceOf[
            java.awt.image.PixelInterleavedSampleModel] && {
            val sm = raster.getSampleModel
              .asInstanceOf[java.awt.image.PixelInterleavedSampleModel]
            sm.getPixelStride == 3 && sm.getScanlineStride == w * 3 &&
              java.util.Arrays.equals(sm.getBandOffsets, Array(2, 1, 0))
          }
      if (direct3) {
        val data = raster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        var i = 0
        val n = w * h
        while (i < n) {
          val o = i * 3
          px(o) = data(o + 2)
          px(o + 1) = data(o + 1)
          px(o + 2) = data(o)
          i += 1
        }
      } else {
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        var i = 0
        var o = 0
        while (i < rgb.length) {
          val v = rgb(i)
          px(o) = ((v >> 16) & 0xff).toByte
          px(o + 1) = ((v >> 8) & 0xff).toByte
          px(o + 2) = (v & 0xff).toByte
          i += 1; o += 3
        }
      }
      (w, h, px)
    }
  }

  /** REAL JPEG encode via `javax.imageio` (pure JDK) — the single most
    * common crawl-image format. Quality is pinned explicitly (0.9) so the
    * fixture bytes are deterministic for a given JVM. Decode goes through
    * the same `ImageIO.read` call as [[PngCodec.decode]]; JPEG is LOSSY,
    * so decoded pixels are gated by BOUNDED deviation from the lossless
    * PNG decode of the same schedule (the q153 TRUE-bounds pattern), not
    * by exact sums. */
  object JpegCodec {

    def encode(w: Int, h: Int,
        pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      // per-thread cached writer + direct raster fill (see PngCodec's
      // writer cache / rgbImage): same writer class, same explicit
      // quality ⇒ byte-identical output, none of the per-call
      // writer-construction cost at ~100k encoded frames per fixture
      val writer = PngCodec.cachedWriter("jpeg")
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(
        javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(0.9f)
      val baos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      writer.setOutput(ios)
      writer.write(null,
        new javax.imageio.IIOImage(PngCodec.rgbImage(w, h, pix), null,
          null), param)
      ios.flush(); ios.close()
      baos.toByteArray
    }

    /** Same generic `ImageIO.read` path as PNG. */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) =
      PngCodec.decode(bytes)
  }

  final case class JpegPair(doc_id: Long, png: Array[Byte],
      jpg: Array[Byte])
  final case class JpegDelta(doc_id: Long, width: Int, height: Int,
      dims_match: Boolean, abs_err: Long, n_channel_values: Long)

  /** Executor-side REAL JPEG decode graded against the lossless baseline:
    * each row carries BOTH encodings of the same pixel schedule; the pass
    * decodes both and accumulates the total absolute per-channel
    * deviation. Dimensions must match exactly (JPEG headers are
    * lossless); pixel error is bounded, and the bound is discriminating —
    * a channel swap, stride bug, or flipped axis produces a mean error an
    * order of magnitude above JPEG quantization loss. One partition pass,
    * no shuffle. */
  def decodeJpegVsPng(df: DataFrame): DataFrame = {
    implicit val inEnc: Encoder[JpegPair] = Encoders.product[JpegPair]
    implicit val outEnc: Encoder[JpegDelta] = Encoders.product[JpegDelta]
    df.select(col("doc_id"), col("png"), col("jpg")).as[JpegPair]
      .mapPartitions { it =>
        it.map { r =>
          val (wp, hp, pp) = PngCodec.decode(r.png)
          val (wj, hj, pj) = JpegCodec.decode(r.jpg)
          val ok = wp == wj && hp == hj
          var err = 0L
          if (ok) {
            var i = 0
            while (i < pp.length) {
              err += math.abs((pp(i) & 0xff) - (pj(i) & 0xff))
              i += 1
            }
          }
          JpegDelta(r.doc_id, wj, hj, ok, err, wj.toLong * hj * 3)
        }
      }.toDF()
  }

  /** REAL codec for WAV / PCM16 mono audio — RIFF container parsing in
    * pure JVM bytes (chunk walk to `fmt ` and `data`), so audio decode
    * also runs for real. Little-endian 16-bit samples. */
  object WavCodec {

    def encode(samples: Array[Short], sampleRate: Int = 16000)
        : Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2)
        .putShort(2).putShort(16) // block align, bits
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** (sampleRate, samples). Walks RIFF chunks; requires PCM16 mono. */
    def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
      }
      require(tag() == "RIFF", "not a RIFF file")
      bb.getInt // riff size
      require(tag() == "WAVE", "not a WAVE file")
      var rate = 0
      var samples: Array[Short] = null
      while (samples == null && bb.remaining() >= 8) {
        val t = tag(); val len = bb.getInt
        t match {
          case "fmt " =>
            val fmt = bb.getShort; val ch = bb.getShort
            rate = bb.getInt
            bb.getInt; bb.getShort
            val bits = bb.getShort
            require(fmt == 1 && ch == 1 && bits == 16,
              s"unsupported wav: fmt=$fmt ch=$ch bits=$bits")
            // RIFF chunks are word-aligned: odd lengths carry a pad
            // byte (AviCodec already handles this; a tagging tool's
            // odd-length LIST chunk would otherwise shift the walk)
            if (len > 16) bb.position(bb.position() + len - 16)
            if (len % 2 == 1) bb.position(bb.position() + 1)
          case "data" =>
            samples = new Array[Short](len / 2)
            var i = 0
            while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
            if (len % 2 == 1 && bb.remaining() > 0)
              bb.position(bb.position() + 1)
          case _ => // skip foreign chunk + RIFF pad byte
            bb.position(bb.position() + len + (len % 2))
        }
      }
      require(samples != null, "no data chunk")
      (rate, samples)
    }
  }

  final case class WavStats(doc_id: Long, sample_rate: Int, n_samples: Long,
      sum_abs: Long, peak: Long, sum_sq: Long, downsample_sum: Long)

  /** Executor-side REAL WAV decode + signal features: abs-sum, peak,
    * energy (integer sum of squares), and a decimate-by-4 checksum —
    * the audio analog of [[decodePpm]], one partition pass, no shuffle. */
  def decodeWav(df: DataFrame): DataFrame = {
    implicit val inEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
    implicit val outEnc: Encoder[WavStats] = Encoders.product[WavStats]
    df.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          val (rate, s) = WavCodec.decode(r.content)
          var sa = 0L; var pk = 0L; var sq = 0L; var ds = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toLong
            val a = math.abs(v)
            sa += a; if (a > pk) pk = a; sq += v * v
            if (i % 4 == 0) ds += v
            i += 1
          }
          WavStats(r.doc_id, rate, s.length.toLong, sa, pk, sq, ds)
        }
      }.toDF()
  }

  final case class PpmStats(doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, thumb_sum: Long)

  /** Executor-side REAL decode + feature extraction (per-channel sums) +
    * 8x8 nearest-neighbor thumbnail checksum — the full decode → feature →
    * resize chain, batch-iterated per partition with no shuffle. Generic
    * over the raster codec: the same pass serves PPM and PNG. */
  private def decodeRgbStats(df: DataFrame,
      dec: Array[Byte] => (Int, Int, Array[Byte])): DataFrame = {
    implicit val inEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
    implicit val outEnc: Encoder[PpmStats] = Encoders.product[PpmStats]
    df.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          val (w, h, px) = dec(r.content)
          var sr = 0L; var sg = 0L; var sb = 0L
          var i = 0
          while (i < px.length) {
            sr += px(i) & 0xff; sg += px(i + 1) & 0xff
            sb += px(i + 2) & 0xff
            i += 3
          }
          // 8x8 nearest-neighbor resize, checksummed over all channels
          // (zero-dimension images have no pixels to sample — an
          // unguarded loop would AIOOBE the whole partition on one
          // degenerate but well-formed row)
          var ts = 0L
          var yy = 0
          while (yy < 8 && w > 0 && h > 0) {
            var xx = 0
            while (xx < 8) {
              val sx = xx * w / 8; val sy = yy * h / 8
              val o = (sy * w + sx) * 3
              ts += (px(o) & 0xff) + (px(o + 1) & 0xff) + (px(o + 2) & 0xff)
              xx += 1
            }
            yy += 1
          }
          PpmStats(r.doc_id, w, h, sr, sg, sb, ts)
        }
      }.toDF()
  }

  def decodePpm(df: DataFrame): DataFrame =
    decodeRgbStats(df, PpmCodec.decode)

  def decodePng(df: DataFrame): DataFrame =
    decodeRgbStats(df, PngCodec.decode)

  /** REAL codec for animated GIF via `javax.imageio` (pure JDK) — the one
    * mainstream MULTI-FRAME container the JDK can both write and read, so
    * the video-shaped path (decode → per-frame rows → frame sampling)
    * runs on actual bytes instead of the [[FakeCodec]] stub. Frames are
    * 8-bit indexed against an exact 256-gray palette: GIF is palette-
    * limited by design, and the identity gray ramp makes the
    * encode→decode round trip byte-lossless — the property the analytic
    * oracle needs. Real video codecs (H.264 etc.) need native libs not in
    * this container; the GIF path exercises the identical Spark plumbing. */
  object GifCodec {

    private def grayModel: java.awt.image.IndexColorModel = {
      val ramp = Array.tabulate(256)(_.toByte)
      new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    }

    /** Animated GIF: `nFrames` frames of `w`×`h` gray pixels from
      * `pix(x, y, frame)`, 10 cs frame delay. */
    def encode(w: Int, h: Int, nFrames: Int,
        pix: (Int, Int, Int) => Int): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      val writer =
        javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayModel)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, pix(x, y, f) & 0xff)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
      ios.close()
      baos.toByteArray
    }

    /** All frames as gray byte arrays (row-major), with (w, h). */
    def decode(bytes: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
      val reader =
        javax.imageio.ImageIO.getImageReadersBySuffix("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      var w = 0; var h = 0
      val frames = (0 until n).map { i =>
        val img = reader.read(i)
        w = img.getWidth; h = img.getHeight
        val out = new Array[Byte](w * h)
        var p = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out(p) = (img.getRGB(x, y) & 0xff).toByte // gray: r = g = b
            p += 1; x += 1
          }
          y += 1
        }
        out
      }
      reader.dispose(); iis.close()
      (w, h, frames)
    }
  }

  final case class GifFrameRow(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, sum_gray: Long)

  /** Executor-side REAL GIF decode exploded to one row PER FRAME — the
    * video-pipeline shape (decode → frame rows → sample/filter →
    * features) on actual container bytes. One partition pass, no
    * shuffle. */
  def decodeGifFrames(df: DataFrame): DataFrame = {
    implicit val inEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
    implicit val outEnc: Encoder[GifFrameRow] = Encoders.product[GifFrameRow]
    df.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { r =>
          val (w, h, frames) = GifCodec.decode(r.content)
          frames.iterator.zipWithIndex.map { case (px, i) =>
            var s = 0L
            var j = 0
            while (j < px.length) { s += px(j) & 0xff; j += 1 }
            GifFrameRow(r.doc_id, i, w, h, s)
          }
        }
      }.toDF()
  }

  /** REAL codec for MJPEG-in-AVI video — the one video container whose
    * frame payloads the shipped pure-JDK [[JpegCodec]] can decode, making
    * the video pipeline end-to-end real: RIFF chunk walk (same container
    * family as [[WavCodec]]), `avih`/`strh`/`strf` headers, `00dc` frame
    * chunks. Real-world codecs (H.264 &c.) need native libs and route
    * through [[FakeCodec]]; the container plumbing here is identical.
    * Reference treats media as opaque payloads (SURVEY §2 multimodal
    * extension). */
  object AviCodec {
    private val ASCII = "US-ASCII"

    /** Minimal standard AVI: RIFF('AVI ') { LIST(hdrl){ avih,
      * LIST(strl){ strh(vids/MJPG, rate/scale = fps), strf(BITMAPINFO,
      * 'MJPG') } }, LIST(movi){ 00dc… } }. Frames are JPEG bytes. */
    def encode(w: Int, h: Int, fps: Int,
        frames: Seq[Array[Byte]]): Array[Byte] = {
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val pad = body.length % 2 // RIFF chunks are word-aligned
        val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(id.getBytes(ASCII)).putInt(body.length).put(body)
        bb.array()
      }
      def list(typ: String, body: Array[Byte]): Array[Byte] =
        chunk("LIST", typ.getBytes(ASCII) ++ body)
      val avih = {
        val bb = java.nio.ByteBuffer.allocate(56)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(1000000 / fps) // dwMicroSecPerFrame
          .putInt(0).putInt(0).putInt(0)
          .putInt(frames.length) // dwTotalFrames
          .putInt(0).putInt(1) // dwStreams
          .putInt(0).putInt(w).putInt(h)
        bb.array()
      }
      val strh = {
        val bb = java.nio.ByteBuffer.allocate(56)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("vids".getBytes(ASCII)).put("MJPG".getBytes(ASCII))
          .putInt(0).putShort(0).putShort(0).putInt(0)
          .putInt(1) // dwScale
          .putInt(fps) // dwRate → fps = rate/scale
          .putInt(0)
          .putInt(frames.length) // dwLength
          .putInt(0).putInt(-1).putInt(0)
          .putShort(0).putShort(0)
          .putShort(w.toShort).putShort(h.toShort) // rcFrame
        bb.array()
      }
      val strf = {
        val bb = java.nio.ByteBuffer.allocate(40)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
          .put("MJPG".getBytes(ASCII)).putInt(w * h * 3)
          .putInt(0).putInt(0).putInt(0).putInt(0)
        bb.array()
      }
      val hdrl = list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val movi = list("movi",
        frames.iterator.map(f => chunk("00dc", f)).reduce(_ ++ _))
      chunk("RIFF", "AVI ".getBytes(ASCII) ++ hdrl ++ movi)
    }

    /** (width, height, fps, frame JPEG payloads). Walks RIFF lists; the
      * frame list needs no idx1 (sequential `00dc`/`00db` scan). */
    def decode(bytes: Array[Byte]): (Int, Int, Int, Seq[Array[Byte]]) = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val t = new Array[Byte](4); bb.get(t); new String(t, ASCII)
      }
      require(tag() == "RIFF", "not a RIFF file")
      bb.getInt // riff size
      require(tag() == "AVI ", "not an AVI file")
      var w = 0; var h = 0; var scale = 1; var rate = 0
      val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      def walk(end: Int): Unit = {
        while (bb.position() + 8 <= end) {
          val id = tag()
          val sz = bb.getInt
          val next = bb.position() + sz + (sz % 2)
          if (id == "LIST") {
            tag() // list type: hdrl / strl / movi — walk them all
            walk(bb.position() + sz - 4)
            bb.position(next)
          } else {
            if (id == "strh") {
              val fcc = tag()
              if (fcc == "vids") {
                bb.position(bb.position() + 16) // handler..initialFrames
                scale = bb.getInt
                rate = bb.getInt
              }
            } else if (id == "strf" && w == 0) {
              bb.getInt // biSize
              w = bb.getInt
              h = bb.getInt
            } else if (id.endsWith("dc") || id.endsWith("db")) {
              val f = new Array[Byte](sz)
              bb.get(f)
              frames += f
            }
            bb.position(next)
          }
        }
      }
      walk(bytes.length)
      val fps = if (scale > 0 && rate > 0) rate / scale else 0
      (w, h, fps, frames.toSeq)
    }
  }

  final case class AviFrameRow(doc_id: Long, frame_idx: Int, fps: Int,
      n_frames: Int, width: Int, height: Int, sampled: Boolean,
      dec_width: Int, dec_height: Int)

  /** Executor-side REAL MJPEG-in-AVI decode exploded to one row per
    * frame, with frames-per-second sampling: one frame per second of
    * video (`frame_idx % fps == 0`) is marked sampled and ONLY sampled
    * frames pay the JPEG decode (`dec_width`/`dec_height` from real
    * pixel decode; -1 on unsampled rows) — the decode cost scales with
    * the sampling schedule, not the frame count, which is the property
    * that matters when the container is 100 TB of video. One partition
    * pass, no shuffle. */
  def decodeAviFrames(df: DataFrame): DataFrame = {
    implicit val inEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
    implicit val outEnc: Encoder[AviFrameRow] = Encoders.product[AviFrameRow]
    df.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { r =>
          val (w, h, fps, frames) = AviCodec.decode(r.content)
          val step = math.max(1, fps)
          frames.iterator.zipWithIndex.map { case (jpeg, i) =>
            val sampled = i % step == 0
            val (dw, dh) =
              if (sampled) {
                val (a, b, _) = JpegCodec.decode(jpeg)
                (a, b)
              } else (-1, -1)
            AviFrameRow(r.doc_id, i, fps, frames.length, w, h, sampled,
              dw, dh)
          }
        }
      }.toDF()
  }

  final case class AudioHashRow(doc_id: Long, window_idx: Int,
      n_windows: Int, whash: Long)

  /** Per-window content hashes for an audio column: WAV decode → FNV-1a
    * 64 over each `windowLen`-sample window's PCM bytes. The audio
    * counterpart of [[aviFrameHashes]]: WAV is lossless, so identical
    * recorded windows hash identically and clip-level near-dup becomes a
    * capped hash equi-join over 8-byte signatures — samples never leave
    * the executor. */
  def wavWindowHashes(df: DataFrame, windowLen: Int = 256): DataFrame = {
    implicit val inEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
    implicit val outEnc: Encoder[AudioHashRow] =
      Encoders.product[AudioHashRow]
    df.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { r =>
          val (_, samples) = WavCodec.decode(r.content)
          val nWin = (samples.length + windowLen - 1) / windowLen
          (0 until samples.length by windowLen).iterator.zipWithIndex
            .map { case (start, wi) =>
              val end = math.min(start + windowLen, samples.length)
              var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
              var i = start
              while (i < end) {
                val s = samples(i)
                h = (h ^ (s & 0xff)) * 0x100000001b3L
                h = (h ^ ((s >> 8) & 0xff)) * 0x100000001b3L
                i += 1
              }
              AudioHashRow(r.doc_id, wi, nWin, h)
            }
        }
      }.toDF()
  }

  final case class AudioWindowRow(doc_id: Long, window_idx: Int,
      n_samples: Int, sum_abs: Long, peak: Long)

  /** Executor-side REAL WAV decode exploded to fixed-length analysis
    * WINDOWS (one row per `windowLen`-sample window, last window ragged)
    * — the audio analog of per-frame video rows: the shape every
    * downstream audio featurizer (VAD, energy gating, loudness
    * normalization) consumes. One partition pass, no shuffle. */
  def decodeWavWindows(df: DataFrame, windowLen: Int = 256): DataFrame = {
    implicit val inEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
    implicit val outEnc: Encoder[AudioWindowRow] =
      Encoders.product[AudioWindowRow]
    df.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { r =>
          val (_, samples) = WavCodec.decode(r.content)
          (0 until samples.length by windowLen).iterator.zipWithIndex
            .map { case (start, wi) =>
              val end = math.min(start + windowLen, samples.length)
              var sa = 0L; var pk = 0L
              var i = start
              while (i < end) {
                val a = math.abs(samples(i).toLong)
                sa += a; if (a > pk) pk = a
                i += 1
              }
              AudioWindowRow(r.doc_id, wi, end - start, sa, pk)
            }
        }
      }.toDF()
  }

  final case class AHashRow(doc_id: Long, width: Int, height: Int,
      ahash: Long)

  /** 64-bit average-hash of one decoded RGB buffer: 8x8 nearest-neighbor
    * luma thumbnail → strict threshold against the thumbnail mean
    * (integer cross-multiply, no division). Shared by the image
    * ([[aHash]]) and per-video-frame ([[aviFrameHashes]]) paths so both
    * produce join-compatible signatures. */
  private[graft] def ahashOf(w: Int, h: Int, px: Array[Byte]): Long = {
    val luma = new Array[Long](64)
    var sum = 0L
    var yy = 0
    // zero-dimension guard: see decodeRgbStats
    while (yy < 8 && w > 0 && h > 0) {
      var xx = 0
      while (xx < 8) {
        val sx = xx * w / 8; val sy = yy * h / 8
        val o = (sy * w + sx) * 3
        val v = (px(o) & 0xff).toLong + (px(o + 1) & 0xff) +
          (px(o + 2) & 0xff)
        luma(yy * 8 + xx) = v; sum += v
        xx += 1
      }
      yy += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (luma(i) * 64 > sum) hash |= (1L << i)
      i += 1
    }
    hash
  }

  final case class FrameHashRow(doc_id: Long, frame_idx: Int,
      n_frames: Int, ahash: Long)

  /** Per-frame perceptual hashes for a video column: AVI container walk →
    * REAL JPEG pixel decode per frame → [[ahashOf]]. One partition pass,
    * no shuffle; pixels never leave the executor — downstream clip-level
    * near-dup is a hash equi-join over 8-byte signatures, the q29/q186
    * scale shape extended to video. */
  def aviFrameHashes(df: DataFrame): DataFrame = {
    implicit val inEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
    implicit val outEnc: Encoder[FrameHashRow] =
      Encoders.product[FrameHashRow]
    df.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { r =>
          val (_, _, _, frames) = AviCodec.decode(r.content)
          frames.iterator.zipWithIndex.map { case (jpeg, i) =>
            val (w, h, px) = JpegCodec.decode(jpeg)
            FrameHashRow(r.doc_id, i, frames.length, ahashOf(w, h, px))
          }
        }
      }.toDF()
  }

  /** Perceptual average-hash (aHash) over REAL decoded images: decode →
    * 8x8 nearest-neighbor luma thumbnail → threshold each cell against the
    * thumbnail mean → 64-bit signature. Identical images hash identically
    * (bit-exact decode), near-identical ones land within a small hamming
    * distance — the standard cheap perceptual fingerprint for image-corpus
    * dedup. Integer luma (r+g+b, no weights) keeps the threshold exact.
    * One partition pass, no shuffle; dedup is then a hash-groupBy, the
    * same scale-free shape as text exact-dedup (q29). */
  def aHash(df: DataFrame,
      dec: Array[Byte] => (Int, Int, Array[Byte])): DataFrame = {
    implicit val inEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
    implicit val outEnc: Encoder[AHashRow] = Encoders.product[AHashRow]
    df.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          val (w, h, px) = dec(r.content)
          AHashRow(r.doc_id, w, h, ahashOf(w, h, px))
        }
      }.toDF()
  }

  /** Magic-byte format classifier — the ingest ROUTER for a mixed media
    * landing zone: a crawl delivers one binary stream, and the first
    * bytes decide which decoder a row is routed to. Pure column algebra
    * (substring compares on the binary column inside whole-stage
    * codegen), so classification costs a few byte reads per row, never a
    * decode. */
  def mediaFormat(content: Column): Column =
    when(substring(content, 1, 8) ===
        lit(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')),
      "png")
      .when(substring(content, 1, 4) === lit("GIF8".getBytes("US-ASCII")),
        "gif")
      .when(substring(content, 1, 4) === lit("RIFF".getBytes("US-ASCII")) &&
        substring(content, 9, 4) === lit("WAVE".getBytes("US-ASCII")), "wav")
      .when(substring(content, 1, 4) === lit("RIFF".getBytes("US-ASCII")) &&
        substring(content, 9, 4) === lit("AVI ".getBytes("US-ASCII")), "avi")
      .when(substring(content, 1, 2) === lit("P6".getBytes("US-ASCII")),
        "ppm")
      // FFD8: the JPEG SOI marker — the most common crawl format must
      // route to the JpegCodec path, not to unknown/quarantine
      .when(substring(content, 1, 2) ===
        lit(Array[Byte](0xff.toByte, 0xd8.toByte)), "jpeg")
      .otherwise("unknown")

  /** Pack a text corpus into the multimodal layout (binary content +
    * metadata): the shape an image/audio corpus lands in. */
  def pack(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "text"): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("content"))

  /** Executor-side batch decode: one codec instance per partition, streamed
    * over the partition's rows — the mapPartitions pattern a real decoder
    * (or a Pandas-UDF equivalent in PySpark) uses. No shuffle; parallelism =
    * input partitions. */
  def decodeMeta(df: DataFrame): DataFrame = {
    implicit val inEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
    implicit val outEnc: Encoder[DecodedRow] = Encoders.product[DecodedRow]
    df.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        // per-partition codec init would go here (expensive native handle)
        it.map { r =>
          val (w, h, f) = FakeCodec.decode(r.content)
          DecodedRow(r.doc_id, w, h, f, r.content.length.toLong)
        }
      }.toDF()
  }

  /** Deterministic frame-sampling stub: pick `n` frame offsets from a fake
    * duration derived from content length — the video path's shape
    * (explode → per-frame rows). */
  def sampleFrames(df: DataFrame, n: Int = 4): DataFrame = {
    val duration = octet_length(col("content")) % 3600 + 1
    df.select(col("doc_id"), duration.as("duration_s"),
      explode(sequence(lit(0), lit(n - 1))).as("frame_idx"))
      .withColumn("frame_offset_s",
        floor(col("frame_idx") * col("duration_s") / n).cast("int"))
  }
}
