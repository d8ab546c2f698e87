package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2): media as opaque BINARY
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The full loop is real: ingest renders each document as an actual
  * grayscale PNG (one pixel per character, value = code point) through
  * javax.imageio; decode reads the PNG container back — signature
  * parsing, zlib inflate, scanline defiltering — and extracts pixel
  * statistics. Both stages run as typed mapPartitions (the Scala
  * analogue of a Pandas-UDF `mapInPandas` batch loop): codec context
  * initialized once per partition, then a streaming loop over rows.
  *
  * Because PNG is lossless, the decoded pixel statistics are exactly
  * the character statistics of the source text — which is what lets a
  * plain-SQL DuckDB oracle verify a genuine image decode end-to-end
  * without any image library on the oracle side.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte],
                            width: Int, height: Int)
  final case class Decoded(doc_id: Long, width: Int, height: Int,
                           n_px: Int, mean_px: Double,
                           q0: Long, q1: Long, q2: Long, q3: Long,
                           n_half: Int, mean_half: Double)

  /** Per-partition codec context: ImageIO's static write/read
    * convenience re-scans the plugin registry and allocates a
    * writer/reader per call — the expensive part with real codecs.
    * Looking the PNG writer/reader up once per partition (per thread)
    * is the "init codec once" batch shape for real. */
  final class PngCodec {
    private val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    private val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next()

    /** Render text as a width×1 8-bit grayscale PNG (pixel i = low
      * byte of the code unit of character i — an 8-bit raster cannot
      * hold more, so both engines mask mod 256; see mediaTable for the
      * corpus constraint). Real container, real compression. PNG
      * requires width ≥ 1, so empty text is rejected rather than
      * silently mis-encoded. */
    def encode(text: String): Array[Byte] = {
      val n = text.length
      require(n > 0, "cannot PNG-encode empty text (width-0 image)")
      val img = new java.awt.image.BufferedImage(
        n, 1, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      while (i < n) { raster.setSample(i, 0, 0, text.charAt(i).toInt & 0xFF); i += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        // explicit mid deflate level: ~3× faster than the default
        // writer mode at identical output size on these payloads
        val p = writer.getDefaultWriteParam
        if (p.canWriteCompressed) {
          p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
          p.setCompressionQuality(0.5f)
        }
        writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { ios.close(); writer.setOutput(null) }
      bos.toByteArray
    }

    /** Decode a PNG payload → (width, height, pixel samples). */
    def decode(payload: Array[Byte]): (Int, Int, Array[Int]) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val img = try {
        reader.setInput(iis)
        reader.read(0)
      } finally { iis.close(); reader.setInput(null) }
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val px = new Array[Int](w * h)
      var y = 0; var i = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(i) = raster.getSample(x, y, 0); x += 1; i += 1 }
        y += 1
      }
      (w, h, px)
    }
  }

  // single-row conveniences (specs, exploratory use)
  def encodePng(text: String): Array[Byte] = new PngCodec().encode(text)
  def decodePng(payload: Array[Byte]): (Int, Int, Array[Int]) =
    new PngCodec().decode(payload)

  /** Media table: documents rendered to real PNG payloads with typed
    * metadata alongside (as a production pipeline carries
    * EXIF/container info). Batch encode via typed mapPartitions.
    *
    * Corpus constraints (enforced/made exact rather than assumed):
    * empty documents cannot become PNGs (width-0) and fail fast in
    * encode; characters are stored as their code-unit low byte, and
    * the oracle masks `unicode(ch) % 256` identically, so any BMP
    * corpus stays oracle-exact (astral code points would split into
    * two UTF-16 units here but one code point in DuckDB — out of
    * scope; the test corpus is ASCII). */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.fanout(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        // once per partition: RawPng (java.util.zip directly) — the
        // ImageIO path costs ~5× in per-image plugin/raster overhead
        // (PngCodec remains for the cross-validation spec)
        val codec = new graft.functions.RawPng()
        rows.map { case (id, text) =>
          val n = text.length
          require(n > 0, "cannot PNG-encode empty text (width-0 image)")
          val px = new Array[Byte](n)
          var i = 0
          while (i < n) { px(i) = text.charAt(i).toByte; i += 1 }
          MediaRow(id, codec.encode(px, n, 1), n, 1)
        }
      }
      .toDF()
  }

  /** Batch decode via typed mapPartitions — one codec init per
    * partition, then a streaming loop over rows, exactly the
    * mapInPandas batch shape. Emits pixel statistics: count, mean,
    * and a 4-bin intensity histogram (the decode-then-featurize stage
    * of an image training pipeline). */
  def decodeAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow]
      .mapPartitions { rows =>
        val codec = new graft.functions.RawPng() // once per partition
        rows.map { r =>
          val (w, h, px) = codec.decode(r.payload)
          var sum = 0L
          val hist = new Array[Long](4)
          var i = 0
          while (i < px.length) {
            sum += px(i); hist(px(i) / 64) += 1; i += 1
          }
          // resize stage: 2× downsample by adjacent-pair averaging
          // (half-integer values are exact in double; sum is exact)
          val nHalf = px.length / 2
          var halfSum = 0.0
          i = 0
          while (i < nHalf) {
            halfSum += (px(2 * i) + px(2 * i + 1)) / 2.0; i += 1
          }
          Decoded(r.doc_id, w, h, px.length,
            sum.toDouble / px.length,
            hist(0), hist(1), hist(2), hist(3),
            nHalf, if (nHalf == 0) 0.0 else halfSum / nHalf)
        }
      }
      .toDF()
  }

  def mmPipeline(s: SparkSession, dir: String): DataFrame =
    decodeAll(s, dir)
      .select("doc_id", "width", "height", "n_px", "mean_px",
        "q0", "q1", "q2", "q3", "n_half", "mean_half")
      .orderBy("doc_id")

  /** PNG is lossless, so decoded pixel statistics equal character
    * statistics of the source text — an ANSI-SQL-expressible oracle
    * for a real image decode. mean division is a single IEEE op on
    * identical operands (exact integer sum / exact count). */
  val mmPipelineSql: String = """
    WITH c AS (
      SELECT doc_id, length(text) AS n,
        list_transform(string_split_regex(text, ''), ch -> unicode(ch) % 256) AS codes
      FROM documents),
    f AS (
      SELECT doc_id,
        CAST(n AS INTEGER) AS width, 1 AS height, CAST(n AS INTEGER) AS n_px,
        CAST(list_sum(codes) AS DOUBLE) / n AS mean_px,
        CAST(len(list_filter(codes, x -> x // 64 = 0)) AS BIGINT) AS q0,
        CAST(len(list_filter(codes, x -> x // 64 = 1)) AS BIGINT) AS q1,
        CAST(len(list_filter(codes, x -> x // 64 = 2)) AS BIGINT) AS q2,
        CAST(len(list_filter(codes, x -> x // 64 = 3)) AS BIGINT) AS q3,
        CAST(n // 2 AS INTEGER) AS n_half,
        CASE WHEN n // 2 = 0 THEN 0.0 ELSE
          list_sum(list_transform(generate_series(1, n // 2),
            i -> (codes[2*i-1] + codes[2*i]) / 2.0)) / (n // 2) END AS mean_half
      FROM c)
    SELECT doc_id, width, height, n_px, mean_px, q0, q1, q2, q3,
           n_half, mean_half
    FROM f ORDER BY doc_id"""

  // ── audio modality ──────────────────────────────────────────────
  // Same contract as the image path: a REAL container format (RIFF/
  // WAV, PCM16LE mono) written and parsed byte-for-byte, batch-staged
  // through typed mapPartitions, with losslessness making the decoded
  // sample statistics ANSI-SQL-expressible for the oracle.

  final case class AudioRow(doc_id: Long, payload: Array[Byte],
                            sr: Int, n_samples: Int)
  final case class AudioFeat(doc_id: Long, sr: Int, n_samples: Int,
                             peak: Int, rms: Double,
                             n_frames: Int, frame_rms: Double)

  /** WAV writer/parser — the 44-byte canonical RIFF header plus PCM16LE
    * payload. Encode and decode are full-fidelity: decode validates the
    * RIFF/WAVE/fmt/data magics and reads the format fields rather than
    * assuming them. */
  object Wav {
    val SampleRate = 16000

    private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
      b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
    }
    private def rd32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
    private def rd16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

    def encode(samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val b = new Array[Byte](44 + dataLen)
      "RIFF".getBytes.copyToArray(b, 0); le32(b, 4, 36 + dataLen)
      "WAVE".getBytes.copyToArray(b, 8)
      "fmt ".getBytes.copyToArray(b, 12); le32(b, 16, 16)
      b(20) = 1; b(21) = 0 // PCM
      b(22) = 1; b(23) = 0 // mono
      le32(b, 24, SampleRate)
      le32(b, 28, SampleRate * 2) // byte rate
      b(32) = 2; b(33) = 0        // block align
      b(34) = 16; b(35) = 0       // bits per sample
      "data".getBytes.copyToArray(b, 36); le32(b, 40, dataLen)
      var i = 0
      while (i < samples.length) {
        b(44 + 2 * i) = samples(i).toByte
        b(45 + 2 * i) = (samples(i) >> 8).toByte
        i += 1
      }
      b
    }

    /** Parse a WAV payload → (sampleRate, samples). Validates magics
      * and format; a corrupt container fails loudly, never silently. */
    def decode(b: Array[Byte]): (Int, Array[Short]) = {
      def magic(off: Int, s: String): Unit =
        require(new String(b, off, 4) == s, s"bad WAV: expected $s at $off")
      magic(0, "RIFF"); magic(8, "WAVE"); magic(12, "fmt "); magic(36, "data")
      require(rd16(b, 20) == 1 && rd16(b, 22) == 1 && rd16(b, 34) == 16,
        "bad WAV: not PCM16 mono")
      val sr = rd32(b, 24)
      val dataLen = rd32(b, 40)
      require(44 + dataLen <= b.length, "bad WAV: truncated data chunk")
      val out = new Array[Short](dataLen / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((b(44 + 2 * i) & 0xFF) | (b(45 + 2 * i) << 8)).toShort
        i += 1
      }
      (sr, out)
    }
  }

  /** Audio table: each document rendered as a real WAV payload whose
    * samples derive deterministically from the text (sample i =
    * (code-unit i mod 256 − 128) · 256 — full int16 dynamic range,
    * lossless, so the oracle can recompute the waveform from the text
    * in SQL). Typed metadata (sample rate, length) alongside, like a
    * production pipeline carries container info. */
  def audioTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.fanout(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val n = text.length
          require(n > 0, "cannot WAV-encode empty text (zero samples)")
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = (((text.charAt(i).toInt & 0xFF) - 128) * 256).toShort
            i += 1
          }
          AudioRow(id, Wav.encode(samples), Wav.SampleRate, n)
        }
      }
      .toDF()
  }

  /** Decode + frame-sample + featurize, one batch stage: parse the
    * container, then emit peak (max |sample|), RMS, and the same stats
    * over a 4:1 frame-sampled signal (every 4th sample — the
    * frame-extraction shape for video/audio: decimate, then featurize).
    * Integer sums of squares are exact in Long (≤ 2^30 per sample);
    * the single sqrt(double) is correctly rounded in both engines. */
  def audioPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    audioTable(s, dir).as[AudioRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (sr, smp) = Wav.decode(r.payload)
          var peak = 0; var sq = 0L
          var i = 0
          while (i < smp.length) {
            val v = math.abs(smp(i).toInt)
            if (v > peak) peak = v
            sq += v.toLong * v
            i += 1
          }
          val nF = (smp.length + 3) / 4
          var sqF = 0L
          i = 0
          while (i < nF) {
            val v = smp(4 * i).toInt
            sqF += v.toLong * v
            i += 1
          }
          AudioFeat(r.doc_id, sr, smp.length, peak,
            math.sqrt(sq.toDouble / smp.length),
            nF, math.sqrt(sqF.toDouble / nF))
        }
      }
      .toDF()
      // round in the DataFrame layer: Spark round() ≡ DuckDB ROUND
      // (the repo's proven HALF_UP pairing), unlike scala math.rint
      .select(col("doc_id"), col("sr"), col("n_samples"), col("peak"),
        round(col("rms"), 6).as("rms"), col("n_frames"),
        round(col("frame_rms"), 6).as("frame_rms"))
      .orderBy("doc_id")
  }

  /** WAV is lossless PCM, so decoded sample statistics equal the
    * text-derived waveform statistics — recomputed here from the text
    * alone (the oracle never sees the binary, which is the point: it
    * certifies the container round-trip). */
  val mmAudioSql: String = """
    WITH c AS (
      SELECT doc_id, length(text) AS n,
        list_transform(string_split_regex(text, ''),
          ch -> (unicode(ch) % 256 - 128) * 256) AS s
      FROM documents),
    f AS (
      SELECT doc_id, 16000 AS sr, n,
        list_max(list_transform(s, x -> abs(x))) AS peak,
        list_sum(list_transform(s, x -> CAST(x AS BIGINT) * x)) AS sq,
        (n + 3) // 4 AS n_frames,
        list_sum(list_transform(generate_series(1, (n + 3) // 4),
          i -> CAST(s[4*i - 3] AS BIGINT) * s[4*i - 3])) AS sq_f
      FROM c)
    SELECT doc_id, CAST(sr AS INTEGER) AS sr,
           CAST(n AS INTEGER) AS n_samples,
           CAST(peak AS INTEGER) AS peak,
           ROUND(sqrt(CAST(sq AS DOUBLE) / n), 6) AS rms,
           CAST(n_frames AS INTEGER) AS n_frames,
           ROUND(sqrt(CAST(sq_f AS DOUBLE) / n_frames), 6) AS frame_rms
    FROM f ORDER BY doc_id"""

  // ── video modality ──────────────────────────────────────────────
  // The third modality leg: a REAL multi-frame container (length-
  // prefixed PNG frames under a validated magic — the moral shape of
  // an MJPEG/fragmented-MP4 track), batch-staged like image/audio.
  // The video-specific operator is FRAME SAMPLING: parse the
  // container index, decode only every `stride`-th frame, featurize
  // the sampled frames. Losslessness again makes the decoded stats
  // ANSI-SQL-expressible from the source text.

  final case class VideoRow(doc_id: Long, payload: Array[Byte],
                            n_frames: Int, n_px_frame: Int)
  final case class VideoFeat(doc_id: Long, n_frames: Int, n_sampled: Int,
                             n_px_sampled: Long, mean_sampled: Double,
                             mean_f0: Double)

  /** GVID container: "GVID" magic, u32 frame count, then per frame a
    * u32 byte length + the PNG payload. Decode validates the magic,
    * the count, every length field, and exact consumption of the
    * buffer — truncated or corrupt containers fail loudly. */
  object Gvid {
    private def be32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
      b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
    }
    private def rd32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
        ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

    def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
      val total = 8 + frames.map(4 + _.length).sum
      val out = new Array[Byte](total)
      out(0) = 'G'; out(1) = 'V'; out(2) = 'I'; out(3) = 'D'
      be32(out, 4, frames.length)
      var off = 8
      frames.foreach { f =>
        be32(out, off, f.length)
        System.arraycopy(f, 0, out, off + 4, f.length)
        off += 4 + f.length
      }
      out
    }

    def decode(b: Array[Byte]): Array[Array[Byte]] = {
      require(b.length >= 8 && b(0) == 'G' && b(1) == 'V' &&
        b(2) == 'I' && b(3) == 'D', "GVID: bad magic")
      val n = rd32(b, 4)
      require(n >= 0, s"GVID: negative frame count $n")
      val out = new Array[Array[Byte]](n)
      var off = 8
      var i = 0
      while (i < n) {
        require(off + 4 <= b.length, s"GVID: truncated at frame $i")
        val len = rd32(b, off)
        require(len >= 0 && off + 4 + len <= b.length,
          s"GVID: bad frame length $len at frame $i")
        out(i) = java.util.Arrays.copyOfRange(b, off + 4, off + 4 + len)
        off += 4 + len
        i += 1
      }
      require(off == b.length, "GVID: trailing bytes after last frame")
      out
    }
  }

  val VideoFrames = 4
  val FrameStride = 2

  /** Video table: each document rendered as a GVID container of
    * `VideoFrames` PNG frames; frame f's pixels are the text's code
    * bytes brightness-shifted by f (mod 256) — deterministic and
    * SQL-recomputable, so the oracle certifies container + codec +
    * sampling end-to-end without seeing the binary. */
  def videoTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.fanout(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        val codec = new graft.functions.RawPng() // once per partition
        rows.map { case (id, text) =>
          val n = text.length
          require(n > 0, "cannot video-encode empty text (width-0 frames)")
          val frames = (0 until VideoFrames).map { f =>
            val px = new Array[Byte](n)
            var i = 0
            while (i < n) {
              px(i) = (((text.charAt(i).toInt & 0xFF) + f) % 256).toByte
              i += 1
            }
            codec.encode(px, n, 1)
          }
          VideoRow(id, Gvid.encode(frames), VideoFrames, n)
        }
      }
      .toDF()
  }

  /** Parse container → sample every `FrameStride`-th frame → decode
    * ONLY the sampled frames (the whole point of frame sampling: the
    * skipped frames' PNG payloads are never inflated) → featurize.
    * Integer pixel sums are exact in Long; each mean is one IEEE
    * division of identical operands in both engines. */
  def videoPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    videoTable(s, dir).as[VideoRow]
      .mapPartitions { rows =>
        val codec = new graft.functions.RawPng()
        rows.map { r =>
          val payloads = Gvid.decode(r.payload)
          val sampled = payloads.indices.by(FrameStride).toArray
          var total = 0L; var nPx = 0L; var sumF0 = 0L; var nF0 = 0L
          sampled.foreach { fi =>
            val (w, h, px) = codec.decode(payloads(fi))
            var i = 0; var s0 = 0L
            while (i < px.length) { s0 += (px(i) & 0xFF); i += 1 }
            total += s0; nPx += w.toLong * h
            if (fi == 0) { sumF0 = s0; nF0 = w.toLong * h }
          }
          VideoFeat(r.doc_id, payloads.length, sampled.length, nPx,
            total.toDouble / nPx, sumF0.toDouble / nF0)
        }
      }
      .toDF()
      .select(col("doc_id"), col("n_frames"), col("n_sampled"),
        col("n_px_sampled"), col("mean_sampled"), col("mean_f0"))
      .orderBy("doc_id")
  }

  /** Frames are PNG-lossless and the brightness shift is
    * SQL-recomputable, so the sampled-frame means derive from the
    * text: sampled frames are 0 and 2 (stride 2 of 4), mean over
    * frame f = mean of (code + f) % 256. */
  val mmVideoSql: String = s"""
    WITH c AS (
      SELECT doc_id, length(text) AS n,
        list_transform(string_split_regex(text, ''),
          ch -> unicode(ch) % 256) AS codes
      FROM documents),
    f AS (
      SELECT doc_id, $VideoFrames AS n_frames, 2 AS n_sampled,
        CAST(2 * n AS BIGINT) AS n_px_sampled,
        list_sum(codes) AS s0,
        list_sum(list_transform(codes, x -> (x + 2) % 256)) AS s2,
        n
      FROM c)
    SELECT doc_id, n_frames, n_sampled, n_px_sampled,
           CAST(s0 + s2 AS DOUBLE) / (2 * n) AS mean_sampled,
           CAST(s0 AS DOUBLE) / n AS mean_f0
    FROM f ORDER BY doc_id"""

  // ── image augmentation stage ────────────────────────────────────
  final case class AugFeat(doc_id: Long, n_px: Int, checksum: Long,
                           mean_aug: Double)

  /** Augmentation as a REAL re-encode pipeline: decode PNG →
    * horizontal flip → brightness shift (+16, clipped at 255) →
    * encode back to PNG → decode again → featurize. Two typed
    * mapPartitions codec stages with a genuine binary intermediate —
    * the shape of an image-augmentation pass in a training pipeline
    * (the middle column IS a valid PNG a downstream tool could read).
    * Certification: PNG losslessness end-to-end means the final
    * POSITION-weighted checksum pins the flip order exactly (a stats-
    * only oracle would pass an unflipped image); the oracle recomputes
    * flip+clip directly on the source characters. All sums are exact
    * integer arithmetic; the mean is one IEEE division. */
  def mmAugment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow]
      .mapPartitions { rows =>
        val codec = new graft.functions.RawPng()
        rows.map { r =>
          val (w, h, px) = codec.decode(r.payload)
          val out = new Array[Byte](px.length)
          var i = 0
          while (i < px.length) {
            out(i) = math.min(px(px.length - 1 - i) + 16, 255).toByte
            i += 1
          }
          MediaRow(r.doc_id, codec.encode(out, w, h), w, h)
        }
      }
      .mapPartitions { rows =>
        val codec = new graft.functions.RawPng()
        rows.map { r =>
          val (_, _, px) = codec.decode(r.payload)
          var cs = 0L
          var sum = 0L
          var i = 0
          while (i < px.length) {
            cs += (i + 1).toLong * px(i); sum += px(i); i += 1
          }
          AugFeat(r.doc_id, px.length, cs, sum.toDouble / px.length)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  val mmAugmentSql: String = """
    WITH c AS (
      SELECT doc_id, length(text) AS n,
        list_transform(string_split_regex(text, ''),
          ch -> unicode(ch) % 256) AS codes
      FROM documents),
    aug AS (
      SELECT doc_id, n,
        list_transform(generate_series(1, n),
          i -> least(codes[n + 1 - i] + 16, 255)) AS a
      FROM c)
    SELECT doc_id, CAST(n AS INTEGER) AS n_px,
      CAST(list_sum(list_transform(generate_series(1, n),
        i -> i * a[i])) AS BIGINT) AS checksum,
      CAST(list_sum(a) AS DOUBLE) / n AS mean_aug
    FROM aug ORDER BY doc_id"""

  /** Content-type routing over a MIXED media table — the first stage
    * of any multimodal ingest: the three modality tables union into
    * one opaque-binary column and every payload is classified by its
    * container magic (PNG signature / RIFF…WAVE / GVID) as pure
    * column ops over the binary prefix (no codec touched — routing
    * must be cheap). Each doc produced exactly one payload per
    * modality, so per-type counts are SQL-derivable and the oracle
    * certifies the classification is total and exact. */
  def mmTypeDetect(s: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(s, dir).select(col("payload"))
      .unionByName(audioTable(s, dir).select(col("payload")))
      .unionByName(videoTable(s, dir).select(col("payload")))
    media
      .withColumn("kind",
        when(hex(substring(col("payload"), 1, 4)) === "89504E47", "png")
          .when(substring(col("payload"), 1, 4).cast("string") === "RIFF" &&
            substring(col("payload"), 9, 4).cast("string") === "WAVE", "wav")
          .when(substring(col("payload"), 1, 4).cast("string") === "GVID",
            "video")
          .otherwise("unknown"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        min(length(col("payload"))).as("min_bytes"))
      .select(col("kind"), col("n"),
        (col("min_bytes") > 12).as("has_header"))
      .orderBy("kind")
  }

  /** Every modality emits one payload per document and min payload
    * size strictly exceeds the largest container header. */
  val mmTypeDetectSql: String = """
    SELECT k.kind, COUNT(*) AS n, TRUE AS has_header
    FROM documents, (SELECT unnest(['png', 'video', 'wav']) AS kind) k
    GROUP BY 1 ORDER BY 1"""

  /** Binary dedup at the MEDIA layer: group identical payloads by
    * md5 of the raw bytes — image dedup without ever decoding. The
    * PNG encoder is deterministic, so payload-identity ≡ source-text
    * identity, which is exactly what the oracle certifies: the
    * per-source distinct-payload counts must equal DuckDB's
    * distinct-text counts. A nondeterministic encoder (timestamps,
    * parallel-chunk zlib) would split groups and fail the gate. */
  def mmDedup(s: SparkSession, dir: String): DataFrame = {
    mediaTable(s, dir)
      .join(Tables.load(s, dir, "documents").select("doc_id", "source"),
        Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_payloads"),
        countDistinct(md5(col("payload"))).as("n_distinct"))
      .orderBy("source")
  }

  val mmDedupSql: String = """
    SELECT source, COUNT(*) AS n_payloads,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct
    FROM documents GROUP BY 1 ORDER BY source"""

  // ── audio augmentation stage ────────────────────────────────────
  final case class AudioAug(doc_id: Long, n_samples: Int, checksum: Long,
                            mean_aug: Double)

  /** Audio augmentation as a real re-encode pipeline — the WAV twin of
    * mm_augment: decode PCM16 → reverse + 2× gain clipped to the
    * sample range → encode back to a valid RIFF/WAV container →
    * decode again → featurize. The position-weighted checksum pins
    * the reversal order; clipping exercises the saturation path both
    * engines must agree on (greatest/least mirror the Scala clamp).
    * All sums are exact integer arithmetic. */
  def mmAudioAugment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    audioTable(s, dir).as[AudioRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (_, smp) = Wav.decode(r.payload)
          val out = new Array[Short](smp.length)
          var i = 0
          while (i < smp.length) {
            val v = smp(smp.length - 1 - i) * 2
            out(i) = math.max(-32768, math.min(32767, v)).toShort
            i += 1
          }
          AudioRow(r.doc_id, Wav.encode(out), r.sr, out.length)
        }
      }
      .mapPartitions { rows =>
        rows.map { r =>
          val (_, smp) = Wav.decode(r.payload)
          var cs = 0L
          var sum = 0L
          var i = 0
          while (i < smp.length) {
            cs += (i + 1).toLong * smp(i); sum += smp(i); i += 1
          }
          AudioAug(r.doc_id, smp.length, cs, sum.toDouble / smp.length)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  val mmAudioAugmentSql: String = """
    WITH c AS (
      SELECT doc_id,
        list_transform(string_split_regex(text, ''),
          ch -> (unicode(ch) % 256 - 128) * 256) AS sm,
        length(text) AS n
      FROM documents),
    a AS (
      SELECT doc_id, n,
        list_transform(generate_series(1, n),
          i -> greatest(-32768, least(32767, 2 * sm[n + 1 - i]))) AS aug
      FROM c)
    SELECT doc_id, CAST(n AS INTEGER) AS n_samples,
      CAST(list_sum(list_transform(generate_series(1, n),
        i -> i * aug[i])) AS BIGINT) AS checksum,
      CAST(list_sum(aug) AS DOUBLE) / n AS mean_aug
    FROM a ORDER BY doc_id"""

  // ── perceptual near-dup (dHash) ─────────────────────────────────
  final case class PHashRow(doc_id: Long, phash: Long)

  /** Perceptual image near-dup: a 60-bit dHash (gradient-sign bits —
    * bit i set iff pixel i is brighter than pixel i+1) computed from
    * DECODED pixels through the real PNG codec, then the same
    * pigeonhole blocking + salted pair generation + hamming filter as
    * dedup_simhash (4 × 15-bit segments; hamming ≤ 3 guarantees one
    * clean segment). This is image dedup that survives small
    * brightness shifts — the content-level companion to mm_dedup's
    * byte-identity. PNG losslessness lets the oracle re-derive every
    * hash bit from the source characters, so blocking, salting, and
    * the hamming filter are all hash-certified end-to-end. */
  def dedupPhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = mediaTable(s, dir).as[MediaRow]
      .mapPartitions { rows =>
        val codec = new graft.functions.RawPng()
        rows.map { r =>
          val (_, _, px) = codec.decode(r.payload)
          var h = 0L
          var i = 0
          while (i < 60 && i < px.length - 1) {
            if (px(i) > px(i + 1)) h |= (1L << i)
            i += 1
          }
          PHashRow(r.doc_id, h)
        }
      }
      .toDF()
    val hot = Tables.hot(hashes)
    val segMask = (1L << 15) - 1
    val seg = (0 until 4).map(k =>
      struct(lit(k).as("seg"),
        shiftright(col("phash"), k * 15).bitwiseAND(lit(segMask)).as("sk")))
    val blocked = hot.select(col("doc_id"),
        explode(array(seg: _*)).as("e"))
      .select(col("doc_id"), col("e.seg").as("seg"), col("e.sk").as("sk"))
    SkewJoin.saltedSelfPairs(blocked, Seq("seg", "sk"), "doc_id",
        target = 32)
      .select(col("_ida").as("da"), col("_idb").as("db"))
      .distinct()
      .join(hot.select(col("doc_id").as("da"), col("phash").as("ha")),
        Seq("da"))
      .join(hot.select(col("doc_id").as("db"), col("phash").as("hb")),
        Seq("db"))
      .select(col("da"), col("db"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("da", "db")
  }

  val dedupPhashSql: String = """
    WITH c AS (
      SELECT doc_id,
        list_transform(string_split_regex(text, ''),
          ch -> unicode(ch) % 256) AS codes,
        length(text) AS n
      FROM documents),
    h AS (
      SELECT doc_id,
        CAST(COALESCE(list_sum(list_transform(
          generate_series(1, least(60, n - 1)),
          i -> CASE WHEN codes[i] > codes[i + 1]
               THEN (1::UBIGINT << (i - 1)) ELSE 0::UBIGINT END)), 0)
          AS BIGINT) AS phash
      FROM c),
    blocked AS (
      SELECT doc_id, phash, t.k AS seg,
             CAST((phash >> (15 * t.k)) & 32767 AS BIGINT) AS sk
      FROM h, generate_series(0, 3) t(k)),
    cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      FROM blocked a JOIN blocked b
        ON a.seg = b.seg AND a.sk = b.sk AND a.doc_id < b.doc_id)
    SELECT da, db,
           CAST(bit_count(xor(ha.phash, hb.phash)) AS INTEGER) AS hamming
    FROM cand
    JOIN h ha ON da = ha.doc_id
    JOIN h hb ON db = hb.doc_id
    WHERE bit_count(xor(ha.phash, hb.phash)) <= 3
    ORDER BY da, db"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("mm_pipeline", mmPipeline, Some(mmPipelineSql)),
    QueryDef("mm_dedup", mmDedup, Some(mmDedupSql)),
    QueryDef("dedup_phash", dedupPhash, Some(dedupPhashSql)),
    QueryDef("mm_audio_augment", mmAudioAugment, Some(mmAudioAugmentSql)),
    QueryDef("mm_type_detect", mmTypeDetect, Some(mmTypeDetectSql)),
    QueryDef("mm_augment", mmAugment, Some(mmAugmentSql)),
    QueryDef("mm_audio", audioPipeline, Some(mmAudioSql)),
    QueryDef("mm_video", videoPipeline, Some(mmVideoSql)))
}
