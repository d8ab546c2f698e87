package graft.functions

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal spec-compliant PNG codec for 8-bit grayscale images,
  * written directly on java.util.zip — no javax.imageio.
  *
  * Why: ImageIO's per-image cost is dominated by plugin/registry
  * machinery, BufferedImage rasters and ImageInputStream wrappers; on
  * corpora of millions of SMALL images that overhead IS the pipeline
  * cost (measured ~5× the actual zlib work on the mm_pipeline bench).
  * This codec is the batch-shaped alternative: one Deflater/Inflater
  * pair per partition, reset between images, zero per-image
  * allocation beyond the output buffer.
  *
  * Compatibility is cross-checked both directions in MultimodalSpec:
  * javax.imageio decodes RawPng output and RawPng decodes
  * javax.imageio output, pixel-identical. The decoder handles all
  * five PNG filter types, multiple IDAT chunks, and rejects non-gray
  * or non-8-bit images — it reads real-world grayscale PNGs, not just
  * its own output.
  */
final class RawPng {
  private val deflater = new Deflater(5) // mid level: size/CPU knee
  private val inflater = new Inflater()
  private val crc = new CRC32()

  private val SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def writeChunk(out: java.io.ByteArrayOutputStream,
                         tag: String, data: Array[Byte]): Unit = {
    def be(i: Int): Array[Byte] =
      Array((i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte)
    out.write(be(data.length))
    val tagB = tag.getBytes("US-ASCII")
    out.write(tagB)
    out.write(data)
    crc.reset(); crc.update(tagB); crc.update(data)
    out.write(be(crc.getValue.toInt))
  }

  /** Encode 8-bit grayscale samples (row-major) as a PNG. Scanlines
    * use filter 0 (None) — tiny rows gain nothing from filtering and
    * skipping the filter pass halves encode CPU. */
  def encode(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"PNG needs positive dims, got ${w}x$h")
    require(px.length == w * h, "pixel count != w*h")
    val out = new java.io.ByteArrayOutputStream(px.length / 2 + 64)
    out.write(SIG)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
    writeChunk(out, "IHDR", ihdr.array())
    // raw scanlines: filter byte 0 + row samples
    val raw = new Array[Byte](h * (1 + w))
    var y = 0
    while (y < h) {
      // raw(y*(1+w)) is already 0 (filter None)
      System.arraycopy(px, y * w, raw, y * (1 + w) + 1, w)
      y += 1
    }
    deflater.reset()
    deflater.setInput(raw)
    deflater.finish()
    val zbuf = new Array[Byte](raw.length + (raw.length >> 8) + 32)
    var zlen = 0
    while (!deflater.finished())
      zlen += deflater.deflate(zbuf, zlen, zbuf.length - zlen)
    writeChunk(out, "IDAT", java.util.Arrays.copyOf(zbuf, zlen))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode an 8-bit grayscale PNG → (width, height, samples). */
  def decode(png: Array[Byte]): (Int, Int, Array[Int]) = {
    require(png.length > 8 && SIG.indices.forall(i => png(i) == SIG(i)),
      "not a PNG")
    val buf = java.nio.ByteBuffer.wrap(png, 8, png.length - 8)
    var w = 0; var h = 0; var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && buf.remaining() >= 12) {
      val len = buf.getInt
      val tag = new String(Array(buf.get, buf.get, buf.get, buf.get)
        .map(_.toChar))
      tag match {
        case "IHDR" =>
          w = buf.getInt; h = buf.getInt
          val depth = buf.get; val color = buf.get
          require(depth == 8 && color == 0,
            s"RawPng reads 8-bit grayscale only (depth=$depth color=$color)")
          buf.position(buf.position() + (len - 10)) // rest of IHDR
          seenIhdr = true
        case "IDAT" =>
          idat.write(png, buf.position(), len)
          buf.position(buf.position() + len)
        case "IEND" => done = true
        case _ => buf.position(buf.position() + len) // ancillary chunk
      }
      if (!done) buf.position(buf.position() + 4) // CRC (trusted input)
    }
    require(seenIhdr && w > 0 && h > 0, "missing/invalid IHDR")
    val stride = 1 + w
    val raw = new Array[Byte](h * stride)
    inflater.reset()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (!inflater.finished() && off < raw.length)
      off += inflater.inflate(raw, off, raw.length - off)
    require(off == raw.length, s"short inflate: $off of ${raw.length}")
    // defilter (grayscale → bytes-per-pixel 1, "left" = previous byte)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val rowOff = y * stride
      val filter = raw(rowOff) & 0xFF
      var x = 0
      while (x < w) {
        val cur = raw(rowOff + 1 + x) & 0xFF
        val left = if (x > 0) px(y * w + x - 1) else 0
        val up = if (y > 0) px((y - 1) * w + x) else 0
        val ul = if (x > 0 && y > 0) px((y - 1) * w + x - 1) else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 => // Paeth predictor
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left
                       else if (pb <= pc) up else ul
            cur + pred
          case f => throw new IllegalArgumentException(s"filter $f")
        }
        px(y * w + x) = recon & 0xFF
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** Release native zlib state (call at partition end if desired;
    * finalization also covers it). */
  def close(): Unit = { deflater.end(); inflater.end() }
}
