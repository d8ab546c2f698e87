package graft.functions

/** Minimal deterministic USTAR writer/reader — the WebDataset shard
  * container (a training corpus shipped as tar archives of per-sample
  * members is the de-facto LLM data-loading format). Real format, no
  * external library: 512-byte headers, octal size fields, the
  * space-initialized checksum, two zero end blocks. Deterministic
  * metadata (mtime/uid/gid 0, mode 644) so identical members always
  * produce identical archive bytes. Cross-validated against the
  * system `tar` binary in WebDataSpec.
  */
object Tar {
  private val Block = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL terminated (the USTAR convention)
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes("US-ASCII")
  }

  private def header(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](Block)
    val nameB = name.getBytes("US-ASCII")
    require(nameB.length <= 100, s"tar member name too long: $name")
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    System.arraycopy(octal(420, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime 0
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces
    h(156) = '0' // typeflag: regular file
    System.arraycopy("ustar\u000000".getBytes("US-ASCII"), 0, h, 257, 8)
    var sum = 0L
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    val ck = java.lang.Long.toOctalString(sum)
    val ckPad = "0" * (6 - ck.length) + ck
    System.arraycopy((ckPad + "\u0000 ").getBytes("US-ASCII"), 0, h, 148, 8)
    h
  }

  /** Members (name, content) → one USTAR archive. */
  def archive(members: Iterator[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, content) =>
      out.write(header(name, content.length.toLong))
      out.write(content)
      val pad = (Block - content.length % Block) % Block
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * Block)) // end-of-archive marker
    out.toByteArray
  }

  /** USTAR archive → members (name, content); loud on corruption. */
  def extract(tar: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    def zeroBlock(o: Int): Boolean =
      (o until o + Block).forall(i => tar(i) == 0)
    while (off + Block <= tar.length && !zeroBlock(off)) {
      var nameEnd = off
      while (nameEnd < off + 100 && tar(nameEnd) != 0) nameEnd += 1
      val name = new String(tar, off, nameEnd - off, "US-ASCII")
      val sizeStr = new String(tar, off + 124, 12, "US-ASCII")
        .takeWhile(c => c != '\u0000' && c != ' ')
      val size = java.lang.Long.parseLong(sizeStr, 8)
      require(tar(off + 156) == '0',
        s"tar member $name: unsupported typeflag")
      // verify the recorded checksum — catches header corruption
      var sum = 0L
      var i = 0
      while (i < Block) {
        sum += (if (i >= 148 && i < 156) ' '.toByte else tar(off + i)) & 0xff
        i += 1
      }
      val ckStr = new String(tar, off + 148, 8, "US-ASCII")
        .takeWhile(c => c != '\u0000' && c != ' ')
      require(java.lang.Long.parseLong(ckStr, 8) == sum,
        s"tar member $name: header checksum mismatch")
      val content = java.util.Arrays.copyOfRange(
        tar, off + Block, off + Block + size.toInt)
      out += ((name, content))
      off += Block + ((size.toInt + Block - 1) / Block) * Block
    }
    require(off + 2 * Block <= tar.length && zeroBlock(off) &&
      zeroBlock(off + Block), "tar: missing end-of-archive marker")
    out.toSeq
  }
}
