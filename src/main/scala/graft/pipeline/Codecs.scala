package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs — no external library: WAV (RIFF, PCM16 mono),
  * BMP (BITMAPINFOHEADER, 24-bit uncompressed), and animated GIF
  * (GIF87a/89a with a real LZW compressor/decompressor), which serves as the
  * video format: multi-frame, palette-indexed, genuinely compressed.
  * These make the multimodal pipeline's decode stage REAL — byte-level
  * header parsing, LZW bitstreams, and sample/pixel math. Everything here is
  * per-row compute invoked inside mapPartitions, the batched per-partition
  * shape a heavier codec would use too.
  */
object Codecs {

  // --- WAV (RIFF/PCM16 mono) -------------------------------------------------

  def wavEncodePcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  final case class WavInfo(sampleRate: Int, channels: Int, nSamples: Int,
                           durationSec: Double, rms: Double, zeroCrossRate: Double)

  /** Parse a PCM16 RIFF/WAVE payload: header fields + RMS amplitude
    * (normalized to [-1,1]) + zero-crossing rate over the samples.
    */
  def wavDecode(bytes: Array[Byte]): WavInfo = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 44 && bytes(0) == 'R' && bytes(8) == 'W', "not a RIFF/WAVE payload")
    buf.position(22)
    val channels = buf.getShort.toInt
    val sampleRate = buf.getInt
    buf.position(34)
    val bits = buf.getShort.toInt
    require(bits == 16, s"only PCM16 supported, got $bits-bit")
    // scan chunks from offset 36 for the data chunk (fmt may have extensions)
    var pos = 36
    var dataLen = -1
    while (dataLen < 0 && pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      buf.position(pos + 4)
      val len = buf.getInt
      if (id == "data") dataLen = len else pos += 8 + len
    }
    require(dataLen >= 0, "no data chunk")
    val n = dataLen / 2
    buf.position(pos + 8)
    var sumSq = 0.0; var crossings = 0L; var prevNonNeg = true; var i = 0
    while (i < n) {
      val s = buf.getShort / 32768.0
      sumSq += s * s
      val nonNeg = s >= 0
      if (i > 0 && nonNeg != prevNonNeg) crossings += 1
      prevNonNeg = nonNeg
      i += 1
    }
    val perCh = n / math.max(channels, 1)
    WavInfo(sampleRate, channels, perCh, perCh.toDouble / sampleRate,
      math.sqrt(sumSq / math.max(n, 1)),
      crossings.toDouble / math.max(n - 1, 1))
  }

  // --- BMP (24-bit uncompressed, bottom-up) ----------------------------------

  def bmpEncode24(w: Int, h: Int, pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4 // rows padded to 4 bytes
    val dataLen = rowBytes * h
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54)          // reserved, pixel-data offset
      .putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER
      .putShort(1).putShort(24)      // planes, bpp
      .putInt(0).putInt(dataLen)     // no compression
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // bottom-up storage
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixel(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte) // BGR order
        x += 1
      }
      var pad = rowBytes - w * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  final case class BmpInfo(width: Int, height: Int,
                           meanR: Double, meanG: Double, meanB: Double)

  /** Parse a 24-bit BMP: dimensions + per-channel mean pixel value. */
  def bmpDecode(bytes: Array[Byte]): BmpInfo = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(10); val offset = buf.getInt
    buf.position(18); val w = buf.getInt; val h = buf.getInt
    buf.position(28); val bpp = buf.getShort.toInt
    require(bpp == 24, s"only 24-bit BMP supported, got $bpp")
    val rowBytes = (w * 3 + 3) / 4 * 4
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    var y = 0
    while (y < h) {
      var x = 0
      val base = offset + y * rowBytes
      while (x < w) {
        sb += (bytes(base + x * 3) & 0xFF)
        sg += (bytes(base + x * 3 + 1) & 0xFF)
        sr += (bytes(base + x * 3 + 2) & 0xFF)
        x += 1
      }
      y += 1
    }
    val n = math.max(w.toLong * h, 1L).toDouble
    BmpInfo(w, h, sr / n, sg / n, sb / n)
  }

  // --- GIF (87a/89a: logical screen + color table + LZW-compressed frames) --

  /** One decoded frame: position, size, delay (centiseconds, from the 89a
    * graphic control extension; 0 when absent) and row-major 0xRRGGBB pixels.
    */
  final case class GifFrame(left: Int, top: Int, width: Int, height: Int,
                            delayCs: Int, rgb: Array[Int])
  final case class GifInfo(width: Int, height: Int, frames: Seq[GifFrame])

  /** Encode an animated GIF89a: global `palette` (RGB ints, length a power
    * of two, 4..256), one image block per frame of (palette indices
    * row-major, delay in centiseconds). The pixel stream is REAL LZW
    * (variable-width codes, dictionary growth, clear-on-full) packed
    * LSB-first into 255-byte sub-blocks.
    */
  def gifEncode(w: Int, h: Int, palette: Array[Int],
                frames: Seq[(Array[Byte], Int)]): Array[Byte] = {
    val sizeBits = {
      var b = 2; while ((1 << b) < palette.length) b += 1
      require((1 << b) == palette.length && b <= 8,
        s"palette length ${palette.length} not a power of two in 4..256")
      b
    }
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0x80 | (7 << 4) | (sizeBits - 1)) // global table, 8-bit res
    out.write(0); out.write(0)                  // bg index, aspect
    palette.foreach { c =>
      out.write((c >> 16) & 0xFF); out.write((c >> 8) & 0xFF); out.write(c & 0xFF)
    }
    frames.foreach { case (pixels, delayCs) =>
      require(pixels.length == w * h, s"frame has ${pixels.length} pixels, want ${w * h}")
      out.write(0x21); out.write(0xF9); out.write(4) // graphic control ext
      out.write(0); le16(delayCs); out.write(0); out.write(0)
      out.write(0x2C)                               // image descriptor
      le16(0); le16(0); le16(w); le16(h); out.write(0)
      val minCode = math.max(2, sizeBits)
      out.write(minCode)
      val data = lzwCompress(pixels, minCode)
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        out.write(n); out.write(data, off, n); off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** GIF-flavor LZW compression of a symbol stream (symbols < 2^minCode):
    * starts at minCode+1 code bits, grows to 12, emits CLEAR and resets when
    * the dictionary fills. Codes packed LSB-first.
    */
  private def lzwCompress(pixels: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode; val end = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var codeSize = minCode + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += codeSize
      while (bitCnt >= 8) { out.write((bitBuf & 0xFF).toInt); bitBuf >>= 8; bitCnt -= 8 }
    }
    // dictionary: (prefixCode << 8 | symbol) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = end + 1
    emit(clear)
    var cur = -1
    var i = 0
    while (i < pixels.length) {
      val k = pixels(i) & 0xFF
      if (cur < 0) cur = k
      else {
        val key = Integer.valueOf((cur << 8) | k)
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          emit(cur)
          dict.put(key, Integer.valueOf(next)); next += 1
          if (next - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
          else if (next == 4096) { // dictionary full: clear and restart
            emit(clear); dict = new java.util.HashMap[Integer, Integer]()
            next = end + 1; codeSize = minCode + 1
          }
          cur = k
        }
      }
      i += 1
    }
    if (cur >= 0) emit(cur)
    emit(end)
    if (bitCnt > 0) out.write((bitBuf & 0xFF).toInt)
    out.toByteArray
  }

  /** Decode a GIF87a/89a payload: all frames, honoring global/local color
    * tables and 89a graphic-control delays. Interlaced images are not
    * produced by gifEncode and are rejected explicitly.
    */
  def gifDecode(bytes: Array[Byte]): GifInfo = {
    require(bytes.length > 13 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F',
      "not a GIF payload")
    def u8(p: Int) = {
      if (p >= bytes.length)
        throw new IllegalArgumentException(s"truncated GIF: read past ${bytes.length}")
      bytes(p) & 0xFF
    }
    def le16(p: Int) = u8(p) | (u8(p + 1) << 8)
    val w = le16(6); val h = le16(8)
    val packed = u8(10)
    var pos = 13
    val global: Array[Int] =
      if ((packed & 0x80) != 0) {
        val n = 1 << ((packed & 7) + 1)
        val t = Array.tabulate(n)(i =>
          (u8(pos + i * 3) << 16) | (u8(pos + i * 3 + 1) << 8) | u8(pos + i * 3 + 2))
        pos += n * 3; t
      } else Array.empty[Int]
    val frames = Seq.newBuilder[GifFrame]
    var delayCs = 0
    var done = false
    while (!done && pos < bytes.length) {
      u8(pos) match {
        case 0x3B => done = true
        case 0x21 => // extension: remember GCE delay, skip sub-blocks
          val label = u8(pos + 1); pos += 2
          if (label == 0xF9 && u8(pos) >= 4) delayCs = le16(pos + 2)
          while (u8(pos) != 0) pos += 1 + u8(pos)
          pos += 1
        case 0x2C =>
          val (left, top) = (le16(pos + 1), le16(pos + 3))
          val (fw, fh) = (le16(pos + 5), le16(pos + 7))
          val fpacked = u8(pos + 9); pos += 10
          require((fpacked & 0x40) == 0, "interlaced GIF not supported")
          val table =
            if ((fpacked & 0x80) != 0) {
              val n = 1 << ((fpacked & 7) + 1)
              val t = Array.tabulate(n)(i =>
                (u8(pos + i * 3) << 16) | (u8(pos + i * 3 + 1) << 8) | u8(pos + i * 3 + 2))
              pos += n * 3; t
            } else global
          require(table.nonEmpty, "image block with no color table")
          val minCode = u8(pos); pos += 1
          val data = new java.io.ByteArrayOutputStream()
          while (u8(pos) != 0) {
            val n = u8(pos)
            if (pos + 1 + n > bytes.length)
              throw new IllegalArgumentException("truncated GIF: short sub-block")
            data.write(bytes, pos + 1, n); pos += 1 + n
          }
          pos += 1
          val idx = lzwDecompress(data.toByteArray, minCode, fw * fh)
          val rgb = new Array[Int](fw * fh)
          var i = 0
          while (i < rgb.length) { rgb(i) = table((idx(i) & 0xFF) % table.length); i += 1 }
          frames += GifFrame(left, top, fw, fh, delayCs, rgb)
          delayCs = 0
        case b => throw new IllegalArgumentException(f"unexpected GIF block 0x$b%02X at $pos")
      }
    }
    GifInfo(w, h, frames.result())
  }

  /** GIF-flavor LZW decompression (LSB-first variable-width codes, CLEAR
    * resets, deferred-clear tolerated) of exactly `nPixels` symbols. The
    * dictionary entry is added BEFORE expanding the just-read code, which
    * makes the KwKwK case (code == next) fall out naturally.
    */
  private def lzwDecompress(data: Array[Byte], minCode: Int, nPixels: Int): Array[Byte] = {
    val clear = 1 << minCode; val end = clear + 1
    val out = new Array[Byte](nPixels)
    var outPos = 0
    // dictionary as (prefix, suffix) pairs; entries < clear are literals
    val prefix = new Array[Int](4096); val suffix = new Array[Byte](4096)
    var next = end + 1; var codeSize = minCode + 1
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    var prev = -1
    val stack = new Array[Byte](4096)
    def firstByte(c0: Int): Byte = {
      var c = c0; while (c >= clear) c = prefix(c); c.toByte
    }
    def emitString(c0: Int): Unit = {
      var sp = 0; var c = c0
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      stack(sp) = c.toByte; sp += 1
      var i = sp - 1
      while (i >= 0 && outPos < nPixels) { out(outPos) = stack(i); outPos += 1; i -= 1 }
    }
    while (outPos < nPixels) {
      while (bitCnt < codeSize && pos < data.length) {
        bitBuf |= (data(pos) & 0xFFL) << bitCnt; bitCnt += 8; pos += 1
      }
      if (bitCnt < codeSize) return out // truncated stream: best-effort
      val code = (bitBuf & ((1L << codeSize) - 1)).toInt
      bitBuf >>= codeSize; bitCnt -= codeSize
      if (code == clear) { next = end + 1; codeSize = minCode + 1; prev = -1 }
      else if (code == end) return out
      else if (prev < 0) { // first code after a clear: a literal
        require(code < clear, s"bad initial LZW code $code")
        out(outPos) = code.toByte; outPos += 1
        prev = code
      } else {
        require(code < next || (code == next && next < 4096), s"bad LZW code $code")
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = firstByte(if (code == next) prev else code)
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        emitString(code)
        prev = code
      }
    }
    out
  }
}
