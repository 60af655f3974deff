package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the two formats that need no external library:
  * WAV (RIFF, PCM16 mono) and BMP (BITMAPINFOHEADER, 24-bit uncompressed).
  * These make the multimodal pipeline's decode stage REAL — byte-level
  * header parsing and sample/pixel math — while video (container formats
  * genuinely need codec libraries) stays a declared stub in Multimodal.
  * Everything here is per-row compute invoked inside mapPartitions, the
  * batched per-partition shape a heavier codec would use too.
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
}
