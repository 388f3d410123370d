package graft.ops

/**
 * Minimal PNG decoder hand-rolled against the public spec (RFC 2083 /
 * W3C PNG): signature check, chunk walk, zlib inflate, per-scanline
 * unfilter (all five filter types: None/Sub/Up/Average/Paeth), 8-bit
 * grayscale / RGB / gray+alpha / RGBA, non-interlaced. Anything outside
 * that subset (palette, 16-bit, interlaced, non-PNG) throws
 * [[PngDecode.UnsupportedPng]] so the caller can fall back to the
 * `javax.imageio` path ([[Multimodal.Codec.ImageDecoder]] wires that up).
 *
 * Why it exists: even with a reused `PNGImageReader` instance,
 * `javax.imageio` pays ~1 ms of per-image stream/metadata plumbing —
 * the floor of the multimodal bench at ~10^5 tiny frame decodes. This
 * decoder reuses one `Inflater` and one raw-scanline buffer per
 * partition handle and decodes a tiny frame in tens of microseconds.
 * Correctness is pinned CROSS-IMPLEMENTATION in PngDecodeSpec: decoded
 * pixels must equal `ImageIO.read` on both our own encoder's output and
 * ImageIO-written PNGs (whose adaptive row filters exercise Sub/Up/
 * Average/Paeth), plus hand-crafted single-filter images.
 *
 * Chunk CRCs are NOT verified (the payloads here are content-addressed
 * by sha256 upstream; a flipped bit surfaces as an inflate error or a
 * pixel mismatch, and the fallback path re-validates).
 */
object PngDecode {

  /** Decoded pixels, packed 0xRRGGBB (alpha dropped — matches the
   * 24-bit projection every consumer in [[Multimodal]] uses). */
  final case class RawImage(width: Int, height: Int, rgb: Array[Int])

  /** The payload is a PNG outside this decoder's subset, or not a PNG:
   * the caller should fall back to a general decoder. */
  final class UnsupportedPng(msg: String) extends RuntimeException(msg)

  private val Signature =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Gray-sample → packed sRGB lookup. `java.awt` treats an 8-bit gray
   * PNG as LINEAR gray (`CS_GRAY`) and `getRGB` runs the ICC transform
   * to sRGB — so raw sample 0x40 surfaces as 0x898989, not 0x404040.
   * The fallback path ([[Multimodal.Codec.ImageDecoder]]) goes through
   * exactly that conversion, and the two paths must agree pixel-for-
   * pixel; rather than reimplement the ICC math we sample the JDK's own
   * conversion once into a 256-entry LUT (bit-exact by construction). */
  private lazy val grayLut: Array[Int] = {
    val img = new java.awt.image.BufferedImage(
      256, 1, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var i = 0
    while (i < 256) { r.setSample(i, 0, 0, i); i += 1 }
    img.getRGB(0, 0, 256, 1, null, 0, 256).map(_ & 0xffffff)
  }

  /**
   * Reusable decoder — a per-partition codec handle (owns one `Inflater`
   * and a grow-only scanline buffer). NOT thread-safe: one per partition
   * iterator, never shared, exactly like [[Multimodal.Codec.PngReader]].
   */
  final class PngDecoder {
    private val inflater = new java.util.zip.Inflater()
    private var rawBuf: Array[Byte] = new Array[Byte](8 * 1024)

    private def unsupported(msg: String): Nothing = throw new UnsupportedPng(msg)

    private def be32(p: Array[Byte], off: Int): Int =
      ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
        ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)

    def decode(payload: Array[Byte]): RawImage = {
      if (payload.length < 45) unsupported("too short for a PNG") // sig+IHDR+IEND
      var i = 0
      while (i < 8) {
        if (payload(i) != Signature(i)) unsupported("bad PNG signature")
        i += 1
      }
      // --- chunk walk: IHDR, gather IDAT segments ----------------------
      var width = 0; var height = 0; var channels = 0; var colorType = -1
      var ihdrSeen = false
      // IDAT segment spans (PNG allows many; our writer emits one)
      var segOff = new Array[Int](4); var segLen = new Array[Int](4)
      var nSeg = 0
      var pos = 8
      var done = false
      while (!done) {
        if (pos + 8 > payload.length) unsupported("truncated chunk header")
        val len = be32(payload, pos)
        if (len < 0 || pos.toLong + 12 + len > payload.length)
          unsupported("truncated chunk body")
        val t0 = payload(pos + 4); val t1 = payload(pos + 5)
        val t2 = payload(pos + 6); val t3 = payload(pos + 7)
        val body = pos + 8
        if (t0 == 'I' && t1 == 'H' && t2 == 'D' && t3 == 'R') {
          if (len != 13) unsupported("bad IHDR length")
          width = be32(payload, body); height = be32(payload, body + 4)
          val bitDepth = payload(body + 8) & 0xff
          colorType = payload(body + 9) & 0xff
          val interlace = payload(body + 12) & 0xff
          if (bitDepth != 8) unsupported(s"bit depth $bitDepth")
          if (interlace != 0) unsupported("interlaced")
          channels = colorType match {
            case 0 => 1 // grayscale
            case 2 => 3 // truecolor RGB
            case 4 => 2 // gray + alpha
            case 6 => 4 // RGBA
            case ct => unsupported(s"color type $ct") // 3 = palette
          }
          if (width <= 0 || height <= 0) unsupported("bad dimensions")
          // guard: filtered-scanline buffer must stay in Int range
          if ((1L + width.toLong * channels) * height > Int.MaxValue)
            unsupported("image too large for in-memory decode")
          ihdrSeen = true
        } else if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T') {
          if (!ihdrSeen) unsupported("IDAT before IHDR")
          if (nSeg == segOff.length) {
            segOff = java.util.Arrays.copyOf(segOff, nSeg * 2)
            segLen = java.util.Arrays.copyOf(segLen, nSeg * 2)
          }
          segOff(nSeg) = body; segLen(nSeg) = len; nSeg += 1
        } else if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') {
          done = true
        }
        pos = body + len + 4 // skip crc
        if (pos >= payload.length) done = true
      }
      if (!ihdrSeen || nSeg == 0) unsupported("missing IHDR/IDAT")

      // --- inflate the filtered scanlines ------------------------------
      val stride = 1 + width * channels
      val rawLen = height * stride
      if (rawBuf.length < rawLen) rawBuf = new Array[Byte](
        java.lang.Math.max(rawLen, rawBuf.length * 2))
      val raw = rawBuf
      inflater.reset()
      var rawOff = 0; var seg = 0
      try {
        while (rawOff < rawLen) {
          if (inflater.needsInput) {
            if (seg >= nSeg) unsupported("truncated IDAT stream")
            inflater.setInput(payload, segOff(seg), segLen(seg)); seg += 1
          }
          val n = inflater.inflate(raw, rawOff, rawLen - rawOff)
          if (n == 0) {
            if (inflater.finished() && rawOff < rawLen)
              unsupported("IDAT ended early")
            // inflate() also returns 0 for needsDictionary (zlib FDICT —
            // forbidden by the PNG spec but representable) and any other
            // no-progress state; without this the loop would spin forever
            // on such a stream instead of falling back to ImageIO.
            if (!inflater.needsInput || inflater.needsDictionary)
              unsupported("zlib stream made no progress")
          }
          rawOff += n
        }
      } catch {
        case e: java.util.zip.DataFormatException =>
          unsupported(s"corrupt zlib stream: ${e.getMessage}")
      }

      // --- unfilter (spec section 6: byte arithmetic mod 256) ----------
      val bpp = channels
      var y = 0
      while (y < height) {
        val row = y * stride
        val f = raw(row) & 0xff
        val d = row + 1 // first data byte of this scanline
        val p = d - stride // same position, previous scanline
        val nBytes = stride - 1
        f match {
          case 0 => // None
          case 1 => // Sub
            var x = bpp
            while (x < nBytes) { raw(d + x) = (raw(d + x) + raw(d + x - bpp)).toByte; x += 1 }
          case 2 => // Up
            if (y > 0) {
              var x = 0
              while (x < nBytes) { raw(d + x) = (raw(d + x) + raw(p + x)).toByte; x += 1 }
            }
          case 3 => // Average
            var x = 0
            while (x < nBytes) {
              val left = if (x >= bpp) raw(d + x - bpp) & 0xff else 0
              val up = if (y > 0) raw(p + x) & 0xff else 0
              raw(d + x) = (raw(d + x) + ((left + up) >> 1)).toByte
              x += 1
            }
          case 4 => // Paeth
            var x = 0
            while (x < nBytes) {
              val a = if (x >= bpp) raw(d + x - bpp) & 0xff else 0
              val b = if (y > 0) raw(p + x) & 0xff else 0
              val c = if (y > 0 && x >= bpp) raw(p + x - bpp) & 0xff else 0
              val pp = a + b - c
              val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
              val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
              raw(d + x) = (raw(d + x) + pred).toByte
              x += 1
            }
          case other => unsupported(s"filter type $other")
        }
        y += 1
      }

      // --- pack to 0xRRGGBB -------------------------------------------
      val out = new Array[Int](width * height)
      y = 0
      colorType match {
        case 2 | 6 => // RGB / RGBA
          while (y < height) {
            var src = y * stride + 1; var dst = y * width; val end = dst + width
            while (dst < end) {
              out(dst) = ((raw(src) & 0xff) << 16) | ((raw(src + 1) & 0xff) << 8) |
                (raw(src + 2) & 0xff)
              src += channels; dst += 1
            }
            y += 1
          }
        case _ => // 0 / 4: grayscale (+alpha), via the JDK-sampled sRGB LUT
          val lut = grayLut
          while (y < height) {
            var src = y * stride + 1; var dst = y * width; val end = dst + width
            while (dst < end) {
              out(dst) = lut(raw(src) & 0xff)
              src += channels; dst += 1
            }
            y += 1
          }
      }
      RawImage(width, height, out)
    }

    def end(): Unit = inflater.end()
  }
}
