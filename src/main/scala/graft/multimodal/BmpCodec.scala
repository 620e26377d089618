package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL (non-stub) image codec: uncompressed 24-bit BMP (BITMAPINFOHEADER)
  * — the image container parseable on a bare JVM, making image decode real
  * the way [[WavCodec]] does for audio. Encode writes the 14-byte file
  * header + 40-byte info header + BOTTOM-UP rows (the BMP quirk a real
  * decoder must handle) with 4-byte row padding; decode validates the
  * magic/compression/bpp and returns pixels in TOP-DOWN image order.
  * BmpCodecSpec golden-tests the header, round-trips, and proves the
  * row-order flip. */
object BmpCodec {

  /** Grayscale image: `gray(y)(x)` ∈ 0..255, top-down rows. */
  final case class Gray(width: Int, height: Int, gray: Array[Array[Int]])

  def encode(img: Gray): Array[Byte] = {
    val stride = (img.width * 3 + 3) & ~3 // rows pad to 4-byte boundaries
    val dataLen = stride * img.height
    val bb = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54)               // reserved, pixel-data offset
      .putInt(40)                         // BITMAPINFOHEADER size
      .putInt(img.width).putInt(img.height) // positive height ⇒ bottom-up
      .putShort(1).putShort(24)           // planes, bits per pixel
      .putInt(0).putInt(dataLen)          // BI_RGB (uncompressed), image size
      .putInt(2835).putInt(2835)          // 72 DPI in px/metre
      .putInt(0).putInt(0)                // palette sizes (none)
    var y = img.height - 1                // bottom-up storage
    while (y >= 0) {
      var x = 0
      val row = img.gray(y)
      while (x < img.width) {
        val v = row(x).toByte
        bb.put(v).put(v).put(v)           // B, G, R
        x += 1
      }
      var pad = stride - img.width * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      y -= 1
    }
    bb.array()
  }

  /** Parse an uncompressed 24-bit BMP; returns top-down grayscale (the R
    * channel). Throws IllegalArgumentException on malformed containers. */
  def decode(bytes: Array[Byte]): Gray = {
    require(bytes.length >= 54, "truncated header")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not BM")
    bb.getInt(); bb.getInt()
    val offset = bb.getInt()
    require(bb.getInt() == 40, "not BITMAPINFOHEADER")
    val w = bb.getInt()
    val h = bb.getInt()
    require(w > 0 && h > 0, s"unsupported dims $w x $h")
    require(bb.getShort() == 1, "planes != 1")
    require(bb.getShort() == 24, "not 24-bit")
    require(bb.getInt() == 0, "compressed BMP unsupported")
    val stride = (w * 3 + 3) & ~3
    require(offset + stride.toLong * h <= bytes.length, "pixel data truncated")
    val out = Array.ofDim[Int](h, w)
    var y = 0
    while (y < h) {
      val rowStart = offset + stride * (h - 1 - y) // bottom-up ⇒ flip
      var x = 0
      while (x < w) {
        out(y)(x) = bytes(rowStart + x * 3 + 2) & 0xff // R channel
        x += 1
      }
      y += 1
    }
    Gray(w, h, out)
  }
}
