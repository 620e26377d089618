package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** The BMP codec is REAL: golden header bytes, round-trips (incl. widths
  * needing row padding), the bottom-up row flip, and malformed-container
  * rejection. */
class BmpCodecSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, f: (Int, Int) => Int): BmpCodec.Gray =
    BmpCodec.Gray(w, h, Array.tabulate(h, w)((y, x) => f(y, x) & 0xff))

  test("encode writes the canonical 54-byte 24-bit header") {
    val b = BmpCodec.encode(img(16, 2, (y, x) => y * 16 + x))
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    assert(b(0) == 'B'.toByte && b(1) == 'M'.toByte)
    assert(bb.getInt(2) == b.length)      // file size
    assert(bb.getInt(10) == 54)           // pixel offset
    assert(bb.getInt(14) == 40)           // info header size
    assert(bb.getInt(18) == 16 && bb.getInt(22) == 2) // w, h
    assert(bb.getShort(28) == 24)         // bpp
    assert(bb.getInt(30) == 0)            // BI_RGB
    assert(b.length == 54 + 48 * 2)       // stride 48, no padding at w=16
  }

  test("decode round-trips encode, including padded widths") {
    val rng = new scala.util.Random(7)
    (0 until 30).foreach { _ =>
      val w = 1 + rng.nextInt(21) // odd widths force row padding
      val h = 1 + rng.nextInt(9)
      val src = img(w, h, (_, _) => rng.nextInt(256))
      val out = BmpCodec.decode(BmpCodec.encode(src))
      assert(out.width == w && out.height == h)
      assert(out.gray.map(_.toSeq).toSeq == src.gray.map(_.toSeq).toSeq)
    }
  }

  test("decode flips BMP's bottom-up row order back to top-down") {
    val b = BmpCodec.encode(img(2, 2, (y, x) => y * 2 + x)) // rows [0,1],[2,3]
    // stored bottom-up: the FIRST stored row must be image row 1 ([2,3])
    assert((b(54 + 2) & 0xff) == 2) // R of first stored pixel
    val out = BmpCodec.decode(b)
    assert(out.gray.map(_.toSeq).toSeq == Seq(Seq(0, 1), Seq(2, 3)))
  }

  test("malformed containers are rejected, not misread") {
    val good = BmpCodec.encode(img(4, 4, (y, x) => x))
    intercept[IllegalArgumentException](BmpCodec.decode(Array[Byte](1)))
    val notBm = good.clone(); notBm(0) = 'X'.toByte
    intercept[IllegalArgumentException](BmpCodec.decode(notBm))
    val compressed = good.clone()
    ByteBuffer.wrap(compressed).order(ByteOrder.LITTLE_ENDIAN).putInt(30, 1) // BI_RLE8
    intercept[IllegalArgumentException](BmpCodec.decode(compressed))
    val truncated = good.slice(0, good.length - 4)
    intercept[IllegalArgumentException](BmpCodec.decode(truncated))
  }
}
