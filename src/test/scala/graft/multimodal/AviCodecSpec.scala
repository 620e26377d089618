package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** The AVI codec is REAL: golden container bytes, frame round-trips, the
  * per-frame bottom-up row flip, the unknown-chunk odd-size skip law, and
  * header/movi agreement enforcement. */
class AviCodecSpec extends AnyFunSuite {

  private def vid(w: Int, h: Int, nf: Int, f: (Int, Int, Int) => Int): AviCodec.Video =
    AviCodec.Video(w, h, 5, Array.tabulate(nf, h, w)((fr, y, x) => f(fr, y, x) & 0xff))

  test("encode writes the canonical RIFF/AVI/hdrl/movi/idx1 layout") {
    val nf = 3; val h = 4
    val b = AviCodec.encode(vid(16, h, nf, (fr, y, x) => fr * 40 + y * 16 + x))
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    assert(new String(b.slice(0, 4), "US-ASCII") == "RIFF")
    assert(bb.getInt(4) == b.length - 8)
    assert(new String(b.slice(8, 12), "US-ASCII") == "AVI ")
    assert(new String(b.slice(12, 16), "US-ASCII") == "LIST")
    assert(new String(b.slice(20, 24), "US-ASCII") == "hdrl")
    assert(new String(b.slice(24, 28), "US-ASCII") == "avih")
    assert(bb.getInt(32) == 200000)                 // µs per frame at 5 fps
    assert(bb.getInt(48) == nf)                     // totalFrames
    // deterministic size law used by the q315 oracle: 232 + nf·(24 + 48h)
    assert(b.length == 232 + nf * (24 + 48 * h))
    assert(new String(b.slice(b.length - 16 * nf - 8, b.length - 16 * nf - 4),
      "US-ASCII") == "idx1")
  }

  test("decode round-trips frames, dims, and fps") {
    val rng = new scala.util.Random(11)
    (0 until 20).foreach { _ =>
      val w = 1 + rng.nextInt(21)                   // odd widths force padding
      val h = 1 + rng.nextInt(6)
      val nf = 1 + rng.nextInt(5)
      val src = vid(w, h, nf, (_, _, _) => rng.nextInt(256))
      val out = AviCodec.decode(AviCodec.encode(src))
      assert(out.width == w && out.height == h && out.fps == 5)
      assert(out.frames.length == nf)
      assert(out.frames.map(_.map(_.toSeq).toSeq).toSeq ==
        src.frames.map(_.map(_.toSeq).toSeq).toSeq)
    }
  }

  test("decode flips each frame's bottom-up DIB rows back to top-down") {
    val b = AviCodec.encode(vid(2, 2, 1, (_, y, x) => y * 2 + x)) // rows [0,1],[2,3]
    // locate the single 00db chunk: its FIRST stored row must be the
    // image's BOTTOM row [2,3] — and decode must return [0,1],[2,3]
    val i = b.indexOfSlice("00db".getBytes("US-ASCII"))
    assert(i > 0)
    assert((b(i + 8 + 2) & 0xff) == 2)              // stored first = bottom row
    val out = AviCodec.decode(b)
    assert(out.frames(0).map(_.toSeq).toSeq == Seq(Seq(0, 1), Seq(2, 3)))
  }

  test("unknown chunks (odd-sized JUNK) are skipped by declared size + pad") {
    val src = vid(4, 2, 2, (fr, y, x) => fr + y + x)
    val clean = AviCodec.encode(src)
    // splice an odd-sized JUNK chunk between hdrl and movi (top level):
    // walker must step over content + 1 pad byte to stay aligned
    val hdrlEnd = 12 + 8 + 192
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](5, 0, 0, 0) ++
      Array[Byte](9, 9, 9, 9, 9) ++ Array[Byte](0)  // size 5 + 1 pad
    val spliced = clean.slice(0, hdrlEnd) ++ junk ++ clean.drop(hdrlEnd)
    val bb = ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)                // patch the RIFF size
    val out = AviCodec.decode(spliced)
    assert(out.frames.length == 2)
    assert(out.frames.map(_.map(_.toSeq).toSeq).toSeq ==
      src.frames.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("header/movi frame-count disagreement and bad magics are rejected") {
    val b = AviCodec.encode(vid(4, 2, 2, (_, _, _) => 1))
    val bb = ByteBuffer.wrap(b.clone()).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(48, 3)                                 // lie in avih totalFrames
    intercept[IllegalArgumentException](AviCodec.decode(bb.array()))
    val notRiff = b.clone(); notRiff(0) = 'X'.toByte
    intercept[IllegalArgumentException](AviCodec.decode(notRiff))
    val notAvi = b.clone(); notAvi(8) = 'W'.toByte
    intercept[IllegalArgumentException](AviCodec.decode(notAvi))
  }
}
