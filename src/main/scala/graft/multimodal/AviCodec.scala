package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL (non-stub) video codec: uncompressed 24-bit DIB frames in a RIFF
  * AVI container — the video container parseable on a bare JVM from the
  * public AVI/RIFF spec, completing the real-codec trio next to
  * [[WavCodec]] (RIFF/PCM16) and [[BmpCodec]] (BITMAPINFOHEADER). No
  * inter-frame compression is involved (that would need an H.264 library
  * this environment doesn't have), but the CONTAINER is the real thing: a
  * decoder must validate RIFF/AVI magics, walk the hdrl header list
  * (avih + strl/strh/strf), walk the movi list collecting '00db' frame
  * chunks, skip unknown chunks by declared size with RIFF's odd-size pad
  * rule, and undo the DIB bottom-up row order per frame.
  *
  * Layout written (all sizes deterministic for w=16):
  *   RIFF('AVI ') { LIST(hdrl){ avih(56), LIST(strl){ strh(56), strf(40) } },
  *                  LIST(movi){ '00db' frame ... }, idx1 }
  *   file bytes = 232 + nf·(24 + stride·h),  stride = (3w+3) & ~3.
  *
  * AviCodecSpec golden-tests the header bytes, round-trips frames, proves
  * the per-frame row flip, and pins the unknown-chunk skip law (a JUNK
  * chunk with odd size must be stepped over via size+pad). */
object AviCodec {

  /** Grayscale video: frames(f)(y)(x) ∈ 0..255, top-down rows per frame. */
  final case class Video(width: Int, height: Int, fps: Int,
      frames: Array[Array[Array[Int]]])

  private def stride(w: Int): Int = (w * 3 + 3) & ~3

  def encode(v: Video): Array[Byte] = {
    val w = v.width; val h = v.height; val nf = v.frames.length
    val st = stride(w)
    val frameLen = st * h
    val hdrlContent = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40))) // 192
    val moviContent = 4 + nf * (8 + frameLen)
    val idxLen = 16 * nf
    val riffContent = 4 + (8 + hdrlContent) + (8 + moviContent) + (8 + idxLen)
    val bb = ByteBuffer.allocate(8 + riffContent).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = s.foreach(c => bb.put(c.toByte))
    fourcc("RIFF"); bb.putInt(riffContent); fourcc("AVI ")
    // ---- LIST hdrl ----
    fourcc("LIST"); bb.putInt(hdrlContent); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(1000000 / v.fps)            // microseconds per frame
      .putInt(0).putInt(0)                // maxBytesPerSec, padding
      .putInt(0x10)                       // AVIF_HASINDEX
      .putInt(nf).putInt(0).putInt(1)     // totalFrames, initialFrames, streams
      .putInt(frameLen)                   // suggestedBufferSize
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    fourcc("LIST"); bb.putInt(4 + 64 + 48); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    bb.putInt(0).putInt(0)                // flags, priority+language
      .putInt(0)                          // initialFrames
      .putInt(1).putInt(v.fps)            // scale, rate → fps frames/sec
      .putInt(0).putInt(nf)               // start, length (frames)
      .putInt(frameLen).putInt(0).putInt(0) // bufferSize, quality, sampleSize
      .putShort(0).putShort(0)            // rcFrame left, top
      .putShort(w.toShort).putShort(h.toShort)
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(w).putInt(h)     // BITMAPINFOHEADER for the frames
      .putShort(1).putShort(24)
      .putInt(0).putInt(frameLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    // ---- LIST movi ----
    fourcc("LIST"); bb.putInt(moviContent); fourcc("movi")
    v.frames.foreach { frame =>
      fourcc("00db"); bb.putInt(frameLen)
      var y = h - 1                       // DIB bottom-up storage
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val p = frame(y)(x).toByte
          bb.put(p).put(p).put(p)         // B, G, R
          x += 1
        }
        var pad = st - w * 3
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        y -= 1
      }
    }
    // ---- idx1 ----
    fourcc("idx1"); bb.putInt(idxLen)
    var f = 0
    while (f < nf) {
      fourcc("00db"); bb.putInt(0x10)     // AVIIF_KEYFRAME
      bb.putInt(4 + f * (8 + frameLen)).putInt(frameLen)
      f += 1
    }
    bb.array()
  }

  /** Parse an uncompressed-DIB AVI; returns top-down grayscale frames (the
    * R channel). Unknown chunks anywhere are skipped by declared size with
    * the RIFF odd-size pad. Throws IllegalArgumentException when magics,
    * header geometry, or the header/movi frame-count agreement fail. */
  def decode(bytes: Array[Byte]): Video = {
    require(bytes.length >= 12, "truncated RIFF header")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not RIFF")
    val riffLen = bb.getInt()
    require(8 + riffLen <= bytes.length, "RIFF size past buffer")
    require(fourcc() == "AVI ", "not AVI")
    var headerFrames = -1; var w = -1; var h = -1; var usPerFrame = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Array[Int]]]
    def walkMovi(end: Int): Unit = while (bb.position() < end) {
      val id = fourcc(); val sz = bb.getInt()
      if (id == "00db" || id == "00dc") {
        require(w > 0 && h > 0, "frame chunk before header")
        val st = stride(w)
        require(sz == st * h, s"frame size $sz != ${st * h}")
        val base = bb.position()
        val frame = Array.ofDim[Int](h, w)
        var y = 0
        while (y < h) {
          val rowStart = base + st * (h - 1 - y) // bottom-up ⇒ flip
          var x = 0
          while (x < w) { frame(y)(x) = bytes(rowStart + x * 3 + 2) & 0xff; x += 1 }
          y += 1
        }
        frames += frame
      }
      bb.position(bb.position() + sz + (sz & 1)) // skip content + odd pad
    }
    def walkHdrl(end: Int): Unit = while (bb.position() < end) {
      val id = fourcc(); val sz = bb.getInt()
      val next = bb.position() + sz + (sz & 1)
      if (id == "avih") {
        require(sz >= 56, "short avih")
        usPerFrame = bb.getInt(); bb.getInt(); bb.getInt(); bb.getInt()
        headerFrames = bb.getInt()
      } else if (id == "LIST" && sz >= 4 && fourcc() == "strl") {
        // nested walk for strh/strf — validates the stream really is
        // uncompressed 24-bit video
        while (bb.position() < next) {
          val sid = fourcc(); val ssz = bb.getInt()
          val snext = bb.position() + ssz + (ssz & 1)
          if (sid == "strh") {
            require(fourcc() == "vids", "first stream not video")
            fourcc() // handler ('DIB ' when written by us; not enforced)
          } else if (sid == "strf") {
            require(bb.getInt() == 40, "not BITMAPINFOHEADER")
            w = bb.getInt(); h = bb.getInt()
            require(bb.getShort() == 1, "planes != 1")
            require(bb.getShort() == 24, "not 24-bit")
            require(bb.getInt() == 0, "compressed frames unsupported")
          }
          bb.position(snext)
        }
      }
      bb.position(next)
    }
    while (bb.position() < 8 + riffLen && bb.remaining() >= 8) {
      val id = fourcc(); val sz = bb.getInt()
      val next = bb.position() + sz + (sz & 1)
      if (id == "LIST" && sz >= 4) {
        val kind = fourcc()
        if (kind == "hdrl") walkHdrl(next)
        else if (kind == "movi") walkMovi(next)
      }
      bb.position(next)                  // idx1/JUNK/unknown: skip by size
    }
    require(w > 0 && h > 0, "no stream format found")
    require(headerFrames == frames.length,
      s"header declares $headerFrames frames, movi carries ${frames.length}")
    val fps = if (usPerFrame > 0) 1000000 / usPerFrame else 0
    Video(w, h, fps, frames.toArray)
  }
}
