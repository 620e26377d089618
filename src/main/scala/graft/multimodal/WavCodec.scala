package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL (non-stub) audio codec: canonical RIFF/WAVE PCM16 mono — the one
  * media container fully parseable on a bare JVM, which upgrades the
  * multimodal chain from "all codecs stubbed" to "audio decode is real".
  * Encode writes the canonical 44-byte header (RIFF size, fmt chunk 16,
  * audio format 1 = PCM, block align, byte rate) + little-endian samples;
  * decode validates the magics and WALKS THE CHUNK LIST to find fmt/data —
  * not a fixed-offset read — so payloads with extra chunks (LIST/INFO)
  * parse like any compliant reader would. WavCodecSpec round-trips and
  * pins the golden header bytes. */
object WavCodec {

  final case class Pcm(sampleRate: Int, samples: Array[Short])

  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                        // PCM
      .putShort(1)                        // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)             // byte rate = sr * block align
      .putShort(2)                        // block align (mono 16-bit)
      .putShort(16)                       // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a RIFF/WAVE PCM16 payload. Throws IllegalArgumentException on a
    * malformed container (wrong magic, missing chunk, non-PCM format) — the
    * caller routes those to the dead-letter side. */
  def decode(bytes: Array[Byte]): Pcm = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); bb.get(a); new String(a, "US-ASCII")
    }
    require(bytes.length >= 12, "truncated header")
    require(ascii(4) == "RIFF", "not RIFF")
    bb.getInt() // declared size (unchecked: streams routinely lie here)
    require(ascii(4) == "WAVE", "not WAVE")
    var sampleRate = -1
    var bits = -1
    var fmt = -1
    var data: Array[Byte] = null
    while (bb.remaining() >= 8 && (sampleRate < 0 || data == null)) {
      val id = ascii(4)
      val len = bb.getInt()
      require(len >= 0 && len <= bb.remaining(), s"bad chunk length $len for '$id'")
      id match {
        case "fmt " =>
          val p = bb.position()
          fmt = bb.getShort()
          bb.getShort() // channels
          sampleRate = bb.getInt()
          bb.getInt(); bb.getShort()
          bits = bb.getShort()
          bb.position(p + len + (len & 1)) // chunks are word-aligned
        case "data" =>
          data = new Array[Byte](len); bb.get(data)
        case _ =>
          bb.position(bb.position() + len + (len & 1)) // skip LIST/INFO/etc.
      }
    }
    require(fmt == 1, s"not PCM (fmt=$fmt)")
    require(bits == 16, s"not 16-bit (bits=$bits)")
    require(data != null, "no data chunk")
    val sb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Short](data.length / 2)
    var i = 0
    while (i < out.length) { out(i) = sb.getShort(); i += 1 }
    Pcm(sampleRate, out)
  }
}
