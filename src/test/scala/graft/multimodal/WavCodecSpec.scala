package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** The WAV codec is REAL (not a stub): golden header bytes, round-trips,
  * chunk-list walking past extra chunks, and malformed-container
  * rejection. */
class WavCodecSpec extends AnyFunSuite {

  test("encode writes the canonical 44-byte PCM16 mono header") {
    val b = WavCodec.encode(8000, Array[Short](0, 1000, -1000))
    assert(b.length == 44 + 6)
    assert(new String(b.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(b.slice(8, 12), "US-ASCII") == "WAVE")
    assert(new String(b.slice(12, 16), "US-ASCII") == "fmt ")
    assert(new String(b.slice(36, 40), "US-ASCII") == "data")
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(4) == 36 + 6)        // RIFF size
    assert(bb.getInt(16) == 16)           // fmt chunk length
    assert(bb.getShort(20) == 1)          // PCM
    assert(bb.getShort(22) == 1)          // mono
    assert(bb.getInt(24) == 8000)         // sample rate
    assert(bb.getInt(28) == 16000)        // byte rate
    assert(bb.getShort(32) == 2)          // block align
    assert(bb.getShort(34) == 16)         // bits
    assert(bb.getInt(40) == 6)            // data length
  }

  test("decode round-trips encode across seeded random sample buffers") {
    val rng = new scala.util.Random(42)
    (0 until 50).foreach { _ =>
      val sr = 4000 + rng.nextInt(44100)
      val samples = Array.fill(rng.nextInt(300))(rng.nextInt().toShort)
      val pcm = WavCodec.decode(WavCodec.encode(sr, samples))
      assert(pcm.sampleRate == sr)
      assert(pcm.samples.toSeq == samples.toSeq)
    }
  }

  test("decode walks past extra chunks (LIST before data)") {
    val base = WavCodec.encode(8000, Array[Short](7, -7))
    // splice a LIST chunk between fmt and data, fixing the RIFF size
    val list = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("INFO".getBytes("US-ASCII")).array()
    val out = ByteBuffer.allocate(base.length + 12).order(ByteOrder.LITTLE_ENDIAN)
      .put(base.slice(0, 36)).put(list).put(base.slice(36, base.length)).array()
    ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN).putInt(4, 36 + 12 + 4)
    val pcm = WavCodec.decode(out)
    assert(pcm.sampleRate == 8000 && pcm.samples.toSeq == Seq(7.toShort, -7.toShort))
  }

  test("malformed containers are rejected, not misread") {
    val good = WavCodec.encode(8000, Array[Short](1))
    intercept[IllegalArgumentException](WavCodec.decode(Array[Byte](1, 2, 3)))
    val notRiff = good.clone(); notRiff(0) = 'X'.toByte
    intercept[IllegalArgumentException](WavCodec.decode(notRiff))
    val notPcm = good.clone(); notPcm(20) = 3 // IEEE float format tag
    intercept[IllegalArgumentException](WavCodec.decode(notPcm))
    val truncated = good.slice(0, 40) // data chunk header cut off
    intercept[IllegalArgumentException](WavCodec.decode(truncated))
  }
}
