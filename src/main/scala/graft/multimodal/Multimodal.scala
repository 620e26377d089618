package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for a training-data pipeline (north-star
  * requirement): image/audio/video payloads are opaque `binary` columns with
  * typed metadata; decode / feature-extract / resize / frame-sample run as
  * `mapPartitions` over typed rows — the Scala analogue of PySpark's
  * `mapInPandas` batch iteration (one partition = one batch, codecs opened
  * once per partition, never per row).
  *
  * ---- STUB BOUNDARY -------------------------------------------------------
  * Real codecs (JPEG/PNG decode, PCM resample, H.264 frame extraction) need
  * native libraries that are NOT present in this container. `FakeCodec`
  * below is a clearly-marked deterministic stand-in: it derives plausible
  * metadata and features purely from the payload bytes, so the Spark-side
  * contract — schema, partitioning, batch shape, null handling — is real and
  * tested, and swapping in a true codec changes only the function bodies.
  * --------------------------------------------------------------------------
  */
object Multimodal {

  final case class Media(media_id: Long, kind: String, content: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int,          // image kinds (0 otherwise)
      sample_rate: Int, n_samples: Long, // audio kinds (0 otherwise)
      n_frames: Int,                    // video kinds (0 otherwise)
      content_hash: Long,
      histogram: Seq[Double])           // 16-bin byte histogram, normalized

  /** STUB decode: deterministic pseudo-metadata from the payload header.
    * A real implementation parses the container format here. */
  object FakeCodec {
    def imageDims(b: Array[Byte]): (Int, Int) =
      (1 + (if (b.length > 0) b(0) & 0xff else 0),
        1 + (if (b.length > 1) b(1) & 0xff else 0))
    def audio(b: Array[Byte]): (Int, Long) = (16000, b.length.toLong * 2)
    /** frame-sample: one frame per 256-byte chunk, max 32. */
    def videoFrames(b: Array[Byte]): Int = math.min(32, 1 + b.length / 256)
    /** 60-bit md5 prefix of the payload — the same portable construction as
      * [[graft.functions.PortableHash.md5Long]], so the content hash is
      * DuckDB-expressible (a wrapping polynomial hash would overflow-error
      * there) and q39 can be value-checked by the oracle. */
    def hash(b: Array[Byte]): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(b)
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    def histogram(b: Array[Byte]): Seq[Double] = {
      val bins = new Array[Double](16)
      var i = 0
      while (i < b.length) { bins((b(i) & 0xff) >> 4) += 1; i += 1 }
      if (b.length > 0) bins.map(_ / b.length).toSeq else bins.toSeq
    }
  }

  /** Synthesize a media table from the documents fixture (no binary fixture
    * table exists): payload = UTF-8 text bytes, kind round-robins. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("content"))
      .as[Media]
  }

  /** decode + feature-extract, batch-shaped per partition. */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition codec setup happens HERE (once per batch, not per row)
      batch.map { m =>
        val b = m.content
        val (w, h) = if (m.kind == "image") FakeCodec.imageDims(b) else (0, 0)
        val (sr, ns) = if (m.kind == "audio") FakeCodec.audio(b) else (0, 0L)
        val nf = if (m.kind == "video") FakeCodec.videoFrames(b) else 0
        MediaFeatures(m.media_id, m.kind, b.length.toLong, w, h, sr, ns, nf,
          FakeCodec.hash(b), FakeCodec.histogram(b))
      }
    }
  }

  /** resize: metadata-level transform (halved dims), payload untouched —
    * shape of the op is what matters; a real impl re-encodes pixels. */
  def resizeHalf(features: Dataset[MediaFeatures]): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map(f =>
      if (f.kind == "image") f.copy(width = math.max(1, f.width / 2),
        height = math.max(1, f.height / 2))
      else f)
  }

  /** REAL-codec chain (q69): synthesize a RIFF/PCM16 WAV payload per doc
    * (sample i = (char_i - 96) · 256 at 8 kHz — deterministic and
    * SQL-modelable since the corpus is ASCII), then DECODE IT BACK with
    * [[WavCodec]] — an actual container parse, not the stub — and extract
    * audio features (peak, RMS). The squared-sample sums are integer-valued
    * doubles < 2^53, so RMS is exact and order-free in both engines. */
  def wavFeaturesQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val samples = text.map(ch => ((ch.toInt - 96) * 256).toShort).toArray
          (id, WavCodec.encode(8000, samples))
        }
      }
    media.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val pcm = WavCodec.decode(bytes) // real parse: magics, chunk walk
        var peak = 0L
        var ss = 0.0
        pcm.samples.foreach { s =>
          val a = math.abs(s.toLong); if (a > peak) peak = a
          ss += s.toDouble * s.toDouble
        }
        (id, bytes.length.toLong, pcm.sampleRate, pcm.samples.length.toLong,
          peak, math.sqrt(ss / pcm.samples.length))
      }
    }.toDF("media_id", "n_bytes", "sample_rate", "n_samples", "peak", "rms_raw")
      .select(col("media_id"), col("n_bytes"), col("sample_rate"),
        col("n_samples"), col("peak"), round(col("rms_raw"), 4).as("rms"))
      .orderBy("media_id")
  }

  /** REAL-codec image chain (q70): render each doc as a 16-wide grayscale
    * BMP (pixel = char code, rows of 16, zero-padded tail), DECODE IT BACK
    * with [[BmpCodec]] (real header parse + bottom-up row flip) and
    * extract image features. px0 — the TOP-LEFT pixel — only comes out
    * equal to the doc's first char if the decoder flips the bottom-up row
    * order correctly, so the oracle checks the parse, not just the
    * arithmetic. Mean sums are integer-valued doubles — exact. */
  def bmpFeaturesQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w = 16
          val h = (text.length + w - 1) / w
          val px = Array.tabulate(h, w) { (y, x) =>
            val i = y * w + x
            if (i < text.length) text.charAt(i).toInt & 0xff else 0
          }
          (id, BmpCodec.encode(BmpCodec.Gray(w, h, px)))
        }
      }
    media.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val img = BmpCodec.decode(bytes) // real parse: magic, bpp, row flip
        var sum = 0L
        img.gray.foreach(row => row.foreach(sum += _))
        (id, bytes.length.toLong, img.width, img.height,
          img.gray(0)(0).toLong, sum.toDouble / (img.width * img.height))
      }
    }.toDF("media_id", "n_bytes", "width", "height", "px0", "mean_raw")
      .select(col("media_id"), col("n_bytes"), col("width"), col("height"),
        col("px0"), round(col("mean_raw"), 4).as("mean_gray"))
      .orderBy("media_id")
  }

  /** Perceptual average-hash (aHash) over the REAL BMP codec: synthesize a
    * 16×h grayscale BMP per doc (q70's construction), decode it back through
    * the container parse, partition the pixel grid into 8×8 floor-banded
    * blocks, and set bit (r·8+c) iff the block's pixel sum strictly exceeds
    * the image mean — compared by integer CROSS-MULTIPLICATION
    * (sum_block·N > total·cnt_block), so the hash is exact in both engines
    * with no float division anywhere. The 64-bit hash ships as two 32-bit
    * halves because DuckDB's left shift is overflow-checked at bit 63.
    * Row-local end to end: at any scale this is a map stage whose output
    * (8 bytes/image) feeds hash-equality or Hamming-ball image dedup —
    * the visual sibling of q34d's SimHash. */
  def bmpAHashQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w = 16
          val h = (text.length + w - 1) / w
          val px = Array.tabulate(h, w) { (y, x) =>
            val i = y * w + x
            if (i < text.length) text.charAt(i).toInt & 0xff else 0
          }
          val img = BmpCodec.decode(BmpCodec.encode(BmpCodec.Gray(w, h, px)))
          val n = img.width.toLong * img.height
          val sums = Array.ofDim[Long](8, 8)
          val cnts = Array.ofDim[Long](8, 8)
          var total = 0L
          for (y <- 0 until img.height; x <- 0 until img.width) {
            val r = y * 8 / img.height
            val c = x * 8 / img.width
            sums(r)(c) += img.gray(y)(x)
            cnts(r)(c) += 1
            total += img.gray(y)(x)
          }
          var hi = 0L; var lo = 0L
          for (r <- 0 until 8; c <- 0 until 8) {
            if (sums(r)(c) * n > total * cnts(r)(c)) {
              val idx = r * 8 + c
              if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
            }
          }
          (id, img.height.toLong, hi, lo)
        }
      }
      .toDF("media_id", "height", "ahash_hi", "ahash_lo")
      .orderBy("media_id")
  }

  /** REAL pixel resize through the BMP codec (the resize verb on actual
    * pixels — [[resizeHalf]] above is the metadata-shape stub): synthesize
    * the 16×h grayscale BMP (q70's construction), decode through the real
    * container parse, 2×2 BOX-DOWNSAMPLE in exact integer arithmetic
    * (floor of block sum over block pixel count — bottom row blocks hold 2
    * pixels when h is odd), then RE-ENCODE the 8×⌈h/2⌉ result and decode
    * it AGAIN. The doubled round-trip makes the emitted stats prove the
    * codec handles the resized geometry (odd heights, new row padding),
    * not just the original; everything is integer-exact so the oracle can
    * re-derive the downsample from the synthesis arithmetic alone.
    * Row-local map stage at any scale. */
  def bmpResizeQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      // an empty text has no pixels: the codec (rightly) rejects 16×0
      // images, and the oracle's generate_series just omits the row — so
      // gate identically on BOTH sides (the q131 short-doc lesson)
      .filter(length(col("text")) >= 1)
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w = 16
          val h = (text.length + w - 1) / w
          val px = Array.tabulate(h, w) { (y, x) =>
            val i = y * w + x
            if (i < text.length) text.charAt(i).toInt & 0xff else 0
          }
          val img = BmpCodec.decode(BmpCodec.encode(BmpCodec.Gray(w, h, px)))
          val rh = (img.height + 1) / 2
          val small = Array.tabulate(rh, 8) { (yy, xx) =>
            var s = 0L; var c = 0L
            for (dy <- 0 to 1; dx <- 0 to 1) {
              val y = yy * 2 + dy; val x = xx * 2 + dx
              if (y < img.height) { s += img.gray(y)(x); c += 1 }
            }
            (s / c).toInt
          }
          val out = BmpCodec.decode(BmpCodec.encode(BmpCodec.Gray(8, rh, small)))
          var rsum = 0L
          out.gray.foreach(row => row.foreach(rsum += _))
          (id, out.width.toLong, out.height.toLong, out.gray(0)(0).toLong, rsum)
        }
      }
      .toDF("media_id", "rw", "rh", "rpx0", "rsum")
      .orderBy("media_id")
  }

  /** INTEGRAL IMAGE (summed-area table) as a DISTRIBUTED computation: the
    * other image ops here are row-local mapPartitions; this one explodes
    * the decoded pixels into (media_id, y, x, g) ROWS and builds
    * ii(y,x) = Σ_{y'≤y, x'≤x} g as two cascaded prefix-sum windows —
    * first along x within (image, row), then along y within (image,
    * column). Both windows are partitioned (never global), so the same
    * plan sums a 10⁹-pixel mosaic tile grid across executors — the
    * summed-area table is the O(1)-box-filter primitive under face
    * detectors and mean-pooling layers. The emitted box/center sums are
    * read back from the table via the 4-corner identity
    * box = ii(y2,x2) − ii(y1−1,x2) − ii(y2,x1−1) + ii(y1−1,x1−1),
    * while the oracle sums the rectangles DIRECTLY from the synthesis
    * codes — the hash match proves the integral identity end to end. */
  def integralImageQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pixels = Tables(spark, dir, "documents")
      .filter(length(col("text")) >= 1) // 16×0 rejected by the codec
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val w = 16
          val h = (text.length + w - 1) / w
          val px = Array.tabulate(h, w) { (y, x) =>
            val i = y * w + x
            if (i < text.length) text.charAt(i).toInt & 0xff else 0
          }
          val img = BmpCodec.decode(BmpCodec.encode(BmpCodec.Gray(w, h, px)))
          for (y <- 0 until img.height; x <- 0 until img.width)
            yield (id, y.toLong, x.toLong, img.gray(y)(x).toLong)
        }
      }
      .toDF("media_id", "y", "x", "g")
    val wRow = Window.partitionBy(col("media_id"), col("y")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCol = Window.partitionBy(col("media_id"), col("x")).orderBy(col("y"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ii = pixels
      .withColumn("rowcum", sum(col("g")).over(wRow))
      .withColumn("ii", sum(col("rowcum")).over(wCol))
      .select(col("media_id"), col("y"), col("x"), col("ii"))
      .cache() // five corner lookups below
    val meta = pixels.groupBy("media_id")
      .agg((max(col("y")) + 1).as("h"), sum(col("g")).as("total"))
      .withColumn("y2", least(col("h") - 1, lit(10L)))
      .withColumn("y1", greatest(col("y2") - 4, lit(0L)))
      .withColumn("yc", least(col("h") - 1, lit(8L)))
    def corner(tag: String, yk: org.apache.spark.sql.Column,
               xk: org.apache.spark.sql.Column)(m: DataFrame): DataFrame = {
      // fully re-aliased lookup side: ii and meta share pixel lineage, so
      // an un-aliased media_id would resolve to the SAME attribute
      val c = ii.select(col("media_id").as(s"_m$tag"), col("y").as(s"_y$tag"),
        col("x").as(s"_x$tag"), col("ii").as(s"ii_$tag"))
      m.join(c, col("media_id") === col(s"_m$tag") &&
          yk === col(s"_y$tag") && xk === col(s"_x$tag"), "left")
        .drop(s"_m$tag", s"_y$tag", s"_x$tag")
        .withColumn(s"ii_$tag", coalesce(col(s"ii_$tag"), lit(0L)))
    }
    val withCorners = Seq[(String, DataFrame => DataFrame)](
      ("a", corner("a", col("y2"), lit(10L))),        // ii(y2, x2)
      ("b", corner("b", col("y1") - 1, lit(10L))),    // ii(y1-1, x2)
      ("c", corner("c", col("y2"), lit(5L))),         // ii(y2, x1-1)
      ("d", corner("d", col("y1") - 1, lit(5L))),     // ii(y1-1, x1-1)
      ("e", corner("e", col("yc"), lit(8L)))          // center prefix sum
    ).foldLeft(meta) { case (m, (_, f)) => f(m) }
    withCorners.select(col("media_id"),
        col("h").cast("long").as("height"),
        col("total").cast("long").as("total"),
        col("ii_e").as("center_ii"),
        (col("ii_a") - col("ii_b") - col("ii_c") + col("ii_d")).as("box5"))
      .orderBy("media_id")
  }

  /** Frame sampling (the north-star's fourth multimodal verb): every 4th
    * frame of each video payload, emitted as (frame_idx, byte count, 60-bit
    * content hash) rows. The STUB "decode" slices fixed 256-byte chunks
    * (FakeCodec.videoFrames' geometry — a real implementation extracts
    * keyframes here); the Spark-side plumbing — typed flatMap fan-out, one
    * row per sampled frame, per-partition batch shape — is real, and the
    * hash arithmetic is portable, so the whole op is oracle-checked. */
  def frameSampleQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, dir)
      .filter(_.kind == "video")
      .mapPartitions { batch =>
        batch.flatMap { m =>
          val nf = FakeCodec.videoFrames(m.content)
          (0 until nf by 4).iterator.map { f =>
            val lo = f * 256
            val hi = math.min(m.content.length, lo + 256)
            // STUB BOUNDARY: a real codec decodes the keyframe here
            val frame = java.util.Arrays.copyOfRange(m.content, lo, hi)
            (m.media_id, f.toLong, (hi - lo).toLong, FakeCodec.hash(frame))
          }
        }
      }
      .toDF("media_id", "frame_idx", "frame_bytes", "frame_hash")
      .orderBy("media_id", "frame_idx")
  }

  /** REAL-codec video chain (q315): synthesize a 16×4 grayscale video per
    * doc — frame f's pixels are chars [64f, 64f+64) of the text, zero-
    * padded, up to 4 frames — encode it as an uncompressed-DIB RIFF AVI
    * ([[AviCodec]]) and DECODE IT BACK through the actual container walk
    * (magics, hdrl/strl headers, movi chunk list, per-frame bottom-up row
    * flip). This retires the video-codec stub for the decode path: the
    * container is real; only inter-frame COMPRESSION stays out of scope
    * (no H.264 lib offline — [[FakeCodec]] remains solely behind the
    * legacy q39/q47/q153 oracles). Features are integer-exact, including
    * the one only video has: MOTION = Σ|frame_f − frame_{f−1}| over
    * aligned pixels. px0/px_last pin the frame order and the row flip;
    * n_bytes pins the container size law 232 + 216·nf. Row-local map. */
  def videoFeaturesQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val n = text.length
          val nf = math.min(4, math.max(1, (n + 63) / 64))
          val src = Array.tabulate(nf, 4, 16) { (f, y, x) =>
            val i = f * 64 + y * 16 + x
            if (i < n) text.charAt(i).toInt & 0xff else 0
          }
          val bytes = AviCodec.encode(AviCodec.Video(16, 4, 5, src))
          val dec = AviCodec.decode(bytes) // real parse: magics, chunk walk
          var sum = 0L; var motion = 0L
          var f = 0
          while (f < dec.frames.length) {
            var y = 0
            while (y < 4) {
              var x = 0
              while (x < 16) {
                val p = dec.frames(f)(y)(x)
                sum += p
                if (f > 0) motion += math.abs(p - dec.frames(f - 1)(y)(x))
                x += 1
              }
              y += 1
            }
            f += 1
          }
          (id, bytes.length.toLong, dec.frames.length.toLong, dec.fps.toLong,
            dec.frames(0)(0)(0).toLong, dec.frames(nf - 1)(3)(15).toLong,
            sum, motion)
        }
      }
      .toDF("media_id", "n_bytes", "n_frames", "fps", "px0", "px_last",
        "sum_gray", "motion")
      .orderBy("media_id")
  }

  /** Frame-level audio analysis through the REAL WAV codec (q69's synth +
    * container parse): whole-clip zero-crossing count plus the peak
    * 80-sample-frame energy — the speech/music front-end primitives (ZCR,
    * short-time energy), kept in EXACT integer arithmetic (energies are
    * BIGINT sums of 16-bit squares; no float anywhere). Row-local map
    * stage at any scale; partial frames are dropped (n div 80 frames). */
  def audioFramesQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val samples = text.map(ch => ((ch.toInt - 96) * 256).toShort).toArray
          val pcm = WavCodec.decode(WavCodec.encode(8000, samples)) // real parse
          val s = pcm.samples
          var zc = 0L
          var i = 1
          while (i < s.length) {
            if ((s(i) < 0) != (s(i - 1) < 0)) zc += 1
            i += 1
          }
          val nf = s.length / 80
          var maxE = 0L
          var f = 0
          while (f < nf) {
            var e = 0L
            var j = f * 80
            while (j < (f + 1) * 80) { e += s(j).toLong * s(j); j += 1 }
            if (e > maxE) maxE = e
            f += 1
          }
          (id, s.length.toLong, zc, nf.toLong, maxE)
        }
      }
      .toDF("media_id", "n_samples", "zc", "n_frames", "max_frame_energy")
      .orderBy("media_id")
  }

  /** 2× PCM decimation through the REAL WAV codec (q361) — the audio
    * resize verb, completing the per-modality transform pairs (image:
    * q163 box-resize / q303 flip+crop; audio: this): synthesize the q69
    * RIFF/PCM16 payload, decode through the real container parse, then
    * box-decimate 2× — each output sample is the TOWARD-ZERO integer mean
    * of its 2-sample block (Scala `/` ≡ DuckDB `//`, the q197-verified
    * truncating-division parity; an odd tail sample passes through
    * unaveraged) — and RE-ENCODE the half-rate result at 4 kHz and decode
    * it AGAIN (q163's doubled-round-trip discipline: the emitted stats
    * prove the codec handles the NEW sample count, including odd lengths
    * and the empty clip). Row-local map stage at any corpus scale. */
  def audioDecimateQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val samples = text.map(ch => ((ch.toInt - 96) * 256).toShort).toArray
          val s = WavCodec.decode(WavCodec.encode(8000, samples)).samples
          val outN = (s.length + 1) / 2
          val out = Array.tabulate(outN) { f =>
            val a = s(2 * f).toInt
            if (2 * f + 1 < s.length) ((a + s(2 * f + 1).toInt) / 2).toShort
            else a.toShort
          }
          val rt = WavCodec.decode(WavCodec.encode(4000, out)) // 2nd real round-trip
          var peak = 0L; var sum = 0L
          rt.samples.foreach { x =>
            val a = math.abs(x.toLong); if (a > peak) peak = a
            sum += x
          }
          (id, s.length.toLong, rt.samples.length.toLong, rt.sampleRate,
            44L + 2L * rt.samples.length, peak, sum)
        }
      }
      .toDF("media_id", "n_samples", "out_samples", "out_rate", "out_bytes",
        "peak_out", "sum_out")
      .orderBy("media_id")
  }

  /** Scene-cut detection through the REAL AVI codec (q362) — the
    * genuinely-temporal video verb on top of q315's per-pair motion sum:
    * decode the synthesized RIFF AVI through the real container parse,
    * compute each adjacent-frame absolute pixel difference d_f (exact
    * BIGINT), and declare a CUT at frame f iff d_f is STRICTLY above the
    * clip's own mean pair difference — self-normalizing integer
    * cross-multiplication (d_f·n_pairs > Σd), no tuned threshold to drift
    * with the corpus. Emits the cut count, the first cut frame (1-based;
    * 0 = none), and the max/total differences that pin the arithmetic.
    * Row-local: a clip's frames live in its own payload. */
  def sceneCutQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val n = text.length
          val nf = math.min(4, math.max(1, (n + 63) / 64))
          val src = Array.tabulate(nf, 4, 16) { (f, y, x) =>
            val i = f * 64 + y * 16 + x
            if (i < n) text.charAt(i).toInt & 0xff else 0
          }
          val dec = AviCodec.decode(AviCodec.encode(AviCodec.Video(16, 4, 5, src)))
          val diffs = Array.tabulate(dec.frames.length - 1) { f =>
            var d = 0L
            for (y <- 0 until 4; x <- 0 until 16)
              d += math.abs(dec.frames(f + 1)(y)(x) - dec.frames(f)(y)(x))
            d
          }
          val np = diffs.length.toLong
          val sd = diffs.sum
          var nCuts = 0L; var firstCut = 0L; var maxD = 0L
          var f = 0
          while (f < diffs.length) {
            if (diffs(f) > maxD) maxD = diffs(f)
            if (diffs(f) * np > sd) { // strictly above the clip mean
              nCuts += 1
              if (firstCut == 0) firstCut = f + 2 // cut AT frame f+2 (1-based)
            }
            f += 1
          }
          (id, dec.frames.length.toLong, nCuts, firstCut, maxD, sd)
        }
      }
      .toDF("media_id", "n_frames", "n_cuts", "first_cut", "max_diff", "sum_diff")
      .orderBy("media_id")
  }

  /** Voice-activity segmentation through the REAL WAV codec (q310): the
    * audio-pipeline primitive that turns a clip into SEGMENTS — frame the
    * PCM into 80-sample frames, flag a frame active iff its exact integer
    * energy Σs² clears the threshold (71500·65536 ≈ the corpus's median
    * frame energy, so both classes are genuinely populated), then merge
    * consecutive active frames into segments with a per-clip sequential
    * fold. Everything is row-local — decode, framing, thresholding, and
    * the island merge all happen inside one map over clips, so the
    * operator is embarrassingly parallel at any corpus size (the
    * gaps-and-islands WINDOW formulation would shuffle frames for no
    * reason; a clip's frames are already adjacent in its own payload). */
  val VadEnergyThreshold: Long = 71500L * 65536L

  def vadSegmentsQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val samples = text.map(ch => ((ch.toInt - 96) * 256).toShort).toArray
          val s = WavCodec.decode(WavCodec.encode(8000, samples)).samples
          val nf = s.length / 80
          var f = 0
          var nSpeech = 0L; var nSeg = 0L; var cur = 0L; var best = 0L
          while (f < nf) {
            var e = 0L
            var j = f * 80
            while (j < (f + 1) * 80) { e += s(j).toLong * s(j); j += 1 }
            if (e >= VadEnergyThreshold) {
              nSpeech += 1
              if (cur == 0) nSeg += 1
              cur += 1
              if (cur > best) best = cur
            } else cur = 0
            f += 1
          }
          (id, nf.toLong, nSpeech, nSeg, best)
        }
      }
      .toDF("media_id", "n_frames", "n_speech", "n_segments", "max_segment")
      .orderBy("media_id")
  }

  /** REAL pixel augmentation through the BMP codec (q303): the two
    * deterministic transforms every vision pipeline applies — horizontal
    * FLIP and center CROP — on actual decoded pixels, with q163's
    * doubled-round-trip discipline: synthesize the 16×h grayscale BMP
    * (q70's construction), decode through the real container parse, flip
    * each row, crop to the center 8 columns, then RE-ENCODE the 8×h
    * result and decode it AGAIN so the emitted stats prove the codec
    * handles the new geometry. px0 (= the ORIGINAL (0,11) pixel — the
    * flip moves it there) and pxlast (= original (h−1,4)) pin the index
    * arithmetic of both transforms; the crop's column set {4..11} is
    * flip-symmetric so the mean must equal the unflipped center-crop
    * mean — the oracle checks exactly that from the synthesis text.
    * Row-local map stage at any scale. */
  def bmpAugmentQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .filter(length(col("text")) >= 1)
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w = 16
          val h = (text.length + w - 1) / w
          val px = Array.tabulate(h, w) { (y, x) =>
            val i = y * w + x
            if (i < text.length) text.charAt(i).toInt & 0xff else 0
          }
          val img = BmpCodec.decode(BmpCodec.encode(BmpCodec.Gray(w, h, px)))
          // flip horizontally, crop to the center 8 columns (4..11)
          val aug = Array.tabulate(img.height, 8) { (y, x) =>
            img.gray(y)(img.width - 1 - (x + 4))
          }
          val rt = BmpCodec.decode(BmpCodec.encode(BmpCodec.Gray(8, img.height, aug)))
          var sum = 0L
          rt.gray.foreach(row => row.foreach(sum += _))
          (id, BmpCodec.encode(BmpCodec.Gray(8, rt.height, aug)).length.toLong,
            rt.width.toLong, rt.height.toLong,
            rt.gray(0)(0).toLong, rt.gray(rt.height - 1)(7).toLong,
            sum.toDouble / (rt.width * rt.height))
        }
      }
      .toDF("media_id", "n_bytes", "width", "height", "px0", "pxlast", "mean_raw")
      .select(col("media_id"), col("n_bytes"), col("width"), col("height"),
        col("px0"), col("pxlast"), round(col("mean_raw"), 4).as("mean_gray"))
      .orderBy("media_id")
  }

  /** The registered rows-only query: full decode→features→resize chain. */
  def featuresQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    resizeHalf(extractFeatures(mediaFromDocuments(spark, dir)))
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("width"),
        col("height"), col("sample_rate"), col("n_samples"), col("n_frames"),
        col("content_hash"),
        round(element_at(col("histogram"), 1), 4).as("hist0"),
        // bin 6 (0x60-0x6f: mostly lowercase letters) is the discriminative
        // bin for text payloads; bin 0 is ~always 0 on ASCII
        round(element_at(col("histogram"), 7), 4).as("hist6"))
      .orderBy("media_id")
  }

  /** Sobel edge extraction through the REAL BMP codec (q328): synthesize
    * the 16×h grayscale BMP (q70's construction), decode through the
    * container parse, and convolve the 3×3 Sobel pair over every INTERIOR
    * pixel (1 ≤ y ≤ h−2, 1 ≤ x ≤ 14; every fixture doc has h ≥ 3).
    * Gradient magnitude is the L1 form |gx|+|gy| — integer-exact, no
    * sqrt — so the per-image edge census (count over threshold 300, total
    * and max magnitude) is bit-identical to the oracle's replay of the
    * synthesis arithmetic. Row-local end to end: decode + convolution is
    * one map over clips, embarrassingly parallel at any corpus size. */
  def sobelQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w = 16
          val h = (text.length + w - 1) / w
          val px = Array.tabulate(h, w) { (y, x) =>
            val i = y * w + x
            if (i < text.length) text.charAt(i).toInt & 0xff else 0
          }
          val img = BmpCodec.decode(BmpCodec.encode(BmpCodec.Gray(w, h, px)))
          val g = img.gray
          var nInt = 0L; var total = 0L; var mx = 0L; var edges = 0L
          var y = 1
          while (y < img.height - 1) {
            var x = 1
            while (x < img.width - 1) {
              val gx = (g(y - 1)(x + 1) + 2 * g(y)(x + 1) + g(y + 1)(x + 1)) -
                (g(y - 1)(x - 1) + 2 * g(y)(x - 1) + g(y + 1)(x - 1))
              val gy = (g(y + 1)(x - 1) + 2 * g(y + 1)(x) + g(y + 1)(x + 1)) -
                (g(y - 1)(x - 1) + 2 * g(y - 1)(x) + g(y - 1)(x + 1))
              val mag = math.abs(gx).toLong + math.abs(gy)
              nInt += 1; total += mag
              if (mag > mx) mx = mag
              if (mag > 300) edges += 1
              x += 1
            }
            y += 1
          }
          (id, img.height.toLong, nInt, total, mx, edges,
            if (nInt > 0) edges * 1000 / nInt else 0L)
        }
      }
      .toDF("media_id", "height", "n_interior", "total_mag", "max_mag",
        "edge_count", "edge_permille")
      .orderBy("media_id")
  }

  /** Integer DFT tables for the spectral-bin query (q329): 40-sample
    * frames at 8 kHz, bins k ∈ {1,2,5,10} ≙ 200/400/1000/2000 Hz.
    * round-half-up at scale 1024; computed ONCE here and injected into
    * the oracle SQL as literals, so both engines consume the identical
    * integer table and the whole spectral estimate stays exact. */
  val dftBins: Seq[Int] = Seq(1, 2, 5, 10)
  private def dftTab(fn: Double => Double, k: Int): Array[Long] =
    Array.tabulate(40)(t => math.floor(fn(2 * math.Pi * k * t / 40) * 1024 + 0.5).toLong)
  val dftCos: Map[Int, Array[Long]] = dftBins.map(k => k -> dftTab(math.cos, k)).toMap
  val dftSin: Map[Int, Array[Long]] = dftBins.map(k => k -> dftTab(math.sin, k)).toMap
  def dftTabSql(k: Int, cos: Boolean): String =
    (if (cos) dftCos(k) else dftSin(k)).mkString("[", ",", "]")

  /** Fixed-bin spectral energy through the REAL WAV codec (q329): the
    * Goertzel-style narrowband analysis an audio curation pipeline uses
    * for tone/hum detection — per 40-sample frame, the DFT projection
    * X_k = Σ s_t·cos_k[t], Y_k = Σ s_t·sin_k[t] on the shared integer
    * table, per-clip energy Σ_f (X²+Y²) ≫ 2²⁰. All products stay under
    * 2⁶³ (|s|≤6656, |c|≤1024, 40 terms, ≤13 frames). Row-local like the
    * other codec queries; the 4-bin spectrum is 32 bytes/clip. */
  def spectralQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val samples = text.map(ch => ((ch.toInt - 96) * 256).toShort).toArray
          val pcm = WavCodec.decode(WavCodec.encode(8000, samples)) // real parse
          val s = pcm.samples
          val nf = s.length / 40
          val e = dftBins.map { k =>
            val ct = dftCos(k); val st = dftSin(k)
            var tot = 0L
            var f = 0
            while (f < nf) {
              var x = 0L; var yAcc = 0L
              var t = 0
              while (t < 40) {
                val v = s(f * 40 + t).toLong
                x += v * ct(t); yAcc += v * st(t)
                t += 1
              }
              tot += x * x + yAcc * yAcc
              f += 1
            }
            k -> tot / 1048576L
          }.toMap
          (id, s.length.toLong, nf.toLong, e(1), e(2), e(5), e(10))
        }
      }
      .toDF("media_id", "n_samples", "n_frames", "e200", "e400", "e1000", "e2000")
      .orderBy("media_id")
  }
}
