package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Multimodal-column plumbing (builder brief): media as opaque `binary`
  * columns with typed metadata, decoded/featurized inside executors.
  *
  * The container has no codec LIBRARIES, but PPM (ASCII header), BMP
  * (fixed little-endian header) and WAV (RIFF/PCM) need none — their
  * headers decode with a `ByteBuffer`. So the round-trip here is REAL:
  * [[encodeBlobs]] renders each document into a genuine media file
  * (magic bytes, spec-conformant header, payload), and [[decodeMedia]]
  * parses the BYTES back — dispatching on the magic number, not on any
  * metadata column — inside `mapPartitions` (the executor-side batch
  * shape every decoder needs: init once per partition, stream rows,
  * never collect). Swapping in a JPEG/FLAC codec changes one `case`
  * arm, not the plan. The xm2 oracle certifies the round-trip: Spark
  * reports what it PARSED from the blobs, DuckDB recomputes the same
  * metadata from first principles over `documents`.
  */
object Multimodal {

  /** Typed result of a real media decode. Image rows carry
    * width/height (zeros for audio); audio rows carry
    * sample_rate/n_samples (zeros for images); every row carries the
    * file size and the exact sum of its payload bytes (pixels or PCM
    * data — proof the decoder read past the header). */
  case class DecodedMedia(doc_id: Long, media_type: String,
                          width: Int, height: Int,
                          sample_rate: Int, n_samples: Int,
                          n_bytes: Long, payload_byte_sum: Long)

  /** Documents re-cast as a media table: (doc_id, content binary,
    * media_type). On a real pipeline this is the schema images/audio
    * arrive in (bytes + mime + source metadata). */
  def asMediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast(BinaryType).as("content"),
        lit("text/plain").as("media_type"))

  /** Deterministic media fixture: each document becomes a REAL media
    * file — `doc_id % 3` picks PPM / BMP / WAV — with dimensions and
    * sample rate derived from the text length and the payload bytes
    * cycled from the text itself (so the oracle can recompute the
    * payload sum without parsing binaries). Encoding runs in
    * `mapPartitions`: byte-level rendering is imperative per-row work,
    * exactly what the executor-side escape hatch is for.
    */
  def encodeBlobs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val tb = text.getBytes(StandardCharsets.US_ASCII)
          val nc = tb.length
          // cycled payload byte k = text byte (k mod nc)
          def fillCycled(buf: ByteBuffer, n: Int): Unit = {
            var k = 0
            while (k < n) {
              buf.put(if (nc == 0) 0.toByte else tb(k % nc)); k += 1
            }
          }
          val blob: Array[Byte] = (id % 3) match {
            case 0 => // PPM P6: ASCII header + w*h*3 RGB bytes
              val w = nc % 64 + 1; val h = (nc * 7) % 48 + 1
              val header = s"P6\n$w $h\n255\n"
                .getBytes(StandardCharsets.US_ASCII)
              val p = w * h * 3
              val buf = ByteBuffer.allocate(header.length + p)
              buf.put(header); fillCycled(buf, p)
              buf.array()
            case 1 => // BMP: 54-byte LE header, 24bpp, 4-byte row pad
              val w = nc % 64 + 1; val h = (nc * 7) % 48 + 1
              val row = w * 3; val pad = (4 - row % 4) % 4
              val data = (row + pad) * h
              val buf = ByteBuffer.allocate(54 + data)
                .order(ByteOrder.LITTLE_ENDIAN)
              buf.put('B'.toByte).put('M'.toByte)
                .putInt(54 + data) // file size
                .putInt(0).putInt(54) // reserved, pixel offset
                .putInt(40).putInt(w).putInt(h) // info size, dims
                .putShort(1).putShort(24) // planes, bpp
                .putInt(0).putInt(data) // compression, image size
                .putInt(2835).putInt(2835).putInt(0).putInt(0)
              // rows share ONE running cycle (padding excluded), so the
              // pixel-byte sum is the plain cycled-prefix sum
              var k = 0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < row) {
                  buf.put(if (nc == 0) 0.toByte else tb(k % nc))
                  k += 1; x += 1
                }
                var q = 0
                while (q < pad) { buf.put(0.toByte); q += 1 }
                y += 1
              }
              buf.array()
            case _ => // WAV: canonical 44-byte RIFF/PCM header, 16-bit mono
              val sr = 8000 + (nc % 8) * 1000
              val ns = nc % 256 + 16
              val data = 2 * ns
              val buf = ByteBuffer.allocate(44 + data)
                .order(ByteOrder.LITTLE_ENDIAN)
              buf.put("RIFF".getBytes(StandardCharsets.US_ASCII))
                .putInt(36 + data)
                .put("WAVE".getBytes(StandardCharsets.US_ASCII))
                .put("fmt ".getBytes(StandardCharsets.US_ASCII))
                .putInt(16).putShort(1).putShort(1) // PCM, mono
                .putInt(sr).putInt(sr * 2) // sample rate, byte rate
                .putShort(2).putShort(16) // block align, bits
                .put("data".getBytes(StandardCharsets.US_ASCII))
                .putInt(data)
              fillCycled(buf, data)
              buf.array()
          }
          (id, blob)
        }
      }.toDF("doc_id", "content")
  }

  /** REAL pure-JVM media decode: dispatch on the MAGIC BYTES (never on
    * stored metadata), parse the header fields the format actually
    * defines, and sum the payload bytes the header points at. Runs in
    * `mapPartitions` over the binary column — per-partition batch
    * shape, no driver materialization. Unknown magic is a data error
    * and throws (a quarantine sink would catch per-row at ingest). */
  def decodeMedia(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // a codec library would initialize once here, per partition
        it.map { case (id, b) =>
          def sumRange(from: Int, n: Int): Long = {
            var s = 0L; var k = 0
            while (k < n) { s += (b(from + k) & 0xff); k += 1 }
            s
          }
          if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
            // PPM: "P6\n<w> <h>\n255\n" then w*h*3 pixel bytes
            val header = new String(b, 0, math.min(b.length, 32),
              StandardCharsets.US_ASCII)
            val m = """P6\n(\d+) (\d+)\n255\n""".r
              .findPrefixMatchOf(header)
              .getOrElse(throw new IllegalArgumentException(
                s"doc $id: malformed PPM header"))
            val w = m.group(1).toInt; val h = m.group(2).toInt
            DecodedMedia(id, "image/ppm", w, h, 0, 0, b.length,
              sumRange(m.end, w * h * 3))
          } else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
            val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
            val pixOff = bb.getInt(10)
            val w = bb.getInt(18); val h = bb.getInt(22)
            val bpp = bb.getShort(28)
            require(bpp == 24, s"doc $id: unsupported BMP bpp $bpp")
            val row = w * 3; val pad = (4 - row % 4) % 4
            var s = 0L; var y = 0
            while (y < h) { // sum pixel bytes, skip the row padding
              s += sumRange(pixOff + y * (row + pad), row); y += 1
            }
            DecodedMedia(id, "image/bmp", w, h, 0, 0, b.length, s)
          } else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I'
                     && b(2) == 'F' && b(3) == 'F') {
            val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
            val sr = bb.getInt(24)
            val bits = bb.getShort(34)
            require(bits == 16, s"doc $id: unsupported WAV bits $bits")
            val dataLen = bb.getInt(40)
            DecodedMedia(id, "audio/wav", 0, 0, sr, dataLen / 2,
              b.length, sumRange(44, dataLen))
          } else throw new IllegalArgumentException(
            s"doc $id: unknown media magic")
        }
      }
  }

  /** xm2: the certified encode→decode round-trip — render every
    * document as a real PPM/BMP/WAV blob, decode the BYTES back, and
    * emit the parsed metadata. The oracle recomputes every field from
    * `documents` arithmetic alone, so a decoder that misparsed a
    * header or misread the payload extent cannot hash-match. */
  def decodedMeta(spark: SparkSession, sfDir: String): DataFrame =
    decodeMedia(encodeBlobs(spark, sfDir))
      .toDF()
      .orderBy("doc_id")

  /** Typed result of a nearest-neighbor image resize. */
  case class ResizedImage(doc_id: Long, media_type: String,
                          width: Int, height: Int,
                          resized_w: Int, resized_h: Int,
                          resized_sum: Long)

  /** xm3: REAL image RESIZE — decode each PPM/BMP blob's pixels and
    * nearest-neighbor downsample to `w2`×`h2`, emitting the resized
    * pixel-byte sum (the 192-byte thumbnail reduced to one exactly
    * checkable number; a feature extractor would emit the thumbnail
    * itself from the same loop). Source pixel for target (x2, y2) is
    * (x2·w/w2, y2·h/h2) in STORED row order, channels preserved —
    * the oracle recomputes every sampled byte from `documents`
    * arithmetic, so an off-by-one in the stride, the header offset, or
    * the BMP row padding cannot hash-match. `mapPartitions`, same
    * executor-batch shape as [[decodeMedia]]; at 100 TB the blobs
    * never leave their partition and the output is O(docs). */
  def resizedImages(spark: SparkSession, sfDir: String,
                    w2: Int = 8, h2: Int = 8): DataFrame =
    resizedImagesOf(encodeBlobs(spark, sfDir), w2, h2)

  /** [[resizedImages]] over any (doc_id, content) media table —
    * exposed so the spec can feed hand-crafted blobs the encoder never
    * produced. */
  def resizedImagesOf(media: DataFrame, w2: Int, h2: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, b) =>
          // (pixel-data offset, bytes per stored row incl. padding) —
          // pixel (x, y) lives at off + y*stride + x*3 + c
          val parsed: Option[(String, Int, Int, Int, Int)] =
            if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
              val header = new String(b, 0, math.min(b.length, 32),
                StandardCharsets.US_ASCII)
              val m = """P6\n(\d+) (\d+)\n255\n""".r
                .findPrefixMatchOf(header)
                .getOrElse(throw new IllegalArgumentException(
                  s"doc $id: malformed PPM header"))
              val w = m.group(1).toInt
              Some(("image/ppm", w, m.group(2).toInt, m.end, w * 3))
            } else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
              val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
              val w = bb.getInt(18)
              Some(("image/bmp", w, bb.getInt(22), bb.getInt(10),
                w * 3 + (4 - (w * 3) % 4) % 4))
            } else None // audio: not this query's modality
          parsed.map { case (mt, w, h, off, stride) =>
            var s = 0L
            var y2 = 0
            while (y2 < h2) {
              val sy = y2 * h / h2
              var x2 = 0
              while (x2 < w2) {
                val sx = x2 * w / w2
                var c = 0
                while (c < 3) {
                  s += (b(off + sy * stride + sx * 3 + c) & 0xff); c += 1
                }
                x2 += 1
              }
              y2 += 1
            }
            ResizedImage(id, mt, w, h, w2, h2, s)
          }
        }
      }.toDF().orderBy("doc_id")
  }

  /** xm4: audio FRAME-SAMPLING — decode each WAV blob's 16-bit PCM
    * stream and split it into `frames` equal windows, emitting each
    * frame's sample count and absolute-amplitude sum (the exact core
    * of an RMS/VAD featurizer, kept integer so the oracle can replay
    * it). Frame f covers samples [f·ns/frames, (f+1)·ns/frames) —
    * integer bounds, so the frames tile the stream exactly. Output is
    * O(docs · frames) rows regardless of audio length. */
  def audioFrames(spark: SparkSession, sfDir: String,
                  frames: Int = 4): DataFrame = {
    import spark.implicits._
    encodeBlobs(spark, sfDir)
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, b) =>
          if (!(b.length >= 4 && b(0) == 'R' && b(1) == 'I'
                && b(2) == 'F' && b(3) == 'F')) Iterator.empty
          else {
            val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
            require(bb.getShort(34) == 16,
              s"doc $id: unsupported WAV bits ${bb.getShort(34)}")
            val ns = bb.getInt(40) / 2
            (0 until frames).iterator.map { f =>
              val lo = f * ns / frames
              val hi = (f + 1) * ns / frames
              var s = 0L
              var i = lo
              while (i < hi) {
                val v = ((b(44 + 2 * i) & 0xff) |
                  ((b(44 + 2 * i + 1) & 0xff) << 8)).toShort.toInt
                s += math.abs(v); i += 1
              }
              (id, f, hi - lo, s)
            }
          }
        }
      }.toDF("doc_id", "frame", "n_frame_samples", "frame_abs_sum")
      .orderBy("doc_id", "frame")
  }

  case class ImageHash(doc_id: Long, media_type: String,
                       phash_lo: Long, phash_hi: Long)

  /** Per-image 64-bit AVERAGE HASH (the aHash perceptual fingerprint):
    * decode, 8×8 nearest-neighbor downsample (the [[resizedImagesOf]]
    * sampling), per-cell gray = r+g+b, bit = cell·64 > total — pure
    * integer, so the oracle replays every bit from the cycled-payload
    * arithmetic. Emitted as two 32-bit halves ([[graft.operators
    * .Dedup.simhash]]'s discipline — a single BIGINT would wrap on
    * bit 63 differently across engines' shift semantics). */
  private[operators] def imageHashes(spark: SparkSession,
                                     sfDir: String): DataFrame = {
    import spark.implicits._
    encodeBlobs(spark, sfDir)
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, b) =>
          val parsed: Option[(String, Int, Int, Int, Int)] =
            if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
              val header = new String(b, 0, math.min(b.length, 32),
                StandardCharsets.US_ASCII)
              val m = """P6\n(\d+) (\d+)\n255\n""".r
                .findPrefixMatchOf(header)
                .getOrElse(throw new IllegalArgumentException(
                  s"doc $id: malformed PPM header"))
              val w = m.group(1).toInt
              Some(("image/ppm", w, m.group(2).toInt, m.end, w * 3))
            } else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
              val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
              val w = bb.getInt(18)
              Some(("image/bmp", w, bb.getInt(22), bb.getInt(10),
                w * 3 + (4 - (w * 3) % 4) % 4))
            } else None
          parsed.map { case (mt, w, h, off, stride) =>
            val cells = new Array[Long](64)
            var total = 0L
            var y2 = 0
            while (y2 < 8) {
              val sy = y2 * h / 8
              var x2 = 0
              while (x2 < 8) {
                val sx = x2 * w / 8
                var g = 0L
                var c = 0
                while (c < 3) {
                  g += (b(off + sy * stride + sx * 3 + c) & 0xff); c += 1
                }
                cells(y2 * 8 + x2) = g
                total += g
                x2 += 1
              }
              y2 += 1
            }
            var lo = 0L; var hi = 0L
            var i = 0
            while (i < 64) {
              if (cells(i) * 64 > total) {
                if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
              }
              i += 1
            }
            ImageHash(id, mt, lo, hi)
          }
        }
      }.toDF()
  }

  /** XM5: IMAGE near-dup via perceptual hash (`xm5_image_phash`) —
    * the multimodal twin of [[graft.operators.Dedup.simhashPairs]]:
    * aHash fingerprints, 16×4-bit pigeonhole bands (complete for
    * hamming ≤ 15: sixteen bands, at most fifteen differing bits —
    * one band must match exactly), candidates from the band
    * equi-join — never image×image — and the exact hamming verify
    * (τ = 12) on candidates only. The venue's planted image near-dups
    * measure at hamming 8-12 against a ≥ 15 background (the
    * text-cycled pixels are adversarially noisy — a few edited tokens
    * shift the whole payload), hence the loose τ and the narrow
    * bands; production images cluster much tighter under aHash, and
    * at 100 TB you keep the SAME τ/bits ratio by widening the
    * fingerprint (256-bit pHash, 16-bit bands) rather than narrowing
    * the bands. Output is one row per image with its fingerprint
    * halves (fully certifying the hash) plus its best partner and
    * match count; decode and hash are per-row map work, the only
    * shuffle is the band key. */
  def imagePhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val h = imageHashes(spark, sfDir).cache()
    val bands = h.select(col("doc_id"), explode(array(
        (0 until 16).map { i =>
          val half = if (i < 8) col("phash_lo") else col("phash_hi")
          struct(lit(i).as("band"),
            shiftright(half, 4 * (i % 8)).bitwiseAND(15).as("bandkey"))
        }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bandkey").as("bandkey"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band")
          && col("x.bandkey") === col("y.bandkey")
          && col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id"),
        col("y.doc_id").as("partner"))
      .distinct()
    val ham = cand
      .join(h.select(col("doc_id"), col("phash_lo").as("lo_a"),
        col("phash_hi").as("hi_a")), "doc_id")
      .join(h.select(col("doc_id").as("partner"),
        col("phash_lo").as("lo_b"), col("phash_hi").as("hi_b")), "partner")
      .select(col("doc_id"), col("partner"),
        (bit_count(expr("lo_a ^ lo_b")) + bit_count(expr("hi_a ^ hi_b")))
          .cast(IntegerType).as("hamming"))
      .filter(col("hamming") <= 12)
    val best = ham
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("hamming"), col("partner"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"),
        max(when(col("rn") === 1, col("partner"))).as("best_partner"),
        max(when(col("rn") === 1, col("hamming"))).as("best_hamming"))
    h.join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("media_type"),
        col("phash_lo"), col("phash_hi"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("best_partner"), col("best_hamming"))
      .orderBy("doc_id")
  }

  /** Oracle-checkable metadata query over the binary content: byte
    * length, content hash, and derived dimensions expressed as native
    * columnar functions (codegen'd, pruned to the two columns read).
    */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    asMediaTable(spark, sfDir)
      .select(col("doc_id"),
        length(col("content")).as("n_bytes"),
        sha2(col("content"), 256).as("sha256_hex"),
        (length(col("content")) % 640).as("fake_width"),
        ((length(col("content")) * 7) % 480).as("fake_height"),
        (length(col("content")) % 16 + 1).as("fake_frames"))
      .orderBy("doc_id")
}
