package graft.operators

import graft.plans.HashOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** A multimodal record: opaque media bytes + typed metadata. At 100 TB the
  * `media` column is the dominant payload; it stays binary end-to-end
  * (parquet binary chunks), metadata stays columnar for pruning, and all
  * decode work happens partition-local with bounded batches. */
final case class MediaRecord(doc_id: Long, media: Array[Byte],
    source: String, lang: String, n_bytes: Long)

final case class MediaFeatures(doc_id: Long, byte_len: Long, n_frames: Long,
    header_hash: Long)

/** Multimodal-column plumbing (SURVEY.md §2.C11). The decode step is a
  * deterministic STUB (no image/audio codecs in this environment) — marked
  * below — but the Spark-side structure is real: typed Dataset, binary
  * payload column, partition-wise batched feature extraction via
  * mapPartitions (the Scala analog of arrow-batched pandas UDFs), columnar
  * metadata kept alongside for predicate pushdown. */
object Multimodal {

  /** Treat each document's UTF-8 bytes as its "media" payload — the test
    * corpus has no real images; the byte-path (binary column → decode →
    * features) is what's being exercised. */
  def toMediaRecords(docs: DataFrame)(implicit s: SparkSession): Dataset[MediaRecord] = {
    import s.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
        col("source"), col("lang"), octet_length(encode(col("text"), "UTF-8"))
          .cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** STUB decode: a real pipeline would decode the codec here (JPEG/WAV/
    * MP4 frame sampling). The stub derives deterministic pseudo-features
    * from the raw bytes so the distributed plumbing is testable:
    * byte_len (payload size), n_frames (256-byte "frames"), header_hash
    * (poly hash of the first 16 bytes). */
  private def decodeStub(media: Array[Byte]): (Long, Long, Long) = {
    val len = media.length.toLong
    val nFrames = len / 256 + 1
    val header = new String(media, 0, math.min(16, media.length), "UTF-8")
    (len, nFrames, HashOps.polyHashStr(header))
  }

  /** Partition-wise feature extraction: one pass over the binary payloads,
    * no shuffle; batch shape == partition iterator (bounded memory). */
  def extractFeatures(ds: Dataset[MediaRecord])
      (implicit s: SparkSession): Dataset[MediaFeatures] = {
    import s.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val (len, frames, header) = decodeStub(r.media)
        MediaFeatures(r.doc_id, len, frames, header)
      }
    }
  }

  /** STUB resize (the image-resize analog): downsample each payload to at
    * most `targetBytes` by keeping every ceil(len/target)-th byte. A real
    * pipeline decodes and rescales pixels here; the stub keeps the
    * Spark-side shape honest — bounded output size, payload + metadata
    * updated together, partition-local, no shuffle. (Byte-stride sampling
    * assumes 1-byte code points; the test corpus is ASCII.) */
  def resize(ds: Dataset[MediaRecord], targetBytes: Int)
      (implicit s: SparkSession): Dataset[MediaRecord] = {
    import s.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val len = r.media.length
        val step = math.max(1, (len + targetBytes - 1) / targetBytes)
        val out = Array.ofDim[Byte]((len + step - 1) / step)
        var i = 0
        var j = 0
        while (i < len) { out(j) = r.media(i); j += 1; i += step }
        r.copy(media = out, n_bytes = out.length.toLong)
      }
    }
  }

  /** Per-clip audio features: windowed energy + relative silence — the
    * VAD/trim-silence shape every audio-ingest pipeline runs before
    * feature extraction. The payload is read as 8-bit PCM (the test
    * corpus has no real audio; ASCII bytes stand in as samples — the
    * REAL part is the plumbing: binary column in, partition-local
    * windowing, integer per-window energy, bounded per-clip state out).
    *
    * Per non-overlapping 64-sample window: energy = Σ (x−96)² (exact
    * integers). A window is "quiet" if its energy is below HALF the
    * clip's mean window energy — the per-clip-normalized test is
    * cross-multiplied (2·n·e < Σe) so no division enters; peak window =
    * argmax energy, lowest index on ties. All int64 → oracle-exact. */
  final case class AudioFeatures(doc_id: Long, n_windows: Long,
      n_quiet: Long, peak_idx: Long, peak_energy: Long)

  def audioFeatures(ds: Dataset[MediaRecord], window: Int = 64)
      (implicit s: SparkSession): Dataset[AudioFeatures] = {
    import s.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val len = r.media.length
        val n = (len + window - 1) / window
        if (n == 0) Iterator.empty
        else {
          val e = Array.ofDim[Long](n)
          var i = 0
          while (i < len) {
            val d = (r.media(i) & 0xff).toLong - 96L
            e(i / window) += d * d
            i += 1
          }
          val total = e.sum
          var quiet = 0L
          var peakIdx = 0
          var w = 0
          while (w < n) {
            if (2L * n * e(w) < total) quiet += 1
            if (e(w) > e(peakIdx)) peakIdx = w
            w += 1
          }
          Iterator.single(AudioFeatures(r.doc_id, n.toLong, quiet,
            peakIdx.toLong, e(peakIdx)))
        }
      }
    }
  }

  /** Decoded-image features: real dimensions + channel-weighted pixel sum
    * when a registered codec decoded the payload; the stub's header hash
    * (and zero dims) when none did. */
  final case class AudioFingerprint(doc_id: Long, n_windows: Long, fp: Long)

  /** Energy-derivative-sign audio fingerprint (the Shazam-lite shape:
    * the CONTOUR of the energy envelope, not its level, so gain
    * changes don't move the print): bit w−1 is set iff window w's
    * energy exceeds window w−1's, packed over the first 62 windows
    * (staying clear of the sign bit in both engines). Same
    * partition-local single pass over opaque bytes as
    * [[audioFeatures]]; near-dup clips collide on (n_windows, fp). */
  def audioFingerprint(ds: Dataset[MediaRecord], window: Int = 64)
      (implicit s: SparkSession): Dataset[AudioFingerprint] = {
    import s.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val len = r.media.length
        val n = (len + window - 1) / window
        if (n == 0) Iterator.empty
        else {
          val e = Array.ofDim[Long](n)
          var i = 0
          while (i < len) {
            val d = (r.media(i) & 0xff).toLong - 96L
            e(i / window) += d * d
            i += 1
          }
          var fp = 0L
          var w = 1
          while (w < n && w <= 62) {
            if (e(w) > e(w - 1)) fp |= 1L << (w - 1)
            w += 1
          }
          Iterator.single(AudioFingerprint(r.doc_id, n.toLong, fp))
        }
      }
    }
  }

  final case class DecodedImage(doc_id: Long, width: Long, height: Long,
      px_sum: Long, decoded: Boolean)

  // keep ImageIO memory-only: no temp-file cache churn per decoded payload
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic synthetic BMP payload for doc `docId` (the sandbox has
    * no real image corpus): width 4+id%5, height 3+id%4, pixel (x,y) =
    * (r,g,b) = ((id·31+x·7+y·13)%256, (id·17+x·3+y·5)%256, (x+y·11)%256),
    * written through the JDK's own BMP encoder — so the decode below is a
    * genuine codec round-trip, not a fixture replay. */
  def synthesizeBmp(docId: Long): Array[Byte] = {
    val w = (4 + docId % 5).toInt
    val h = (3 + docId % 4).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((docId * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((docId * 17 + x * 3 + y * 5) % 256).toInt
        val b = ((x + y * 11) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** REAL image decode via `javax.imageio` (public JDK — BMP/PNG/GIF/JPEG
    * readers are always registered): returns (width, height, Σ r+2g+4b)
    * — the channel weights catch RGB/BGR order bugs a plain r+g+b sum
    * would mask — or None when no reader handles the bytes. */
  def decodeImage(media: Array[Byte]): Option[(Long, Long, Long)] = {
    // a reader may CLAIM the bytes (magic matches) and then throw on a
    // corrupt/truncated body — the common web case; that is a fallback,
    // not a task failure
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sum += ((rgb >> 16) & 255) + 2L * ((rgb >> 8) & 255) + 4L * (rgb & 255)
          x += 1
        }
        y += 1
      }
      Some((img.getWidth.toLong, img.getHeight.toLong, sum))
    }
  }

  /** Feature extraction with the REAL codec path: ImageIO first, the
    * deterministic stub as fallback for payloads no reader accepts (the
    * honest analog of skipping undecodable web images). Same partition-
    * local, no-shuffle shape as [[extractFeatures]]. */
  def decodeFeatures(ds: Dataset[MediaRecord])
      (implicit s: SparkSession): Dataset[DecodedImage] = {
    import s.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        decodeImage(r.media) match {
          case Some((w, h, sum)) => DecodedImage(r.doc_id, w, h, sum, decoded = true)
          case None =>
            val (_, _, header) = decodeStub(r.media)
            DecodedImage(r.doc_id, 0L, 0L, header, decoded = false)
        }
      }
    }
  }

  /** aHash-style perceptual image fingerprint (the production image-dedup
    * primitive: identical/near-identical images collide even across
    * re-encodes): bit i (row-major pixel i) is set iff that pixel's
    * weighted gray value strictly exceeds the image mean — compared as
    * `gray·npix > total` in exact integers, no division. Gray uses the
    * same r+2g+4b channel weights as [[decodeImage]] so RGB/BGR bugs
    * flip bits. Image area must fit the 63-bit hash (true for the
    * synthetic corpus; real pipelines downscale to 8×8 first). */
  final case class ImageHash(doc_id: Long, width: Long, height: Long,
      phash: Long, decoded: Boolean)

  def perceptualHash(media: Array[Byte]): Option[(Long, Long, Long)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val n = w * h
      require(n <= 62, s"image area $n exceeds the 62-bit hash; downscale first")
      val gray = Array.ofDim[Long](n)
      var total = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val g = ((rgb >> 16) & 255) + 2L * ((rgb >> 8) & 255) + 4L * (rgb & 255)
          gray(y * w + x) = g
          total += g
          x += 1
        }
        y += 1
      }
      var bits = 0L
      var i = 0
      while (i < n) {
        if (gray(i) * n > total) bits |= 1L << i
        i += 1
      }
      Some((w.toLong, h.toLong, bits))
    }
  }

  /** Perceptual hashes for a media collection — partition-local decode,
    * no shuffle; undecodable payloads fall back to the stub header hash
    * with decoded=false (same policy as [[decodeFeatures]]). */
  def phashFeatures(ds: Dataset[MediaRecord])
      (implicit s: SparkSession): Dataset[ImageHash] = {
    import s.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        perceptualHash(r.media) match {
          case Some((w, h, bits)) => ImageHash(r.doc_id, w, h, bits, decoded = true)
          case None =>
            val (_, _, header) = decodeStub(r.media)
            ImageHash(r.doc_id, 0L, 0L, header, decoded = false)
        }
      }
    }
  }

  /** One sampled "frame" of a media payload. */
  final case class Frame(doc_id: Long, frame_idx: Long, frame_hash: Long)

  /** Frame sampling: split the payload into fixed `frameBytes` frames and
    * keep every `stride`-th one (the video-frame-sampling shape: decode is
    * stubbed, the fan-out/row-explosion plumbing is real). Output size is
    * payload/(frameBytes·stride) rows per doc — bounded fan-out, no
    * shuffle. */
  def sampleFrames(ds: Dataset[MediaRecord], frameBytes: Int = 256,
      stride: Int = 2)(implicit s: SparkSession): Dataset[Frame] = {
    import s.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        // ceil-division: no empty trailing frame (hash of "" is engine-
        // dependent in the oracle's char fold)
        val nFrames = (r.media.length + frameBytes - 1) / frameBytes
        (0L until nFrames.toLong).by(stride.toLong).map { i =>
          val from = (i * frameBytes).toInt
          val until = math.min(from + frameBytes, r.media.length)
          val chunk = new String(r.media, from, until - from, "UTF-8")
          Frame(r.doc_id, i, HashOps.polyHashStr(chunk))
        }
      }
    }
  }
}
