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
