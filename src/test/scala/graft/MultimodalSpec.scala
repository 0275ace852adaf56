package graft

import graft.operators.Multimodal
import graft.plans.HashOps
import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** The multimodal plumbing: binary payload column through typed Dataset
  * and partition-wise stubbed decode. */
class MultimodalSpec extends SparkSpec {

  test("binary payload → partition-wise features, deterministic stub") {
    implicit val s: SparkSession = spark
    val docs = Tables.documents(spark, sf()).limit(50)
    val feats = Multimodal.extractFeatures(Multimodal.toMediaRecords(docs))
      .collect().sortBy(_.doc_id)
    val raw = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(feats.length == raw.length)
    feats.zip(raw).foreach { case (f, (id, text)) =>
      assert(f.doc_id == id)
      assert(f.byte_len == text.length) // ASCII corpus: bytes == chars
      assert(f.n_frames == text.length / 256 + 1)
      assert(f.header_hash == HashOps.polyHashStr(text.take(16)))
    }
  }

  test("ImageIO BMP round-trip: real dimensions and channel-weighted pixels") {
    val id = 11L
    val bmp = Multimodal.synthesizeBmp(id)
    val (w, h, sum) = Multimodal.decodeImage(bmp).get
    assert(w == 4 + id % 5 && h == 3 + id % 4)
    var exp = 0L
    for (y <- 0 until h.toInt; x <- 0 until w.toInt) {
      exp += (id * 31 + x * 7 + y * 13) % 256 +
        2L * ((id * 17 + x * 3 + y * 5) % 256) + 4L * ((x + y * 11) % 256)
    }
    assert(sum == exp, "decoded pixel checksum must match the analytic value")
    // undecodable bytes → no reader claims them
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("decodeFeatures: codec path decodes, fallback stubs, in one pass") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val recs = Seq(
      graft.operators.MediaRecord(1L, Multimodal.synthesizeBmp(1L), "s", "en", 0L),
      graft.operators.MediaRecord(2L, "plain text".getBytes("UTF-8"), "s", "en", 10L))
      .toDS()
    val out = Multimodal.decodeFeatures(recs).collect().sortBy(_.doc_id)
    assert(out(0).decoded && out(0).width == 4 + 1 % 5 && out(0).height == 3 + 1 % 4)
    assert(!out(1).decoded && out(1).width == 0L &&
      out(1).px_sum == HashOps.polyHashStr("plain text"))
  }

  test("empty payload survives the decode stub") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val ds = Seq(graft.operators.MediaRecord(1L, Array.emptyByteArray, "s", "en", 0L)).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head
    assert(f.byte_len == 0 && f.n_frames == 1 && f.header_hash == 0L)
  }

  test("perceptualHash: analytic parity, identity, and mean-threshold bits") {
    // parity with the synthetic pixel formula for a few ids
    for (id <- Seq(1L, 2L, 13L, 42L)) {
      val Some((w, h, bits)) = Multimodal.perceptualHash(Multimodal.synthesizeBmp(id))
      assert(w == 4 + id % 5 && h == 3 + id % 4)
      val n = (w * h).toInt
      val gray = (0 until n).map { i =>
        val (x, y) = (i % w.toInt, i / w.toInt)
        ((id * 31 + x * 7 + y * 13) % 256) +
          2 * ((id * 17 + x * 3 + y * 5) % 256) + 4 * ((x + y * 11) % 256)
      }
      val total = gray.sum
      val expect = (0 until n).foldLeft(0L) { (acc, i) =>
        if (gray(i) * n > total) acc | (1L << i) else acc
      }
      assert(bits == expect, s"id=$id")
    }
    // identical payloads → identical hash; different ids differ (dedup works)
    assert(Multimodal.perceptualHash(Multimodal.synthesizeBmp(5L)) ==
      Multimodal.perceptualHash(Multimodal.synthesizeBmp(5L)))
    val hashes = (0L until 20L)
      .flatMap(i => Multimodal.perceptualHash(Multimodal.synthesizeBmp(i)))
      .map(_._3)
    assert(hashes.distinct.size >= 18,
      s"synthetic images should rarely collide: ${hashes.distinct.size}/20")
    // undecodable bytes → None (the fallback path in phashFeatures)
    assert(Multimodal.perceptualHash("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("audioFeatures: hand-computed windows — silence, peak, partial tail") {
    implicit val s: SparkSession = spark
    import s.implicits._
    // clip 1: a silent window (all samples at the 96 center, energy 0)
    // then a loud one (196 → (100)²·64 = 640 000); clip 2: one partial
    // 10-sample window at 106 → energy 10·100 = 1000, nothing quiet
    // (a window is never quiet relative to itself)
    val clip1 = Array.fill[Byte](64)(96.toByte) ++ Array.fill[Byte](64)(196.toByte)
    val clip2 = Array.fill[Byte](10)(106.toByte)
    val ds = Seq(
      graft.operators.MediaRecord(1L, clip1, "s", "en", clip1.length.toLong),
      graft.operators.MediaRecord(2L, clip2, "s", "en", clip2.length.toLong)).toDS()
    val out = Multimodal.audioFeatures(ds).collect()
      .map(a => a.doc_id -> a).toMap
    assert(out(1L).n_windows == 2 && out(1L).n_quiet == 1 &&
      out(1L).peak_idx == 1 && out(1L).peak_energy == 640000L)
    assert(out(2L).n_windows == 1 && out(2L).n_quiet == 0 &&
      out(2L).peak_idx == 0 && out(2L).peak_energy == 1000L)
    // empty payload → no row (matches the oracle's inner-join semantics)
    val empty = Seq(graft.operators.MediaRecord(3L, Array.emptyByteArray,
      "s", "en", 0L)).toDS()
    assert(Multimodal.audioFeatures(empty).collect().isEmpty)
  }
}
