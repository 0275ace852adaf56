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

  test("empty payload survives the decode stub") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val ds = Seq(graft.operators.MediaRecord(1L, Array.emptyByteArray, "s", "en", 0L)).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head
    assert(f.byte_len == 0 && f.n_frames == 1 && f.header_hash == 0L)
  }
}
