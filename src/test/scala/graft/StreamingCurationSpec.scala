package graft

import graft.operators.Curation
import graft.sources.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The curation scorers are stateless per-row projections, so the same
  * code runs unchanged under Structured Streaming — score-as-you-ingest
  * (classifier + shard assignment at consume time), with packing left to
  * batch export where a per-stream ordering exists. */
class StreamingCurationSpec extends SparkSpec {

  test("streaming hashedLinearScore + shardAssign == batch on same docs") {
    val tmp = Files.createTempDirectory("graft-curate-stream").toString
    val srcDir = s"$tmp/src"
    val outDir = s"$tmp/out"
    val ckpt = s"$tmp/ckpt"

    val docs = Tables.documents(spark, sf())
    docs.write.parquet(srcDir)

    val stream = spark.readStream
      .schema(docs.schema)
      .parquet(srcDir)
    val scored = Curation.shardAssign(
      Curation.hashedLinearScore(stream), nShards = 16)
    val q = scored.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(outDir)
      .select("doc_id", "n_tok", "score", "pred", "shard")
      .orderBy("doc_id").collect().toSeq
    val batch = Curation.shardAssign(Curation.hashedLinearScore(docs), 16)
      .select("doc_id", "n_tok", "score", "pred", "shard")
      .orderBy("doc_id").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming PQ code assignment (offline-trained codebook) == batch") {
    // the ANN model-application seam: codebook trained offline on the
    // batch corpus, applied to a streaming ingest as a pure narrow
    // projection — every new vector is indexed at consume time
    val tmp = Files.createTempDirectory("graft-pq-stream").toString
    val emb = Tables.embeddings(spark, sf())
    emb.write.parquet(s"$tmp/src")
    // the PRODUCTION trainer (sampled Lloyd) — the full-corpus trainer
    // is an sf-bounded audit since r11
    val cents = graft.operators.Similarity.sampledCentroids(emb, iters = 2)
    val stream = spark.readStream.schema(emb.schema).parquet(s"$tmp/src")
    val q = graft.operators.Similarity.pqCodesWith(stream, cents)
      .writeStream
      .format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(s"$tmp/out")
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    val batch = graft.operators.Similarity.pqCodesWith(emb, cents)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("packSequences is a batch-only export (streaming window rejected)") {
    val tmp = Files.createTempDirectory("graft-curate-stream2").toString
    val docs = Tables.documents(spark, sf())
    docs.write.parquet(s"$tmp/src")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$tmp/src")
    // non-time windows have no incremental plan; Spark must refuse rather
    // than silently compute wrong packing — pin that contract
    val ex = intercept[Exception] {
      val q = Curation.packSequences(stream, 256).writeStream
        .format("memory").queryName("pack_stream")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    assert(ex.getMessage.toLowerCase.contains("streaming") ||
      ex.getMessage.toLowerCase.contains("window"))
  }
}
