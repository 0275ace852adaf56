package graft

import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Mergeable == streamable: the histogram sketch's bin counts built as a
  * streaming aggregation across several micro-batches must equal the
  * batch sketch on the same data — the property that lets one sketch
  * serve batch, incremental, and streaming paths. */
class StreamingSketchSpec extends SparkSpec {

  test("histogram bin counts merge across micro-batches == batch") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val data = (1 to 3000).map(i => (s"k${i % 3}", (i % 500) + 0.25))
    val ms = MemoryStream[(String, Double)]
    val counts = ms.toDS().toDF("key", "value")
      .groupBy(col("key"),
        Sketches.histogramBin(col("value"), 128, 0.0, 512.0).as("bin"))
      .count()
    val q = counts.writeStream.format("memory").queryName("hist_stream")
      .outputMode("complete").start()
    try {
      // three uneven micro-batches — merge order must not matter
      ms.addData(data.take(100))
      q.processAllAvailable()
      ms.addData(data.slice(100, 1700))
      q.processAllAvailable()
      ms.addData(data.drop(1700))
      q.processAllAvailable()
      val streamed = spark.table("hist_stream")
        .orderBy("key", "bin").collect().toSeq
      val batch = data.toDF("key", "value")
        .groupBy(col("key"),
          Sketches.histogramBin(col("value"), 128, 0.0, 512.0).as("bin"))
        .count()
        .orderBy("key", "bin").collect().toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("CMS grid cells merge across micro-batches == batch grid") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val words = (1 to 2000).map(i => s"w${i % 37}")
    val ms = MemoryStream[String]
    val grid = Sketches.cmsCells(ms.toDS().toDF("word"), col("word"),
      depth = 4, width = 64)
    val q = grid.writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      ms.addData(words.take(300))
      q.processAllAvailable()
      ms.addData(words.drop(300))
      q.processAllAvailable()
      val streamed = spark.table("cms_stream")
        .orderBy("k", "cell").collect().toSeq
      val batch = Sketches.cmsCells(words.toDF("word"), col("word"),
          depth = 4, width = 64)
        .orderBy("k", "cell").collect().toSeq
      assert(streamed.nonEmpty && streamed == batch,
        "the heavy-hitter gate's grid is incrementally maintainable")
    } finally q.stop()
  }

  test("minhash-union source sketch: slot-wise min across micro-batches == batch") {
    // the source_overlap_sketch artifact maintained AT INGEST: min is
    // the streaming-aggregable state, so the stored (source, slot, mh)
    // table stays current without any corpus rescan
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf())
      .select(col("source"), col("text")).limit(400)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val ms = MemoryStream[(String, String)]
    val slots = ms.toDS().toDF("source", "text")
      .select(col("source").as("src"),
        posexplode(graft.plans.native.minhash_sig(col("text"), 16, 3))
          .as(Seq("slot", "h")))
      .groupBy(col("src"), col("slot")).agg(min(col("h")).as("mh"))
    val q = slots.writeStream.format("memory").queryName("mh_stream")
      .outputMode("complete").start()
    try {
      ms.addData(docs.take(150))
      q.processAllAvailable()
      ms.addData(docs.drop(150))
      q.processAllAvailable()
      val streamed = spark.table("mh_stream")
        .orderBy("src", "slot").collect().toSeq
      val batch = graft.operators.Dedup.sourceMinhashSlots(
          docs.toDF("source", "text"))
        .orderBy("src", "slot").collect().toSeq
      assert(streamed.nonEmpty && streamed == batch,
        "the overlap sketch is incrementally maintainable at ingest")
    } finally q.stop()
  }

  test("HLL registers: max across micro-batches == batch registers") {
    // the cardinality sketch maintained AT INGEST: max(rho) is the
    // streaming-aggregable state (duplicate re-deliveries are even
    // absorbed for free — no distinct pass like KMV's), so the stored
    // (group, bucket, m_j) table stays current without any rescan
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val data = (1 to 2500).map(i => (s"g${i % 4}", (i % 700).toLong))
    val ms = MemoryStream[(String, Long)]
    val regs = Sketches.hllRegisters(ms.toDS().toDF("g", "v"),
      Seq("g"), col("v"))
    val q = regs.writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      ms.addData(data.take(400))
      q.processAllAvailable()
      ms.addData(data.slice(400, 400)) // an empty micro-batch is a no-op
      ms.addData(data.drop(400))
      q.processAllAvailable()
      val streamed = spark.table("hll_stream")
        .orderBy("g", "bucket").collect().toSeq
      val batch = Sketches.hllRegisters(data.toDF("g", "v"),
          Seq("g"), col("v"))
        .orderBy("g", "bucket").collect().toSeq
      assert(streamed.nonEmpty && streamed == batch,
        "the HLL register table is incrementally maintainable at ingest")
    } finally q.stop()
  }
}
