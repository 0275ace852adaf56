package graft

import graft.streaming.StreamingQuota
import graft.streaming.StreamingQuota.{Admitted, Arrival}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The ingest-time per-domain quota must equal the batch arrival-order
  * relation on a single batch, and must carry admitted-counts across
  * micro-batches so a domain's budget is global, not per-batch. */
class StreamingQuotaSpec extends SparkSpec {

  test("single batch: streaming quota == batch arrival-order relation") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val arrivals = (1L to 40L).map(i => Arrival(i, s"d${i % 4}"))
    val ms = MemoryStream[Arrival]
    val q = StreamingQuota.quotaGate(ms.toDS(), cap = 3)
      .writeStream.format("memory").queryName("quota_one")
      .outputMode("append").start()
    try {
      ms.addData(arrivals)
      q.processAllAvailable()
      val streamed = spark.table("quota_one")
        .as[Admitted].collect().map(a => (a.doc_id, a.domain, a.slot)).toSet
      val batch = StreamingQuota.batchQuota(
          arrivals.toDF("doc_id", "domain"), cap = 3)
        .as[(Long, String, Long)].collect().toSet
      assert(streamed.size == 12) // 4 domains × cap 3
      assert(streamed == batch)
    } finally q.stop()
  }

  test("cross-batch: the budget is global — a domain exhausted in batch 1 admits nothing later") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Arrival]
    val q = StreamingQuota.quotaGate(ms.toDS(), cap = 2)
      .writeStream.format("memory").queryName("quota_two")
      .outputMode("append").start()
    try {
      ms.addData(Seq(Arrival(1, "a"), Arrival(2, "a"), Arrival(3, "b")))
      q.processAllAvailable()
      // a filled its quota (slots 1,2); b holds one slot
      assert(spark.table("quota_two").count() == 3)
      ms.addData(Seq(Arrival(4, "a"), Arrival(5, "b"), Arrival(6, "b"),
        Arrival(7, "b")))
      q.processAllAvailable()
      val all = spark.table("quota_two")
        .as[Admitted].collect().map(a => (a.doc_id, a.domain, a.slot)).toSet
      // doc 4 dropped (a exhausted); b admits 5 then 6 (slot 2 then... cap 2
      // → only doc 5 fits), doc 6 and 7 dropped
      assert(all == Set((1L, "a", 1L), (2L, "a", 2L), (3L, "b", 1L),
        (5L, "b", 2L)))
      // MEASURED state bound: one counter row per domain ever seen —
      // O(domains), independent of arrival count
      assert(stateRows(q) == 2,
        s"quota state rows ${stateRows(q)} != 2 distinct domains")
    } finally q.stop()
  }

  test("restart recovery: quota state survives a full query stop/restart from checkpoint") {
    // the crash-recovery guarantee: two SEPARATE AvailableNow runs share
    // a checkpoint — run 2 must restore run 1's admitted-counts from
    // state store, not re-admit an exhausted domain
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-quota-ckpt").toString
    val schema = Seq.empty[Arrival].toDS().schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$tmp/src")
      val q = StreamingQuota.quotaGate(stream.as[Arrival], cap = 2)
        .writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    Seq(Arrival(1, "a"), Arrival(2, "a"), Arrival(3, "b")).toDS()
      .write.mode("append").parquet(s"$tmp/src")
    run() // run 1: a fills its quota (1,2), b admits one
    Seq(Arrival(4, "a"), Arrival(5, "b"), Arrival(6, "b")).toDS()
      .write.mode("append").parquet(s"$tmp/src")
    run() // run 2, fresh query object, SAME checkpoint
    val all = spark.read.parquet(s"$tmp/out").as[Admitted]
      .collect().map(a => (a.doc_id, a.domain, a.slot)).toSet
    // doc 4 must be dropped — only a restored admitted-count can know
    // domain a was exhausted in the PREVIOUS run
    assert(all == Set((1L, "a", 1L), (2L, "a", 2L), (3L, "b", 1L),
      (5L, "b", 2L)))
  }
}
