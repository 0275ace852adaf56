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
    } finally q.stop()
  }
}
