package graft

import graft.streaming.StreamingIntervalJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-stream interval join ≡ the batch range join on the same data —
  * including matches that arrive in DIFFERENT micro-batches (the case a
  * per-batch join would miss: the impression buffers in state until its
  * conversion shows up). */
class StreamingJoinSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(3600000L + min * 60000L)

  test("interval join across micro-batches == batch range join") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // impressions: user u, minute m; conversions some minutes later —
    // inside (≤ 60 min) and outside (> 60 min) the attribution window
    val imps = (0 until 40).map(i => (i.toLong % 5, ts(i), i.toLong))
    val convs = Seq(
      (0L, ts(30), 100L),   // matches imps at minutes 0..30 for user 0
      (1L, ts(90), 101L),   // matches minutes 31..90 window for user 1
      (2L, ts(200), 102L))  // beyond every impression's 60-min window? minute 140..200
    val msI = MemoryStream[(Long, Timestamp, Long)]
    val msC = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamingIntervalJoin.attribute(
      msI.toDS().toDF("user_id", "imp_ts", "imp_id"),
      msC.toDS().toDF("c_user_id", "conv_ts", "conv_id"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      // impressions arrive FIRST (buffer in state), conversions later —
      // and in separate micro-batches
      msI.addData(imps.take(20))
      q.processAllAvailable()
      msC.addData(convs.take(1))
      q.processAllAvailable()
      msI.addData(imps.drop(20))
      msC.addData(convs.drop(1))
      q.processAllAvailable()
      val streamed = spark.table("ssj")
        .orderBy("user_id", "imp_id", "conv_id").collect().toSeq
      val batch = StreamingIntervalJoin.attribute(
          imps.toDF("user_id", "imp_ts", "imp_id"),
          convs.toDF("c_user_id", "conv_ts", "conv_id"))
        .orderBy("user_id", "imp_id", "conv_id").collect().toSeq
      assert(streamed.nonEmpty, "the join must produce matches")
      assert(streamed == batch,
        "stream-stream interval join must equal the batch range join")
      // sanity: every emitted pair respects the window
      assert(streamed.forall { r =>
        val d = (r.getTimestamp(4).getTime - r.getTimestamp(3).getTime) / 1000
        d >= 0 && d <= 3600
      })
    } finally q.stop()
  }
}
