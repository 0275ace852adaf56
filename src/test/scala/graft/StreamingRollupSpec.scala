package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** agg_incremental's contract at ingest: the algebraic state triple
  * (decimal sum, count, max) maintained by a streaming aggregation
  * across uneven micro-batches must equal the one-shot batch aggregate —
  * the same state ⊕ delta algebra, driven by the streaming runtime
  * instead of an explicit merge. */
class StreamingRollupSpec extends SparkSpec {

  test("incremental rollup state across micro-batches == full recompute") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val data = (1 to 900).map(i => ((i % 7).toLong, (i % 131) + 0.25))
    def rollup(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("k"))
      .agg(round(sum(col("v").cast(DecimalType(12, 2))), 2)
          .cast("double").as("total"),
        count(lit(1)).as("n"), max(col("v")).as("mx"))
    val ms = MemoryStream[(Long, Double)]
    val q = rollup(ms.toDS().toDF("k", "v"))
      .writeStream.format("memory").queryName("rollup_stream")
      .outputMode("complete").start()
    try {
      // three uneven batches, including a batch touching only one key —
      // per-key state must merge independently
      ms.addData(data.take(50))
      q.processAllAvailable()
      ms.addData(data.slice(50, 700))
      q.processAllAvailable()
      ms.addData(data.drop(700) ++ Seq((3L, 999.75)))
      q.processAllAvailable()
      val streamed = spark.table("rollup_stream")
        .orderBy("k").collect().toSeq
      val batch = rollup((data ++ Seq((3L, 999.75))).toDF("k", "v"))
        .orderBy("k").collect().toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }
}
