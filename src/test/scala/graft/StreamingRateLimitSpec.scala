package graft

import graft.operators.{SyncConfig, SyncPipeline}
import graft.streaming.StreamingRateLimit
import graft.streaming.StreamingRateLimit.RlMsg
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Cross-batch rate limiting: the stateful limiter must hold the
  * per-(app, second) limit even when a second's messages span multiple
  * micro-batches — the case where per-batch window admission over-admits. */
class StreamingRateLimitSpec extends SparkSpec {

  private val cfg = SyncConfig(rateLimits = Map("app_a" -> 2))

  // 6 msgs for app_a in ONE second + 3 for unlimited app_b, split so the
  // hot second spans both micro-batch files
  private def msg(id: Long, app: String) =
    RlMsg(id, "t", new Timestamp(1700000000000L + id), s"""{"app": "$app"}""", app)
  private val batch1 = Seq(msg(1, "app_a"), msg(2, "app_a"), msg(3, "app_a"),
    msg(4, "app_b"))
  private val batch2 = Seq(msg(5, "app_a"), msg(6, "app_a"), msg(7, "app_a"),
    msg(8, "app_b"), msg(9, "app_b"))

  test("stateful limiter enforces the limit across micro-batches") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-rl").toString
    batch1.toDS().repartition(1).write.mode("append").parquet(s"$tmp/src")
    // distinct mod-times so FileStreamSource orders batch1 before batch2
    Thread.sleep(1100)
    batch2.toDS().repartition(1).write.mode("append").parquet(s"$tmp/src")

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[RlMsg]].schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/src")
      .as[RlMsg]
    val q = StreamingRateLimit(cfg)(stream).writeStream
      .format("memory").queryName("rl_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val admitted = spark.table("rl_out").as[RlMsg].collect().toSeq

    // app_a: ONE hot second, limit 2 → exactly 2 admitted over BOTH
    // batches (per-batch admission would let 2 per batch through)
    assert(admitted.count(_.app == "app_a") === 2)
    // unconfigured app passes through untouched
    assert(admitted.count(_.app == "app_b") === 3)

    // per-(app, second) admitted counts equal the batch limiter on the
    // union — the stateful stage computes the same admission totals
    val all = (batch1 ++ batch2).toDS().toDF()
    val batchAdmitted = SyncPipeline.rateLimit(cfg)(all)
    val batchCounts = batchAdmitted
      .groupBy(col("app"), date_trunc("second", col("publish_time")))
      .count().collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2))).toSet
    val streamCounts = admitted.toDS().toDF()
      .groupBy(col("app"), date_trunc("second", col("publish_time")))
      .count().collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2))).toSet
    assert(streamCounts === batchCounts)

    // MEASURED state bound: one state row per app ever seen (app_a,
    // app_b) — the per-app counts map inside each row is horizon-pruned
    // to ≤ stateHorizonWindows windows, so state is O(apps), not O(msgs)
    assert(stateRows(q) == 2,
      s"limiter state rows ${stateRows(q)} != 2 distinct apps")
  }

  test("restart recovery: limiter state survives a query restart from checkpoint") {
    // the crash-recovery guarantee the quota gate already proves, for
    // the limiter: two SEPARATE AvailableNow runs share a checkpoint —
    // run 2 must restore run 1's per-(app, window) admitted counts, or
    // the hot second would admit 2 MORE messages after the restart
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-rl-ckpt").toString
    val schema = implicitly[org.apache.spark.sql.Encoder[RlMsg]].schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .parquet(s"$tmp/src").as[RlMsg]
      val q = StreamingRateLimit(cfg)(stream).writeStream
        .format("parquet").option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000))
    }
    batch1.toDS().repartition(1).write.mode("append").parquet(s"$tmp/src")
    run() // admits 2 of app_a's hot second (+ 1 app_b)
    batch2.toDS().repartition(1).write.mode("append").parquet(s"$tmp/src")
    run() // fresh query object, SAME checkpoint: hot second exhausted
    val admitted = spark.read.parquet(s"$tmp/out").as[RlMsg].collect().toSeq
    assert(admitted.count(_.app == "app_a") === 2,
      "a restart must not re-admit the exhausted hot second")
    assert(admitted.count(_.app == "app_b") === 3)
  }

  test("in-order arrival admits the exact batch-limiter message set") {
    import spark.implicits._
    // single micro-batch (no split): stateful == batch window exactly,
    // including WHICH messages survive (first-by publish_time, msg_id)
    val tmp = Files.createTempDirectory("graft-rl2").toString
    (batch1 ++ batch2).toDS().repartition(1).write.parquet(s"$tmp/src")
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[RlMsg]].schema)
      .parquet(s"$tmp/src").as[RlMsg]
    val q = StreamingRateLimit(cfg)(stream).writeStream
      .format("memory").queryName("rl_out2").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamedIds = spark.table("rl_out2").as[RlMsg]
      .collect().map(_.msg_id).toSet
    val batchIds = SyncPipeline.rateLimit(cfg)((batch1 ++ batch2).toDS().toDF())
      .select("msg_id").collect().map(_.getLong(0)).toSet
    assert(streamedIds === batchIds)
  }
}
