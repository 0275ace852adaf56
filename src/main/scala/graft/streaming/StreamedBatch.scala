package graft.streaming

import graft.operators.SyncConfig
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** Batch-twin runners for the stateful streaming operators — the seam
  * that promotes "streaming ≡ batch proven in a spec" to an ORACLE row:
  * each runner feeds a deterministic bounded input through the REAL
  * streaming operator (file source → flatMapGroupsWithState → memory
  * sink, Trigger.AvailableNow) and returns the emitted relation as a
  * DataFrame, which the driver then compares against the SAME DuckDB
  * SQL that anchors the batch operator.
  *
  * Determinism: the input is written as ONE parquet file and consumed
  * without maxFilesPerTrigger, so the whole stream is a single
  * micro-batch — the initial watermark (0) drops nothing as late, and
  * admission/session state starts empty, making the emitted set a pure
  * function of the data (proven equal to the batch window relations in
  * StreamingRateLimitSpec / ScaleTechniquesSpec; here the equality is
  * re-checked against the batch operator's own oracle SQL every round).
  */
object StreamedBatch {

  private val seq = new AtomicInteger(0)

  /** [[StreamingSessionize]] fed `events(user_id, ts)` plus one
    * far-future sentinel event per user: every REAL session closes by
    * successor inside the batch (the sentinel's own singleton session
    * stays open and never emits), so the emitted set is exactly the
    * batch sessionization — aggregated here to q_sessionize's
    * per-user (n_sessions, n_events) shape. */
  def sessionCounts(s: SparkSession, events: DataFrame,
      gapMinutes: Int): DataFrame = {
    import s.implicits._
    val evs = events.select(col("user_id").cast("long").as("user_id"),
      col("ts").cast("timestamp").as("ts"))
    val maxUs = evs.agg(max(unix_micros(col("ts")))).head.getLong(0)
    val sentinel = evs.select(col("user_id")).distinct()
      .withColumn("ts", timestamp_micros(lit(maxUs + 864000000000L)))
    val tmp = Files.createTempDirectory("graft-sess-twin").toString
    evs.unionByName(sentinel).coalesce(1).write.parquet(s"$tmp/src")
    val stream = s.readStream.schema("user_id LONG, ts TIMESTAMP")
      .parquet(s"$tmp/src").as[StreamingSessionize.Event]
    val qn = s"sess_twin_${seq.incrementAndGet()}"
    val q = StreamingSessionize.sessions(stream, gapMinutes)(s)
      .writeStream.format("memory").queryName(qn).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    s.table(qn).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events").cast("long")).as("n_events"))
  }

  /** [[StreamingRateLimit]] fed the enriched message stream: with one
    * micro-batch and empty initial state the stateful limiter admits
    * exactly the batch window's first-`limit` per (app, window) in
    * (publish_time µs, msg_id) order. Returns the admitted
    * (msg_id, app) relation. */
  def rateLimited(s: SparkSession, msgs: DataFrame,
      cfg: SyncConfig): DataFrame = {
    import s.implicits._
    val enc = implicitly[org.apache.spark.sql.Encoder[StreamingRateLimit.RlMsg]]
    val tmp = Files.createTempDirectory("graft-rl-twin").toString
    msgs.select(col("msg_id").cast("long"), col("topic"),
        col("publish_time").cast("timestamp"), col("data"), col("app"))
      .coalesce(1).write.parquet(s"$tmp/src")
    val stream = s.readStream.schema(enc.schema).parquet(s"$tmp/src")
      .as[StreamingRateLimit.RlMsg]
    val qn = s"rl_twin_${seq.incrementAndGet()}"
    val q = StreamingRateLimit(cfg)(stream)
      .writeStream.format("memory").queryName(qn).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    s.table(qn).select(col("msg_id"), col("app"))
  }
}
