package graft.streaming

import graft.operators.{SyncConfig, SyncPipeline}
import graft.sinks.IndexedParquetSink
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's consume→sink loop (pulsar.rs consume_loop +
  * es.rs sink_elasticsearch_loop) as Structured Streaming.
  *
  * Mapping: the Pulsar subscription is a streaming source over the message
  * shape `(msg_id, topic, publish_time, data)`; the per-message transforms
  * (filters, parse, enrich) run as narrow streaming projections; the
  * reference's buffer_size/flush_interval buffering IS the micro-batch —
  * rate-limit admission and bulk batching are applied inside foreachBatch,
  * exactly where the reference applies them (at sink time, over the
  * buffered batch), then written to the indexed store with bulk metrics.
  * A real deployment swaps the file source for a Pulsar/Kafka source and
  * the trigger for ProcessingTime(flush_interval). */
object StreamingSync {

  val messageSchema: StructType = StructType(Seq(
    StructField("msg_id", LongType),
    StructField("topic", StringType),
    StructField("publish_time", TimestampType),
    StructField("data", StringType)))

  /** File-based streaming source of messages (the test stand-in for the
    * Pulsar consumer; one file = one consumer batch). `batchFiles` bounds
    * files per micro-batch — the analog of the reference's consumer
    * --batch-size (args.rs:101-103), i.e. ingestion backpressure.
    * Delegates to the [[graft.sources.Connectors]] seam: a deployment
    * selects a different connector by config name instead of editing
    * this file. */
  def readMessageStream(spark: SparkSession, dir: String,
      batchFiles: Option[Int] = None): DataFrame =
    graft.sources.Connectors.ParquetMessages.readStream(spark, dir, batchFiles)

  /** Exactly-once message admission under redelivery: drop duplicate
    * msg_ids within the watermark horizon (the engine-side counterpart of
    * Pulsar's broker deduplication — the reference relies on
    * `deduplicationStatus: Enabled`). State is bounded by the watermark:
    * ids older than `horizon` are forgotten, so memory is
    * O(messages per horizon), not O(stream). */
  def dedupMessages(horizon: String = "1 hour")(stream: DataFrame): DataFrame =
    stream.withWatermark("publish_time", horizon)
      .dropDuplicates("msg_id", "publish_time")

  /** The narrow transform chain shared verbatim with the batch pipeline —
    * single source of truth for the sync semantics. */
  def transform(cfg: SyncConfig)(stream: DataFrame): DataFrame =
    stream.transform(SyncPipeline.globalFilter(cfg))
      .transform(SyncPipeline.parseable)
      .transform(SyncPipeline.namespaceFilter(cfg))
      .transform(SyncPipeline.enrich(cfg))

  /** Start the full sync: source → transforms → per-batch admission →
    * indexed sink. `availableNow` drains what's there and stops (tests);
    * otherwise runs on a processing-time trigger = flush_interval.
    *
    * `failedDocPattern` models the per-item bulk failures of the
    * reference's ES response handling (es.rs:133-191): matching docs are
    * diverted to `<sinkPath>/_failed` (the failed-payload log), counted
    * in the bulk metrics (`failed` column) and in the
    * `graft_es_write_failed_total` counter. The write itself runs under
    * [[IndexedParquetSink.withRetries]] — the connect/retry loop analog;
    * exhausted retries fail the micro-batch, which the checkpoint
    * replays (broker redelivery). */
  def start(spark: SparkSession, cfg: SyncConfig, sourceDir: String,
      sinkPath: String, metricsPath: String,
      availableNow: Boolean = false,
      // None → the config's --flush-interval (args.rs:117-119); Some(ms)
      // remains for call sites that override per-run
      flushIntervalMs: Option[Long] = None,
      batchFiles: Option[Int] = None,
      failedDocPattern: Option[String] = None,
      maxRetries: Int = 3,
      source: graft.sources.Connectors.MessageConnector =
        graft.sources.Connectors.ParquetMessages,
      sink: graft.sources.Connectors.BulkSinkConnector =
        graft.sources.Connectors.IndexedParquetBulk): StreamingQuery = {
    // the FULL subscription descriptor goes to the connector (r11):
    // connection-identity knobs travel config → seam verbatim; the
    // file stand-ins ignore the client fields, a Pulsar binding uses
    // them
    val out = transform(cfg)(source.readStreamWith(spark,
      graft.sources.Connectors.subscriptionFor(cfg, sourceDir, batchFiles)))
    val writer = out.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val admitted = SyncPipeline.rateLimit(cfg)(batch)
          .select("msg_id", "topic", "publish_time", "data",
            "index", "app", "ts_resolved", "is_debug", "field_count")
        // batchId makes the store write idempotent under checkpoint
        // replay (commit-marker protocol): a replayed batch skips if
        // committed, scrubs-and-rewrites if it died mid-write
        val metrics = IndexedParquetSink.withRetries(maxRetries) { () =>
          sink.writeBatch(admitted, sinkPath,
            failedDocPattern.map(p =>
              org.apache.spark.sql.functions.col("data").rlike(p)),
            failedDocPattern.map(_ => s"$sinkPath/_failed"),
            batchId = Some(batchId))
        }
        // prometheus-style counters are observability: at-least-once
        // under a post-marker-crash replay is acceptable (and matches
        // the reference's counter semantics). The metrics STORE is not:
        // it feeds written==stored audits, so each batch OVERWRITES its
        // own bid=<id> directory — a replay rewrites the same rows
        // instead of appending duplicates (idempotent like the sink
        // itself). batch_id stays a LongType DATA column so readers
        // keep the schema they always had (`bid` is only the partition
        // key the overwrite scopes to); a store from the old
        // append-at-root layout must be drained before pointing the
        // sync at it (mixed layouts fail partition discovery).
        SyncMetrics.recordBulk(metrics)
        metrics.withColumn("batch_id",
            org.apache.spark.sql.functions.lit(batchId))
          .write.mode("overwrite").parquet(s"$metricsPath/bid=$batchId")
        ()
      }
      .option("checkpointLocation", s"$sinkPath/_checkpoint")
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime(
       flushIntervalMs.getOrElse(cfg.flushIntervalMs)))).start()
  }
}
