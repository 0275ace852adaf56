package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The engine's analog of the reference's Elasticsearch bulk sink
  * (es.rs:273-316): documents are routed to time-rotated "indices" —
  * here a parquet dataset partitioned by the `index` column — and each
  * flush produces per-(index, app) bulk metrics, the counterpart of the
  * reference's write success/failure counters (prometheus.rs).
  *
  * At cluster scale the partitioned write IS the bulk batching: each task
  * writes its index partitions independently (no shuffle beyond the
  * optional repartition on index to bound file counts), and downstream
  * consumers prune by index directory exactly like an ES index query. */
object IndexedParquetSink {

  /** Append one batch of enriched sync documents (must carry `index`,
    * `app` columns) to the indexed store; returns per-(index, app) bulk
    * metrics for observability. */
  def writeBatch(batch: DataFrame, path: String): DataFrame = {
    // Two actions run against the batch (write + metrics agg); the cache
    // keeps the second off the source. Note: the streaming progress
    // numInputRows still reports the batch size once per action — an
    // accounting quirk of multi-action foreachBatch, not a double scan
    // (sink row counts stay exact).
    batch.cache()
    try {
      batch.write.mode("append").partitionBy("index").parquet(path)
      batch.groupBy(col("index"), col("app"))
        .agg(count(lit(1)).as("written"))
    } finally batch.unpersist()
  }

  /** [[writeBatch]] with per-item bulk failure accounting (es.rs:133-191:
    * the reference parses the bulk response, counts failed items per
    * index, and logs the failed payloads). `isFailed` marks the docs the
    * bulk response would reject; they are diverted to the failed-docs
    * store (the payload log) instead of the index, and the returned
    * metrics carry per-(index, app) `written` AND `failed` counts. The
    * metrics aggregate is materialized while the batch is cached, so
    * consuming it later never rescans the source. */
  def writeBatchAccounted(batch: DataFrame, path: String,
      isFailed: org.apache.spark.sql.Column,
      failedPath: Option[String] = None): DataFrame = {
    val spark = batch.sparkSession
    batch.cache()
    try {
      batch.filter(!isFailed).write.mode("append")
        .partitionBy("index").parquet(path)
      failedPath.foreach { fp =>
        batch.filter(isFailed).write.mode("append")
          .partitionBy("index").parquet(fp)
      }
      val agg = batch.groupBy(col("index"), col("app"))
        .agg(sum(when(!isFailed, 1L).otherwise(0L)).as("written"),
          sum(when(isFailed, 1L).otherwise(0L)).as("failed"))
      val rows = agg.collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1), agg.schema)
    } finally batch.unpersist()
  }

  /** Transient-failure retry with linear backoff — the engine analog of
    * the reference's ES connect/retry loop (es.rs: connection retried on
    * startup; bulk errors logged and retried by redelivery). Each retry
    * bumps the `graft_es_retry_total` counter; attempts exhausted →
    * rethrow (the micro-batch fails and the checkpoint replays it, the
    * streaming counterpart of broker redelivery). */
  def withRetries[T](maxRetries: Int, backoffMs: Long = 0,
      label: String = "sink")(attempt: () => T): T = {
    var tries = 0
    while (true) {
      try return attempt()
      catch {
        case e: Throwable =>
          tries += 1
          if (tries > maxRetries) throw e
          graft.streaming.SyncMetrics.incBy("graft_es_retry_total",
            Seq("sink" -> label), 1)
          if (backoffMs > 0) Thread.sleep(backoffMs * tries)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Metrics accumulated across batches (driver-side small aggregate). */
  def readIndexed(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
