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

  /** Metrics accumulated across batches (driver-side small aggregate). */
  def readIndexed(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
