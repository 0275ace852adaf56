package graft.operators

import graft.functions.SyncFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Configuration of a sync pipeline — the engine analog of the reference's
  * CLI surface (reference: args.rs). Regex filters drop messages; rewrite
  * rules re-route indices; rate limits admit N docs per app per second. */
final case class SyncConfig(
    globalFilters: Seq[String] = Nil,
    namespaceFilters: Map[String, Seq[String]] = Map.empty,
    rewriteRules: Seq[(String, String)] = Nil,
    timeKey: Option[String] = None,
    debugLogPatterns: Seq[String] = Nil,
    rateLimits: Map[String, Int] = Map.empty,
    /** admission window granularity: "second" (reference semantics),
      * "minute", "hour" — the refill period of the batch token bucket */
    rateLimitWindow: String = "second",
    bufferSize: Int = 1000)

/** The reference's consume→transform→route→buffer pipeline (pulsar.rs
  * consume_loop + es.rs sink_elasticsearch_loop) re-expressed as a
  * declarative Spark plan over a message DataFrame with columns
  * `(msg_id: long, topic: string, publish_time: timestamp, data: string)`.
  *
  * Every stage is a narrow projection/filter (no shuffle) except the
  * explicitly-wide admission/batching windows, which partition by app /
  * index — never a global window — so the plan scales linearly with
  * executors at 100 TB.
  */
object SyncPipeline {

  /** Drop empty messages and messages matching any global filter
    * (pulsar.rs:241-252). */
  def globalFilter(cfg: SyncConfig)(df: DataFrame): DataFrame = {
    val kept = df.filter(col("data").isNotNull && col("data") =!= "")
    if (cfg.globalFilters.isEmpty) kept
    else kept.filter(!matchesAny(col("data"), cfg.globalFilters))
  }

  /** Drop messages matching their topic's namespace filter set
    * (pulsar.rs:264-275). */
  def namespaceFilter(cfg: SyncConfig)(df: DataFrame): DataFrame =
    cfg.namespaceFilters.foldLeft(df) { case (acc, (ns, pats)) =>
      acc.filter(col("topic") =!= ns || !matchesAny(col("data"), pats))
    }

  /** Keep only JSON-object messages (es.rs:124-127: non-JSON is dropped). */
  def parseable(df: DataFrame): DataFrame =
    df.filter(get_json_object(col("data"), "$") .isNotNull &&
      col("data").rlike("^\\s*\\{"))

  /** Add derived columns: collapsed topic, date bucket, rewritten index,
    * app, @timestamp, debug flag, field count. One narrow projection. */
  def enrich(cfg: SyncConfig)(df: DataFrame): DataFrame = {
    val topic = collapsePartitionTopic(topicPart(col("topic")))
    df.withColumn("topic_base", topic)
      .withColumn("date_str", dateStr(col("publish_time")))
      // the index derives from the TOPIC PART: for URI-shaped topics
      // (persistent://tenant/ns/topic, util.rs:13-21) the tenant/ns
      // prefix must not leak into the index name
      .withColumn("index",
        concat(rewriteIndex(topicPart(col("topic")), cfg.rewriteRules),
          lit("-"), col("date_str")))
      .withColumn("app", appOf(col("data")))
      .withColumn("ts_resolved",
        resolveTimestamp(col("data"), cfg.timeKey, col("publish_time")))
      .withColumn("is_debug", isDebugLog(col("data"), cfg.debugLogPatterns))
      .withColumn("field_count", fieldCount(col("data")))
  }

  /** Per-app per-second admission in arrival order (ratelimiter.rs):
    * batch semantics of a token-bucket with per-second refill — the first
    * `limit(app)` messages in each (app, second) survive. Apps without a
    * configured limit pass through. Window partitions by (app, second):
    * bounded state, shuffle on the app key only. */
  def rateLimit(cfg: SyncConfig)(df: DataFrame): DataFrame = {
    if (cfg.rateLimits.isEmpty) df
    else {
      val sec = date_trunc(cfg.rateLimitWindow, col("publish_time"))
      val w = Window.partitionBy(col("app"), sec)
        .orderBy(col("publish_time"), col("msg_id"))
      val limit = cfg.rateLimits.foldRight(lit(Int.MaxValue)) {
        case ((app, n), acc) => when(col("app") === app, lit(n)).otherwise(acc)
      }
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= limit).drop("__rn")
    }
  }

  /** Assign bulk-batch ids per index in arrival order (es.rs:301: every
    * buffer_size docs per flush group become one bulk request). */
  def bulkBatches(cfg: SyncConfig)(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("index"))
      .orderBy(col("publish_time"), col("msg_id"))
    df.withColumn("batch_id",
      floor((row_number().over(w) - 1) / cfg.bufferSize))
  }

  /** Full pipeline: filters → parse → enrich → rate limit. */
  def apply(cfg: SyncConfig)(df: DataFrame): DataFrame =
    df.transform(globalFilter(cfg))
      .transform(parseable)
      .transform(namespaceFilter(cfg))
      .transform(enrich(cfg))
      .transform(rateLimit(cfg))
}
