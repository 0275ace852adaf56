package graft.sources

import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables. Reads are plain
  * `spark.read.parquet` so Catalyst keeps full pushdown/pruning freedom;
  * at cluster scale the same call reads a partitioned 100 TB dataset. */
object Tables {
  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** The events table, with `ts` normalized to BIGINT epoch-nanos — the
    * shape every downstream consumer assumes. The driver has shipped the
    * column under two physical layouts (TIMESTAMP(NANOS), read as a long
    * via nanosAsLong, and timestamp[us], read as TIMESTAMP_NTZ), so the
    * read is schema-adaptive: branch on the decoded dtype here, at the one
    * seam, instead of letting 38 queries die at analysis time when the
    * layout flips. The NTZ→LTZ cast is identity because every session in
    * this repo pins spark.sql.session.timeZone=UTC, matching DuckDB's
    * naive read of the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    // keep the flag for the legacy nanos layout: without it any query
    // touching a TIMESTAMP(NANOS) ts column aborts — set here so every
    // events consumer is self-contained (a name-filtered Verify of a
    // single events query must not depend on another having run first)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df // legacy layout: already BIGINT nanos
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalStateException(s"unsupported events.ts dtype: $other")
    }
  }
  /** events with `ts` as a micros TIMESTAMP — the pushdown-friendly
    * shape for time-range scans. On the current timestamp[us] layout the
    * column passes through (NTZ→LTZ cast, identity under the repo-wide
    * UTC session tz), so `ts >= lit` predicates reach the parquet scan
    * as PushedFilters with row-group statistics — the scan shape a
    * 100 TB time-window query lives or dies by. On the legacy nanos
    * layout the value is computed (that layout exposes no timestamp
    * stats to Spark anyway). Same micros values as
    * `timestamp_micros(events.ts div 1000)` on BOTH layouts. */
  def eventsTime(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case TimestampType => df
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case other =>
        throw new IllegalStateException(s"unsupported events.ts dtype: $other")
    }
  }

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
