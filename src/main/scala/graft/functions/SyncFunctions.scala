package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** The reference pipeline's message-level semantics as composable, codegen'd
  * Column functions (no UDFs). Reference cites point into
  * /root/reference/src (studied for behavior only; engine is Spark-first).
  */
object SyncFunctions {

  /** Default app when the JSON has no string-typed `app` key
    * (reference: es.rs:351). */
  val DefaultApp = "__DEFAULT_APP__"

  /** Extract the topic part of a Pulsar-style topic URI
    * `{type}://{tenant}/{namespace}/{topic}` (reference: util.rs:53-57).
    * Non-URI inputs pass through unchanged. */
  def topicPart(c: Column): Column =
    when(c.contains("://"), element_at(split(c, "/"), -1)).otherwise(c)

  /** Collapse a partitioned topic `foo-partition-3` → `foo`
    * (reference: es.rs:27-29, 252-259). */
  def collapsePartitionTopic(c: Column): Column = {
    val base = regexp_extract(c, "^(.*)-partition-\\d+", 1)
    when(base =!= "", base).otherwise(c)
  }

  /** Elasticsearch-style date bucket `yyyy.MM.dd` from an event-time column
    * (reference: util.rs:38-48; the engine uses UTC, not server-local). */
  def dateStr(ts: Column): Column = date_format(ts, "yyyy.MM.dd")

  /** Index name `{topic}-{yyyy.MM.dd}` (reference: util.rs:13-21). */
  def esIndex(topic: Column, ts: Column): Column =
    concat(topic, lit("-"), dateStr(ts))

  /** First-match prefix-anchored index rewrite (reference: es.rs:203-248):
    * rules are (pattern, target) tried in order against the
    * partition-collapsed topic; the target has any ".*" stripped; no match
    * keeps the topic. */
  def rewriteIndex(topic: Column, rules: Seq[(String, String)]): Column = {
    val collapsed = collapsePartitionTopic(topic)
    rules.foldRight(collapsed) { case ((pat, target), acc) =>
      when(regexp_like(collapsed, lit("^" + pat)),
        lit(target.replace(".*", ""))).otherwise(acc)
    }
  }

  /** True when the raw message matches any of the regex patterns (the
    * reference's RegexSet drop-filters, pulsar.rs:246-252 / 264-275). */
  def matchesAny(raw: Column, patterns: Seq[String]): Column =
    patterns.map(p => regexp_like(raw, lit(p)))
      .reduceOption(_ || _).getOrElse(lit(false))

  /** Topic-regex subscription predicate (reference: pulsar.rs:101-123 —
    * consumers discover the topic set by regex): matches against the
    * topic part of a possibly URI-shaped topic name, mirroring the
    * broker's namespace-scoped topic listing. */
  def topicMatches(topic: Column, pattern: String): Column =
    regexp_like(topicPart(topic), lit(pattern))

  /** String-typed `app` key of the JSON message, else [[DefaultApp]]
    * (reference: util.rs:167-172 — only Value::String counts, so a numeric
    * `app` falls back to the default; hence the quoted-string regex rather
    * than get_json_object, which erases the JSON type). */
  def appOf(raw: Column): Column = {
    val app = regexp_extract(raw, "\"app\"\\s*:\\s*\"([^\"]*)\"", 1)
    when(app =!= "", app).otherwise(lit(DefaultApp))
  }

  /** Debug-log classification (reference: util.rs:141-164): JSON
    * `level == "debug"` OR the raw message matches any debug pattern. */
  def isDebugLog(raw: Column, patterns: Seq[String]): Column =
    (get_json_object(raw, "$.level") === "debug") <=> lit(true) ||
      matchesAny(raw, patterns)

  /** Number of top-level keys of the JSON document
    * (reference: util.rs:151-156; 0 for non-objects). */
  def fieldCount(raw: Column): Column =
    coalesce(size(json_object_keys(raw)), lit(0))

  /** Resolve `@timestamp` (reference: es.rs:61-97): when `timeKey` is given
    * and is a numeric JSON field, interpret it as epoch *milliseconds* —
    * INCLUDING the fractional part (es.rs:51-58 converts the f64 ms value
    * to nanoseconds; Spark timestamps are micros, so the fraction is
    * carried to microsecond precision, truncating like Rust's `as`
    * conversion). Otherwise fall back to the message publish time. */
  def resolveTimestamp(raw: Column, timeKey: Option[String],
      publishTime: Column): Column =
    timeKey match {
      case None => publishTime
      case Some(k) =>
        // numeric-typed check: the raw value must not be quoted
        val numStr = regexp_extract(raw,
          "\"" + k + "\"\\s*:\\s*(-?[0-9]+(\\.[0-9]+)?)", 1)
        val millis = when(numStr =!= "", numStr.cast("double"))
        coalesce(timestamp_micros(floor(millis * 1000).cast("long")),
          publishTime)
    }

  /** Debug key injection (reference: pulsar.rs:277-281, es.rs:346-348):
    * adds `__INJECTED_DATA__` to the JSON document. The reference uses a
    * random UUIDv4; `deterministic = true` derives a stable id from the
    * message id instead (for replayable pipelines / the oracle gate). */
  def injectKey(raw: Column, msgId: Column, deterministic: Boolean,
      keyName: String = "__INJECTED_DATA__"): Column = {
    val idVal =
      if (deterministic) concat(lit("msg-"), msgId.cast("string"))
      else expr("uuid()")
    // the empty object `{}` strips to just "{": no comma before the
    // injected key (the reference inserts into a parsed map, which
    // handles empty objects for free)
    val stripped = regexp_replace(raw, "\\}\\s*$", "")
    val sep = when(stripped.rlike("^\\s*\\{\\s*$"), lit(""))
      .otherwise(lit(", "))
    concat(stripped, sep, lit("\"" + keyName + "\": \""), idVal, lit("\"}"))
  }

  /** The final Elasticsearch-style document (reference transform output,
    * es.rs:77-107): `@timestamp` first (RFC3339 micros), then the
    * original fields (spliced after the opening brace, preserving field
    * order exactly as the reference's insertion-ordered map does). Key
    * sanitization for nested docs goes through the native Jackson
    * expression ([[graft.plans.SanitizeJsonKeysExpr]]); pass
    * `sanitize = false` when keys are known clean to keep the raw
    * byte-exact field formatting. */
  def buildDocument(raw: Column, tsResolved: Column,
      sanitize: Boolean = false): Column = {
    val body =
      if (sanitize) graft.plans.native.sanitize_json_keys(raw)
      else raw
    // the empty object `{}` leaves only "}" after the brace strip: no
    // comma after @timestamp (a trailing comma is invalid JSON)
    val rest = regexp_replace(body, "^\\{\\s*", "")
    val sep = when(rest.rlike("^\\s*\\}\\s*$"), lit("")).otherwise(lit(", "))
    concat(lit("{\"@timestamp\": \""),
      date_format(tsResolved, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
      lit("\""), sep, rest)
  }

  /** Recursive JSON key sanitization `.` → `_` for flat string maps
    * (reference: es.rs:77-107). Deeply-nested documents use the native
    * expression in graft.plans; this built-in-only variant covers the
    * flat-object case the reference's own test exercises. */
  def sanitizeKeysFlat(raw: Column): Column = {
    val m = from_json(raw, MapType(StringType, StringType))
    to_json(transform_keys(m, (k, _) => regexp_replace(k, "\\.", "_")))
  }
}
