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

  /** Replay-twin scratch dirs (source copies, checkpoints, state-store
    * deltas, store sinks) — bounded single-run artifacts deleted in the
    * runner's own `finally`, placed via [[graft.operators.Scratch]]
    * (tmpfs when available; r13 optimization). */
  private[graft] def twinTempDir(prefix: String): String =
    graft.operators.Scratch.tempDir(prefix)

  /** Monotone count of streaming replays started by this JVM — every
    * runner in this object ticks it. [[graft.Bench]] samples it around
    * each timed query to SPLIT the bench total into `batch_total` /
    * `replay_total` (r12, verdict #3): the ~26 replay rows pay real
    * multi-micro-batch checkpoint + state-store cost (seconds each at
    * ANY scale factor) and were masking batch-plan deltas inside one
    * aggregate number. Classification is observed at run time, so a new
    * replay row is split correctly with no list to maintain. */
  def replayRuns: Int = seq.get

  /** Tick the replay counter from a row that drives REAL streaming-query
    * lifecycles outside this object's runners (the watchdog replay, r13):
    * Bench's batch/replay split is observed around each timed run, so a
    * row paying query-startup + checkpoint cost must register here to be
    * classified with the other replay rows. */
  def noteReplay(): Unit = { seq.incrementAndGet(); () }

  /** Isolated-conf session for the twin's streaming run with the state
    * store right-sized to the bounded oracle input: the session default
    * (32) spreads a few thousand state rows over 32 store partitions ×
    * per-batch task overhead — measured 6.6 s → 2.9 s on the
    * stream-stream twin at 8. The PRODUCTION operators keep the
    * caller's partitioning (this clone only governs the runner);
    * results are partition-layout-independent (spec-proven for every
    * stateful operator, and the driver compare sorts). */
  private def streamSession(s: SparkSession): SparkSession = {
    val ss = s.newSession()
    // SPARK_GRAFT_TWIN_PARTITIONS parameterizes the twin's state-store
    // layout (r13): the replay inputs are bounded oracle corpora (a few
    // thousand rows), so per-micro-batch cost is per-PARTITION state
    // commit overhead, not compute — fewer partitions is strictly
    // cheaper until the corpus stops fitting one task. Measured on a
    // 13-row replay subset at sf0.1 (3 interleaved sweeps each,
    // same session): partitions 8 / 4 / 2 / 1 → subset totals
    // 115.9 / 96.8 / 69.9 / 60.6 s (q_attribution_multibatch alone
    // 27.5 → 7.0 s at 1). Results are byte-identical — partition-layout
    // independence is spec-proven for every stateful operator and the
    // oracle compare sorts. A deployment replaying production volumes
    // sets the env to its real parallelism; the PRODUCTION operators
    // keep the caller's partitioning (this clone only governs the
    // bounded runner).
    // Validated here (r14, ADVICE): a non-numeric value would otherwise
    // fail deep inside Spark with an opaque error. NOTE for new twins:
    // the default of 1 rests on every stateful twin being
    // partition-layout-INDEPENDENT (group iterators sorted by explicit
    // keys, spec-proven) — a future twin without that property must not
    // be added under this default.
    val twinParts = sys.env.getOrElse("SPARK_GRAFT_TWIN_PARTITIONS", "1")
    require(scala.util.Try(twinParts.trim.toInt).toOption.exists(_ > 0),
      s"SPARK_GRAFT_TWIN_PARTITIONS must be a positive integer, got '$twinParts'")
    ss.conf.set("spark.sql.shuffle.partitions", twinParts.trim)
    // State-store provider knob for the replay floor (r14, verdict #4):
    // lets an A/B pit RocksDB against the default HDFS-backed store on
    // the many-tiny-state-files workload (A/B table in
    // OPTIMIZATION_r14.md; the default stays whatever that table says).
    sys.env.get("SPARK_GRAFT_TWIN_STATE_PROVIDER").foreach(p =>
      ss.conf.set("spark.sql.streaming.stateStore.providerClass", p.trim))
    ss
  }

  /** Run `build`'s streaming query to completion against a one-file
    * parquet copy of `input`, then PIN the memory-sink relation as a
    * local DataFrame and clean up — the memory table is dropped and the
    * temp dir deleted, so repeated invocations (Bench runs every query
    * twice) leak neither driver memory nor disk. A timed-out query is
    * an ERROR, never a silently partial relation. */
  private def throughStream(s: SparkSession, input: DataFrame, name: String)
      (build: (SparkSession, String) => org.apache.spark.sql.streaming.DataStreamWriter[_])
      : DataFrame = {
    val tmp = twinTempDir(s"graft-$name-twin")
    val qn = s"${name}_twin_${seq.incrementAndGet()}"
    val ss = streamSession(s)
    try {
      input.coalesce(1).write.parquet(s"$tmp/src")
      // explicit checkpoint under the twin's scratch dir: a temp
      // checkpoint would otherwise land in java.io.tmpdir (r13)
      val q = build(ss, s"$tmp/src")
        .format("memory").queryName(qn).outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      if (!q.awaitTermination(300000)) {
        q.stop()
        throw new IllegalStateException(s"$qn did not drain within 300 s")
      }
      val sink = ss.table(qn)
      s.createDataFrame(
        s.sparkContext.parallelize(sink.collect().toIndexedSeq, 1),
        sink.schema)
    } finally { // failure paths must not leak the sink table or the copy
      try ss.catalog.dropTempView(qn) catch { case _: Exception => () }
      org.apache.hadoop.fs.FileSystem
        .get(new java.net.URI(tmp), s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(tmp), true)
      ()
    }
  }

  /** [[StreamingSessionize]] fed `events(user_id, ts)` plus one
    * far-future sentinel event per user: every REAL session closes by
    * successor inside the batch (the sentinel's own singleton session
    * stays open and never emits), so the emitted set is exactly the
    * batch sessionization — aggregated here to q_sessionize's
    * per-user (n_sessions, n_events) shape. */
  def sessionCounts(s: SparkSession, events: DataFrame,
      gapMinutes: Int): DataFrame = {
    import s.implicits._
    def agg(df: DataFrame): DataFrame = df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events").cast("long")).as("n_events"))
    val evs = events.select(col("user_id").cast("long").as("user_id"),
      col("ts").cast("timestamp").as("ts"))
    val maxRow = evs.agg(max(unix_micros(col("ts")))).head
    if (maxRow.isNullAt(0)) // empty relation: empty result, right schema
      return agg(evs.limit(0).withColumn("n_events", lit(0)))
    val maxUs = maxRow.getLong(0)
    val sentinel = evs.select(col("user_id")).distinct()
      .withColumn("ts", timestamp_micros(lit(maxUs + 864000000000L)))
    agg(throughStream(s, evs.unionByName(sentinel), "sess") { (ss, src) =>
      val stream = ss.readStream.schema("user_id LONG, ts TIMESTAMP")
        .parquet(src).as[StreamingSessionize.Event]
      StreamingSessionize.sessions(stream, gapMinutes)(ss).writeStream
    })
  }

  /** Complete-mode variant of [[throughStream]] for streaming
    * AGGREGATIONS (append mode would demand a watermark and emit
    * nothing for an unwindowed agg): the memory sink holds the final
    * aggregate table after the AvailableNow drain. Same pin-and-clean
    * contract. */
  private def throughStreamComplete(s: SparkSession, input: DataFrame,
      name: String)
      (build: (SparkSession, String) => org.apache.spark.sql.streaming.DataStreamWriter[_])
      : DataFrame = {
    val tmp = twinTempDir(s"graft-$name-twin")
    val qn = s"${name}_twin_${seq.incrementAndGet()}"
    val ss = streamSession(s)
    try {
      input.coalesce(1).write.parquet(s"$tmp/src")
      val q = build(ss, s"$tmp/src")
        .format("memory").queryName(qn).outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      if (!q.awaitTermination(300000)) {
        q.stop()
        throw new IllegalStateException(s"$qn did not drain within 300 s")
      }
      val sink = ss.table(qn)
      s.createDataFrame(
        s.sparkContext.parallelize(sink.collect().toIndexedSeq, 1),
        sink.schema)
    } finally {
      try ss.catalog.dropTempView(qn) catch { case _: Exception => () }
      org.apache.hadoop.fs.FileSystem
        .get(new java.net.URI(tmp), s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(tmp), true)
      ()
    }
  }

  /** Two-source variant of [[throughStream]] for stream-STREAM
    * operators (each side its own file source; both drain in the same
    * AvailableNow run). Same pin-and-clean contract. */
  private def throughStream2(s: SparkSession, left: DataFrame,
      right: DataFrame, name: String)
      (build: (SparkSession, String, String) => org.apache.spark.sql.streaming.DataStreamWriter[_])
      : DataFrame = {
    val tmp = twinTempDir(s"graft-$name-twin")
    val qn = s"${name}_twin_${seq.incrementAndGet()}"
    val ss = streamSession(s)
    try {
      left.coalesce(1).write.parquet(s"$tmp/left")
      right.coalesce(1).write.parquet(s"$tmp/right")
      val q = build(ss, s"$tmp/left", s"$tmp/right")
        .format("memory").queryName(qn).outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      if (!q.awaitTermination(300000)) {
        q.stop()
        throw new IllegalStateException(s"$qn did not drain within 300 s")
      }
      val sink = ss.table(qn)
      s.createDataFrame(
        s.sparkContext.parallelize(sink.collect().toIndexedSeq, 1),
        sink.schema)
    } finally {
      try ss.catalog.dropTempView(qn) catch { case _: Exception => () }
      org.apache.hadoop.fs.FileSystem
        .get(new java.net.URI(tmp), s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(tmp), true)
      ()
    }
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
    val input = msgs.select(col("msg_id").cast("long"), col("topic"),
      col("publish_time").cast("timestamp"), col("data"), col("app"))
    throughStream(s, input, "rl") { (ss, src) =>
      val stream = ss.readStream.schema(enc.schema).parquet(src)
        .as[StreamingRateLimit.RlMsg]
      StreamingRateLimit(cfg)(stream).writeStream
    }.select(col("msg_id"), col("app"))
  }

  /** [[StreamingQuota]] fed `(doc_id, domain)`: one micro-batch + empty
    * state admits the first-`cap` per domain in doc-id arrival order
    * with 1-based slots — exactly [[StreamingQuota.batchQuota]]'s
    * window relation, so the batch twin's oracle SQL anchors the REAL
    * stateful gate. */
  def quotaAdmitted(s: SparkSession, docs: DataFrame, cap: Int): DataFrame = {
    import s.implicits._
    val input = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("domain").cast("string").as("domain"))
    throughStream(s, input, "quota") { (ss, src) =>
      val stream = ss.readStream.schema("doc_id LONG, domain STRING")
        .parquet(src).as[StreamingQuota.Arrival]
      StreamingQuota.quotaGate(stream, cap).toDF().writeStream
    }
  }

  /** [[StreamingIntervalJoin.attribute]] as a REAL stream-STREAM join:
    * impressions and conversions each arrive on their own file source,
    * both watermarked, and the interval join buffers keyed state on
    * both sides. Inner-join semantics emit every match inside the
    * single AvailableNow micro-batch (the watermark only governs later
    * state eviction), so the emitted relation is exactly the batch
    * range join — the batch twin's oracle SQL anchors it. */
  def attributed(s: SparkSession, impressions: DataFrame,
      conversions: DataFrame, windowSec: Int): DataFrame = {
    val imps = impressions.select(col("user_id").cast("long").as("user_id"),
      col("imp_ts").cast("timestamp").as("imp_ts"),
      col("imp_id").cast("long").as("imp_id"))
    val convs = conversions.select(col("c_user_id").cast("long").as("c_user_id"),
      col("conv_ts").cast("timestamp").as("conv_ts"),
      col("conv_id").cast("long").as("conv_id"))
    throughStream2(s, imps, convs, "attr") { (ss, l, r) =>
      val impStream = ss.readStream
        .schema("user_id LONG, imp_ts TIMESTAMP, imp_id LONG").parquet(l)
      val convStream = ss.readStream
        .schema("c_user_id LONG, conv_ts TIMESTAMP, conv_id LONG").parquet(r)
      StreamingIntervalJoin.attribute(impStream, convStream,
        windowSec = windowSec).writeStream
    }
  }

  /** [[graft.operators.Sketches.hllRegisters]] maintained by a REAL
    * streaming aggregation (complete mode): max(rho) per (key, bucket)
    * is the streaming-aggregable state, so the drained register table
    * must equal the batch registers exactly — the estimate computed
    * from it lands on sketch_hll's own oracle SQL. */
  def hllRegistersStreamed(s: SparkSession, rows: DataFrame,
      key: String, valueCol: String): DataFrame = {
    val input = rows.select(col(key).cast("string").as(key),
      col(valueCol).cast("long").as(valueCol))
    throughStreamComplete(s, input, "hll") { (ss, src) =>
      val stream = ss.readStream.schema(s"$key STRING, $valueCol LONG")
        .parquet(src)
      graft.operators.Sketches.hllRegisters(stream, Seq(key), col(valueCol))
        .writeStream
    }
  }

  /** [[graft.operators.Sketches.cmsCells]] maintained by a REAL
    * streaming aggregation (complete mode): plain-sum cells are the
    * streaming-aggregable state, so the drained grid must equal the
    * batch grid — probes estimated from it land on sketch_freq_cms's
    * own oracle SQL. */
  def cmsCellsStreamed(s: SparkSession, docs: DataFrame): DataFrame = {
    val input = docs.select(col("text").cast("string").as("text"))
    throughStreamComplete(s, input, "cms") { (ss, src) =>
      val stream = ss.readStream.schema("text STRING").parquet(src)
      graft.operators.Sketches.cmsCells(
        stream.select(explode(
          graft.functions.Portable.tokens(col("text"))).as("word")),
        col("word")).writeStream
    }
  }

  /** [[graft.operators.Sketches.cmsGridsByKey]] maintained as a LIVE
    * complete-mode streaming aggregation — the per-SOURCE grid sibling
    * of [[cmsCellsStreamed]]: plain-sum cells per (source, k, cell)
    * accumulate across micro-batches, so the drained grid equals the
    * batch grid exactly and everything derived from it (the CMS dot in
    * sketch_cms_dot_stream) lands on the batch oracle. */
  def cmsGridsByKeyStreamed(s: SparkSession, docs: DataFrame): DataFrame = {
    val input = docs.select(col("source").cast("string").as("source"),
      col("text").cast("string").as("text"))
    throughStreamComplete(s, input, "cmsk") { (ss, src) =>
      val stream = ss.readStream.schema("source STRING, text STRING")
        .parquet(src)
      graft.operators.Sketches.cmsGridsByKey(
        stream.select(col("source"), explode(
          graft.functions.Portable.tokens(col("text"))).as("word")),
        col("source"), col("word")).writeStream
    }
  }

  /** [[graft.plans.SkylineAggregator]] as a LIVE complete-mode
    * streaming aggregation across REAL micro-batches: the front
    * accumulates in aggregation state file by file, and because
    * dominance filtering is CONFLUENT (any insertion order yields the
    * same final front — the monoid behind Pareto's shard-merge
    * theorem), the drained front must equal the batch skyline exactly.
    * Input `pts`: (id, x, y, batch). */
  def skylineStreamed(s: SparkSession, pts: DataFrame,
      nBatches: Int): DataFrame =
    throughChunkedStreamMode(s, "sky", nBatches, "complete",
      (pts, Seq("id", "x", "y"))) { (ss, srcs) =>
      import ss.implicits._
      ss.readStream.schema("id LONG, x LONG, y LONG")
        .option("maxFilesPerTrigger", "1").parquet(srcs.head)
        .as[graft.plans.FrontPoint]
        .groupByKey(_ => 0L)
        .agg(new graft.plans.SkylineAggregator().toColumn.name("front"))
        .toDF("k", "front")
        .writeStream
    }

  /** [[graft.plans.AckLedgerAggregator]] as a LIVE complete-mode
    * streaming aggregation across REAL micro-batches: per-topic ack
    * observations arrive file by file, the interval-compressed ledger
    * accumulates in aggregation state (O(holes), the Pulsar-cursor
    * shape), and because interval-set union is a commutative monoid the
    * drained ledger must equal the batch ledger for ANY arrival order.
    * Input `obs`: (topic, seq, acked, batch). */
  def ackLedgerStreamed(s: SparkSession, obs: DataFrame,
      nBatches: Int): DataFrame =
    throughChunkedStreamMode(s, "ackl", nBatches, "complete",
      (obs, Seq("topic", "seq", "acked"))) { (ss, srcs) =>
      import ss.implicits._
      ss.readStream.schema("topic STRING, seq LONG, acked INT")
        .option("maxFilesPerTrigger", "1").parquet(srcs.head)
        .as[graft.plans.AckObs]
        .groupByKey(_.topic)
        .agg(new graft.plans.AckLedgerAggregator().toColumn.name("ledger"))
        .toDF("topic", "ledger")
        .writeStream
    }

  /** [[graft.plans.BottomKDistinctAggregator]] as a LIVE complete-mode
    * streaming aggregation: the KMV k-min sets accumulate per key in
    * O(k) aggregation state (the bottom-k-of-a-union monoid), so the
    * drained sketch equals the batch sketch exactly. Input `obs`:
    * (key, h) — the portable re-hashed values. */
  def kmvMinKStreamed(s: SparkSession, obs: DataFrame, k: Int): DataFrame = {
    val input = obs.select(col("key").cast("string").as("key"),
      col("h").cast("long").as("h"))
    throughStreamComplete(s, input, "kmv") { (ss, src) =>
      import ss.implicits._
      ss.readStream.schema("key STRING, h LONG").parquet(src)
        .as[graft.plans.KmvObs]
        .groupByKey(_.key)
        .agg(new graft.plans.BottomKDistinctAggregator(k).toColumn.name("hs"))
        .toDF("key", "hs")
        .writeStream
    }
  }

  /** [[graft.operators.Dedup.bloomGateWith]] — benchmark
    * decontamination AT INGEST — run through a REAL stream: the Bloom
    * bits are trained offline (512 B of model state), inlined as a
    * literal into a narrow per-doc expression, and every arriving doc
    * is gated at consume time with no state, no join, no shuffle. The
    * emitted relation is the batch gate's exact output
    * (`decontaminate_stream` shares `decontaminate_bloom`'s SQL). */
  def bloomGatedStream(s: SparkSession, docs: DataFrame,
      bits: Array[Long], n: Int = 8): DataFrame = {
    val input = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text").cast("string").as("text"))
    throughStream(s, input, "blg") { (ss, src) =>
      graft.operators.Dedup.bloomGateWith(
        ss.readStream.schema("doc_id LONG, text STRING").parquet(src),
        bits, n).writeStream
    }
  }

  /** [[graft.plans.BottomKPairsAggregator]] as a LIVE complete-mode
    * streaming aggregation — the exact-k per-stratum HOLDOUT maintained
    * at ingest: the bottom-k (priority, id) pairs accumulate per
    * stratum in O(k) state (the bottom-k-of-a-union monoid), so the
    * drained sample equals the batch rank-window draw exactly —
    * whatever the arrival order, and with redeliveries collapsing
    * instead of double-occupying slots. Input `rows`: (key, u, id). */
  def sampleMinKStreamed(s: SparkSession, rows: DataFrame,
      k: Int): DataFrame = {
    val input = rows.select(col("key").cast("string").as("key"),
      col("u").cast("long").as("u"), col("id").cast("long").as("id"))
    throughStreamComplete(s, input, "smpk") { (ss, src) =>
      import ss.implicits._
      ss.readStream.schema("key STRING, u LONG, id LONG").parquet(src)
        .as[graft.plans.PairObs]
        .groupByKey(_.key)
        .agg(new graft.plans.BottomKPairsAggregator(k).toColumn.name("ps"))
        .toDF("key", "ps")
        .writeStream
    }
  }

  /** Per-(key, bin) histogram counts maintained as a LIVE complete-mode
    * streaming aggregation (plain sums — the [[cmsCellsStreamed]]
    * property on the quantile grid): the drained counts equal the batch
    * counts, so the quantile readout lands on the batch oracle. Input
    * `rows`: (key, bin). */
  def histBinsStreamed(s: SparkSession, rows: DataFrame): DataFrame = {
    val input = rows.select(col("key").cast("string").as("key"),
      col("bin").cast("int").as("bin"))
    throughStreamComplete(s, input, "hist") { (ss, src) =>
      ss.readStream.schema("key STRING, bin INT").parquet(src)
        .groupBy(col("key"), col("bin"))
        .agg(count(lit(1)).as("cnt"))
        .writeStream
    }
  }

  /** The CDC last-writer-wins merge as a LIVE complete-mode streaming
    * aggregation: the changelog replays in its REAL arrival order
    * (base snapshot, then updates, then deletes — one micro-batch per
    * version epoch) and per-key max(struct(version, op, text)) keeps
    * exactly the last writer in O(keys) aggregation state; the drained
    * relation must match the batch merge's rank-window result. Input
    * `log`: (doc_id, version, op, text, batch). */
  def cdcApplied(s: SparkSession, log: DataFrame, nBatches: Int): DataFrame =
    throughChunkedStreamMode(s, "cdc", nBatches, "complete",
      (log, Seq("doc_id", "version", "op", "text"))) { (ss, srcs) =>
      ss.readStream
        .schema("doc_id LONG, version LONG, op STRING, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcs.head)
        .groupBy(col("doc_id"))
        .agg(max(struct(col("version"), col("op"), col("text"))).as("last"))
        .select(col("doc_id"), col("last.version").as("version"),
          col("last.op").as("op"), col("last.text").as("text"))
        .writeStream
    }

  /** [[StreamingRollover.assignGenerations]] across REAL micro-batches:
    * the in-order message stream replays one file per micro-batch, the
    * per-topic cumulative-bytes counter SURVIVES batch boundaries in
    * state, and the per-message generation assignments — aggregated
    * back to generations — must land on sync_rollover's own oracle. */
  def rolledGenerations(s: SparkSession, batched: DataFrame,
      nBatches: Int, capBytes: Long = 16384L): DataFrame = {
    import s.implicits._
    throughChunkedStream(s, "roll", nBatches,
      (batched, Seq("msg_id", "topic", "data"))) { (ss, srcs) =>
      val stream = ss.readStream
        .schema("msg_id LONG, topic STRING, data STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcs.head)
        .as[StreamingRollover.Msg]
      StreamingRollover.assignGenerations(stream, capBytes)
        .toDF().writeStream
    }
  }

  /** [[graft.operators.Curation.hashedLinearScore]] + shard assignment
    * run as STREAMING projections (the score-as-you-ingest seam of
    * StreamingCurationSpec promoted to an oracle row): stateless narrow
    * expressions, so the emitted relation is exactly the batch
    * classifier's extended with the shard key. */
  def classifiedStream(s: SparkSession, docs: DataFrame,
      nShards: Int): DataFrame = {
    val input = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("lang").cast("string").as("lang"),
      col("text").cast("string").as("text"))
    throughStream(s, input, "clf") { (ss, src) =>
      val stream = ss.readStream
        .schema("doc_id LONG, lang STRING, text STRING").parquet(src)
      graft.operators.Curation.shardAssign(
          graft.operators.Curation.hashedLinearScore(stream), nShards)
        .select(col("doc_id"), col("lang"), col("n_tok"), col("score"),
          col("pred"), col("shard"))
        .writeStream
    }
  }

  /** The FULL ingest-side curation projection as ONE streaming plan
    * (r11 capstone): quality score + admission verdict + shard route +
    * benchmark-contamination count, every column a stateless narrow
    * expression over frozen artifacts (the hashed classifier kernel,
    * the shard hash, the offline-trained Bloom bits) — what a
    * production consumer computes PER ARRIVING DOC before anything
    * lands. No join, no shuffle, no state; the emitted relation equals
    * the batch composition's SQL (`curate_ingest_stream`). */
  def curatedIngestStream(s: SparkSession, docs: DataFrame,
      bits: Array[Long], nShards: Int): DataFrame = {
    val input = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("lang").cast("string").as("lang"),
      col("text").cast("string").as("text"))
    throughStream(s, input, "curi") { (ss, src) =>
      val stream = ss.readStream
        .schema("doc_id LONG, lang STRING, text STRING").parquet(src)
      graft.operators.Curation.shardAssign(
          graft.operators.Curation.hashedLinearScore(stream), nShards)
        .withColumn("n_contaminated", coalesce(
          graft.operators.Dedup.bloomHitCountCol(col("text"), bits),
          lit(0L)))
        .select(col("doc_id"), col("lang"), col("n_tok"), col("score"),
          col("pred"), col("shard"), col("n_contaminated"))
        .writeStream
    }
  }

  /** [[graft.operators.Sketches.moments]] maintained by a REAL
    * streaming aggregation (complete mode): the three integer sums are
    * the streaming-aggregable state, so the drained per-key (n, s1, s2)
    * table must equal the batch moments — the integer mean/variance
    * computed from it lands on sketch_moments' own direct oracle. */
  def momentsStreamed(s: SparkSession, rows: DataFrame): DataFrame = {
    val input = rows.select(col("event_type").cast("string").as("event_type"),
      col("value").cast("double").as("value"))
    throughStreamComplete(s, input, "mom") { (ss, src) =>
      val stream = ss.readStream.schema("event_type STRING, value DOUBLE")
        .parquet(src)
      graft.operators.Sketches.moments(stream, Seq("event_type"),
        col("value")).writeStream
    }
  }

  /** [[graft.operators.Tokenizer.encodeWith]] (the frozen-artifact
    * narrow encoder) run through a REAL stream — file source → narrow
    * projection → memory sink — then exploded back to the
    * (doc_id, pos, tok_id) relation of the batch join+window encode:
    * the offline-trained/online-applied tokenizer under the oracle. */
  def encodedStream(s: SparkSession, docs: DataFrame,
      merges: Seq[(String, String)], ids: Map[String, Long]): DataFrame = {
    val input = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text").cast("string").as("text"))
    throughStream(s, input, "tokenc") { (ss, src) =>
      ss.readStream.schema("doc_id LONG, text STRING").parquet(src)
        .select(col("doc_id"),
          graft.operators.Tokenizer.encodeWith(col("text"), merges, ids)
            .as("ids"))
        .writeStream
    }.select(col("doc_id"), posexplode(col("ids")).as(Seq("pos", "tok_id")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok_id"))
  }

  /** [[graft.operators.Similarity.pqCodesWith]] — the offline-trained
    * PQ codebook applied AT INGEST — run through a REAL stream (file
    * source → narrow argmin projection → memory sink), then exploded to
    * the (vec_id, subspace, code) relation with the ordinal mapped back
    * to its centroid id, so the emitted stream lands on the BATCH
    * assignment's oracle SQL. The C61 component's oracle anchor (r11):
    * every new vector is indexed at consume time, no state, no
    * shuffle. */
  def pqCodesStream(s: SparkSession, emb: DataFrame,
      cents: Array[(Long, Seq[Double])]): DataFrame = {
    val input = emb.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding"))
    val streamed = throughStream(s, input, "pqc") { (ss, src) =>
      graft.operators.Similarity.pqCodesWith(
        ss.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
          .parquet(src), cents)
        .writeStream
    }
    streamed
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("subspace", "ord")))
      .select(col("vec_id"), col("subspace").cast("long").as("subspace"),
        element_at(typedLit(cents.map(_._1).toSeq), col("ord") + 1).as("code"))
  }



  /** Write `batches` as ONE parquet FILE per `batch` value, in batch
    * order with distinct mod-times, so a file source with
    * `maxFilesPerTrigger = 1` replays them as deterministic
    * micro-batches. Returns the source directory. */
  private[graft] def writeChunkedFiles(batches: DataFrame, cols: Seq[String],
      nBatches: Int, tmp: String): String = {
    val src = s"$tmp/src"
    new java.io.File(src).mkdirs()
    // Materialize the batched input ONCE before the per-batch writes:
    // each `filter(batch === b)` below re-executes the ENTIRE upstream
    // plan (for the flagship sync twins that plan contains a global
    // row_number window — nBatches extra full sorts of the message
    // relation; for every multibatch row at least nBatches extra scans
    // + plant transforms). Guide §2.4/§5: one pass computes the
    // relation, the per-batch jobs then scan tiny materialized blocks.
    // Row MEMBERSHIP per batch file is unchanged; within-file row order
    // after the repartition shuffle is pinned by the explicit
    // sortWithinPartitions below (r14, ADVICE — the r13 shape left it
    // to shuffle fetch order): no current twin depends on file row
    // order (every admission order the oracles model is an EXPLICIT
    // sort key of the operator, spec-proven), but byte-deterministic
    // files close the trap for any future order-sensitive twin.
    val mat = graft.operators.Materialize(
      batches.select((cols :+ "batch").distinct.map(col): _*))
    // ONE partitioned write instead of nBatches sequential jobs (r13):
    // repartition(nBatches, batch) puts each batch value in exactly one
    // task, so the dynamic-partition write emits exactly one file per
    // batch= directory in a single job. An EMPTY batch produces no
    // directory, so the fallback below writes a schema-only file for it
    // — the micro-batch sequence (and the two-source lockstep of the
    // stream-stream replays) must stay exactly nBatches files per
    // source.
    val stage = s"$tmp/stage"
    mat.repartition(nBatches, col("batch"))
      .sortWithinPartitions(cols.map(col): _*)
      .write.partitionBy("batch").parquet(stage)
    // Mod-times are set EXPLICITLY, 1 s apart (some filesystems have
    // 1-second mtime granularity, so sleeping between writes would not
    // guarantee distinct stamps): file b gets base + b s, pinning the
    // file source's mod-time ordering deterministically.
    val base = (System.currentTimeMillis() / 1000L) * 1000L
    (0 until nBatches).foreach { b =>
      val dest = java.nio.file.Paths.get(f"$src/f$b%03d.parquet")
      val parts = Option(new java.io.File(s"$stage/batch=$b").listFiles())
        .map(_.filter(_.getName.endsWith(".parquet"))).getOrElse(Array.empty)
      val part = parts match {
        case Array(one) => one.toPath
        case Array() => // empty batch: schema-only file keeps the sequence
          val d = s"$tmp/stage/e$b"
          mat.filter(lit(false)).select(cols.map(col): _*)
            .coalesce(1).write.parquet(d)
          new java.io.File(d).listFiles()
            .filter(_.getName.endsWith(".parquet")).head.toPath
        case many => throw new IllegalStateException(
          s"batch $b wrote ${many.length} files; expected exactly one")
      }
      Files.move(part, dest, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      if (!dest.toFile.setLastModified(base + b * 1000L))
        throw new IllegalStateException(s"cannot set mod-time on $dest")
    }
    src
  }

  /** Chunked-source variant of [[throughStream]]: each `sources` entry
    * `(batchedDf, cols)` is written as one file per `batch` value (see
    * [[writeChunkedFiles]]) into its own directory, `build` receives
    * the source directories (readers should set
    * `maxFilesPerTrigger = 1` so each file is one micro-batch), and the
    * drain-timeout / memory-sink pin / cleanup contract is the same as
    * the single-batch runner's. */
  private def throughChunkedStream(s: SparkSession, name: String,
      nBatches: Int, sources: (DataFrame, Seq[String])*)
      (build: (SparkSession, Seq[String]) => org.apache.spark.sql.streaming.DataStreamWriter[_])
      : DataFrame =
    throughChunkedStreamMode(s, name, nBatches, "append", sources: _*)(build)

  /** [[throughChunkedStream]] with an explicit sink output mode —
    * "complete" for streaming AGGREGATIONS accumulated across the real
    * micro-batches (the chunked sibling of [[throughStreamComplete]]). */
  private def throughChunkedStreamMode(s: SparkSession, name: String,
      nBatches: Int, outputMode: String, sources: (DataFrame, Seq[String])*)
      (build: (SparkSession, Seq[String]) => org.apache.spark.sql.streaming.DataStreamWriter[_])
      : DataFrame = {
    val tmp = twinTempDir(s"graft-$name-twin")
    val qn = s"${name}_twin_${seq.incrementAndGet()}"
    val ss = streamSession(s)
    try {
      val srcs = sources.zipWithIndex.map { case ((df, cols), i) =>
        val dir = if (sources.size == 1) tmp else s"$tmp/s$i"
        writeChunkedFiles(df, cols, nBatches, dir)
      }
      val q = build(ss, srcs)
        .format("memory").queryName(qn).outputMode(outputMode)
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      if (!q.awaitTermination(300000)) {
        q.stop()
        throw new IllegalStateException(s"$qn did not drain within 300 s")
      }
      val sink = ss.table(qn)
      s.createDataFrame(
        s.sparkContext.parallelize(sink.collect().toIndexedSeq, 1),
        sink.schema)
    } finally {
      try ss.catalog.dropTempView(qn) catch { case _: Exception => () }
      org.apache.hadoop.fs.FileSystem
        .get(new java.net.URI(tmp), s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(tmp), true)
      ()
    }
  }

  /** A REAL watermark-drop replay: `batches` (topic, ts, batch) is
    * written as ONE FILE PER MICRO-BATCH in batch order (distinct
    * mod-times keep the file-source order deterministic), streamed with
    * `maxFilesPerTrigger = 1` through a watermarked tumbling-window
    * count, and the memory sink holds exactly the windows the terminal
    * watermark closed — late rows REALLY dropped by state eviction,
    * not predicted. The oracle models Spark's observed semantics: the
    * late filter evicts on window end ≤ the filter watermark, the
    * filter watermark derives from data through batch b−2 (the b−1
    * update lands one batch later), and the AvailableNow final empty
    * batch flushes every window with end ≤ global max − horizon. */
  def watermarkedWindowCounts(s: SparkSession, batches: DataFrame,
      nBatches: Int, horizon: String = "1 hour",
      windowDur: String = "1 hour"): DataFrame =
    throughChunkedStream(s, "wm", nBatches,
      (batches, Seq("topic", "ts"))) { (ss, srcs) =>
      ss.readStream.schema("topic STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1").parquet(srcs.head)
        .withWatermark("ts", horizon)
        .groupBy(window(col("ts"), windowDur).as("w"), col("topic"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("w.start").as("win_start"), col("topic"), col("cnt"))
        .writeStream
    }








  /** [[StreamingSync.dedupMessages]] across REAL micro-batches with
    * planted DUPLICATE redelivery: the twin proves exactly-once holds
    * for ANY redelivery delay — a duplicate inside the watermark
    * horizon hits retained state and drops; one beyond it is dropped
    * by the late-input filter before it can re-emit (its event time
    * sits below the watermark that evicted the original's state). The
    * emitted relation must therefore equal the DISTINCT message set. */
  def dedupedMessages(s: SparkSession, batched: DataFrame,
      nBatches: Int, horizon: String): DataFrame =
    throughChunkedStream(s, "mdedup", nBatches,
      (batched, Seq("msg_id", "topic", "publish_time", "data"))) { (ss, srcs) =>
      val stream = ss.readStream
        .schema("msg_id LONG, topic STRING, publish_time TIMESTAMP, data STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcs.head)
      StreamingSync.dedupMessages(horizon)(stream).writeStream
    }

  /** THE flagship twin: [[StreamingSync.start]] run for REAL — the
    * chunked message relation replays one file per micro-batch through
    * the full transform chain, the foreachBatch admission, and the
    * commit-marker indexed sink — then the STORE is read back as the
    * result relation. The batch pipeline's own oracle SQL anchors it:
    * the store a real streaming deployment accumulates must hold
    * exactly the batch relation. */
  def syncedStore(s: SparkSession, batched: DataFrame, cfg: SyncConfig,
      nBatches: Int): DataFrame =
    runSyncedStore(s, batched, cfg, nBatches, compactFirst = false)

  /** [[syncedStore]] plus the OPTIMIZE pass: after the stream drains,
    * the accumulated store is COMPACTED in place
    * ([[graft.sinks.Compaction.compact]] — salted rewrite, atomic
    * swap) and only THEN read back. The same oracle SQL anchors it:
    * the maintenance pass must be content-preserving end to end (file
    * counts shrink, the relation doesn't change by a row). The tiny
    * targetBytes forces a real multi-file rewrite at test scale. */
  def syncedCompactedStore(s: SparkSession, batched: DataFrame,
      cfg: SyncConfig, nBatches: Int): DataFrame =
    runSyncedStore(s, batched, cfg, nBatches, compactFirst = true)

  private def runSyncedStore(s: SparkSession, batched: DataFrame,
      cfg: SyncConfig, nBatches: Int, compactFirst: Boolean): DataFrame = {
    val tmp = twinTempDir("graft-sync-twin")
    seq.incrementAndGet() // count toward replayRuns like every runner
    val ss = streamSession(s)
    try {
      val src = writeChunkedFiles(batched,
        Seq("msg_id", "topic", "publish_time", "data"), nBatches, tmp)
      val q = StreamingSync.start(ss, cfg, src, s"$tmp/sink",
        s"$tmp/metrics", availableNow = true, batchFiles = Some(1))
      if (!q.awaitTermination(300000)) {
        q.stop()
        throw new IllegalStateException("sync twin did not drain within 300 s")
      }
      if (compactFirst) {
        val report = graft.sinks.Compaction.compact(ss, s"$tmp/sink",
          targetBytes = 64L << 10)
        require(report.filesAfter <= report.filesBefore,
          s"compaction grew the store: $report")
      }
      val store = ss.read.parquet(s"$tmp/sink")
      s.createDataFrame(
        s.sparkContext.parallelize(store.collect().toIndexedSeq, 1),
        store.schema)
    } finally {
      org.apache.hadoop.fs.FileSystem
        .get(new java.net.URI(tmp), s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(tmp), true)
      ()
    }
  }

  /** [[StreamingSessionize]] across REAL micro-batches with the
    * EVENT-TIME TIMEOUT path live (no sentinel): the in-order stream
    * replays one file per micro-batch, sessions merge across batch
    * boundaries in state, mid-stream sessions close by successor OR by
    * timeout as the watermark advances, and the per-user tail session
    * emits only if the TERMINAL watermark (global max − gap) passed its
    * timeout — the emission boundary the oracle models (in-order
    * arrival keeps the session STRUCTURE identical to batch, so only
    * emission needs modeling). */
  def sessionsMulti(s: SparkSession, batched: DataFrame, nBatches: Int,
      gapMinutes: Int): DataFrame = {
    import s.implicits._
    throughChunkedStream(s, "sessm", nBatches,
      (batched, Seq("user_id", "ts"))) { (ss, srcs) =>
      val stream = ss.readStream.schema("user_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1").parquet(srcs.head)
        .as[StreamingSessionize.Event]
      StreamingSessionize.sessions(stream, gapMinutes)(ss).writeStream
    }
  }

  /** [[StreamingIntervalJoin.attribute]] across REAL micro-batches with
    * the watermark's state eviction EXECUTED: both sides replay one
    * file per micro-batch in lockstep (each trigger takes one file from
    * EACH source), late input rows drop below the join watermark, and a
    * redelivered row only matches partners whose buffered state
    * survived to its arrival batch. The oracle models the pinned
    * semantics: the filter watermark derives from data through batch
    * b−2 over BOTH sides; an input row drops iff its event time is
    * below it; a cross-batch pair survives iff, at the later arrival
    * batch, the impression's match horizon (imp_ts + window) and the
    * conversion's event time are still at-or-above the watermark. */
  def attributedMulti(s: SparkSession, impsBatched: DataFrame,
      convsBatched: DataFrame, nBatches: Int, windowSec: Int,
      horizon: String): DataFrame =
    throughChunkedStream(s, "attrm", nBatches,
      (impsBatched, Seq("user_id", "imp_ts", "imp_id")),
      (convsBatched, Seq("c_user_id", "conv_ts", "conv_id"))) { (ss, srcs) =>
      val imps = ss.readStream
        .schema("user_id LONG, imp_ts TIMESTAMP, imp_id LONG")
        .option("maxFilesPerTrigger", "1").parquet(srcs(0))
      val convs = ss.readStream
        .schema("c_user_id LONG, conv_ts TIMESTAMP, conv_id LONG")
        .option("maxFilesPerTrigger", "1").parquet(srcs(1))
      StreamingIntervalJoin
        .attribute(imps, convs, horizon = horizon, windowSec = windowSec)
        .writeStream
    }

  /** [[StreamingRateLimit]] across REAL micro-batches: the
    * planted-arrival `batched` message relation replays one file per
    * micro-batch, so per-(app, window) admission order is
    * (batch, publish_time µs, msg_id) with counters carried in state —
    * a redelivered message is admitted only if its EVENT-time window
    * still has budget when it finally arrives. */
  def rateLimitedMulti(s: SparkSession, batched: DataFrame,
      nBatches: Int, cfg: SyncConfig): DataFrame = {
    import s.implicits._
    throughChunkedStream(s, "rlm", nBatches,
      (batched, Seq("msg_id", "topic", "publish_time", "data", "app"))) { (ss, srcs) =>
      val stream = ss.readStream
        .schema("msg_id LONG, topic STRING, publish_time TIMESTAMP, data STRING, app STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcs.head)
        .as[StreamingRateLimit.RlMsg]
      StreamingRateLimit(cfg)(stream).toDF().writeStream
    }
  }

  /** [[StreamingQuota.quotaGate]] across REAL micro-batches: the
    * planted-arrival `batched` relation (doc_id, domain, batch) replays
    * one file per micro-batch, so per-domain admission order is
    * (batch, doc id) — a redelivered doc burns a later slot or is
    * rejected outright when its domain's budget filled in an earlier
    * batch. The oracle recomputes first-`cap` per domain in
    * (batch, doc id) order with the same 1-based slots. */
  def quotaAdmittedMulti(s: SparkSession, batched: DataFrame,
      nBatches: Int, cap: Int): DataFrame = {
    import s.implicits._
    throughChunkedStream(s, "quotam", nBatches,
      (batched, Seq("doc_id", "domain"))) { (ss, srcs) =>
      val stream = ss.readStream.schema("doc_id LONG, domain STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcs.head)
        .as[StreamingQuota.Arrival]
      StreamingQuota.quotaGate(stream, cap).toDF().writeStream
    }
  }

  /** [[StreamingDedup.nearDupGate]] across REAL micro-batches: the
    * planted-arrival `batched` relation (doc_id, text, batch) replays
    * one file per micro-batch, so per-bucket first-seen OWNERSHIP is
    * decided by arrival order — first = min doc id within the bucket's
    * EARLIEST batch, carried forward by the registry; every later
    * (doc, bucket) pair collides. The oracle recomputes exactly that. */
  def nearDupCollisionsMulti(s: SparkSession, batched: DataFrame,
      nBatches: Int): DataFrame = {
    import s.implicits._
    throughChunkedStream(s, "ndgm", nBatches,
      (batched, Seq("doc_id", "text"))) { (ss, srcs) =>
      val stream = ss.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcs.head)
        .as[StreamingDedup.Doc]
      StreamingDedup.nearDupGate(stream).toDF().writeStream
    }
  }

  /** [[nearDupCollisionsMulti]] RESTARTED from a flushed ownership
    * registry — the bucket gate's state-eviction half (r11, the line
    * gate's C199 lifecycle applied to the first-seen registry): the
    * gate runs with EMPTY state, each arriving (doc, bucket) pair
    * carries the bucket's STORED first owner via a stream-static left
    * join against `registry` (bucket, first_doc) — min per bucket
    * first, so overlapping flushes collapse to the earliest owner —
    * and ownership continues exactly where the flushed run stopped
    * (`dedup_gate_evict` shares `dedup_gate_multibatch`'s SQL
    * verbatim). */
  def nearDupCollisionsMultiFrom(s: SparkSession, batched: DataFrame,
      nBatches: Int, registry: DataFrame): DataFrame = {
    val regTmp = twinTempDir("graft-ndgf-reg")
    try {
      registry.select(col("bucket"), col("first_doc"))
        .write.parquet(s"$regTmp/reg")
      throughChunkedStream(s, "ndgf", nBatches,
        (batched, Seq("doc_id", "text"))) { (ss, srcs) =>
        import ss.implicits._
        val reg = ss.read.parquet(s"$regTmp/reg")
          .groupBy(col("bucket")).agg(min(col("first_doc")).as("__first"))
        val stream = ss.readStream.schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", "1").parquet(srcs.head)
        val keyed = graft.operators.Dedup.minhashBuckets(stream)
          .join(reg, Seq("bucket"), "left")
          .select(col("doc_id"), col("bucket"),
            coalesce(col("__first"), lit(Long.MaxValue)).as("first"))
          .as[(Long, Long, Long)]
        StreamingDedup.keyedFirstSeenGateFrom(keyed).toDF().writeStream
      }
    } finally {
      org.apache.hadoop.fs.FileSystem
        .get(new java.net.URI(regTmp), s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(regTmp), true)
      ()
    }
  }

  /** The LINE-BOILERPLATE gate at ingest across REAL micro-batches:
    * each arriving document splits into its fixed-window lines INSIDE
    * the stream (the same [[graft.operators.Dedup.docLines]] projection
    * the batch pass runs — narrow, stream-safe), and every line is
    * gated against the per-line document support accumulated over
    * strictly earlier batches
    * ([[StreamingDedup.lineSupportGate]]). Returns the gated line
    * relation (doc_id, n_lines, line_id, line, kept); reassembly into
    * cleaned documents is the caller's stateless batch step — in
    * production the gated stream lands in a store and reassembly is
    * the downstream job. */
  def lineGatedMulti(s: SparkSession, batched: DataFrame,
      nBatches: Int, lineLen: Int = 10, minSupport: Int = 3): DataFrame =
    throughChunkedStream(s, "lng", nBatches,
      (batched, Seq("doc_id", "text"))) { (ss, srcs) =>
      import ss.implicits._
      val stream = ss.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcs.head)
      StreamingDedup.lineSupportGate(
        graft.operators.Dedup.docLines(stream, lineLen)
          .as[StreamingDedup.LineRow],
        minSupport).toDF().writeStream
    }

  /** [[lineGatedMulti]] RESTARTED from a flushed registry — the state
    * EVICTION half of the line gate's lifecycle (r11): the gate runs
    * with EMPTY state, each arriving line carries its stored support
    * via a stream-static left join against `registry` (summed per line
    * first, so a union of daily flushes is a valid input), and the
    * verdict is stored + since-flush support
    * ([[StreamingDedup.lineSupportGateFrom]]). Flush(phase-1 emissions)
    * → restart(phase 2) must replay EXACTLY like the never-flushed gate
    * (the `dedup_lines_evict` oracle row shares `dedup_lines_stream`'s
    * SQL verbatim) while the state store holds only phase-2 lines. */
  def lineGatedMultiFrom(s: SparkSession, batched: DataFrame,
      nBatches: Int, registry: DataFrame, lineLen: Int = 10,
      minSupport: Int = 3): DataFrame = {
    val regTmp = twinTempDir("graft-lngf-reg")
    try {
      registry.select(col("line"), col("sup")).write.parquet(s"$regTmp/reg")
      throughChunkedStream(s, "lngf", nBatches,
        (batched, Seq("doc_id", "text"))) { (ss, srcs) =>
        import ss.implicits._
        val base = ss.read.parquet(s"$regTmp/reg")
          .groupBy(col("line")).agg(sum(col("sup")).as("__base"))
        val stream = ss.readStream.schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", "1").parquet(srcs.head)
        val withBase = graft.operators.Dedup.docLines(stream, lineLen)
          .join(base, Seq("line"), "left")
          .select(col("doc_id"), col("n_lines"), col("line_id"),
            col("line"), coalesce(col("__base"), lit(0L)).as("base"))
          .as[StreamingDedup.LineRowBase]
        StreamingDedup.lineSupportGateFrom(withBase, minSupport)
          .toDF().writeStream
      }
    } finally {
      org.apache.hadoop.fs.FileSystem
        .get(new java.net.URI(regTmp), s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(regTmp), true)
      ()
    }
  }

  /** Event-time base + watermark-advancing SENTINEL shared by the TTL
    * replays (r12, verdict #1): every data row gets
    * ts = batch · 1 min, and ONE sentinel row (doc_id = −1, a
    * control-char-prefixed text no corpus document can produce)
    * arrives as an extra final micro-batch at a far-future timestamp,
    * driving the watermark past every live timeout so the store
    * provably drains before the query terminates. The sentinel is
    * output-invisible: its rows are filtered after the gate, and since
    * it arrives last it cannot change any real verdict. */
  private def withTtlTimeline(batched: DataFrame,
      nBatches: Int): DataFrame = {
    val interval = 60000L
    val sentinelText =
      "\u0001wm \u0001adv \u0001s1 \u0001s2 \u0001s3"
    batched.select(col("doc_id"), col("text"),
        col("batch").cast("long").as("batch"))
      .unionByName(batched.sparkSession.range(1)
        .select(lit(-1L).as("doc_id"), lit(sentinelText).as("text"),
          lit(nBatches.toLong).as("batch")))
      .withColumn("ts", expr(
        s"timestamp_millis(CASE WHEN doc_id < 0 THEN ${3600L * interval} " +
          // batch + 1, NOT batch: the first batch must sit strictly
          // above the INITIAL watermark (0) — a ts equal to the
          // watermark is dropped as late by the stateful operator
          s"ELSE (batch + 1) * $interval END)"))
  }

  /** [[lineGatedMulti]] through the EventTimeTimeout gate
    * ([[StreamingDedup.lineSupportGateTtl]], ttl = `ttlBatches` batch
    * intervals): support rows leave the state store IN-STREAM as the
    * watermark advances — during the replay itself, not at a flush
    * boundary — and the sentinel batch drains the rest before
    * termination. With a ttl at or above the corpus's verdict-relevant
    * recurrence window the emissions are EXACTLY [[lineGatedMulti]]'s
    * (the `dedup_lines_ttl` oracle row shares `dedup_lines_stream`'s
    * SQL verbatim). */
  def lineGatedTtlMulti(s: SparkSession, batched: DataFrame,
      nBatches: Int, ttlBatches: Int, lineLen: Int = 10,
      minSupport: Int = 3): DataFrame = {
    val interval = 60000L
    throughChunkedStream(s, "lngt", nBatches + 1,
      (withTtlTimeline(batched, nBatches), Seq("doc_id", "text", "ts"))) {
      (ss, srcs) =>
        import ss.implicits._
        val stream = ss.readStream
          .schema("doc_id LONG, text STRING, ts TIMESTAMP")
          .option("maxFilesPerTrigger", "1").parquet(srcs.head)
        // event time re-attaches by doc id through a stream-STATIC join
        // (docs are unique in the replay); the static side is the same
        // one-file-per-batch source directory
        val tsRel = ss.read.parquet(srcs.head)
          .select(col("doc_id"), col("ts"))
        val rows = graft.operators.Dedup.docLines(stream, lineLen)
          .join(tsRel, "doc_id")
          .select(col("doc_id"), col("n_lines"), col("line_id"),
            col("line"), col("ts"))
          .as[StreamingDedup.LineRowT]
        StreamingDedup.lineSupportGateTtl(rows,
            ttlMs = ttlBatches * interval, minSupport = minSupport)
          .filter(col("doc_id") >= 0)
          .toDF().writeStream
    }
  }

  /** [[nearDupCollisionsMulti]] through the EventTimeTimeout gate
    * ([[StreamingDedup.keyedFirstSeenGateTtl]], ttl = `ttlBatches`
    * batch intervals). ttlBatches = nBatches − 2 is UNIVERSALLY
    * ownership-invariant on an nBatches replay (no recurrence gap can
    * exceed nBatches − 1 intervals ≤ ttl + 1 batch), so the
    * `dedup_gate_ttl` oracle row shares `dedup_gate_multibatch`'s SQL
    * verbatim while buckets idle past the ttl leave the store
    * in-stream. */
  def nearDupCollisionsTtlMulti(s: SparkSession, batched: DataFrame,
      nBatches: Int, ttlBatches: Int): DataFrame = {
    val interval = 60000L
    throughChunkedStream(s, "ndgt", nBatches + 1,
      (withTtlTimeline(batched, nBatches), Seq("doc_id", "text", "ts"))) {
      (ss, srcs) =>
        import ss.implicits._
        val stream = ss.readStream
          .schema("doc_id LONG, text STRING, ts TIMESTAMP")
          .option("maxFilesPerTrigger", "1").parquet(srcs.head)
        val tsRel = ss.read.parquet(srcs.head)
          .select(col("doc_id"), col("ts"))
        val keyed = graft.operators.Dedup
          .minhashBuckets(stream.select(col("doc_id"), col("text")))
          .join(tsRel, "doc_id")
          .select(col("doc_id"), col("bucket").as("key"), col("ts"))
          .as[StreamingDedup.KeyedT]
        StreamingDedup.keyedFirstSeenGateTtl(keyed,
            ttlMs = ttlBatches * interval)
          .filter(col("doc_id") >= 0)
          .toDF().writeStream
    }
  }

  /** The COMPOSED production lifecycle runner for the bucket gate
    * (r12): phase-2 replay through
    * [[StreamingDedup.keyedFirstSeenGateTtlFrom]] — every arrival
    * carries its stored owner from `registry` via the stream-static
    * join AND idle keys evict in-stream as the watermark advances, so
    * the store holds only ttl-active keys while evicted registry
    * ownership re-seeds losslessly on the next arrival. */
  def nearDupCollisionsTtlMultiFrom(s: SparkSession, batched: DataFrame,
      nBatches: Int, registry: DataFrame, ttlMs: Long): DataFrame = {
    val regTmp = twinTempDir("graft-ndgtf-reg")
    try {
      registry.select(col("bucket"), col("first_doc"))
        .write.parquet(s"$regTmp/reg")
      throughChunkedStream(s, "ndgtf", nBatches + 1,
        (withTtlTimeline(batched, nBatches), Seq("doc_id", "text", "ts"))) {
        (ss, srcs) =>
          import ss.implicits._
          val reg = ss.read.parquet(s"$regTmp/reg")
            .groupBy(col("bucket")).agg(min(col("first_doc")).as("__first"))
          val stream = ss.readStream
            .schema("doc_id LONG, text STRING, ts TIMESTAMP")
            .option("maxFilesPerTrigger", "1").parquet(srcs.head)
          val tsRel = ss.read.parquet(srcs.head)
            .select(col("doc_id"), col("ts"))
          val keyed = graft.operators.Dedup
            .minhashBuckets(stream.select(col("doc_id"), col("text")))
            .join(tsRel, "doc_id")
            .join(reg, Seq("bucket"), "left")
            .select(col("doc_id"), col("bucket").as("key"),
              coalesce(col("__first"), lit(Long.MaxValue)).as("base"),
              col("ts"))
            .as[StreamingDedup.KeyedBT]
          StreamingDedup.keyedFirstSeenGateTtlFrom(keyed, ttlMs)
            .filter(col("doc_id") >= 0)
            .toDF().writeStream
      }
    } finally {
      org.apache.hadoop.fs.FileSystem
        .get(new java.net.URI(regTmp), s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(regTmp), true)
      ()
    }
  }

  /** The COMPOSED production lifecycle runner for the line gate (r12):
    * phase-2 replay through [[StreamingDedup.lineSupportGateTtlFrom]] —
    * stored support joins in as the verdict base AND idle lines evict
    * in-stream, so the store is O(ttl-active lines) while long-horizon
    * support lives in the registry. */
  def lineGatedTtlMultiFrom(s: SparkSession, batched: DataFrame,
      nBatches: Int, registry: DataFrame, ttlMs: Long, lineLen: Int = 10,
      minSupport: Int = 3): DataFrame = {
    val regTmp = twinTempDir("graft-lngtf-reg")
    try {
      registry.select(col("line"), col("sup")).write.parquet(s"$regTmp/reg")
      throughChunkedStream(s, "lngtf", nBatches + 1,
        (withTtlTimeline(batched, nBatches), Seq("doc_id", "text", "ts"))) {
        (ss, srcs) =>
          import ss.implicits._
          val base = ss.read.parquet(s"$regTmp/reg")
            .groupBy(col("line")).agg(sum(col("sup")).as("__base"))
          val stream = ss.readStream
            .schema("doc_id LONG, text STRING, ts TIMESTAMP")
            .option("maxFilesPerTrigger", "1").parquet(srcs.head)
          val tsRel = ss.read.parquet(srcs.head)
            .select(col("doc_id"), col("ts"))
          val rows = graft.operators.Dedup.docLines(stream, lineLen)
            .join(tsRel, "doc_id")
            .join(base, Seq("line"), "left")
            .select(col("doc_id"), col("n_lines"), col("line_id"),
              col("line"), coalesce(col("__base"), lit(0L)).as("base"),
              col("ts"))
            .as[StreamingDedup.LineRowBaseT]
          StreamingDedup.lineSupportGateTtlFrom(rows, ttlMs, minSupport)
            .filter(col("doc_id") >= 0)
            .toDF().writeStream
      }
    } finally {
      org.apache.hadoop.fs.FileSystem
        .get(new java.net.URI(regTmp), s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(regTmp), true)
      ()
    }
  }

  /** The image near-dup gate AT INGEST across REAL micro-batches:
    * doc ids replay one file per micro-batch (batch = id mod 3, an
    * out-of-id-order arrival plant), each arrival's payload is
    * synthesized and perceptually hashed PARTITION-LOCALLY inside the
    * stream (the mm_phash decode path), and the phash feeds the same
    * first-seen registry the text gate uses
    * ([[StreamingDedup.keyedFirstSeenGate]]) — first = earliest
    * (batch, id), every later holder of the image collides. */
  def phashCollisionsMulti(s: SparkSession, batched: DataFrame,
      nBatches: Int): DataFrame =
    throughChunkedStream(s, "phg", nBatches,
      (batched, Seq("doc_id"))) { (ss, srcs) =>
      import ss.implicits._
      val keyed = ss.readStream.schema("doc_id LONG")
        .option("maxFilesPerTrigger", "1").parquet(srcs.head)
        .as[Long]
        .mapPartitions(_.map { id =>
          val payload = graft.operators.Multimodal.synthesizeBmp(id % 97)
          val ph = graft.operators.Multimodal.perceptualHash(payload)
            .map(_._3).getOrElse(0L)
          (id, ph)
        })
      StreamingDedup.keyedFirstSeenGate(keyed).toDF().writeStream
    }

  /** The TEMPLATE gate at ingest across REAL micro-batches: each
    * arrival's digit-masked text hash keys the same first-seen registry
    * as the text/image gates ([[StreamingDedup.keyedFirstSeenGate]]) —
    * a repost that differs only in ids/counters collides the moment it
    * arrives. Input `docs`: (doc_id, text, batch). */
  def templateCollisionsMulti(s: SparkSession, docs: DataFrame,
      nBatches: Int): DataFrame =
    throughChunkedStream(s, "tmplg", nBatches,
      (docs, Seq("doc_id", "text"))) { (ss, srcs) =>
      import ss.implicits._
      val keyed = ss.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcs.head)
        .select(col("doc_id"), graft.plans.native.poly_hash(
          regexp_replace(col("text"), "[0-9]+", "#")).as("k"))
        .as[(Long, Long)]
      StreamingDedup.keyedFirstSeenGate(keyed).toDF().writeStream
    }

  /** [[StreamingDedup.nearDupGate]] fed `(doc_id, text)`: one
    * micro-batch + empty registry flags exactly the batch relation —
    * for every band bucket, each doc sharing it with an earlier
    * (smaller-id) doc emits one (doc_id, bucket, first_doc) collision
    * row. The oracle recomputes the portable minhash banding in SQL. */
  def nearDupCollisions(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val input = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text").cast("string").as("text"))
    throughStream(s, input, "ndg") { (ss, src) =>
      val stream = ss.readStream.schema("doc_id LONG, text STRING")
        .parquet(src).as[StreamingDedup.Doc]
      StreamingDedup.nearDupGate(stream).toDF().writeStream
    }
  }
}
