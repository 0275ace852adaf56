package graft

import graft.operators.Skew
import graft.streaming.StreamingSessionize
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The 100 TB posture techniques must be *demonstrably* correct and
  * shuffle-shaped as claimed: salted aggregation equals direct
  * aggregation; bucketed co-located joins plan without a shuffle;
  * stateful streaming sessions agree with the batch formulation. */
class ScaleTechniquesSpec extends SparkSpec {

  test("salted aggregation == direct aggregation") {
    val ev = Tables.events(spark, sf())
      .select(col("event_type"), (col("value") * 100).cast("long").as("cents"))
    val direct = ev.groupBy("event_type")
      .agg(sum("cents").as("sum_value"), count(lit(1)).as("n"))
      .orderBy("event_type").collect().toSeq
    val salted = Skew.saltedSumCount(ev, Seq("event_type"), "cents", salts = 16)
      .orderBy("event_type").collect().toSeq
    assert(salted == direct)
  }

  test("bucketed co-located join plans without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      // in-memory catalog forgets tables across JVMs but their warehouse
      // dirs persist; clear them so saveAsTable can recreate
      Seq("b_orders", "b_customer").foreach { t =>
        val d = new java.io.File(s"spark-warehouse/$t")
        if (d.exists()) {
          import scala.reflect.io.Directory
          new Directory(d).deleteRecursively()
        }
      }
      spark.read.parquet(s"${sf()}/orders.parquet")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
      spark.read.parquet(s"${sf()}/customer.parquet")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_customer")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hot-key sync corpus: time-bucketed window keys bound the hot partition; salting splits the hot agg") {
    import graft.operators.{SyncConfig, SyncPipeline}
    // the r6-verdict #5 shape: ONE topic carries 90% of the stream
    val msgs = Tables.events(spark, sf())
      .select(col("event_id").as("msg_id"), col("event_type").as("topic"),
        timestamp_micros(expr("ts div 1000")).as("publish_time"),
        col("props").as("data"))
      .withColumn("topic",
        when(pmod(col("msg_id"), lit(10)) < 9, lit("hot"))
          .otherwise(col("topic")))
    // the events payload carries no app field, so every message enriches
    // to __DEFAULT_APP__ — the app dimension is ALREADY 100% skewed; the
    // planted topic skew covers the index dimension
    val cfg = SyncConfig(rateLimits = Map("__DEFAULT_APP__" -> 1000000),
      rateLimitWindow = "hour")
    val out = SyncPipeline(cfg)(msgs).cache()
    val total = out.count()
    val hotRows = out.filter(col("topic_base") === "hot").count()
    assert(hotRows.toDouble / total >= 0.85, "the corpus is actually skewed")

    // 1. the admission window partitions on (app, hour) and the app key
    //    is one value for 100% of rows: the LARGEST window partition
    //    must still be a small fraction of the stream — the hour bucket
    //    in the key is what keeps the rate-limit stage off a single
    //    task at 100 TB
    val maxWindowPart = out
      .groupBy(col("app"), date_trunc("hour", col("publish_time")))
      .count().agg(max("count")).head.getLong(0)
    assert(maxWindowPart.toDouble / total <= 0.10,
      s"the sole app must spread over hour buckets: max $maxWindowPart of $total")

    // 2. bulk batching partitions on index = topic-DATE: the hot
    //    topic's 90% splits across its dates the same way
    val maxIndexPart = out.groupBy(col("index")).count()
      .agg(max("count")).head.getLong(0)
    assert(maxIndexPart.toDouble / hotRows <= 0.25,
      s"hot index must split by date: max $maxIndexPart of $hotRows")

    // 3. the per-topic metrics agg on the 90% key: salted ≡ direct
    //    (the mitigation for the one stage whose key has NO time bucket)
    val ev = out.select(col("topic_base"),
      col("field_count").cast("long").as("v"))
    val direct = ev.groupBy("topic_base")
      .agg(sum("v").as("sum_value"), count(lit(1)).as("n"))
      .orderBy("topic_base").collect().toSeq
    val salted = Skew.saltedSumCount(ev, Seq("topic_base"), "v", salts = 16)
      .orderBy("topic_base").collect().toSeq
    assert(salted == direct, "salted agg must equal direct on the hot key")
    out.unpersist()
  }

  test("Zipf-skewed word join: AQE skew-join splits the hot partition") {
    // the lmUnigramScore web-scale shape (SURVEY §6): vocab too big to
    // broadcast → the score join shuffles by word and the Zipf head
    // lands in one partition; AQE must split it (the build side is one
    // row per word, so splitting is always legal)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevT = spark.conf.get(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    val prevF = spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val prevA = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // thresholds sized for a local test: the hot partition is MBs raw but
    // lz4 map-output compression shrinks the near-constant rows a lot
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4096")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1024")
    try {
      // 90% of 200k tokens are the head word — one hot shuffle partition
      val words = spark.range(0, 200000).select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(10)) < 9, lit("the"))
          .otherwise(concat(lit("w"), pmod(col("id"), lit(1000)))).as("word"))
      // the vocab table must be MATERIALIZED for the split to be legal in
      // AQE's pattern: OptimizeSkewedJoin only matches a sort-merge join
      // whose Sort children sit directly on shuffle stages — an inline
      // groupBy on the counts side leaves its final HashAggregate between
      // the Sort and the shuffle and the rule never fires. At web scale
      // the vocab/score table is a stored artifact anyway; Materialize is
      // the in-plan equivalent.
      val counts = graft.operators.Materialize(
        words.groupBy("word").agg(count(lit(1)).as("cnt")))
      val joined = words.join(counts, "word")
      // materialize THIS dataframe's own query execution (count() would
      // run a different QueryExecution and leave this plan un-finalized)
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE skew-join did not fire:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", prevT)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", prevF)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prevA)
    }
  }

  test("LM score against the WRITTEN vocab artifact: skew-join fires, scores exact") {
    // the real web-scale wiring (round-3 ask #6): lmUnigramScoreVocab
    // joins the corpus against the STORED vocabBuild parquet — the build
    // side sits directly on a shuffle stage, so OptimizeSkewedJoin can
    // split the Zipf-head partition without any in-plan Materialize
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevT = spark.conf.get(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    val prevF = spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val prevA = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4096")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1024")
    try {
      // 90% of 200k single-token docs are the head word — one hot
      // shuffle partition on the score join's word key
      val docs = spark.range(0, 200000).select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(10)) < 9, lit("the"))
          .otherwise(concat(lit("w"), pmod(col("id"), lit(1000))))
          .as("text"))
      val vocabDir = Files.createTempDirectory("graft_vocab_artifact").toString
      graft.operators.Curation.vocabBuild(docs, minCount = 1)
        .write.mode("overwrite").parquet(vocabDir)
      val scored = graft.operators.Curation.lmUnigramScoreVocab(
        docs, spark.read.parquet(vocabDir))
      val rows = scored.collect()
      assert(rows.length == 200000)
      val plan = scored.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE skew-join did not fire on the vocab-artifact join:\n$plan")
      // scores must equal the inline-aggregate formulation exactly
      val inline = graft.operators.Curation.lmUnigramScore(docs)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      rows.foreach { r =>
        val got = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
        assert(inline(r.getLong(0)) == got,
          s"doc ${r.getLong(0)}: vocab-scored $got != inline ${inline(r.getLong(0))}")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", prevT)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", prevF)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prevA)
    }
  }

  test("connected components converge on a worst-case-diameter chain") {
    import spark.implicits._
    // a 2000-node path graph has diameter 2000: plain min-label
    // propagation needs ~2000 rounds and would hit maxIter=50; the
    // pointer-jumping hop gives O(log n) — converging under the default
    // cap IS the proof the hop works
    val edges = (0L until 1999L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = graft.operators.Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 2000)
    assert(labels.forall(_._2 == 0L), "every node must label to the root")
  }

  test("stateful streaming sessions == batch sessions (closed ones)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val tmp = Files.createTempDirectory("graft-sess").toString
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("ts"))
    ev.write.parquet(s"$tmp/src")

    val stream = spark.readStream.schema("user_id LONG, ts TIMESTAMP")
      .parquet(s"$tmp/src").as[StreamingSessionize.Event]
    val q = StreamingSessionize.sessions(stream, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // session_start passed through java.sql.Timestamp.getTime → ms
    // precision; key the comparison on ms on both sides
    val streamed = spark.table("sess_stream")
      .select(col("user_id"), unix_millis(col("session_start")).as("start_ms"),
        col("n_events"))

    // batch reference: same gap logic via window functions
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val batch = ev
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s", when(col("prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev")) > 30L * 60 * 1000000, 1L)
        .otherwise(0L))
      .withColumn("sid", sum("new_s").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(floor(min(unix_micros(col("ts"))) / 1000).as("start_ms"),
        count(lit(1)).as("n_events"))

    // streamed sessions are those the watermark closed; each must match
    // the batch session with the same (user, start) exactly
    val joined = streamed.as("st").join(batch.as("b"),
      Seq("user_id", "start_ms"), "left")
    assert(joined.filter(col("b.n_events").isNull ||
      col("st.n_events") =!= col("b.n_events")).count() == 0)
    assert(streamed.count() > 0)
  }
}
