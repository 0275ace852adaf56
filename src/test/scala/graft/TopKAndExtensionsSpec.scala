package graft

import graft.operators.Similarity
import graft.plans.{GraftExtensions, Scored, TopKAggregator, native}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The typed top-k aggregator must equal the window formulation row for
  * row, and the injected optimizer rule must add the jaccard size prune
  * to naive user filters. */
class TopKAndExtensionsSpec extends SparkSpec {

  test("TopKAggregator == window row_number top-k") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf())
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("key"), col("embedding").as("pv"))
    val scored = Tables.embeddings(spark, sf())
      .select(col("vec_id").as("id"), col("embedding").as("cv"))
      .join(broadcast(probes), col("key") =!= col("id"))
      .select(col("key"), col("id"),
        native.cosine_sim(col("pv"), col("cv")).as("score"))

    val viaAgg = scored.as[Scored]
      .groupByKey(_.key)
      .agg(new TopKAggregator(5).toColumn.name("topk"))
      .flatMap { case (k, tk) => tk.map { case (id, s) => (k, id, s) } }
      .toDF("key", "id", "score")
      .orderBy("key", "id").collect().toSeq

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("score").desc, col("id"))
    val viaWindow = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .orderBy("key", "id").collect().toSeq

    assert(viaAgg == viaWindow)
  }

  test("IVF search: deterministic, candidates come from probed lists only") {
    val emb = Tables.embeddings(spark, sf())
    val r1 = Similarity.ivfTopK(emb, col("vec_id") < 10, k = 5, nprobe = 2)
      .orderBy("probe_id", "cand_id").collect().toSeq
    val r2 = Similarity.ivfTopK(emb, col("vec_id") < 10, k = 5, nprobe = 2)
      .orderBy("probe_id", "cand_id").collect().toSeq
    assert(r1 == r2 && r1.nonEmpty)
    // every IVF cosine is <= the brute-force best for that probe
    val brute = Similarity.cosineTopK(emb, col("vec_id") < 10, 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    r1.foreach { row =>
      assert(row.getDouble(2) <= brute(row.getLong(0)) + 1e-9)
    }
  }

  test("JaccardSizePruneRule injects size bounds into naive filters") {
    // getOrCreate returns the active session (ignoring extensions), so
    // detach it first; the new session shares the SparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val docs = Tables.documents(ext, sf()).limit(50)
      val g = docs.select(col("doc_id"), col("lang"),
        native.ngram_hash_set(col("text"), 3).as("ng"))
      val a = g.select(col("lang"), col("doc_id").as("da"), col("ng").as("na"))
      val b = g.select(col("lang").as("lang_b"), col("doc_id").as("db"),
        col("ng").as("nb"))
      // naive user query: no manual size prune
      val naive = a.join(b, col("lang") === col("lang_b") && col("da") < col("db"))
        .filter(native.sorted_jaccard(col("na"), col("nb")) >= 0.8)
      val optimized = naive.queryExecution.optimizedPlan.toString
      assert(optimized.contains("size("),
        s"size prune not injected:\n$optimized")
      // and the rule must not change results
      assert(naive.count() ==
        a.join(b, col("lang") === col("lang_b") && col("da") < col("db"))
          .withColumn("j", native.sorted_jaccard(col("na"), col("nb")))
          .filter(col("j") >= 0.8).count())
      // a threshold under OR is NOT implied by the whole condition: the
      // rule must not fire (injected bounds would drop rows that survive
      // via the other branch)
      val orQ = a.join(b, col("lang") === col("lang_b") && col("da") < col("db"))
        .filter(col("da") === 1 ||
          native.sorted_jaccard(col("na"), col("nb")) >= 0.8)
      val orPlan = orQ.queryExecution.optimizedPlan.toString
      assert(!orPlan.contains("size("),
        s"size prune wrongly injected under OR:\n$orPlan")
      assert(orQ.count() ==
        a.join(b, col("lang") === col("lang_b") && col("da") < col("db"))
          .withColumn("j", native.sorted_jaccard(col("na"), col("nb")))
          .filter(col("da") === 1 || col("j") >= 0.8).count())
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("BottomKPairsAggregator: arrival-order invariant, redelivery collapses") {
    // r11 (sample_exact_k_stream): the streamed holdout's two claims —
    // ANY batch split of the corpus drains to the batch draw, and a
    // redelivered id cannot occupy two sample slots
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.sources.Tables.documents(spark, sf())
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("doc_id"))
    val batch = graft.operators.Curation
      .sampleExactK(graft.sources.Tables.documents(spark, sf()), k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val obs = docs.select(
        org.apache.spark.sql.functions.col("source"),
        graft.operators.Curation.samplePriority(
          org.apache.spark.sql.functions.col("doc_id")).as("u"),
        org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(r => graft.plans.PairObs(r.getString(0), r.getLong(1),
        r.getLong(2))).toSeq
    // adversarial split: reverse order, 3 uneven batches, and the
    // FIRST 40 observations redelivered verbatim in the last batch
    val rev = obs.reverse
    val batches = Seq(rev.take(7), rev.slice(7, 250),
      rev.drop(250) ++ obs.take(40))
    val ms = MemoryStream[graft.plans.PairObs]
    val q = ms.toDS().groupByKey(_.key)
      .agg(new graft.plans.BottomKPairsAggregator(5).toColumn.name("ps"))
      .toDF("key", "ps")
      .writeStream.format("memory").queryName("smpk_spec")
      .outputMode("complete").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      val streamed = spark.table("smpk_spec")
        .as[(String, Seq[(Long, Long)])].collect()
        .flatMap { case (src, ps) => ps.zipWithIndex.map { case ((_, id), i) =>
          (id, src, (i + 1).toLong) } }.toSet
      assert(streamed == batch,
        s"streamed holdout diverged: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
    } finally q.stop()
  }
}
