package graft

import graft.operators.{Curation, Similarity, Sketches}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-4 additions: DSIR importance weights, mixture scheduling,
  * CMS-gated heavy hitters, and label-centroid embedding distances —
  * semantics on synthetic corpora where ground truth is computable by
  * hand, plus the plan shapes their scale story depends on. */
class PipelineOpsSpec extends SparkSpec {

  import spark.implicits._

  test("dsirWeights: target-like docs outscore raw-like docs") {
    // target docs draw from vocab A, background from vocab B; a held-out
    // A-like doc must score positive, a B-like doc negative
    val a = "alpha beta gamma delta epsilon"
    val b = "zeta eta theta iota kappa"
    val docs = ((0 until 40).map(i => (i.toLong, a, "tgt")) ++
      (40 until 80).map(i => (i.toLong, b, "raw")) ++
      Seq((100L, a, "probe"), (101L, b, "probe")))
      .toDF("doc_id", "text", "source")
    val w = Curation.dsirWeights(docs, col("source") === "tgt").cache()
    val probeA = w.filter(col("doc_id") === 100L).head
    val probeB = w.filter(col("doc_id") === 101L).head
    assert(probeA.getAs[Double]("dsir_score") > 0,
      s"A-like probe must be target-like: $probeA")
    assert(probeB.getAs[Double]("dsir_score") < 0,
      s"B-like probe must be raw-like: $probeB")
    assert(probeA.getAs[Boolean]("selected") && !probeB.getAs[Boolean]("selected"))
    // deterministic under re-evaluation
    val again = Curation.dsirWeights(docs, col("source") === "tgt")
      .select("doc_id", "dsir_score").collect().toSet
    assert(w.select("doc_id", "dsir_score").collect().toSet === again)
  }

  test("dsirWeights: weight-table join is broadcast; one corpus-wide stage") {
    val df = Curation.dsirWeights(Tables.documents(spark, sf()),
      col("source") === "src0")
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the B-row weight table must broadcast, not shuffle:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join allowed:\n$p")
  }

  test("mixSchedule: cap binds on a skewed corpus and mass redistributes") {
    // one dominant source (10k tokens) vs four small (100 each): with
    // α=0.5 the dominant sqrt-share is 1/(1+4·0.1)·... > 0.06 cap
    val docs = (Seq.fill(100)("big") ++ Seq.fill(1)("s1") ++
      Seq.fill(1)("s2") ++ Seq.fill(1)("s3") ++ Seq.fill(1)("s4"))
      .zipWithIndex
      .map { case (src, i) => (i.toLong, Seq.fill(100)("w").mkString(" "), src) }
      .toDF("doc_id", "text", "source")
    val m = Curation.mixSchedule(docs, alpha = 0.5, cap = 0.3,
      budget = 1000L).cache()
    val big = m.filter(col("source") === "big").head
    assert(big.getAs[Boolean]("capped"), s"dominant source must cap: $big")
    assert(big.getAs[Double]("share") === 0.3)
    // the freed mass lands on the uncapped sources: share > raw p
    val small = m.filter(col("source") =!= "big").collect()
    assert(small.forall(r =>
      r.getAs[Double]("share") > r.getAs[Double]("raw_share")),
      s"uncapped sources must gain redistributed mass: ${small.mkString(",")}")
    // total share stays ≈ 1 (one-round redistribution, 6-dp rounding)
    val tot = m.agg(sum("share")).head.getDouble(0)
    assert(math.abs(tot - 1.0) < 1e-3, s"shares must re-normalize: $tot")
    assert(m.agg(sum("alloc_tokens")).head.getLong(0) <= 1000L)
  }

  test("heavyHitters: exactly the true heavy-hitter set, gate is narrow") {
    // zipf-ish synthetic stream: w0 ×600, w1 ×300, w2 ×90, tail ×10 each
    val words = (Seq.fill(600)("w0") ++ Seq.fill(300)("w1") ++
      Seq.fill(90)("w2") ++ (0 until 10).flatMap(i => Seq.fill(10)(s"t$i")))
      .toDF("word")
    val hh = Sketches.heavyHitters(words, col("word"), fracDenom = 10)
    // total = 1090, threshold = 109: w0 and w1 qualify, w2 (90) does not
    val got = hh.select("item", "freq").as[(String, Long)].collect().toMap
    assert(got === Map("w0" -> 600L, "w1" -> 300L), s"got $got")
    // the sketch gate must be a narrow literal probe — no join anywhere
    val p = hh.queryExecution.sparkPlan.toString
    assert(!p.contains("Join"), s"the CMS gate must not plan a join:\n$p")
  }

  test("heavyHitters: collision-heavy grid still yields the exact set") {
    // width=4 forces collisions → false positives enter the gate; the
    // exact recount must still drop them (parity with plain HAVING)
    val words = (Seq.fill(200)("hot") ++ (0 until 50).map(i => s"cold$i"))
      .toDF("word")
    val hh = Sketches.heavyHitters(words, col("word"), fracDenom = 5,
      depth = 2, width = 4)
    val exact = words.groupBy(col("word").as("item"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") * 5 >= 250)
      .select("item", "freq").collect().toSet
    assert(hh.select("item", "freq").collect().toSet === exact)
  }

  test("labelCentroidDistance: geometry and broadcast posture") {
    // two labels; label 0's vectors are symmetric about the origin →
    // centroid = 0 → equal distances; label 1 has an off-manifold outlier
    val rows = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(-1f, 0f), 0),
      (2L, Array(0f, 1f), 1), (3L, Array(0f, 3f), 1), (4L, Array(0f, 20f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val d = Similarity.labelCentroidDistance(emb).cache()
    val m = d.select("vec_id", "centroid_dist").as[(Long, Double)]
      .collect().toMap
    assert(m(0L) === m(1L), "symmetric vectors are equidistant")
    assert(m(0L) === 1.0, "centroid of ±e1 is the origin")
    // label-1 centroid is (0, 8): distances 7, 5, 12 — outlier largest
    assert(m(4L) > m(2L) && m(4L) > m(3L), s"outlier must be farthest: $m")
    assert(m(2L) === 7.0 && m(3L) === 5.0 && m(4L) === 12.0)
    val p = d.queryExecution.sparkPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"centroid table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus shuffle join:\n$p")
  }

  test("globalCumSum: exact prefix sums under any layout, no global window") {
    // parity vs the single-partition reference on a shuffled small table
    val rows = (0 until 500).map(i => ((i * 37) % 500L, (i % 13 + 1).toLong))
    val df = rows.toDF("id", "v").repartition(7)
    val cum = Curation.globalCumSum(df, Seq(col("id")), col("v"), "cum")
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect()
    var acc = 0L
    val expect = rows.sortBy(_._1).map { case (id, v) => acc += v; (id, acc) }
    assert(cum.toSeq === expect)
    val plan = Curation.globalCumSum(df, Seq(col("id")), col("v"), "cum")
      .queryExecution.sparkPlan
    val unpart = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty, s"cum-sum planned a single-partition window:\n$plan")
  }

  test("charEntropy: hand-computable distributions") {
    val docs = Seq((0L, "aabb"), (1L, "aaaa"), (2L, "abcd"), (3L, ""))
      .toDF("doc_id", "text")
    val e = graft.operators.TextAnalysis.charEntropy(docs)
      .orderBy("doc_id").collect()
    assert(e(0).getAs[Double]("entropy") === math.round(math.log(2) * 1e6) / 1e6,
      "uniform 2-symbol → ln 2")
    assert(e(1).getAs[Double]("entropy") === 0.0, "single symbol → 0")
    assert(e(2).getAs[Double]("entropy") === math.round(math.log(4) * 1e6) / 1e6,
      "uniform 4-symbol → ln 4")
    assert(e(3).isNullAt(e(3).fieldIndex("entropy")), "empty doc → NULL")
    assert(e(0).getAs[Long]("n_distinct") === 2L)
  }

  test("sqDistortion: half-cell error bound, constant dims free, narrow plan") {
    // dim 1 spans [0, 256] → cell width 1, midpoint error ≤ 0.5;
    // dim 2 is constant → quantizes exactly (contributes 0)
    val rows = (0 until 256).map(i => (i.toLong, Array(i.toFloat, 7f), 0))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val d = Similarity.sqDistortion(emb).cache()
    val vals = d.select("sq_distortion").as[Double].collect()
    assert(vals.forall(v => v >= 0 && v <= 0.5 + 1e-9),
      s"distortion must sit inside the half-cell bound: max=${vals.max}")
    assert(vals.exists(_ > 0), "quantization error should be non-trivial")
    // corpus audit: distortion bounded by sqrt(sum of per-dim half-cells)
    val corpus = graft.sources.Tables.embeddings(spark, sf())
    val stats = corpus.select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim").agg((max(col("x")) - min(col("x"))).as("range"))
      .select("range").as[Float].collect()
    val bound = math.sqrt(stats.map(r => math.pow(r / 512.0, 2)).sum) + 1e-6
    val worst = Similarity.sqDistortion(corpus)
      .agg(max("sq_distortion")).head.getDouble(0)
    assert(worst <= bound, s"corpus distortion $worst exceeds bound $bound")
    // the quantize pass is narrow: no join anywhere in the plan
    val p = Similarity.sqDistortion(emb).queryExecution.sparkPlan.toString
    assert(!p.contains("Join"), s"SQ audit must not plan a join:\n$p")
  }

  test("vocabMerge: threshold applies post-merge, 3-way split == rebuild") {
    // "rare" appears once per batch — under minCount=2 it must survive
    // ONLY because the threshold is applied to the merged totals
    val batches = (0 until 3).map { b =>
      ((b * 10) until (b * 10 + 3)).map(i => (i.toLong, s"common w$b rare"))
        .toDF("doc_id", "text")
    }
    val merged = Curation.vocabMerge(batches.map(Curation.vocabCounts(_)),
      minCount = 2).orderBy("vocab_id")
    val full = Curation.vocabBuild(batches.reduce(_ unionAll _), minCount = 2)
      .orderBy("vocab_id")
    assert(merged.collect().toSeq === full.collect().toSeq)
    assert(merged.filter(col("word") === "rare").count() === 1,
      "a word crossing minCount only after merging must be kept")
  }

  test("curate_funnel: monotone non-increasing stage counts") {
    val f = SparkEntry.queries("curate_funnel")(spark, sf())
      .orderBy("stage").select("n_docs").as[Long].collect()
    assert(f.length === 5)
    assert(f.sliding(2).forall { case Array(a, b) => b <= a; case _ => true },
      s"every gate can only shrink the corpus: ${f.toSeq}")
    assert(f.last > 0, "the pipeline must not empty the corpus")
  }

  test("degenerate inputs: empty/edge corpora don't wedge the new operators") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // DSIR with an empty target set: t_tot = 0, add-1 smoothing keeps
    // every weight finite; all scores defined
    val one = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val w = Curation.dsirWeights(one, lit(false)).collect()
    assert(w.length === 2 && w.forall(r =>
      !r.getAs[Double]("dsir_score").isNaN &&
      !r.getAs[Double]("dsir_score").isInfinite))
    // mixSchedule with ONE source: p = 1 >= any cap → capped, share = cap
    val m = Curation.mixSchedule(one.withColumn("source", lit("only")),
      cap = 0.5).collect()
    assert(m.length === 1 && m.head.getAs[Boolean]("capped") &&
      m.head.getAs[Double]("share") === 0.5)
    // heavyHitters on an empty stream: empty result, no division issues
    assert(Sketches.heavyHitters(empty.select(col("text").as("word")),
      col("word"), 10).collect().isEmpty)
    // BPE on an empty corpus: zero merges, empty audit
    assert(graft.operators.Tokenizer.bpeMerges(empty, 3).collect().isEmpty)
    assert(graft.operators.Tokenizer.bpeCompressionAudit(empty, 3)
      .collect().isEmpty)
    // cumulative sum over an empty table: empty, no offsets to collect
    assert(Curation.globalCumSum(empty.withColumn("v", lit(1L)),
      Seq(col("doc_id")), col("v"), "cum").collect().isEmpty)
    // tfidf on a single doc: idf = ln(1) = 0 → all scores 0, ranks by word
    val t = graft.operators.TextAnalysis.tfidfTopK(
      Seq((1L, "b a b")).toDF("doc_id", "text"), k = 2).orderBy("rank").collect()
    assert(t.length === 2 && t.forall(_.getAs[Double]("tfidf") === 0.0) &&
      t.map(_.getAs[String]("word")).toSeq === Seq("a", "b"))
  }

  test("curriculum rank: contiguous, quality-ordered, partitioned windows only") {
    val df = SparkEntry.queries("curate_curriculum")(spark, sf())
    val rows = df.select("curriculum_rank", "quality")
      .as[(Long, Double)].collect()
    assert(rows.map(_._1).toSeq === rows.indices.map(_.toLong),
      "ranks must be a contiguous 0-based sequence")
    assert(rows.sliding(2).forall {
      case Array((_, q1), (_, q2)) => q1 >= q2
      case _ => true
    }, "rank order must be non-increasing quality")
    // the two-phase rank must never plan an unpartitioned window
    val unpart = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty,
      s"curriculum rank planned a single-partition window:\n${df.queryExecution.sparkPlan}")
  }
}
