package graft

import graft.operators.{Curation, Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Invariants of the round-8 operators that the oracle rows cannot
  * express directly: packing capacity, rebalance conservation, the
  * pcaPower overflow guard, and MIPS-vs-brute agreement. */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta", "s1"),
    (2L, "alpha beta", "s1"),
    (3L, "the alpha of the beta gamma", "s1"),
    (4L, "x", "s2"),
    (5L, "x y z w v u t s r q p o n m l k", "s2"),
    (6L, "alpha beta gamma delta", "s2")
  ).toDF("doc_id", "text", "source")

  test("packNoSplit: no bin exceeds seqLen; every admitted doc packs once") {
    val seqLen = 8
    val bins = Curation.packNoSplit(docs, seqLen).collect()
    assert(bins.forall(r => r.getAs[Long]("n_tokens") <= seqLen))
    val admitted = docs
      .withColumn("n", graft.plans.native.token_count(col("text")))
      .filter(col("n") > 0).count()
    assert(bins.map(_.getAs[Long]("n_docs")).sum == admitted)
  }

  test("shardRebalance: moves conserve bytes — donors drain exactly their excess") {
    val sharded = Seq((0L, 100L), (1L, 10L), (2L, 10L), (3L, 40L))
      .toDF("shard", "n_chars")
    val plan = Curation.shardRebalance(sharded).collect()
    // total = 160, n = 4 → target 40 per shard; shard 0 excess 60,
    // shards 1 and 2 deficit 30 each, shard 3 balanced
    val out = plan.map(r => (r.getAs[Long]("from_shard"),
      r.getAs[Long]("to_shard"), r.getAs[Long]("moved"))).toSet
    assert(out == Set((0L, 1L, 30L), (0L, 2L, 30L)))
  }

  test("pcaPower: overflow guard fails loudly instead of wrapping") {
    val emb = (0 until 10).map(i =>
      (i.toLong, Array.fill(64)(0.9f))).toDF("vec_id", "embedding")
    // scale=10^9 → nVec·scale² ≈ 10^19 > Long.Max: must throw, not wrap
    val e = intercept[IllegalArgumentException] {
      Similarity.pcaPower(emb, scale = 1000000000L).collect()
    }
    assert(e.getMessage.contains("pcaPower"))
  }

  test("shardChecksums: any drop/duplicate/mutation flips a shard's checksum triple") {
    // r11: the export-integrity contract — recomputing on a corrupted
    // copy must disagree with the source manifest, and partial
    // checksums merge by XOR (so a resharded copy verifies piecewise)
    val docs = graft.sources.Tables.documents(spark, sf())
    val sharded = Curation.shardAssign(docs, 4)
    def sums(df: org.apache.spark.sql.DataFrame) =
      Curation.shardChecksums(df).orderBy("shard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val base = sums(sharded)
    // drop one row
    assert(sums(sharded.filter(col("doc_id") =!= 3L)) != base)
    // duplicate one row
    assert(sums(sharded.union(sharded.filter(col("doc_id") === 3L))) != base)
    // mutate one row's text
    assert(sums(sharded.withColumn("text",
      when(col("doc_id") === 3L, concat(col("text"), lit(" x")))
        .otherwise(col("text")))) != base)
    // merge-by-XOR: per-half checksums XOR/sum to the full manifest
    val h1 = sums(sharded.filter(col("doc_id") % 2 === 0))
    val h2 = sums(sharded.filter(col("doc_id") % 2 === 1))
    val merged = (h1 ++ h2).groupBy(_._1).map { case (s2, rows) =>
      (s2, rows.map(_._2).sum, rows.map(_._3).sum,
        rows.map(_._4).reduce(_ ^ _))
    }.toSeq.sortBy(_._1)
    assert(merged == base, s"piecewise merge diverged: $merged vs $base")
  }

  test("qualityCalibrate: zero-MAD source keeps all at z=0; z centers on the source median") {
    // r11: the cross-source normalization contract — a uniform source
    // has no outliers to cut (z ≡ 0, all kept), and within a varied
    // source the median-score doc sits exactly at z = 0 with the rest
    // signed around it
    val docs = Seq(
      (1L, "aa bb", "s1"), (2L, "aa bb", "s1"), (3L, "aa bb", "s1"),
      (4L, "m", "s2"), (5L, "m n o p q r", "s2"),
      (6L, "m n o p q r s t u v w x", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Curation.qualityCalibrate(docs).orderBy("doc_id").collect()
    val s1 = out.filter(_.getString(1) == "s1")
    assert(s1.length == 3 &&
      s1.forall(r => r.getDouble(3) == 0.0 && r.getBoolean(4)))
    val s2 = out.filter(_.getString(1) == "s2")
      .map(r => (r.getLong(2), r.getDouble(3))).sortBy(_._1)
    // median-score doc at z = 0; lower/higher scores signed around it
    assert(s2(1)._2 == 0.0, s2.toSeq.toString)
    assert(s2(0)._2 < 0.0 && s2(2)._2 > 0.0, s2.toSeq.toString)
  }

  test("rakeScores: stopwords never score; degree >= freq") {
    val r = TextAnalysis.rakeScores(docs, Seq("the", "a")).collect()
    val words = r.map(_.getAs[String]("word")).toSet
    assert(!words.contains("the") && !words.contains("a"))
    assert(r.forall(row =>
      row.getAs[Long]("degree") >= row.getAs[Long]("freq")))
  }

  test("knTable3: context counts aggregate the trigram counts exactly") {
    val t = Curation.knTable3(docs)
    val byCtx = t.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c123")).as("s"), max(col("c12")).as("c12"))
      .collect()
    assert(byCtx.nonEmpty)
    assert(byCtx.forall(r => r.getAs[Long]("s") == r.getAs[Long]("c12")))
    val probs = t.select(col("p_kn")).as[Double].collect()
    assert(probs.forall(p => p > 0.0 && p <= 1.5))
  }

  test("mipsTopKAgg agrees with a brute-force inner-product ranking") {
    val emb = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(64)(d => ((i * 31 + d * 7) % 13 - 6) / 6.0f))
    }.toDF("vec_id", "embedding")
    val got = Similarity.mipsTopKAgg(emb, col("vec_id") === 0, k = 3)
      .orderBy(col("dot").desc, col("cand_id"))
      .select("cand_id").as[Long].collect().toSeq
    val rows = emb.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray))
    val probe = rows.find(_._1 == 0L).get._2
    val brute = rows.filter(_._1 != 0L)
      .map { case (id, v) =>
        (id, v.zip(probe).map { case (a, b) => a.toDouble * b.toDouble }.sum)
      }
      .sortBy { case (id, d) => (-d, id) }.take(3).map(_._1).toSeq
    assert(got == brute)
  }

  test("pcaTop2: first direction equals pcaPower's; second is near-orthogonal") {
    val emb = (0 until 200).map { i =>
      // two planted directions: strong on dims 0-1, weaker on dims 2-3
      val v = Array.fill(64)(0.0f)
      if (i % 2 == 0) { v(0) = 1.0f; v(1) = 0.5f }
      else { v(2) = 0.8f; v(3) = -0.4f }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val both = Similarity.pcaTop2(emb).collect()
      .groupBy(_.getAs[Long]("comp_id"))
      .map { case (k, rows) =>
        k -> rows.sortBy(_.getAs[Long]("dim")).map(_.getAs[Long]("comp"))
      }
    val v1 = both(1L); val v2 = both(2L)
    val first = Similarity.pcaPower(emb).collect()
      .sortBy(_.getAs[Long]("dim")).map(_.getAs[Long]("comp"))
    assert(v1.toSeq == first.toSeq,
      "comp_id 1 must be exactly the pcaPower direction")
    def dot(a: Array[Long], b: Array[Long]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val cos = dot(v1, v2) /
      (math.sqrt(dot(v1, v1)) * math.sqrt(dot(v2, v2)))
    assert(math.abs(cos) < 0.15,
      s"deflated direction must be near-orthogonal, cos=$cos")
  }

  test("bloomFpr: shared grams are all positive and rates are consistent") {
    val r = Dedup.bloomFpr(docs.filter(col("doc_id") > 2),
      docs.filter(col("doc_id") <= 2), n = 3).collect().head
    val tested = r.getAs[Long]("n_tested")
    val fp = r.getAs[Long]("n_false_pos")
    assert(fp >= 0 && fp <= tested)
    assert(r.getAs[Long]("bits_set") > 0)
    assert(r.getAs[Long]("m_bits") == 4096L)
  }
}
