package graft

import graft.functions.Portable
import graft.operators.{Graph, Pareto, Sketches, Temporal}
import org.apache.spark.sql.functions._

/** Invariants of the round-8 continuation operators that oracle
  * agreement alone cannot establish — in particular properties where
  * Spark and DuckDB share the formula, so a formula bug would cancel
  * out of the hash compare: Hilbert curve ADJACENCY (a broken xy2d
  * still agrees with its own CTE unroll), CUSUM's closed form vs the
  * literal recursion, skyline vs brute-force dominance, k-core vs a
  * driver-side reference peel, and the CMS dot upper bound.
  */
class ContinuationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hilbert: keys are a permutation and consecutive keys are grid-adjacent") {
    // exhaustive 32×32 grid through the 16-bit production path: the
    // first 10 bits are zero for every point, which is exactly the
    // production regime (keys narrower than the bit budget)
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y))
      .toDF("x", "y")
    val keyed = Portable.withHilbert(grid, col("x"), col("y"), 16, "h")
      .collect().map(r => (r.getAs[Long]("h"), r.getAs[Int]("x"), r.getAs[Int]("y")))
      .sortBy(_._1)
    // a 16-bit curve visits the 32×32 subgrid in one contiguous key
    // run only if the subgrid is curve-aligned; instead assert the
    // DEFINING property pointwise: distinct keys, and the full
    // 65536-cell curve restricted to consecutive-key pairs that are
    // both in the subgrid is grid-adjacent
    assert(keyed.map(_._1).distinct.length == 1024)
    val byKey = keyed.map(t => t._1 -> (t._2, t._3)).toMap
    val adjacentPairs = keyed.map(_._1).filter(k => byKey.contains(k + 1))
    assert(adjacentPairs.nonEmpty)
    adjacentPairs.foreach { k =>
      val (x0, y0) = byKey(k); val (x1, y1) = byKey(k + 1)
      assert(math.abs(x0 - x1) + math.abs(y0 - y1) == 1,
        s"keys $k,${k + 1} map to non-adjacent cells ($x0,$y0)->($x1,$y1)")
    }
  }

  test("hilbert: matches the reference xy2d on random 16-bit points") {
    def xy2dRef(bits: Int, x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      val n = 1L << bits
      var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val rng = new scala.util.Random(42)
    val pts = Seq.fill(50)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    val got = Portable.withHilbert(pts.toDF("x", "y"), col("x"), col("y"),
        16, "h")
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")) ->
        r.getAs[Long]("h")).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == xy2dRef(16, x, y), s"mismatch at ($x,$y)")
    }
    // native codegen expr == the Portable HOF reference formula
    val parity = pts.toDF("x", "y")
      .select(graft.plans.native.hilbert_key(col("x"), col("y"), 16).as("n"),
        Portable.hilbertKey(col("x"), col("y"), 16).as("r"))
      .collect()
    assert(parity.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("cusum: closed form equals the literal max(0, s+x) recursion") {
    val rng = new scala.util.Random(7)
    val days = (0 until 40).map(i =>
      ("t1", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        rng.nextInt(20).toLong))
    val daily = days.toDF("topic", "day", "n")
    val got = Temporal.cusum(daily, hMult = 4L)
      .orderBy("day").collect().map(_.getAs[Long]("cusum"))
    val k = days.map(_._3).sum / days.length // dense == observed here
    var s = 0L
    val want = days.map { case (_, _, n) =>
      s = math.max(0L, s + (n - k)); s
    }
    assert(got.toSeq == want)
  }

  test("skyline2d: equals brute-force dominance, duplicates both survive") {
    val rng = new scala.util.Random(11)
    val pts = Seq.fill(300)((rng.nextInt(1000).toLong, rng.nextInt(1000).toLong)) ++
      Seq((999L, 999L), (999L, 999L)) // planted duplicate maximum
    val df = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val got = Pareto.skyline2d(df, "x", "y", bucketWidth = 100L)
      .collect().map(_.getAs[Long]("id")).toSet
    val want = pts.zipWithIndex.collect { case ((x, y), i)
      if !pts.exists { case (a, b) =>
        a >= x && b >= y && (a > x || b > y) } => i.toLong }.toSet
    assert(got == want)
    assert(got.count(i => pts(i.toInt) == (999L, 999L)) == 2)
  }

  test("skyline2d: shard-merge route equals the direct front") {
    val rng = new scala.util.Random(13)
    val df = Seq.fill(500)((rng.nextInt(100).toLong, rng.nextInt(100).toLong))
      .zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val direct = Pareto.skyline2d(df, "x", "y", bucketWidth = 10L)
      .collect().map(_.getAs[Long]("id")).toSet
    val local = Pareto.skyline2d(
        df.withColumn("sh", pmod(col("id"), lit(4L))),
        "x", "y", bucketWidth = 10L, groupCols = Seq("sh"))
      .drop("sh")
    val merged = Pareto.skyline2d(local, "x", "y", bucketWidth = 10L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(merged == direct)
  }

  test("kcorePeel: matches a driver-side reference peel, and converges here") {
    // two triangles sharing a bridge node + a pendant chain: the chain
    // peels away over rounds, the triangles survive any k=2 peel
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (3L, 5L), (5L, 6L), (6L, 7L)).toDF("a", "b")
    def refPeel(es: Set[(Long, Long)], k: Int, rounds: Int): Map[Long, Int] = {
      var cur = es
      for (_ <- 1 to rounds) {
        val deg = cur.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (d, xs) => d -> xs.size }
        val keep = deg.filter(_._2 >= k).keySet
        cur = cur.filter(e => keep(e._1) && keep(e._2))
      }
      cur.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (d, xs) => d -> xs.size }
    }
    val got = Graph.kcorePeel(edges, k = 2L, rounds = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("degree").toInt)
      .toMap
    val want = refPeel(Set((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (3L, 5L), (5L, 6L), (6L, 7L)), 2, 3)
    assert(got == want)
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L)) // chain peeled, cores stay
  }

  test("SkylineAggregator: front is invariant to insertion order") {
    val agg = new graft.plans.SkylineAggregator
    val rng = new scala.util.Random(3)
    val pts = Seq.fill(200)(graft.plans.FrontPoint(
      rng.nextLong().abs % 1000, rng.nextInt(50).toLong, rng.nextInt(50).toLong))
    val f1 = agg.finish(pts.foldLeft(agg.zero)(agg.reduce))
    val f2 = agg.finish(rng.shuffle(pts).foldLeft(agg.zero)(agg.reduce))
    // split-merge route: two partials merged
    val (a, b) = rng.shuffle(pts).splitAt(97)
    val f3 = agg.finish(agg.merge(
      a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce)))
    assert(f1.toSet == f2.toSet && f2.toSet == f3.toSet)
  }

  test("pcaWhiten: sd is the exact isqrt of the pb variance; w = pb*1000/sd") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val rows = graft.operators.Similarity.pcaWhiten(emb, iters = 3)
      .collect()
      .map(r => (r.getAs[Long]("comp_id"), r.getAs[Long]("pb"), r.getAs[Long]("w")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, comp) =>
      val pbs = comp.map(_._2)
      val n = pbs.length.toLong
      val sp = pbs.sum; val sp2 = pbs.map(p => p * p).sum
      val m = (if (sp < 0) -1L else 1L) * (math.abs(sp) / n)
      val varS = math.max(sp2 / n - m * m, 1L)
      var sd = 0L
      for (b <- 23 to 0 by -1) {
        val t = sd + (1L << b)
        if (t * t <= varS) sd = t
      }
      assert(sd * sd <= varS && (sd + 1) * (sd + 1) > varS)
      comp.foreach { case (_, pbv, w) =>
        val want = (if (pbv < 0) -1L else 1L) *
          (math.abs(pbv) * 1000 / math.max(sd, 1L))
        assert(w == want, s"pb=$pbv sd=$sd: got $w want $want")
      }
    }
  }

  test("AckLedgerAggregator: interval compression reads the ledger exactly, any order") {
    val agg = new graft.plans.AckLedgerAggregator
    // seqs 1..20, unacked at 5 and 12 → mark_delete=4, holes=18-4=14
    val obs = (1L to 20L).map(s =>
      graft.plans.AckObs("t", s, if (s == 5 || s == 12) 0 else 1))
    val want = graft.plans.AckLedger(20L, 4L, 14L)
    assert(agg.finish(obs.foldLeft(agg.zero)(agg.reduce)) == want)
    val rng = new scala.util.Random(5)
    val shuffled = rng.shuffle(obs)
    assert(agg.finish(shuffled.foldLeft(agg.zero)(agg.reduce)) == want)
    val (a, b) = shuffled.splitAt(7)
    assert(agg.finish(agg.merge(
      a.foldLeft(agg.zero)(agg.reduce),
      b.foldLeft(agg.zero)(agg.reduce))) == want)
    // fully acked → mark_delete = n, no holes
    val full = (1L to 9L).map(s => graft.plans.AckObs("t", s, 1))
    assert(agg.finish(full.foldLeft(agg.zero)(agg.reduce)) ==
      graft.plans.AckLedger(9L, 9L, 0L))
    // first message unacked → mark_delete 0, every ack is a hole
    val firstUn = (1L to 6L).map(s => graft.plans.AckObs("t", s, if (s == 1) 0 else 1))
    assert(agg.finish(firstUn.foldLeft(agg.zero)(agg.reduce)) ==
      graft.plans.AckLedger(6L, 0L, 5L))
  }

  test("cmsDot: estimate upper-bounds the exact dot and is exact without collisions") {
    val toks = Seq.tabulate(60)(i => (s"s${i % 2}", s"w${i % 5}"))
      .toDF("src", "word")
    val est = Sketches.cmsDot(toks, col("src"), col("word"))
      .collect().head.getAs[Long]("est_dot")
    // exact dot: per-word counts 6 each side over 5 shared words
    val exact = 5L * 6 * 6
    assert(est >= exact)
    // 5 distinct words in a 1024-wide grid: collisions are impossible
    // for the min row only if no pair collides in EVERY row; with 4
    // independent rows over width 1024 this tiny vocab is collision-free
    assert(est == exact)
  }
}
