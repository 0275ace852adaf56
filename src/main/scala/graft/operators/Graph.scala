package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics for corpus curation. Web-scale training-data
  * pipelines rank their crawl's host graph (a quality prior over domains —
  * the CommonCrawl-style centrality ranking) before per-document filtering;
  * the same machinery ranks any derived similarity graph.
  *
  * Determinism by design: ranks are FIXED-POINT integers (`scale` units =
  * rank 1.0), every update is integer multiply / integer `div`, and the
  * per-round reduction is a sum of longs — commutative-exact under any
  * partitioning, so two runs (or two engines) agree bit-for-bit. The
  * float formulation would make every round's result partition-order
  * dependent, compounding across iterations; fixed-point is the same
  * trick the repo's decimal aggregates use, specialized to an iterative
  * loop where drift would accumulate.
  */
object Graph {

  /** Fixed-point weighted PageRank over `edges(src, dst, w)`, run for a
    * FIXED `iters` rounds (the production shape: a bounded-round sweep
    * whose cost is predictable; convergence-to-epsilon is a policy on top).
    *
    * Update (all integer arithmetic, damping d = dampNum/dampDen):
    *   contrib(e)  = (w(e) * rank(src)) div out_w(src)
    *   rank'(node) = (scale * (dampDen - dampNum)) div (n * dampDen)
    *               + (dampNum * sum(contrib into node)) div dampDen
    * Dangling nodes (no out-edges) keep only the base term — their mass
    * is dropped rather than redistributed, so total rank can shrink by
    * the dangling share per round (documented, bounded, deterministic).
    *
    * Scale: `nodes` and the per-round rank table are O(V) — for a host
    * graph, millions of rows, NOT broadcastable at the top end — so each
    * round is a shuffle join of rank (O(V)) against edges (O(E)) on
    * `src`. The edge table is materialized ONCE with its out-degree
    * totals folded in ([[Materialize]]); every round reuses that
    * lineage-truncated table, so the corpus-sized edge derivation never
    * re-runs. Each round's rank table is materialized before the next
    * (the CC-iteration pattern, Dedup.scala's applyDedup loop) to keep
    * the plan depth constant. AQE handles the Zipf in-degree skew of hub
    * nodes on the dst-side agg (map-side combine first).
    */
  def pageRankFixed(edges: DataFrame, nodes: DataFrame, iters: Int,
      scale: Long = 1000000L, dampNum: Long = 85L, dampDen: Long = 100L)
      : DataFrame = {
    require(iters >= 0 && dampNum >= 0 && dampNum <= dampDen)
    // out-weight totals folded onto each edge once; the per-edge share
    // numerator w*rank stays within Long for scale ≤ 1e6 and w ≤ 1e12
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val e = Materialize(edges.join(outW, "src")
      .select(col("src"), col("dst"), col("w"), col("out_w")))
    val nCount = nodes.agg(count(lit(1)).as("n"))
    val base = Materialize(nodes.crossJoin(broadcast(nCount))
      .select(col("node"),
        expr(s"(${scale}L * ${dampDen - dampNum}L) div (n * ${dampDen}L)")
          .as("base"),
        expr(s"${scale}L div n").as("r0")))
    var ranks = base.select(col("node"), col("r0").as("rank"))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("(w * rank) div out_w").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      ranks = Materialize(
        base.join(contrib, base("node") === contrib("dst"), "left")
          .select(base("node"),
            (col("base") +
              expr(s"(${dampNum}L * coalesce(in_sum, 0L)) div ${dampDen}L"))
              .as("rank")))
    }
    ranks
  }

  /** Triangle participation over an undirected graph given as `edges(a, b)`
    * with `a < b` (each edge once) — the cluster-density audit of a
    * near-dup graph: a doc in many triangles sits in a tight duplicate
    * clique (safe to collapse aggressively); a high-degree doc with few
    * triangles is a hub of pairwise-only matches (the LSH-false-positive
    * smell worth inspecting before applyDedup).
    *
    * Shape: the standard ordered node-iterator join — because every edge
    * is stored (lo, hi), a triangle a<b<c is found EXACTLY once as
    * e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c); no direction explosion, no dedup pass.
    * The edge table is materialized once and reused by all three sides
    * and the degree count. Two shuffle joins on edge endpoints — at 100 TB
    * the cost is bounded by the candidate-pair table (k-bounded per doc
    * for LSH graphs), never the corpus. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = Materialize(edges.select(col("a"), col("b")))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("ta"), col("e1.b").as("tb"), col("e2.b").as("tc"))
    val triPerDoc = tri.select(col("ta").as("d"))
      .unionAll(tri.select(col("tb").as("d")))
      .unionAll(tri.select(col("tc").as("d")))
      .groupBy(col("d")).agg(count(lit(1)).as("n_tri"))
    e.select(col("a").as("d")).unionAll(e.select(col("b").as("d")))
      .groupBy(col("d")).agg(count(lit(1)).as("degree"))
      .join(triPerDoc, Seq("d"), "left_outer")
      .select(col("d").as("doc_id"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** Common-neighbor link prediction over the near-dup graph — the
    * "pairs the LSH bands MISSED" audit: two docs sharing ≥ minCommon
    * near-dup neighbors but no direct edge are strong merge candidates
    * (a band-collision near-miss). Wedge enumeration through each
    * center node: adj(y→x) ⋈ adj(y→z) with x < z counts every common
    * neighbor exactly once; the LEFT ANTI against the (lo, hi) edge
    * table keeps only non-edges.
    *
    * Scale: one shuffle join on the center node; fan-out per center is
    * degree² — bounded for LSH graphs (k-bounded candidate lists), and
    * the standard mitigation for hubs (drop centers above a degree cap)
    * composes as a pre-filter on the adjacency table. */
  /** Bounded-round k-core peel over the near-dup graph: `rounds`
    * iterations of "drop every node whose CURRENT degree < k", then the
    * surviving subgraph's degree table. The 2-core separates redundant
    * clusters (every member ≥2 near-dup partners — safe to collapse
    * aggressively) from pendant LSH edges that a single false positive
    * explains; full convergence is a policy loop on top (the
    * pageRankFixed convention — fixed rounds keep cost predictable and
    * the oracle unrollable).
    *
    * Pure set logic on integer ids — no arithmetic at all, so any
    * engine agrees exactly. Scale: each round is one degree agg + two
    * semi-joins on the edge table (candidate-pair-bounded, never
    * corpus-bounded); each round's edge set is materialized so plan
    * depth stays constant across rounds. */
  def kcorePeel(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    var e = Materialize(edges.select(col("a"), col("b")))
    for (_ <- 1 to rounds) {
      val keep = e.select(col("a").as("d")).unionAll(e.select(col("b").as("d")))
        .groupBy(col("d")).agg(count(lit(1)).as("degree"))
        .filter(col("degree") >= k)
        .select(col("d"))
      e = Materialize(
        e.join(keep.select(col("d").as("a")), Seq("a"), "left_semi")
          .join(keep.select(col("d").as("b")), Seq("b"), "left_semi")
          .select(col("a"), col("b")))
    }
    e.select(col("a").as("d")).unionAll(e.select(col("b").as("d")))
      .groupBy(col("d")).agg(count(lit(1)).as("degree"))
      .select(col("d").as("doc_id"), col("degree"))
  }

  def commonNeighbors(edges: DataFrame, minCommon: Long = 2): DataFrame = {
    val e = Materialize(edges.select(col("a"), col("b")))
    val adj = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
    val l = adj.select(col("a").as("y"), col("b").as("x"))
    val r = adj.select(col("a").as("y2"), col("b").as("z"))
    val cn = l.join(r, col("y") === col("y2") && col("x") < col("z"))
      .groupBy(col("x"), col("z")).agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    cn.join(e, cn("x") === e("a") && cn("z") === e("b"), "left_anti")
      .select(col("x").as("doc_a"), col("z").as("doc_b"), col("common"))
  }
}
