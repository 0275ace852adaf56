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
}
