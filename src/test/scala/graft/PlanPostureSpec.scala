package graft

/** Regression guard on the physical-plan shapes SURVEY.md §5b/§6 claims:
  * dims broadcast, filters pushed to the parquet scan, columns pruned.
  * If a future change silently degrades a headliner plan (e.g. a
  * broadcast becomes a shuffle join), this fails before the bench does. */
class PlanPostureSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf("0.01"))
    df.queryExecution.sparkPlan.toString
  }

  test("q3/q5: dimension joins are broadcast") {
    assert(planOf("q3_join_topk").contains("BroadcastHashJoin"))
    assert(planOf("q5_multijoin").contains("BroadcastHashJoin"))
  }

  test("q1: shipdate filter pushed to scan, columns pruned") {
    val p = planOf("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "unused columns must be pruned from the scan")
  }

  test("sync_pipeline: message filters pushed to scan") {
    val p = planOf("sync_pipeline")
    assert(p.contains("PushedFilters: [IsNotNull(props)"))
  }

  test("dedup/sim operators: no cartesian or nested-loop join") {
    Seq("dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard",
        "dedup_embedding", "sim_ann_lsh").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("temporal joins avoid inequality-join physical shapes") {
    Seq("q_asof_join", "q_range_join").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q must not plan a nested-loop/cartesian join:\n$p")
    }
  }

  test("sim_ivf assign stage is one narrow pass: no join, no window") {
    val p = planOf("sim_ivf")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"IVF assignment must be a pure projection:\n$p")
  }

  test("decontaminate: benchmark gram set is broadcast") {
    assert(planOf("decontaminate").contains("BroadcastHashJoin"))
  }
}
