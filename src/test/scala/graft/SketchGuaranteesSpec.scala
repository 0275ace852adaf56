package graft

import graft.operators.{Dedup, Sketches}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The approximate operators' guarantees, asserted (not assumed): the
  * Bloom gate may only over-flag, never miss; the histogram quantile
  * estimate sits within one bin of the exact quantile. */
class SketchGuaranteesSpec extends SparkSpec {

  test("decontaminateBloom is a superset of the exact gate (no false negatives)") {
    val docs = Tables.documents(spark, sf())
    val isBench = pmod(col("doc_id"), lit(97)) === 0
    val exact = Dedup.decontaminate(
        docs.filter(!isBench), docs.filter(isBench), n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Dedup.decontaminateBloom(
        docs.filter(!isBench), docs.filter(isBench), n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty)
    assert(exact.keySet.subsetOf(bloom.keySet),
      "a doc flagged by the exact gate must be flagged by the Bloom gate")
    // per doc, maybe-shared counts can only exceed true shared counts
    exact.foreach { case (d, n) => assert(bloom(d) >= n) }
  }

  test("histogramQuantiles: estimate within one bin width of the exact quantile") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = Tables.events(spark, sf())
    val width = 4.0
    val est = Sketches.histogramQuantiles(ev, Seq("event_type"), col("value"),
        qs = Seq(0.5, 0.95))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("p50_est"), r.getAs[Double]("p95_est"))).toMap
    // the sketch bounds the DISCRETE quantile (smallest value whose rank
    // reaches ceil(q·n)) — interpolated percentiles can sit far below it
    // on sparse tails, so compare against the order statistic
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("value")
    val ranked = ev.select(col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
    def disc(q: Double): Map[String, Double] =
      ranked.filter(col("rn") === ceil(lit(q) * col("n")))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val d50 = disc(0.5); val d95 = disc(0.95)
    assert(est.keySet == d50.keySet && est.nonEmpty)
    est.foreach { case (k, (e50, e95)) =>
      // est = upper edge of the order statistic's bin: (disc, disc + w]
      assert(e50 > d50(k) - 1e-9 && e50 <= d50(k) + width + 1e-9,
        s"$k p50: est $e50 vs disc ${d50(k)}")
      assert(e95 > d95(k) - 1e-9 && e95 <= d95(k) + width + 1e-9,
        s"$k p95: est $e95 vs disc ${d95(k)}")
    }
  }

  test("KMV sketch: per-batch min-k sets re-min to the full sketch; estimate sane") {
    import graft.operators.Sketches
    import org.apache.spark.sql.expressions.Window
    val ev = graft.sources.Tables.events(spark, sf())
      .select(col("event_type"), col("user_id"))
    // mergeability: union the halves' sketches, re-rank, keep k — must
    // equal the full-corpus sketch (the k smallest of a union are among
    // the union of the k smallest)
    val k = 64
    val h1 = Sketches.kmvMinK(ev.filter(col("user_id") % 2 === 0),
      Seq("event_type"), col("user_id"), k)
    val h2 = Sketches.kmvMinK(ev.filter(col("user_id") % 2 === 1),
      Seq("event_type"), col("user_id"), k)
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val merged = h1.select(col("event_type"), col("h"))
      .unionAll(h2.select(col("event_type"), col("h"))).distinct()
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .orderBy("event_type", "rk").collect().toSeq
    val full = Sketches.kmvMinK(ev, Seq("event_type"), col("user_id"), k)
      .orderBy("event_type", "rk").collect().toSeq
    assert(merged == full)
    // estimate sanity: within 50% of exact at k=64 on every group
    val est = Sketches.kmvDistinct(ev, Seq("event_type"), col("user_id"), k)
      .join(ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact")), "event_type")
      .collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val (e, x) = (r.getDouble(2), r.getLong(3).toDouble)
      assert(e > x * 0.5 && e < x * 1.5,
        s"${r.getString(0)}: kmv $e vs exact $x")
    }
  }

  test("HLL sketch: per-batch registers max-merge to the full sketch; both estimate paths sane") {
    val ev = graft.sources.Tables.events(spark, sf())
      .select(col("event_type"), col("user_id"))
    // mergeability: max is associative/commutative/idempotent, so the
    // halves' register tables max-merge to exactly the full registers
    val r1 = Sketches.hllRegisters(ev.filter(col("user_id") % 2 === 0),
      Seq("event_type"), col("user_id"))
    val r2 = Sketches.hllRegisters(ev.filter(col("user_id") % 2 === 1),
      Seq("event_type"), col("user_id"))
    val merged = r1.unionAll(r2)
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("m_j")).as("m_j"))
      .orderBy("event_type", "bucket").collect().toSeq
    val full = Sketches.hllRegisters(ev, Seq("event_type"), col("user_id"))
      .orderBy("event_type", "bucket").collect().toSeq
    assert(merged == full)
    // duplicate arrivals are free: doubling the stream leaves registers
    // (and so the estimate) unchanged — the property KMV's distinct
    // pass has to pay for
    val doubled = Sketches.hllRegisters(ev.unionAll(ev),
      Seq("event_type"), col("user_id"))
      .orderBy("event_type", "bucket").collect().toSeq
    assert(doubled == full)
    // estimate sanity: within 50% of exact on every group (m = 64 has
    // ~13% standard error; the bound is loose on purpose)
    val est = Sketches.hllDistinct(ev, Seq("event_type"), col("user_id"))
      .join(ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact")), "event_type")
      .collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val (e, x) = (r.getDouble(2), r.getLong(3).toDouble)
      assert(e > x * 0.5 && e < x * 1.5,
        s"${r.getString(0)}: hll $e vs exact $x")
    }
    // the raw-HLL path (E > 2.5m): a synthetic group with 4000 distinct
    // values must route around the linear-counting fallback and still
    // land within 50%
    import spark.implicits._
    val big = (0 until 4000).map(i => ("g", i.toLong)).toDF("g", "v")
    val bigEst = Sketches.hllDistinct(big, Seq("g"), col("v"))
      .select(col("occupied"), col("hll_est")).head()
    assert(bigEst.getLong(0) == 64, "4000 distinct must fill all 64 registers")
    val e = bigEst.getDouble(1)
    assert(e > 2000 && e < 6000, s"raw-path estimate $e vs exact 4000")
  }
}
