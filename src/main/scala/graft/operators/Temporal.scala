package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Temporal joins Spark lacks natively — as-of and bounded range joins —
  * built from shuffle-friendly primitives instead of inequality joins
  * (which plan as nested-loop / cartesian shapes and die at scale).
  */
object Temporal {

  /** Per-(topic, day) volume anomaly vs a trailing-week baseline:
    * z = (n − mean7) / std7 over the 7 preceding days, mean/var from
    * integer sums (sum, sum²) divided once in double (engine-exact).
    *
    * `dense = false`: the ROWS (-7,-1) frame runs over OBSERVED days —
    * a zero-event calendar day contributes no row, so the baseline is
    * the last 7 days WITH traffic (the q_events_anomaly semantics).
    * `dense = true`: days are densified per topic over its [min, max]
    * span with n=0 fillers first, so the same frame IS the 7 preceding
    * CALENDAR days and a zero-event day both feeds the baseline and
    * gets its own (collapse-alarm) z row. The densify is a per-topic
    * min/max agg exploded to #topics × span rows — calendar-bounded,
    * never corpus-bounded; `daily` remains the only corpus-sized input.
    * Input `daily`: (topic, day DATE, n LONG). */
  def volumeAnomaly(daily: DataFrame, dense: Boolean): DataFrame = {
    val base =
      if (!dense) daily
      else daily.groupBy(col("topic"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("topic"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
        .join(daily, Seq("topic", "day"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
    val w = Window.partitionBy(col("topic")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    base
      .withColumn("w_n", count(col("n")).over(w))
      .withColumn("w_sum", sum(col("n")).over(w))
      .withColumn("w_sum2", sum(col("n") * col("n")).over(w))
      .filter(col("w_n") === 7)
      .withColumn("mean7", col("w_sum").cast("double") / 7)
      .withColumn("var7",
        (col("w_sum2").cast("double") - col("w_sum").cast("double")
          * col("w_sum") / 7) / 7)
      .withColumn("z", when(col("var7") > 0,
        round((col("n") - col("mean7")) / sqrt(col("var7")), 6)))
      .select(col("topic"), col("day"), col("n"),
        round(col("mean7"), 6).as("mean7"), col("z"))
  }

  /** One-sided upper CUSUM changepoint score over dense per-(topic, day)
    * counts — the sustained-drift detector the z-score anomaly rows
    * (volumeAnomaly) can't express: a level shift of +1σ/day never fires
    * a z alarm but accumulates linearly in the CUSUM.
    *
    * Semantics: per topic, reference level k = sum(n) div days (integer),
    * deviation x_t = n_t − k, and s_t = max(0, s_{t−1} + x_t). The
    * recursion is NOT window-expressible directly, but has the exact
    * closed form s_t = P_t − min(0, min_{j≤t} P_j) with P the prefix sum
    * of x — two cumulative windows PARTITIONED by topic, all integer
    * arithmetic (portable across engines bit-for-bit). Alarm when
    * s_t > hMult·k. Days densified per topic (a drift INTO silence must
    * keep accumulating), same calendar-explode shape as volumeAnomaly:
    * #topics × span rows, never corpus-bounded.
    * Input `daily`: (topic, day DATE, n LONG). */
  def cusum(daily: DataFrame, hMult: Long = 4L): DataFrame = {
    val dense = daily.groupBy(col("topic"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("topic"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("topic", "day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val k = dense.groupBy(col("topic"))
      .agg(expr("CAST(sum(n) AS BIGINT) div count(*)").as("kk"))
    val w = Window.partitionBy(col("topic")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.join(broadcast(k), Seq("topic"))
      .withColumn("p", sum(col("n") - col("kk")).over(w))
      .withColumn("cusum",
        col("p") - least(lit(0L), min(col("p")).over(w)))
      .select(col("topic"), col("day"), col("n"), col("cusum"),
        (col("cusum") > lit(hMult) * col("kk")).cast("int").as("alarm"))
  }

  /** As-of join: for each left row, the latest right row with
    * right.ts <= left.ts (inclusive) under the same key.
    *
    * Implemented WITHOUT an inequality join: both sides are unioned and
    * sorted once per key, and the right side's (ts, payload) runs forward
    * as a windowed running max — one shuffle on the key column (the same
    * cost shape as a groupBy), state O(1) per row. Right rows sort before
    * left rows at equal timestamps, which is what makes the join
    * inclusive; ties among right rows at the same ts resolve to the max
    * payload (deterministic). Output: all left columns + `asof_ts` +
    * `asof_<payload>` columns (null when no right row precedes). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    val pStruct = struct(col(rightTs).as("asof_ts") +:
      rightPayload.map(c => col(c).as(s"asof_$c")): _*)
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rSel = right.select(col(key).as("__k"), col(rightTs).as("__t"),
      lit(0).as("__kind"), pStruct.as("__p"))
    val lSel = left.select(col(key).as("__k"), col(leftTs).as("__t"),
      lit(1).as("__kind"), lit(null).cast(rSel.schema("__p").dataType).as("__p"),
      lStruct.as("__l"))
    val u = rSel
      .withColumn("__l", lit(null).cast(lSel.schema("__l").dataType))
      .unionByName(lSel)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.withColumn("__asof", max(col("__p")).over(w))
      .filter(col("__kind") === 1)
    val outCols = left.columns.map(c => col(s"__l.$c")) ++
      (Seq("asof_ts") ++ rightPayload.map(c => s"asof_$c"))
        .map(c => col(s"__asof.$c").as(c))
    matched.select(outCols.toIndexedSeq: _*)
  }

  /** Bounded range join: count right rows with |right.ts - left.ts| <=
    * tolerance under the same key.
    *
    * Scale shape: the right side is bucketed by fixed 2·tolerance-wide
    * time buckets (a narrow projection); each left row explodes to the
    * <= 2-3 buckets covering its interval, so the join is an EQUI-join on
    * (key, bucket) — hash-partitioned, skew-bounded — with the exact
    * range predicate applied after. Candidate fan-out per left row is
    * bounded by interval/bucket + 1, never a cross product, and each
    * right row carries exactly one bucket so no pair is double-counted. */
  def rangeJoinCount(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, toleranceSec: Long,
      countName: String = "n_in_range"): DataFrame = {
    val tolUs = toleranceSec * 1000000L
    val widthUs = 2 * tolUs
    def bucket(ts: Column): Column = floor(unix_micros(ts) / widthUs)
    val r = right.select(col(key).as("__rk"), col(rightTs).as("__rt"),
      bucket(col(rightTs)).as("__rb"))
    val tol = expr(s"INTERVAL $toleranceSec SECOND")
    val l = left.withColumn("__b",
      explode(sequence(bucket(col(leftTs) - tol), bucket(col(leftTs) + tol))))
    // left.columns must identify left rows uniquely (an id/ts pair): the
    // groupBy re-collapses the bucket fan-out
    l.join(r, col(key) === col("__rk") && col("__b") === col("__rb") &&
        col("__rt") >= col(leftTs) - tol && col("__rt") <= col(leftTs) + tol,
        "left")
      .groupBy(left.columns.map(col).toIndexedSeq: _*)
      .agg(sum(when(col("__rt").isNotNull, 1L).otherwise(0L)).as(countName))
  }
}
