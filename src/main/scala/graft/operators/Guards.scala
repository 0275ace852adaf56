package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** In-plan int64-sum overflow guards. A sum of `n` long terms each with
  * |term| ≤ maxAbs is exact iff n·maxAbs ≤ Long.MaxValue; past that,
  * non-ANSI Spark silently wraps and the engine would return WRONG
  * numbers at exactly the corpus sizes it targets. These guards ride
  * the aggregation that computes the sum — `count(*)` and `max(abs())`
  * are one extra map-side cell each, no second pass — and multiply in
  * DECIMAL, which cannot wrap (a decimal precision overflow yields
  * NULL, which `assert_true` rejects the same as false, so the check
  * stays conservative even past decimal range). The guard evaluates to
  * 0L on success and is ADDED to the guarded sum by the caller, so
  * Catalyst cannot prune the assertion out of the plan. */
object Guards {
  private val int64Max = lit(Long.MaxValue).cast("decimal(38,0)")

  /** 0L if n·maxAbs ≤ Long.MaxValue; otherwise the query fails with
    * `msg`. `maxAbs` may be long or decimal. A NULL maxAbs (a group
    * whose terms are all null — the sum itself is null, nothing can
    * have wrapped) counts as 0, so such groups pass through with null
    * sums exactly as they did before the guard existed. */
  def sumBound(n: Column, maxAbs: Column, msg: String): Column =
    coalesce(
      assert_true(
        n.cast("decimal(19,0)") *
          coalesce(maxAbs.cast("decimal(38,0)"),
            lit(0L).cast("decimal(38,0)")) <= int64Max,
        lit(msg)).cast("long"),
      lit(0L))

  /** 0L if n·maxAbs² ≤ Long.MaxValue — the bound for Σterm² sums
    * (also catches the per-row term·term wrap: if maxAbs² alone
    * exceeds int64, so does n·maxAbs²). */
  def sumSqBound(n: Column, maxAbs: Column, msg: String): Column =
    sumBound(n,
      maxAbs.cast("decimal(19,0)") * maxAbs.cast("decimal(19,0)"), msg)
}
