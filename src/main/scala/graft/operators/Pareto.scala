package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Pareto-front (skyline) extraction — the multi-objective "best
  * trade-offs" operator (maximize both dims; a row survives iff no other
  * row is ≥ on both dims and > on at least one). Spark has no skyline
  * operator; the naive spelling is a NOT EXISTS self-join that plans as
  * a nested loop — O(n²) and dead at 100 TB.
  */
object Pareto {

  /** 2-D skyline via the per-x staircase, in three scale-safe stages:
    *
    *  1. groupBy(x) → max(y): within equal x only the max-y points can
    *     survive (any lower y is dominated by equal-x, greater-y).
    *  2. strict-prefix running max of ymax over x DESC — the staircase:
    *     an (x, ymax) column survives iff ymax exceeds every ymax at
    *     strictly greater x. Computed as a TWO-LEVEL cumulative so no
    *     global sort/single-partition window touches the per-x table:
    *     a partitioned window inside coarse x-buckets + a broadcast
    *     cross-bucket prefix max over the tiny bucket summary.
    *  3. broadcast the surviving (x, ymax) staircase back onto the
    *     points — the skyline of any corpus is vanishingly small.
    *
    * Equal duplicate points both survive (neither dominates — equal on
    * both dims, strictly greater on none). All comparisons are integer,
    * so batch, oracle, and merge routes agree bit-for-bit. `xCol`/`yCol`
    * must be integral; `bucketWidth` only affects parallelism, not the
    * result (the two-level prefix max is exact for any width).
    *
    * `groupCols` computes an INDEPENDENT skyline per group — the local
    * phase of the shard-merge route (local prune only ever removes
    * dominated points, dominance is transitive, so per-shard skyline →
    * union → global skyline ≡ the direct skyline: the theorem that
    * makes the operator shippable as k-rows-per-executor at 100 TB). */
  def skyline2d(pts: DataFrame, xCol: String, yCol: String,
      bucketWidth: Long = 5000000L,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0,
      s"skyline2d: bucketWidth must be positive, got $bucketWidth")
    val g = groupCols.map(col)
    val perX = pts.groupBy((g :+ col(xCol)): _*)
      .agg(max(col(yCol)).as("__ymax"))
      .withColumn("__b", col(xCol).divide(bucketWidth).cast("long"))
    val wLocal = Window.partitionBy((g :+ col("__b")): _*)
      .orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketMax = perX.groupBy((g :+ col("__b")): _*)
      .agg(max(col("__ymax")).as("__bmax"))
    val wBuckets = Window.partitionBy(g: _*).orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // tiny table (one row per bucket per group): single-partition OK
    val bucketPrefix = bucketMax
      .withColumn("__pmax", max(col("__bmax")).over(wBuckets))
      .select((g :+ col("__b") :+ col("__pmax")): _*)
    val stair = perX
      .withColumn("__lmax", max(col("__ymax")).over(wLocal))
      .join(broadcast(bucketPrefix), groupCols :+ "__b")
      .withColumn("__prev",
        greatest(coalesce(col("__lmax"), lit(Long.MinValue)),
          coalesce(col("__pmax"), lit(Long.MinValue))))
      .filter(col("__ymax") > col("__prev"))
      .select((g :+ col(xCol) :+ col("__ymax").as(yCol)): _*)
    pts.join(broadcast(stair), (groupCols :+ xCol) :+ yCol)
  }
}
