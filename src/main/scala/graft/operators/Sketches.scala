package graft.operators

import graft.plans.native
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates with *deterministic, portable*
  * arithmetic (SURVEY.md §5): unlike HLL (whose hash/bias tables are
  * engine-specific), linear counting over the portable poly-hash gives the
  * same estimate in any engine — so the oracle can verify it exactly.
  *
  * Scale: the per-group state is the K-bucket occupancy set, built by a
  * map-side-combinable count-distinct of `hash mod K`; memory O(K) per
  * group, one shuffle. For 100 TB cardinalities raise K (error ~
  * sqrt(K)·(e^{n/K}−1); K=4096 keeps <2% to n≈3K). */
object Sketches {

  /** Occupied-bucket count and linear-counting estimate of
    * count-distinct(valueCol) per key group:
    * estimate = −K·ln((K − occupied)/K). */
  def linearCountDistinct(df: DataFrame, keys: Seq[String], valueCol: Column,
      k: Int = 1024): DataFrame = {
    val bucket = pmod(native.poly_hash(valueCol.cast("string")), lit(k.toLong))
    df.groupBy(keys.map(col): _*)
      .agg(countDistinct(bucket).as("occupied"))
      .withColumn("estimate",
        when(col("occupied") === k, lit(Double.PositiveInfinity))
          .otherwise(round(-lit(k.toDouble) *
            log((lit(k) - col("occupied")) / lit(k)), 4)))
  }
}
