package graft.operators

import graft.functions.Portable
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

  /** Count-min sketch frequency estimates for the `probes` items:
    * depth×width counter grid addressed by affine re-hashes of the
    * portable poly-hash; estimate(w) = min over rows of w's cell count.
    * Cell counts are plain sums — commutative, so the sketch (and every
    * estimate) is identical under any partitioning or merge order, and
    * the oracle verifies it EXACTLY. Estimates always upper-bound the
    * true frequency (collisions only inflate).
    *
    * Scale: building the grid is one map-side-combined agg of at most
    * depth×width rows — O(1) state regardless of corpus size; probing is
    * a broadcast-sized join on (row, cell). */
  def countMinFreq(items: DataFrame, itemCol: Column, probes: Seq[String],
      depth: Int = 4, width: Int = 1024): DataFrame = {
    def cellsOf(hc: Column): Column = array((0 until depth).map(k =>
      struct(lit(k).as("k"),
        (Portable.rehash(hc, k) % width).as("cell"))): _*)
    val cells = items
      .select(explode(cellsOf(native.poly_hash(itemCol))).as("kc"))
      .groupBy(col("kc.k").as("k"), col("kc.cell").as("cell"))
      .agg(count(lit(1)).as("n"))
    val spark = items.sparkSession
    import spark.implicits._
    val probeCells = probes.toDF("word")
      .select(col("word"),
        explode(cellsOf(native.poly_hash(col("word")))).as("kc"))
      .select(col("word"), col("kc.k").as("k"), col("kc.cell").as("cell"))
    probeCells.join(cells, Seq("k", "cell"), "left")
      .groupBy(col("word"))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }
}
