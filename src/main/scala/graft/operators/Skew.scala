package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §6). At 100 TB a handful of hot
  * keys (one chatty topic, one dominant app) can pin a whole stage on one
  * task; salting splits each hot key across `salts` reducers and
  * recombines — two small shuffles instead of one skewed one. (Skewed
  * JOINs are handled by AQE's skew-join split; this covers aggregations,
  * which AQE does not rebalance.) */
object Skew {

  /** Two-phase salted aggregation: partial aggregate on (keys, salt),
    * then final aggregate on keys. `aggs` must be algebraic (sum/count/
    * min/max style) — supplied as (partial, final) column pairs keyed by
    * output name. */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      partialAggs: Seq[(String, Column)], finalAggs: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head._2.as(partialAggs.head._1),
        partialAggs.tail.map { case (n, c) => c.as(n) }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(finalAggs.head._2.as(finalAggs.head._1),
        finalAggs.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Salted long-sum + count per key — the common case. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame =
    saltedAgg(df, keys, salts,
      partialAggs = Seq("__psum" -> sum(col(valueCol)), "__pn" -> count(lit(1))),
      finalAggs = Seq("sum_value" -> sum(col("__psum")),
        "n" -> sum(col("__pn"))))
}
