package graft

import graft.plans.GroupTopK
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom top-k plan node: semantics equal the window row_number
  * formulation; the physical plan is partial heap → exchange → final heap
  * with no sort of the full input. */
class GroupTopKSpec extends SparkSpec {

  private lazy val orders = Tables.orders(spark, sf())

  test("topK == window row_number filter (deterministic total order)") {
    val ours = GroupTopK.topK(orders, Seq(col("o_orderpriority")), 3,
        col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "o_orderkey")
      .collect().toSeq
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val reference = orders
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 3)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "o_orderkey")
      .collect().toSeq
    assert(ours === reference)
  }

  test("plan: partial and final heap stages, exchange between, no sort") {
    val df = GroupTopK.topK(orders, Seq(col("o_orderpriority")), 3,
      col("o_totalprice").desc, col("o_orderkey"))
    val plan = df.queryExecution.executedPlan.toString
    // AQE hides the exec nodes from collect(); assert on the rendered tree:
    // final heap (partial=false) above the exchange, partial heap below
    assert(plan.contains(", 3, false")  && plan.contains(", 3, true"),
      s"want partial+final heap stages:\n$plan")
    assert(plan.indexOf(", 3, false") < plan.indexOf("Exchange") &&
      plan.indexOf("Exchange") < plan.indexOf(", 3, true"),
      s"want final ← exchange ← partial:\n$plan")
    assert(!plan.contains("SortExec") && !plan.contains("+- Sort"),
      s"top-k must not sort the input:\n$plan")
  }

  test("partial stage bounds shuffle volume to k rows per group per task") {
    import spark.implicits._
    // 4 groups × 1000 rows in each of 4 input partitions
    val data = spark.range(0, 16000).select(
      (col("id") % 4).as("g"), col("id").as("v")).repartition(4)
    val topped = GroupTopK.topK(data, Seq(col("g")), 5, col("v").desc)
    assert(topped.count() === 4L * 5)
    // survivors are exactly the global top-5 per group
    val got = topped.as[(Long, Long)].collect().toSet
    val want = (0L until 4L).flatMap(g =>
      (0 until 5).map(i => (g, 15996L + g - 4 * i))).toSet
    assert(got === want)
  }

  test("k larger than group size returns whole groups") {
    import spark.implicits._
    val tiny = Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("g", "v")
    val out = GroupTopK.topK(tiny, Seq(col("g")), 100, col("v"))
      .as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (1L, 20L), (2L, 30L)))
  }
}
