package graft.tools

import graft.operators.Skew
import graft.streaming.StreamingSessionize
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Runnable demonstration of the scale techniques (SURVEY.md §6):
  * salted aggregation, bucketed co-located join (prints the plan's
  * exchange count), stateful streaming sessionization.
  * Usage: runMain graft.tools.ScaleDemo [sfDir] */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-scale-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1. salted aggregation vs direct
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), (col("value") * 100).cast("long").as("cents"))
    val direct = ev.groupBy("event_type")
      .agg(sum("cents").as("sum_value"), count(lit(1)).as("n"))
      .orderBy("event_type").collect().toSeq
    val salted = Skew.saltedSumCount(ev, Seq("event_type"), "cents")
      .orderBy("event_type").collect().toSeq
    println(s"SALTED_EQUALS_DIRECT=${salted == direct}")

    // 2. bucketed co-located join: zero exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    Seq("b_orders_demo", "b_customer_demo").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) new scala.reflect.io.Directory(d).deleteRecursively()
    }
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders_demo")
    spark.read.parquet(s"$sfDir/customer.parquet")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer_demo")
    val j = spark.table("b_orders_demo").join(spark.table("b_customer_demo"),
      col("o_custkey") === col("c_custkey"))
    val exchanges = j.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    println(s"BUCKETED_JOIN_EXCHANGES=$exchanges ROWS=${j.count()}")

    // 3. stateful streaming sessionization
    val tmp = java.nio.file.Files.createTempDirectory("graft-scale-demo").toString
    val evs = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("ts"))
    evs.write.parquet(s"$tmp/src")
    implicit val s: SparkSession = spark
    val stream = spark.readStream.schema("user_id LONG, ts TIMESTAMP")
      .parquet(s"$tmp/src").as[StreamingSessionize.Event]
    val q = StreamingSessionize.sessions(stream, gapMinutes = 30)
      .writeStream.format("memory").queryName("scale_demo_sess")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val sess = spark.table("scale_demo_sess")
    println(s"CLOSED_SESSIONS=${sess.count()} USERS=${sess.select("user_id").distinct().count()}")
    sess.orderBy(desc("n_events")).show(3, truncate = false)
    spark.stop()
  }
}
