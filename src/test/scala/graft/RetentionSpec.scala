package graft

import graft.sinks.Retention
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Retention: the ILM delete phase over the indexed store. Expired
  * partitions vanish, surviving partitions keep byte-identical rows, and
  * unparseable index names are never touched (fail-safe). */
class RetentionSpec extends SparkSpec {

  private def mkStore(rowsPerIndex: Int, indices: Seq[String]): (String, Map[String, Seq[String]]) = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-retention").toString
    val store = s"$tmp/store"
    indices.zipWithIndex.foreach { case (idx, k) =>
      (0 until rowsPerIndex)
        .map(i => ((k * 1000 + i).toLong, s"doc $k-$i", idx))
        .toDF("msg_id", "data", "index")
        .write.mode("append").partitionBy("index").parquet(store)
    }
    val byIndex = spark.read.parquet(store).collect()
      .groupBy(_.getAs[String]("index"))
      .map { case (k, rs) => (k, rs.map(_.toString).sorted.toSeq) }
    (store, byIndex)
  }

  test("expireBefore drops dated indices older than the horizon, keeps the rest intact") {
    val (store, before) = mkStore(20, Seq(
      "app-2024.01.05", "app-2024.02.10", "app-2024.03.01",
      "err-2024.01.31", "err-2024.03.15", "keepme"))

    val r = Retention.expireBefore(spark, store, horizon = "2024.02.01")

    assert(r.deleted === Seq("app-2024.01.05", "err-2024.01.31"))
    assert(r.kept === Seq("app-2024.02.10", "app-2024.03.01",
      "err-2024.03.15", "keepme"))
    val after = spark.read.parquet(store).collect()
      .groupBy(_.getAs[String]("index"))
      .map { case (k, rs) => (k, rs.map(_.toString).sorted.toSeq) }
    assert(after.keySet === r.kept.toSet)
    // survivors byte-identical — expiry never rewrites what it keeps
    r.kept.foreach { idx => assert(after(idx) === before(idx), idx) }
  }

  test("expireGenerations keeps the newest k generations per topic") {
    val (store, before) = mkStore(10, Seq(
      "web-g0", "web-g1", "web-g2", "web-g3",
      "commerce-g0", "commerce-g1", "app-2024.01.05"))

    val r = Retention.expireGenerations(spark, store, keepLast = 2)

    // web keeps g2,g3; commerce keeps g0,g1 (only 2 exist); dated name untouched
    assert(r.deleted === Seq("web-g0", "web-g1"))
    assert(r.kept.toSet === Set("web-g2", "web-g3", "commerce-g0",
      "commerce-g1", "app-2024.01.05"))
    val after = spark.read.parquet(store).collect()
      .groupBy(_.getAs[String]("index"))
      .map { case (k, rs) => (k, rs.map(_.toString).sorted.toSeq) }
    assert(after.keySet === r.kept.toSet)
    r.kept.foreach { idx => assert(after(idx) === before(idx), idx) }
  }

  test("expireGenerations keeps k SURVIVING generations when numbers are non-contiguous") {
    // after an external delete the generation numbers can have holes
    // (web-g0, web-g7): the floor must be the keepLast-th largest
    // EXISTING generation, not max+1-keepLast — the arithmetic floor
    // would keep only g7 here
    val (store, _) = mkStore(5, Seq("web-g0", "web-g7", "web-g9"))

    val r = Retention.expireGenerations(spark, store, keepLast = 2)

    assert(r.deleted === Seq("web-g0"))
    assert(r.kept.toSet === Set("web-g7", "web-g9"))
  }

  test("full ILM loop: streaming sync writes dated indices, retention expires by horizon") {
    // sync → store → expire, through the real seams: StreamingSync
    // routes messages into {topic}-{yyyy.MM.dd} index partitions
    // (Connectors.IndexedParquetBulk), then Retention ages out
    // everything older than the horizon — the reference's daily-index
    // lifecycle end-to-end (util.rs:13-48 naming, es.rs rollover).
    import graft.operators.SyncConfig
    import graft.streaming.StreamingSync
    import graft.sources.Tables
    val tmp = Files.createTempDirectory("graft-ilm").toString
    val msgs = Tables.eventsTime(spark, sf())
      .select(col("event_id").as("msg_id"), col("event_type").as("topic"),
        col("ts").as("publish_time"), col("props").as("data"))
      .limit(300)
    msgs.write.parquet(s"$tmp/src")
    StreamingSync.start(spark, SyncConfig(), s"$tmp/src", s"$tmp/sink",
      s"$tmp/metrics", availableNow = true).awaitTermination(120000)

    val indices = spark.read.parquet(s"$tmp/sink")
      .select("index").distinct().collect().map(_.getString(0)).sorted
    assert(indices.nonEmpty && indices.forall(_.matches(".+-\\d{4}\\.\\d{2}\\.\\d{2}")),
      s"sync must write dated indices: ${indices.take(3).mkString(",")}")

    // horizon = the median date: older dated indices must vanish
    val dates = indices.map(_.takeRight(10)).distinct.sorted
    val horizon = dates(dates.length / 2)
    val r = Retention.expireBefore(spark, s"$tmp/sink", horizon)
    assert(r.deleted.nonEmpty == dates.exists(_ < horizon))
    val left = spark.read.parquet(s"$tmp/sink")
      .select("index").distinct().collect().map(_.getString(0))
    assert(left.forall(_.takeRight(10) >= horizon),
      s"indices older than $horizon survived: ${left.mkString(",")}")
    assert(left.toSet === indices.filter(_.takeRight(10) >= horizon).toSet)
  }

  test("expiry on an empty or missing store is a no-op") {
    val tmp = Files.createTempDirectory("graft-retention-empty").toString
    val r = Retention.expireBefore(spark, s"$tmp/nope", "2024.01.01")
    assert(r.deleted.isEmpty && r.kept.isEmpty)
  }
}
