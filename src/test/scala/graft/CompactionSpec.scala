package graft

import graft.sinks.Compaction
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Compaction: a fragmented indexed store collapses to ~1 file per
  * partition (big target), preserves every row, and the swap leaves no
  * scratch dirs behind. */
class CompactionSpec extends SparkSpec {

  test("compact merges small files, preserves rows, cleans up") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact").toString
    val store = s"$tmp/store"

    // simulate many tiny flushes: 3 indices × 8 appends, forced 2-file writes
    val docs = (0 until 240).map(i => (i.toLong, s"doc $i", s"idx${i % 3}"))
      .toDF("msg_id", "data", "index")
    (0 until 8).foreach { _ =>
      docs.repartition(2).write.mode("append").partitionBy("index")
        .parquet(store)
    }
    val beforeRows = spark.read.parquet(store).collect()
      .map(_.toString).sorted.toSeq

    val report = Compaction.compact(spark, store, targetBytes = 1L << 30)

    assert(report.partitions === 3)
    assert(report.filesBefore >= 3 * 8L)
    assert(report.filesAfter === 3, s"want 1 file per index: $report")
    val afterRows = spark.read.parquet(store).collect()
      .map(_.toString).sorted.toSeq
    assert(afterRows === beforeRows)
    // no scratch dirs left behind
    val names = new java.io.File(tmp).listFiles().map(_.getName).toSet
    assert(names === Set("store"))
  }

  test("targetBytes splits a hot partition into multiple files") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact2").toString
    val store = s"$tmp/store"
    val docs = (0 until 5000)
      .map(i => (i.toLong, "x" * 200, if (i < 4500) "hot" else "cold"))
      .toDF("msg_id", "data", "index")
    docs.repartition(4).write.partitionBy("index").parquet(store)

    val report = Compaction.compact(spark, store, targetBytes = 16 * 1024)
    assert(report.filesAfter > report.partitions,
      s"hot partition must split into multiple target-size files: $report")
    assert(spark.read.parquet(store).count() === 5000)
  }
}
