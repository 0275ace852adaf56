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

  test("fault: concurrent readers never observe a partial store mid-swap") {
    // hammer reads while three compactions swap the store underneath:
    // every SUCCESSFUL read must see the complete row count (old or new
    // layout). A read that lands inside the rename window may fail
    // (store momentarily absent — the documented HDFS-rename caveat) but
    // must never return a subset: the rewrite goes to a sibling scratch
    // dir, so the root only ever lists one complete layout.
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact3").toString
    val store = s"$tmp/store"
    val docs = (0 until 600).map(i => (i.toLong, s"doc $i", s"idx${i % 3}"))
      .toDF("msg_id", "data", "index")
    (0 until 6).foreach(_ => docs.repartition(2).write.mode("append")
      .partitionBy("index").parquet(store))
    val expect = spark.read.parquet(store).count()
    @volatile var done = false
    @volatile var partial: Option[Long] = None
    val reader = new Thread(() => {
      while (!done && partial.isEmpty) {
        try {
          val n = spark.read.parquet(store).count()
          if (n != expect) partial = Some(n)
        } catch { case _: Exception => () } // absent mid-rename: allowed
      }
    })
    reader.start()
    try {
      (0 until 3).foreach(_ =>
        Compaction.compact(spark, store, targetBytes = 1L << 30))
    } finally { done = true; reader.join(60000) }
    assert(partial.isEmpty,
      s"a reader observed a partial store: ${partial.getOrElse(-1L)} rows " +
        s"vs $expect")
    assert(spark.read.parquet(store).count() === expect)
  }

  test("fault: re-running compact after a mid-carry crash recovers stranded state") {
    // a prior compaction that died AFTER its swap but BEFORE its
    // carry-forward strands _checkpoint in `._precompact`; the old
    // first statement (delete the leftover dir) would destroy the only
    // copy — a re-run must recover it into the live store instead
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact5").toString
    val store = s"$tmp/store"
    val docs = (0 until 90).map(i => (i.toLong, s"d$i", s"idx${i % 3}"))
      .toDF("msg_id", "data", "index")
    docs.write.partitionBy("index").parquet(store)
    val pre = new java.io.File(s"$store._precompact/_checkpoint")
    assert(pre.mkdirs())
    java.nio.file.Files.writeString(pre.toPath.resolve("offsets"), "batch-7")
    Compaction.compact(spark, store, targetBytes = 1L << 30)
    // recovered into the live store AND carried through the new swap
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$store/_checkpoint/offsets")) == "batch-7")
    assert(!new java.io.File(s"$store._precompact").exists())
    assert(spark.read.parquet(store).count() === 90)
  }

  test("fault: compacting a LIVE sync store preserves checkpoint and failure log") {
    // maintenance interleaved with the streaming sync: batch 1 drains,
    // compaction rewrites the store (the _checkpoint and _failed dirs
    // live INSIDE it), then a second AvailableNow run must RESUME from
    // the preserved checkpoint — final store equals the batch pipeline
    // over all messages, no loss, no replay duplicates
    import graft.operators.{SyncConfig, SyncPipeline}
    import graft.streaming.StreamingSync
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact4").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def m(id: Long) = (id, if (id % 2 == 0) "click" else "view", ts,
      s"""{"k": $id}""")
    val cols = Seq("msg_id", "topic", "publish_time", "data")
    val cfg = SyncConfig()
    val poison = "\"k\": 13\\}"

    (1L to 40L).map(m).toDF(cols: _*).repartition(1)
      .write.mode("append").parquet(s"$tmp/src")
    val q1 = StreamingSync.start(spark, cfg, s"$tmp/src", s"$tmp/sink",
      s"$tmp/metrics", availableNow = true, failedDocPattern = Some(poison))
    assert(q1.awaitTermination(120000))

    Compaction.compact(spark, s"$tmp/sink", targetBytes = 1L << 30)
    val names = new java.io.File(s"$tmp/sink").listFiles()
      .map(_.getName).toSet
    assert(names.contains("_checkpoint"),
      s"compaction dropped the consumer checkpoint: $names")
    assert(names.contains("_failed"),
      s"compaction dropped the failed-payload log: $names")

    (41L to 80L).map(m).toDF(cols: _*).repartition(1)
      .write.mode("append").parquet(s"$tmp/src")
    val q2 = StreamingSync.start(spark, cfg, s"$tmp/src", s"$tmp/sink",
      s"$tmp/metrics", availableNow = true, failedDocPattern = Some(poison))
    assert(q2.awaitTermination(120000))

    val store = spark.read.parquet(s"$tmp/sink")
      .select("msg_id").as[Long].collect().sorted.toSeq
    val batch = SyncPipeline(cfg)((1L to 80L).map(m).toDF(cols: _*))
      .filter(!col("data").rlike(poison))
      .select("msg_id").as[Long].collect().sorted.toSeq
    assert(store === batch, "resumed store must equal the batch pipeline")
    // the diverted batch-1 doc is still in the preserved failure log
    assert(spark.read.parquet(s"$tmp/sink/_failed")
      .select("msg_id").as[Long].collect().toSeq === Seq(13L))
  }
}
