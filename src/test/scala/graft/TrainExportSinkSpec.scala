package graft

import graft.sinks.TrainExportSink
import graft.sources.Tables
import java.nio.file.{Files, Paths}

/** The export writer must produce the consumable layout: one directory
  * per shard, a manifest commit marker whose counts match the data, and
  * a lossless read-back. */
class TrainExportSinkSpec extends SparkSpec {

  test("shard-partitioned export + manifest round-trip") {
    val out = Files.createTempDirectory("graft-export").toString
    val docs = Tables.documents(spark, sf())
    val manifest = TrainExportSink.write(docs, out, nShards = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // layout: shard=N directories under data/
    val shardDirs = new java.io.File(s"$out/data").listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).toSet
    assert(shardDirs == manifest.keySet.map(s => s"shard=$s"))
    assert(Files.exists(Paths.get(s"$out/manifest.json")))

    // read-back is lossless and per-shard counts match the manifest
    val back = TrainExportSink.read(spark, out)
    assert(back.count() == docs.count())
    // the partition column reads back type-inferred (int) — normalize
    val perShard = back.groupBy(
        org.apache.spark.sql.functions.col("shard").cast("long").as("shard"))
      .count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perShard == manifest)

    // an export without its manifest is refused
    Files.delete(Paths.get(s"$out/manifest.json"))
    val ex = intercept[IllegalArgumentException] {
      TrainExportSink.read(spark, out)
    }
    assert(ex.getMessage.contains("manifest"))
  }
}
