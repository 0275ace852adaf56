package graft.sinks

import graft.operators.Curation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The export WRITER end of the curation pipeline: the curated corpus
  * lands as shard-partitioned parquet plus a JSON manifest with the
  * per-shard audit counts — the layout a training job consumes
  * (shard = the unit of shuffle/assignment for data loaders).
  *
  * Scale: `partitionBy("shard")` writes each shard as its own directory
  * in one pass (the shard column is the deterministic hash from
  * [[Curation.shardAssign]], so shards are uniform); the manifest
  * aggregate collapses map-side to ≤ nShards rows. The manifest is the
  * commit marker: readers treat a directory without one as an
  * incomplete export. */
object TrainExportSink {

  /** Write `docs` (any schema with `idCol` + `textCol`) as an nShards
    * export under `outDir`: parquet part files per `data/shard=N`
    * directory + `manifest.json`. Returns the manifest rows
    * (shard, n_docs, tok_sum). */
  def write(docs: DataFrame, outDir: String, nShards: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val sharded = Curation.shardAssign(docs, nShards, idCol)
    sharded.write.mode("overwrite")
      .partitionBy("shard").parquet(s"$outDir/data")
    // the manifest aggregates the WRITTEN files, not the input plan:
    // one upstream computation (the curation pipeline above a real
    // export is expensive), and the commit marker can never diverge
    // from the data it describes. Partition columns read back
    // type-inferred → normalize shard to long.
    val manifest = spark.read.parquet(s"$outDir/data")
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.plans.native.token_count(col(textCol))).as("tok_sum"))
      .orderBy(col("shard"))
    val rows = manifest.collect()
    val json = rows.map { r =>
      s"""{"shard":${r.getLong(0)},"n_docs":${r.getLong(1)},""" +
        s""""tok_sum":${r.getLong(2)}}"""
    }.mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/manifest.json"), json)
    manifest
  }

  /** Read an export back, verifying the manifest commit marker exists. */
  def read(spark: SparkSession, outDir: String): DataFrame = {
    require(Files.exists(Paths.get(s"$outDir/manifest.json")),
      s"no manifest at $outDir — incomplete export")
    spark.read.parquet(s"$outDir/data")
  }
}
