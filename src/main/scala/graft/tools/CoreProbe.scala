package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Core-count probe (r14 verdict #5): at sf0.1 the driver's 8-core and
  * 32-core totals are equal — every batch row is sub-second and
  * job-overhead-bound, so the board cannot measure parallelism at all.
  * This tool times the [[ScaleProbe.probes]] set on a `replicas`×
  * corpus (default 8× sf0.1) at each requested core count in one JVM
  * (fresh SparkContext per count, same scratch/conf conventions as
  * Bench) and writes SCALE_CORES.json with per-query walls and the
  * low-core/high-core ratio — the parallelism yardstick plan work can
  * be judged against (scan/shuffle-bound rows should show ratio ≫ 1).
  *
  * Usage: runMain graft.tools.CoreProbe [replicas] [reps] [cores,...]
  * (defaults: 8 replicas, 2 reps, cores 32,4). SPARK_GRAFT_SCALE_ONLY
  * restricts the probe set; restricted runs skip the JSON write. */
object CoreProbe {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"graft-core-probe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir",
        graft.operators.Scratch.tempDir("graft-spark-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(8)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val cores = args.drop(2).headOption.getOrElse("32,4")
      .split(",").map(_.trim.toInt).toSeq
    val onlyProbes = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = onlyProbes.fold(ScaleProbe.probes)(s =>
      ScaleProbe.probes.filter(s))
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // build the scaled corpus once, with the first core count's session
    val scaledDir = Files.createTempDirectory("graft-core-scale").toString
    locally {
      val s0 = session(cores.head)
      ScaleProbe.replicateCorpus(s0, baseDir, scaledDir, replicas)
      s0.stop()
    }

    def fmt(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val results = cores.map { c =>
      val spark = session(c)
      val times = selected.map { q =>
        val fn = graft.SparkEntry.queries(q)
        fn(spark, scaledDir).count() // warm (JIT + listing caches)
        val t = (1 to reps).map { _ =>
          spark.sharedState.cacheManager.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          val t0 = System.nanoTime()
          fn(spark, scaledDir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[cores] $q%-22s c$c%-3d $t%.2f s")
        q -> t
      }.toMap
      spark.stop()
      c -> times
    }.toMap

    val hi = cores.max
    val rows = selected.map { q =>
      val per = cores.map(c => s""""c$c":${fmt(results(c)(q))}""")
      val ratios = cores.filter(_ != hi).map(c =>
        s""""ratio_c$c":${fmt(results(c)(q) / results(hi)(q))}""")
      s""""$q":{${(per ++ ratios).mkString(",")}}"""
    }
    val line = s"""{"replicas":$replicas,"cores":[${cores.mkString(",")}],"queries":{${rows.mkString(",")}}}"""
    if (onlyProbes.isEmpty)
      Files.writeString(Paths.get("SCALE_CORES.json"), line + "\n")
    println(line)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(scaledDir),
      new org.apache.hadoop.conf.Configuration())
    fs.delete(new org.apache.hadoop.fs.Path(scaledDir), true)
    ()
  }
}
