package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver benchmark contract: ONE JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR, also written to a file (SPARK_GRAFT_BENCH_OUT,
  * default BENCH_LOCAL.json) so the gate never depends on scraping sbt
  * log noise. A session-level warm-up (tiny action per table + one full
  * pass of two cheap queries) separates JVM/codegen start-up cost from
  * steady-state per-query throughput; each query is then timed on full
  * materializations (count of the final plan).
  *
  * Failure contract: a query run that throws is NEVER reported as a
  * timing. Its entry in `queries` is -1.0, the message lands in `errors`,
  * and the line is also printed to stderr. The reported time is the min
  * over successful runs only.
  */
object Bench {
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // legacy-layout compatibility: when events.parquet stores
      // TIMESTAMP(NANOS) (rounds ≤4), the plain per-table warm-up read
      // aborts without this; harmless on the current micros layout
      // (Tables.events normalizes either way).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Warm-up: JIT/codegen/session init + file-listing caches. Guarded
    // PER ITEM — one failure must not silently skip the rest.
    def warm(label: String)(f: => Unit): Unit =
      try f catch {
        case e: Throwable => System.err.println(s"[bench] warm-up $label failed: $e")
      }
    graft.sources.Tables.All.foreach { t =>
      warm(t)(spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count())
    }
    warm("q1_agg")(SparkEntry.queries("q1_agg")(spark, sfDir).count())
    warm("sync_route_index")(SparkEntry.queries("sync_route_index")(spark, sfDir).count())

    // Steady-state per-query time: min over two SUCCESSFUL materializations
    // (the reference baseline is a long-running daemon's sustained
    // throughput, so post-JIT time is the comparable number).
    //
    // Round-3/4 regression diagnosis (sync_debug_detect 0.90 s → 2.52 s in
    // BENCH_r03 on untouched code): NOT reproducible — re-measured in round
    // 4 on the same commit's operator at sf0.1/local[32] it runs 0.73 s
    // isolated (SPARK_GRAFT_BENCH_ONLY) and 0.61 s inside the full
    // alphabetical sweep, i.e. back at its round-2 value with no code
    // change. The plan (pruned scan → get_json_object → rlike → 2-group
    // agg) has no order-dependent state; the 2.52 s was a transient
    // artifact of that driver run (BENCH_r03 was attempt "n": 3 — a
    // retried, contended run), not a plan or JIT regression. min-over-two
    // within one process cannot defend against machine-level contention;
    // cross-round comparisons should treat ±2-3× on sub-second queries as
    // environment noise unless it reproduces.
    //
    // Second data point (same round, later session): two BACK-TO-BACK
    // full sweeps on identical code measured 3.100 s then 0.636 s for
    // this query (totals 76.1 s vs 59.8 s — the whole board inflated in
    // the slow run). GC logs from the slow-run JVM show zero full pauses
    // and no code-cache exhaustion; both timed runs inside a sweep were
    // equally slow, so the contention window spans seconds. Confirms:
    // bimodal machine-level noise, not plan/JIT state.
    final case class R(name: String, secs: Double, err: Option[String])
    // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts to named queries (local
    // iteration aid; the driver leaves it unset → full run)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(s =>
      SparkEntry.queries.filter { case (n, _) => s(n) })
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Either[String, Double] = {
        // Release DEAD materialization blocks from prior queries before
        // timing: Materialize local-checkpoints eagerly and a finished
        // query's blocks are unreachable, but they still occupy the
        // unified memory pool — measured on dedup_prefix_jaccard (3
        // materializations): 0.85 s in a fresh session vs 6.6 s after
        // 28 queries' accumulated blocks, same code, reproducible.
        // Each timed run rebuilds its own plan, so nothing live is lost.
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          Left(s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(400)}")
        }
      }
      once() match {
        case Left(e1) => R(name, -1.0, Some(e1))
        case Right(t1) => once() match {
          case Right(t2) =>
            // the two runs can straddle a machine-contention window (the
            // bimodal-noise history above): when they disagree by >2×, a
            // third run arbitrates so one contended sample can't become
            // the reported "regression" (the r8 q10_returned ghost)
            val disagree = math.max(t1, t2) > 2.0 * math.min(t1, t2)
            if (disagree) once() match {
              case Right(t3) => R(name, Seq(t1, t2, t3).min, None)
              case Left(e3) => // same posture as the warm-run branch below:
                // a crashing arbitration run is surfaced, not swallowed
                R(name, math.min(t1, t2), Some(s"third run failed: $e3"))
            } else R(name, math.min(t1, t2), None)
          case Left(e2) => // succeeded cold, failed warm: suspicious — surface it
            R(name, t1, Some(s"second run failed: $e2"))
        }
      }
    }
    results.flatMap(r => r.err.map(r.name -> _)).foreach { case (n, e) =>
      System.err.println(s"[bench] QUERY FAILED $n: $e")
    }

    // 3-decimal seconds keep the full line compact; Locale.ROOT so the
    // decimal separator is always '.'
    def fmt(d: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val qs = results.map(r => jstr(r.name) + ":" + fmt(r.secs)).mkString("{", ",", "}")
    val errs = results.flatMap(r => r.err.map(e => jstr(r.name) + ":" + jstr(e)))
      .mkString("{", ",", "}")
    val total = results.filter(_.secs >= 0).map(_.secs).sum
    val nErr = results.count(_.err.isDefined)
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errs,"n_errors":$nErr,"sf":${jstr(sfDir)}}"""
    // tail-proof contract: the LAST stdout line is a short, complete JSON
    // object (a bounded tail window always contains one parseable line
    // even if the full per-query line gets truncated by log capture);
    // the full detail lives in the line above and in the output file.
    val compact =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_errors":$nErr,"sf":${jstr(sfDir)}}"""
    Files.writeString(Paths.get(outFile), line + "\n")
    // Per-SF committed artifact (r6 verdict #2): BENCH_LOCAL.json is
    // overwritten by whichever scale ran last, which destroyed the
    // sf0.01-vs-sf0.1 per-query slope data — the only contention-proof
    // cross-round perf signal (see the bimodal-noise history above). A
    // second copy keyed by scale factor (sf0.01 → BENCH_SF001.json,
    // sf0.1 → BENCH_SF01.json) survives both runs; full restricted runs
    // (SPARK_GRAFT_BENCH_ONLY) skip it so a partial sweep never
    // masquerades as the board.
    if (only.isEmpty) {
      val sfTag = Paths.get(sfDir).getFileName.toString
        .stripPrefix("sf").replace(".", "")
      Files.writeString(Paths.get(s"BENCH_SF$sfTag.json"), line + "\n")
    }
    println(line)
    println(compact)
    spark.stop()
  }
}
