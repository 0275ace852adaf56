package graft.operators

import java.nio.file.{Files, Path, Paths}

/** Scratch placement for ephemeral per-run artifacts: replay-twin
  * source copies / checkpoints / state deltas, and the stored-artifact
  * rows' write-then-read-back indexes. All of it is bounded,
  * per-invocation data (overwritten or deleted by the owning run) —
  * never durable state — so it belongs on the fastest scratch
  * available (guide §6: sensible placement for what you write).
  *
  * Resolution order: `SPARK_GRAFT_SCRATCH` when set (a cluster points
  * it at local SSD), else `/dev/shm` when writable (tmpfs beats the
  * ext4 `/tmp` for the many tiny fsync-ordered files a streaming
  * checkpoint writes per micro-batch), else `java.io.tmpdir`. r13
  * optimization; results are byte-identical — only the placement of
  * temp I/O changes.
  */
object Scratch {
  lazy val base: Path = {
    val fromEnv = sys.env.get("SPARK_GRAFT_SCRATCH").map(Paths.get(_))
    val shm = Paths.get("/dev/shm")
    fromEnv
      .orElse(if (Files.isDirectory(shm) && Files.isWritable(shm)) Some(shm)
              else None)
      .getOrElse(Paths.get(System.getProperty("java.io.tmpdir")))
  }

  /** Create a fresh scratch dir under [[base]]. Registered for
    * JVM-exit deletion as a backstop (owners that fill it are expected
    * to clean up themselves; Spark removes its own local-dir subtrees
    * on shutdown, after which the empty parent can go). */
  def tempDir(prefix: String): String = {
    val d = Files.createTempDirectory(base, prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  /** A fixed-name scratch path under [[base]] (for per-SF stored
    * artifacts that `mode("overwrite")` each invocation). */
  def fixedPath(name: String): String =
    base.resolve(name).toString
}
