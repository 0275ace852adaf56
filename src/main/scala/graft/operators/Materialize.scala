package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager lineage-truncating materialization for iterative / reused
  * intermediates (candidate edge sets, banded signatures, CC labels).
  *
  * Cluster-grade: when the session has a checkpoint directory configured
  * (`sc.setCheckpointDir`), uses a reliable `checkpoint` — the materialized
  * partitions survive executor loss, which matters for a multi-round loop
  * over 100 TB. Without one (local mode, tests) falls back to an eager
  * `localCheckpoint`, which is executor-local and fast but not
  * fault-tolerant.
  */
object Materialize {
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
