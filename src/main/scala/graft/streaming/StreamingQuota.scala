package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-domain quota AT INGEST — the streaming sibling of
  * `Curation.domainCap`: each domain admits its first `cap` documents in
  * arrival order (the crawl-frontier budget: once a host has contributed
  * its quota, further pages are dropped the moment they arrive, not at
  * the nightly curation pass).
  *
  * Arrival-order semantics, NOT quality-ranked: a stream can't rank
  * against documents it hasn't seen. The batch [[Curation.domainCap]]
  * keeps the top-`cap` BY QUALITY over the full corpus; the stream keeps
  * the FIRST `cap` by (micro-batch, doc id). Both are the production
  * pair: gate at ingest with the arrival quota, re-rank at the curation
  * pass. Spec-proven: admissions ≡ the batch arrival-order relation
  * (row_number over arrival order ≤ cap) regardless of micro-batch
  * boundaries.
  *
  * Scale: ONE shuffle on the domain key per micro-batch; state is a
  * single long per domain (admitted-count), O(domains) total — the same
  * key sharding as the batch window, with none of its sort. Batch-
  * position ties inside a micro-batch resolve by doc id (deterministic
  * replay). */
object StreamingQuota {

  final case class Arrival(doc_id: Long, domain: String)

  /** An admitted document with its per-domain admission slot (1-based). */
  final case class Admitted(doc_id: Long, domain: String, slot: Long)

  final case class Count(n: Long)

  def quotaGate(docs: Dataset[Arrival], cap: Int): Dataset[Admitted] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.groupByKey(_.domain)
      .flatMapGroupsWithState[Count, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain: String, it: Iterator[Arrival], state: GroupState[Count]) =>
          val arrivals = it.map(_.doc_id).toArray.sorted
          var n = state.getOption.map(_.n).getOrElse(0L)
          val out = Array.newBuilder[Admitted]
          arrivals.foreach { d =>
            if (n < cap) { n += 1; out += Admitted(d, domain, n) }
          }
          state.update(Count(n))
          out.result().iterator
      }
  }

  /** Batch reference relation for the spec: first-`cap` per domain in
    * (doc id) arrival order, with the same 1-based slot. */
  def batchQuota(docs: DataFrame, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("domain")).orderBy(col("doc_id"))
    docs.withColumn("slot", row_number().over(w).cast("long"))
      .filter(col("slot") <= cap)
  }
}
