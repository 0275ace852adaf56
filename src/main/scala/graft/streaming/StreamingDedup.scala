package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Near-dup gating AT INGEST: every arriving document's minhash band
  * buckets are checked against the first-seen registry kept in streaming
  * state, so a re-crawl / repost is flagged the moment it arrives instead
  * of waiting for the nightly batch dedup. Emits one [[Collision]] per
  * (doc, shared bucket) — downstream consumers distinct the doc ids (a
  * doc colliding in b buckets yields b rows).
  *
  * Semantics match the batch relation exactly (spec-proven): with ties
  * broken by doc id inside a micro-batch, a doc is flagged iff some
  * bucket holds an earlier-seen doc — over one batch that is precisely
  * "doc is the later member of ≥ 1 [[Dedup.minhashCandidates]] pair";
  * across batches the registry carries first-seen ownership forward.
  *
  * Scale: the shuffle is on the bucket key (the same single wide stage
  * as batch banding); state is O(distinct buckets) × 16 bytes — at
  * 100 TB the registry is sharded by the same key, and a production
  * deployment bounds it with event-time TTL (dedup horizon) or periodic
  * compaction into the stored bucket index that [[Dedup.incrementalDedup]]
  * consumes. NoTimeout here = an unbounded horizon, the strictest gate.
  */
object StreamingDedup {

  final case class Doc(doc_id: Long, text: String)

  /** A flagged arrival: `doc_id` shares `bucket` with earlier-seen
    * `first_doc`. */
  final case class Collision(doc_id: Long, bucket: Long, first_doc: Long)

  final case class Seen(first: Long)

  /** The first-seen registry as a flatMapGroupsWithState over the bucket
    * key. Batch-position ties inside a micro-batch resolve by doc id
    * (deterministic replay). */
  def nearDupGate(docs: Dataset[Doc], k: Int = 16, bands: Int = 4,
      shingleN: Int = 3): Dataset[Collision] = {
    val s = docs.sparkSession
    import s.implicits._
    keyedFirstSeenGate(
      Dedup.minhashBuckets(docs.toDF(), k, bands, shingleN).as[(Long, Long)])
  }

  /** The first-seen registry over ANY precomputed (doc_id, key)
    * relation — the gate's state machinery split out so other keying
    * functions (perceptual image hashes, chunk hashes, …) gate through
    * the identical semantics: within a micro-batch ties break by doc
    * id, across batches the registry carries ownership forward. */
  def keyedFirstSeenGate(keyed: Dataset[(Long, Long)]): Dataset[Collision] = {
    val s = keyed.sparkSession
    import s.implicits._
    keyed.groupByKey(_._2)
      .flatMapGroupsWithState[Seen, Collision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Long, it: Iterator[(Long, Long)], state: GroupState[Seen]) =>
          val arrivals = it.map(_._1).toArray.sorted
          var first = state.getOption.map(_.first).getOrElse(Long.MaxValue)
          val out = Array.newBuilder[Collision]
          arrivals.foreach { d =>
            if (first == Long.MaxValue) first = d
            else if (d != first) out += Collision(d, bucket, first)
          }
          state.update(Seen(first))
          out.result().iterator
      }
  }

  /** Batch reference relation for the spec: docs that are the later
    * member of ≥ 1 bucket (all-in-one-batch equivalence). */
  def batchFlagged(docs: DataFrame, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions._
    val b = Dedup.minhashBuckets(docs, k, bands, shingleN)
    val firsts = b.groupBy(col("bucket")).agg(min(col("doc_id")).as("first"))
    b.join(firsts, "bucket")
      .filter(col("doc_id") =!= col("first"))
      .select(col("doc_id")).distinct()
  }
}
