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

  /** One document line flowing through [[lineSupportGate]]. */
  final case class LineRow(doc_id: Long, n_lines: Long, line_id: Long,
    line: String)

  /** A gated line: `kept` = the line's corpus support over STRICTLY
    * EARLIER micro-batches was still under the threshold when this
    * document arrived. */
  final case class LineGated(doc_id: Long, n_lines: Long, line_id: Long,
    line: String, kept: Boolean)

  final case class LineSup(n: Long)

  /** The ONLINE face of [[Dedup.lineDedup]]'s support table: per-line
    * running document support kept in streaming state, each arriving
    * batch gated against the support accumulated over STRICTLY EARLIER
    * batches (boilerplate that crossed `minSupport` stops flowing for
    * every LATER arrival; the arrivals that carried it over the
    * threshold still pass — an online gate can only act on what it has
    * seen). The decision is batch-atomic — within one micro-batch every
    * instance of a line gets the same verdict, so the replay is
    * deterministic whatever the intra-batch row order.
    *
    * State per line: ONE long — O(distinct lines ever seen), the same
    * bound the batch support table has; at 100 TB the key is the line
    * hash and a production deployment ages it with event-time TTL.
    * Emits EVERY line with its verdict (a fully-boilerplate document
    * must still reach the downstream reassembly with n_kept = 0). */
  def lineSupportGate(lines: Dataset[LineRow],
      minSupport: Int = 3): Dataset[LineGated] = {
    require(minSupport > 1,
      s"minSupport must be > 1 (1 would drop every line), got $minSupport")
    val s = lines.sparkSession
    import s.implicits._
    lines.groupByKey(_.line)
      .flatMapGroupsWithState[LineSup, LineGated](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (line: String, it: Iterator[LineRow], state: GroupState[LineSup]) =>
          val rows = it.toArray
          val before = state.getOption.map(_.n).getOrElse(0L)
          val keep = before < minSupport
          // a line repeating inside one document counts the doc once —
          // the same distinct-docs semantics as the batch support table
          state.update(LineSup(before +
            rows.iterator.map(_.doc_id).toSet.size))
          rows.sortBy(r => (r.doc_id, r.line_id)).iterator
            .map(r => LineGated(r.doc_id, r.n_lines, r.line_id, r.line,
              keep))
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
