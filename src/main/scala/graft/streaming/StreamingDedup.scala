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
  * as batch banding); state is O(distinct buckets since the last
  * flush) × 16 bytes — at 100 TB the registry is sharded by the same
  * key and bounded by the r11 eviction lifecycle: persist the stored
  * bucket index (the C104 artifact), restart the gate through
  * [[keyedFirstSeenGateFrom]] with empty state seeded by it — verdicts
  * unchanged (`dedup_gate_evict` shares `dedup_gate_multibatch`'s SQL
  * verbatim). NoTimeout within a run = the strictest gate horizon.
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
    * id, across batches the registry carries ownership forward.
    * State = one owner per distinct key since the last flush — the
    * r11 eviction lifecycle: persist the stored bucket index (per-key
    * replay owner, the C104 artifact a production sink maintains),
    * restart through [[keyedFirstSeenGateFrom]] with EMPTY state —
    * verdicts unchanged (spec + the `dedup_gate_evict` oracle row). */
  def keyedFirstSeenGate(keyed: Dataset[(Long, Long)]): Dataset[Collision] = {
    val s = keyed.sparkSession
    import s.implicits._
    keyedFirstSeenGateFrom(keyed.map(r => (r._1, r._2, Long.MaxValue)))
  }

  /** [[keyedFirstSeenGate]] seeded by a STORED ownership registry: each
    * row carries its key's flushed first-owner (`_3`; Long.MaxValue =
    * no stored owner — the same sentinel the gate's own empty state
    * uses), joined in upstream from the stored bucket index. A key
    * absent from the registry starts fresh; a key present collides
    * every arrival against the stored owner. base ≡ MaxValue IS the
    * plain gate. */
  def keyedFirstSeenGateFrom(
      keyed: Dataset[(Long, Long, Long)]): Dataset[Collision] = {
    val s = keyed.sparkSession
    import s.implicits._
    keyed.groupByKey(_._2)
      .flatMapGroupsWithState[Seen, Collision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Long, it: Iterator[(Long, Long, Long)],
            state: GroupState[Seen]) =>
          val ids = Array.newBuilder[Long]
          var base = Long.MinValue
          it.foreach { r =>
            // the stored base is a PER-KEY constant by contract (it is
            // joined in from a pre-aggregated registry); a violation —
            // e.g. two registries unioned without folding — would make
            // the verdict depend on intra-batch arrival order, so fail
            // loudly instead of silently picking the head's value
            if (base == Long.MinValue) base = r._3
            else require(base == r._3,
              s"non-uniform stored owner for bucket $bucket: $base vs " +
                s"${r._3} — fold registries before joining them in")
            ids += r._1
          }
          val arrivals = ids.result().sorted
          var first = state.getOption.map(_.first).getOrElse(base)
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

  /** A line carrying its STORED-REGISTRY support (`base`) — the input of
    * [[lineSupportGateFrom]]; produced by a stream-static left join of
    * the line stream against the flushed registry (absent line →
    * base = 0). */
  final case class LineRowBase(doc_id: Long, n_lines: Long, line_id: Long,
    line: String, base: Long)

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
    * State per line: ONE long — O(distinct lines seen SINCE the last
    * flush): the eviction protocol (r11) is [[registryFold]] the gate's
    * emissions into the stored registry (C197-proven ≡ the batch
    * support table), then restart the gate through
    * [[lineSupportGateFrom]] with the registry as base and EMPTY state —
    * verdicts are unchanged (spec + the `dedup_lines_evict` oracle row)
    * and the state store shrinks to the post-flush tail.
    * Emits EVERY line with its verdict (a fully-boilerplate document
    * must still reach the downstream reassembly with n_kept = 0). */
  def lineSupportGate(lines: Dataset[LineRow],
      minSupport: Int = 3): Dataset[LineGated] = {
    val s = lines.sparkSession
    import s.implicits._
    lineSupportGateFrom(
      lines.map(r => LineRowBase(r.doc_id, r.n_lines, r.line_id, r.line, 0L)),
      minSupport)
  }

  /** [[lineSupportGate]] seeded by a STORED registry: each row carries
    * the line's flushed support (`base`, constant per line — joined in
    * upstream), the verdict is `base + state < minSupport`, and state
    * counts only documents seen since the registry snapshot. Running it
    * with base ≡ 0 IS the plain gate.
    *
    * The group body is ONE EAGER PASS with a COMPACT buffer (r12,
    * ADVICE): state commits exactly once, before the emission iterator
    * is returned — a downstream operator that stops consuming early
    * (limit/take) can no longer leave a partially-counted support in
    * the store and make replay non-deterministic. The hot-chrome memory
    * concern that motivated the r11 lazy pass stays addressed because
    * the buffered rows never carry the line text (it is the group key):
    * per-group memory is three longs per instance plus the distinct-doc
    * id set. Emission order within a group is ARRIVAL order (every
    * downstream consumer is relational: reassembly aggregates, registry
    * folds). */
  def lineSupportGateFrom(lines: Dataset[LineRowBase],
      minSupport: Int = 3): Dataset[LineGated] = {
    require(minSupport > 1,
      s"minSupport must be > 1 (1 would drop every line), got $minSupport")
    val s = lines.sparkSession
    import s.implicits._
    lines.groupByKey(_.line)
      .flatMapGroupsWithState[LineSup, LineGated](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (line: String, it: Iterator[LineRowBase],
            state: GroupState[LineSup]) =>
          val prior = state.getOption.map(_.n).getOrElse(0L)
          // a line repeating inside one document counts the doc once —
          // the same distinct-docs semantics as the batch support table
          val docs = new java.util.HashSet[Long]
          val rows = Array.newBuilder[(Long, Long, Long)]
          var base = Long.MinValue
          it.foreach { r =>
            // base is a per-line constant by contract (joined in from a
            // folded registry); fail loudly on a violation rather than
            // letting the verdict depend on intra-batch arrival order
            if (base == Long.MinValue) base = r.base
            else require(base == r.base,
              s"non-uniform stored support for a line group: $base vs " +
                s"${r.base} — fold registries before joining them in")
            docs.add(r.doc_id)
            rows += ((r.doc_id, r.n_lines, r.line_id))
          }
          val keep = base + prior < minSupport
          state.update(LineSup(prior + docs.size))
          rows.result().iterator.map { case (d, n, lid) =>
            LineGated(d, n, lid, line, keep)
          }
      }
  }

  /** A keyed arrival carrying its EVENT TIME — input of
    * [[keyedFirstSeenGateTtl]]. */
  final case class KeyedT(doc_id: Long, key: Long, ts: java.sql.Timestamp)

  /** [[keyedFirstSeenGate]] with IN-STREAM state eviction via
    * `GroupStateTimeout.EventTimeTimeout` (r12, verdict #1): each key's
    * state arms a timeout at its latest event time + `ttlMs`, and when
    * the WATERMARK passes it the owner row is dropped from the store —
    * watermark-driven, so fully deterministic under replay (no wall
    * clock anywhere; the same data always evicts at the same batch).
    *
    * Exactness contract: ownership verdicts equal the NoTimeout gate's
    * whenever every key's consecutive-occurrence gap is ≤ ttl + one
    * batch interval: a key with data in a batch is never timed out in
    * that batch, and the watermark that can expire it commits only
    * after the batch FOLLOWING its last activity (timeouts then fire
    * promptly, in a no-data batch — spec-observed). On an n-batch
    * replay, ttl = (n−2)·interval makes that
    * bound UNIVERSAL — no gap can exceed (n−1)·interval — which is the
    * `dedup_gate_ttl` oracle row's setting; production instead picks
    * ttl from its redelivery-window SLO and keys older than that live
    * in the stored bucket index (the C104 artifact,
    * [[keyedFirstSeenGateFrom]]'s base join). */
  def keyedFirstSeenGateTtl(keyed: Dataset[KeyedT],
      ttlMs: Long): Dataset[Collision] = {
    val s = keyed.sparkSession
    import s.implicits._
    keyedFirstSeenGateTtlFrom(
      keyed.map(r => KeyedBT(r.doc_id, r.key, Long.MaxValue, r.ts)), ttlMs)
  }

  /** A keyed arrival carrying its STORED owner (`base`) and event
    * time — input of [[keyedFirstSeenGateTtlFrom]]. */
  final case class KeyedBT(doc_id: Long, key: Long, base: Long,
    ts: java.sql.Timestamp)

  /** The COMPOSED production lifecycle of the first-seen gate (r12):
    * [[keyedFirstSeenGateTtlFrom]] = stored-registry seeding
    * ([[keyedFirstSeenGateFrom]]) ⊕ watermark-driven eviction
    * ([[keyedFirstSeenGateTtl]]). Every arrival carries its key's
    * flushed owner via the stream-static registry join, so EVICTING a
    * registry-owned key is provably harmless — the next arrival
    * re-seeds the identical owner from `base` — and the state store
    * holds only keys ACTIVE within the ttl horizon, not the registry's
    * tail. Ownership can drift only for a key ABSENT from the registry
    * that recurs after eviction, i.e. a new key with a recurrence gap
    * > ttl + one batch — exactly the window the registry flush cadence
    * is chosen to cover in production. */
  def keyedFirstSeenGateTtlFrom(keyed: Dataset[KeyedBT],
      ttlMs: Long): Dataset[Collision] = {
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    val s = keyed.sparkSession
    import s.implicits._
    keyed.withWatermark("ts", "0 seconds")
      .groupByKey(_.key)
      .flatMapGroupsWithState[Seen, Collision](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucket: Long, it: Iterator[KeyedBT], state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ids = Array.newBuilder[Long]
            var base = Long.MinValue
            var maxTs = Long.MinValue
            it.foreach { r =>
              if (base == Long.MinValue) base = r.base
              else require(base == r.base,
                s"non-uniform stored owner for bucket $bucket: $base vs " +
                  s"${r.base} — fold registries before joining them in")
              ids += r.doc_id
              val t = r.ts.getTime
              if (t > maxTs) maxTs = t
            }
            val arrivals = ids.result().sorted
            var first = state.getOption.map(_.first).getOrElse(base)
            val out = Array.newBuilder[Collision]
            arrivals.foreach { d =>
              if (first == Long.MaxValue) first = d
              else if (d != first) out += Collision(d, bucket, first)
            }
            state.update(Seen(first))
            state.setTimeoutTimestamp(maxTs + ttlMs)
            out.result().iterator
          }
      }
  }

  /** A line instance carrying its EVENT TIME — input of
    * [[lineSupportGateTtl]]. */
  final case class LineRowT(doc_id: Long, n_lines: Long, line_id: Long,
    line: String, ts: java.sql.Timestamp)

  /** [[lineSupportGate]] with IN-STREAM state eviction via
    * `GroupStateTimeout.EventTimeTimeout` (r12, verdict #1): a line's
    * support row leaves the store once the watermark passes its latest
    * event time + `ttlMs` — deterministic (watermark-driven, no wall
    * clock), so the gate's state is O(lines active within the TTL
    * horizon) instead of O(lines since the last flush).
    *
    * Exactness contract: support resets can only flip a verdict for a
    * line that re-crosses `minSupport` after an eviction, so the safe
    * TTL is a property of the corpus's recurrence structure rather
    * than a universal bound; the `dedup_lines_ttl` oracle row runs
    * ttl = 2 batch intervals, verified verdict-invariant against the
    * never-evicting replay at all three test scale factors (at
    * ttl = 1 interval one real line — "scan query" at sf0.1 — flips,
    * which the spec plants as the negative control). Production pairs
    * the TTL with the flushed registry ([[lineSupportGateFrom]]) so
    * long-horizon support survives outside the store. */
  def lineSupportGateTtl(lines: Dataset[LineRowT], ttlMs: Long,
      minSupport: Int = 3): Dataset[LineGated] = {
    val s = lines.sparkSession
    import s.implicits._
    lineSupportGateTtlFrom(
      lines.map(r => LineRowBaseT(r.doc_id, r.n_lines, r.line_id, r.line,
        0L, r.ts)), ttlMs, minSupport)
  }

  /** A line instance carrying its STORED-REGISTRY support and event
    * time — input of [[lineSupportGateTtlFrom]]. */
  final case class LineRowBaseT(doc_id: Long, n_lines: Long, line_id: Long,
    line: String, base: Long, ts: java.sql.Timestamp)

  /** The COMPOSED production lifecycle of the line gate (r12):
    * [[lineSupportGateTtlFrom]] = stored-registry support
    * ([[lineSupportGateFrom]]) ⊕ watermark-driven eviction
    * ([[lineSupportGateTtl]]). The verdict is base + since-eviction
    * state, so long-horizon support lives in the registry while the
    * store holds only lines ACTIVE within the ttl horizon; a verdict
    * can drift only when a line's IN-STORE increments (support earned
    * since the registry snapshot) evict before a recurrence that they
    * would have pushed across `minSupport` — the window the flush
    * cadence covers in production. */
  def lineSupportGateTtlFrom(lines: Dataset[LineRowBaseT], ttlMs: Long,
      minSupport: Int = 3): Dataset[LineGated] = {
    require(minSupport > 1,
      s"minSupport must be > 1 (1 would drop every line), got $minSupport")
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    val s = lines.sparkSession
    import s.implicits._
    lines.withWatermark("ts", "0 seconds")
      .groupByKey(_.line)
      .flatMapGroupsWithState[LineSup, LineGated](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (line: String, it: Iterator[LineRowBaseT],
            state: GroupState[LineSup]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption.map(_.n).getOrElse(0L)
            val docs = new java.util.HashSet[Long]
            val rows = Array.newBuilder[(Long, Long, Long)]
            var base = Long.MinValue
            var maxTs = Long.MinValue
            it.foreach { r =>
              if (base == Long.MinValue) base = r.base
              else require(base == r.base,
                s"non-uniform stored support for a line group: $base vs " +
                  s"${r.base} — fold registries before joining them in")
              docs.add(r.doc_id)
              rows += ((r.doc_id, r.n_lines, r.line_id))
              val t = r.ts.getTime
              if (t > maxTs) maxTs = t
            }
            val keep = base + prior < minSupport
            state.update(LineSup(prior + docs.size))
            state.setTimeoutTimestamp(maxTs + ttlMs)
            rows.result().iterator.map { case (d, n, lid) =>
              LineGated(d, n, lid, line, keep)
            }
          }
      }
  }

  /** The registry FLUSH of gate emissions — the eviction target: every
    * line instance flows through the gate with its verdict, so distinct
    * (line, doc) pairs survive the stream and the fold rebuilds EXACT
    * document support (the `dedup_lines_registry` oracle row proves
    * fold(stream) ≡ batch [[Dedup.lineSupport]]). A production
    * deployment flushes on a state-size trigger, unions the fold into
    * the stored registry, and restarts the gate through
    * [[lineSupportGateFrom]]; [[Dedup.lineDedupIncremental]] consumes
    * the same registry on the batch side. */
  def registryFold(gated: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    gated.select(col("line"), col("doc_id")).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("sup"))
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
