package graft.operators

import graft.functions.Portable
import graft.plans.native
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates with *deterministic, portable*
  * arithmetic (SURVEY.md §5): unlike HLL (whose hash/bias tables are
  * engine-specific), linear counting over the portable poly-hash gives the
  * same estimate in any engine — so the oracle can verify it exactly.
  *
  * Scale: the per-group state is the K-bucket occupancy set, built by a
  * map-side-combinable count-distinct of `hash mod K`; memory O(K) per
  * group, one shuffle. For 100 TB cardinalities raise K (error ~
  * sqrt(K)·(e^{n/K}−1); K=4096 keeps <2% to n≈3K). */
object Sketches {

  /** Occupied-bucket count and linear-counting estimate of
    * count-distinct(valueCol) per key group:
    * estimate = −K·ln((K − occupied)/K). */
  def linearCountDistinct(df: DataFrame, keys: Seq[String], valueCol: Column,
      k: Int = 1024): DataFrame = {
    val bucket = pmod(native.poly_hash(valueCol.cast("string")), lit(k.toLong))
    df.groupBy(keys.map(col): _*)
      .agg(countDistinct(bucket).as("occupied"))
      .withColumn("estimate",
        when(col("occupied") === k, lit(Double.PositiveInfinity))
          .otherwise(round(-lit(k.toDouble) *
            log((lit(k) - col("occupied")) / lit(k)), 4)))
  }

  /** KMV (k-minimum-values) distinct sketch per key group — the
    * mergeable cardinality estimator that, unlike linear counting, also
    * supports set operations (union = re-min of merged k-min sets,
    * proven in SketchGuaranteesSpec): hash every value through the
    * affine rehash (sequential ids raw-hash prefix-banded — the
    * mixUpsample draw lesson), keep each group's k smallest DISTINCT
    * hashes, estimate n̂ = (k−1)·M / h_k from the k-th minimum. Groups
    * with fewer than k distinct hashes report their exact count.
    *
    * Determinism: hashes are exact integers, h_k is an exact order
    * statistic, and the estimate is ONE double division rounded at 4 dp
    * — bit-identical cross-engine. Scale: the distinct pass shuffles
    * once on (group, hash); the rank window is PARTITIONED by group and
    * Catalyst plans the k-filter as a pre-shuffle WindowGroupLimit, so
    * maps ship O(k) rows per group — the sketch is O(groups·k) state,
    * never the data. */
  def kmvDistinct(df: DataFrame, keys: Seq[String], valueCol: Column,
      k: Int = 64): DataFrame =
    kmvDistinctFromMinK(Materialize(kmvMinK(df, keys, valueCol, k)), keys, k)

  /** The estimate readout of [[kmvDistinct]] over an already-built
    * (possibly streaming-maintained or merged) k-min relation
    * (keys..., h, rk) — split out so a stored/streamed sketch
    * estimates through the identical arithmetic. */
  def kmvDistinctFromMinK(mink: DataFrame, keys: Seq[String],
      k: Int): DataFrame = {
    mink.groupBy(keys.map(col): _*)
      .agg(max(col("rk")).cast("long").as("n_min"),
        max(when(col("rk") === k, col("h"))).as("h_k"))
      .withColumn("kmv_est",
        when(col("n_min") < k, col("n_min").cast("double"))
          .otherwise(round(lit((k - 1).toDouble * graft.plans.HashOps.M)
            / col("h_k"), 4)))
      .drop("h_k")
  }

  /** The stored KMV sketch rows behind [[kmvDistinct]] — each group's k
    * smallest distinct hashes with their rank, O(groups·k). MERGEABLE:
    * union per-batch sketches, re-rank, keep k — ≡ the full-corpus
    * sketch (SketchGuaranteesSpec), because the k smallest of a union
    * are among the union of the k smallest. */
  def kmvMinK(df: DataFrame, keys: Seq[String], valueCol: Column,
      k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = (native.poly_hash(concat(lit("kmv:"), valueCol.cast("string")))
      * graft.plans.HashOps.aK(0) + graft.plans.HashOps.bK(0)) %
      graft.plans.HashOps.M
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("h"))
    df.select(keys.map(col) :+ h.as("h"): _*).distinct()
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** KMV set-operation estimates for every GROUP PAIR — the capability
    * that distinguishes KMV from linear counting: the union sketch of
    * two groups is the re-min of their k-min sets (no raw data touched),
    * so n̂(A∪B) comes from the merged k-th minimum, n̂(A∩B) by
    * inclusion–exclusion, and the jaccard estimate as their ratio.
    * Audience-overlap / shared-users analysis at O(groups²·k) cost over
    * the stored sketch — the corpus is scanned ONCE (by [[kmvMinK]]).
    *
    * Determinism: per-group and per-pair estimates are single rounded
    * divisions of exact integers; the intersection subtraction runs on
    * the 4-dp-rounded estimates (both engines subtract identical
    * doubles). Negative inclusion–exclusion artifacts clamp to 0. */
  def kmvPairOverlap(df: DataFrame, keyCol: String, valueCol: Column,
      k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mink = Materialize(kmvMinK(df, Seq(keyCol), valueCol, k))
    def estOf(grouped: DataFrame, keys: Seq[String]): DataFrame =
      grouped.groupBy(keys.map(col): _*)
        .agg(max(col("rk")).cast("long").as("n_min"),
          max(when(col("rk") === k, col("h"))).as("h_k"))
        .withColumn("est",
          when(col("n_min") < k, col("n_min").cast("double"))
            .otherwise(round(lit((k - 1).toDouble * graft.plans.HashOps.M)
              / col("h_k"), 4)))
        .select(keys.map(col) :+ col("est"): _*)
    val perGroup = estOf(mink, Seq(keyCol))
    val pairs = perGroup.select(col(keyCol).as("key_a"), col("est").as("est_a"))
      .crossJoin(perGroup.select(col(keyCol).as("key_b"), col("est").as("est_b")))
      .filter(col("key_a") < col("key_b"))
    val wp = Window.partitionBy(col("key_a"), col("key_b")).orderBy(col("h"))
    // membership via two EQUI-joins unioned (an OR-condition join would
    // plan a nested loop): each pair pulls its two groups' sketch rows
    val pk = pairs.select(col("key_a"), col("key_b"))
    val hs = mink.select(col(keyCol), col("h"))
    val merged = pk.join(hs, col(keyCol) === col("key_a"))
      .select(col("key_a"), col("key_b"), col("h"))
      .unionAll(pk.join(hs, col(keyCol) === col("key_b"))
        .select(col("key_a"), col("key_b"), col("h")))
      .distinct()
      .withColumn("rk", row_number().over(wp)).filter(col("rk") <= k)
    val unionEst = estOf(merged, Seq("key_a", "key_b"))
      .withColumnRenamed("est", "est_union")
    pairs.join(unionEst, Seq("key_a", "key_b"))
      .withColumn("est_intersection",
        greatest(round(col("est_a") + col("est_b") - col("est_union"), 4),
          lit(0.0)))
      .withColumn("est_jaccard",
        round(col("est_intersection") / col("est_union"), 6))
  }

  /** Fixed-bin histogram quantile sketch: values bucketed into `bins`
    * equal-width bins over [lo, hi) (out-of-range clamped to the edge
    * bins), per-key bin counts merged as plain sums — commutative, so
    * the sketch and every estimate are identical under any partitioning
    * (oracle-EXACT, like the CMS). The q-quantile estimate is the upper
    * edge of the first bin whose cumulative count reaches ceil(q·n):
    * error ≤ one bin width, O(bins) state per key.
    *
    * Scale: the count agg is map-side combined to ≤ bins rows per key
    * before the shuffle; the cumulative window runs over ≤ keys×bins
    * rows — never over the data. Choose lo/hi/bins so the width is a
    * power of two and the bin arithmetic is exact in both engines. */
  /** The histogram sketch's bin assignment (clamped equal-width bins) —
    * public so streaming aggregations can build the SAME mergeable bin
    * counts (StreamingSketchSpec proves cross-batch merge ≡ batch). */
  def histogramBin(valueCol: Column, bins: Int, lo: Double, hi: Double): Column =
    least(greatest(floor((valueCol - lo) / ((hi - lo) / bins)), lit(0)),
      lit(bins - 1)).cast("int")

  def histogramQuantiles(df: DataFrame, keys: Seq[String], valueCol: Column,
      qs: Seq[Double], bins: Int = 128, lo: Double = 0.0,
      hi: Double = 512.0): DataFrame =
    histogramQuantilesFromCounts(
      df.groupBy(
        (keys.map(col) :+ histogramBin(valueCol, bins, lo, hi).as("bin")): _*)
        .agg(count(lit(1)).as("cnt")),
      keys, qs, bins, lo, hi)

  /** The quantile readout of [[histogramQuantiles]] over an
    * already-built (possibly streaming-maintained or merged) per-(key,
    * bin) count relation — bin counts are plain sums, so a streamed or
    * sharded grid reads out identically. */
  def histogramQuantilesFromCounts(counts: DataFrame, keys: Seq[String],
      qs: Seq[Double], bins: Int = 128, lo: Double = 0.0,
      hi: Double = 512.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val width = (hi - lo) / bins
    val byKey = Window.partitionBy(keys.map(col): _*)
    val cum = counts
      .withColumn("n_values", sum(col("cnt")).over(byKey))
      .withColumn("cum", sum(col("cnt")).over(byKey.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val qCols = qs.flatMap { q =>
      val tag = (q * 100).round.toInt
      val b = min(when(col("cum") >= ceil(lit(q) * col("n_values")),
        col("bin")))
      Seq(b.as(s"p${tag}_bin"),
        round((b.cast("double") + 1) * width + lo, 6).as(s"p${tag}_est"))
    }
    cum.groupBy(keys.map(col): _*)
      .agg(max(col("n_values")).as("n_values"), qCols: _*)
  }

  /** Count-min sketch frequency estimates for the `probes` items:
    * depth×width counter grid addressed by affine re-hashes of the
    * portable poly-hash; estimate(w) = min over rows of w's cell count.
    * Cell counts are plain sums — commutative, so the sketch (and every
    * estimate) is identical under any partitioning or merge order, and
    * the oracle verifies it EXACTLY. Estimates always upper-bound the
    * true frequency (collisions only inflate).
    *
    * Scale: building the grid is one map-side-combined agg of at most
    * depth×width rows — O(1) state regardless of corpus size; probing is
    * a broadcast-sized join on (row, cell). */
  /** The CMS grid as a DataFrame of (k, cell, n) — plain-sum cells, so
    * the SAME aggregation runs batch, incremental (sum two grids), or as
    * a streaming aggregation across micro-batches
    * (StreamingSketchSpec proves merge ≡ batch). */
  def cmsCells(items: DataFrame, itemCol: Column, depth: Int = 4,
      width: Int = 1024): DataFrame =
    items
      .select(explode(cmsCellsOf(native.poly_hash(itemCol), depth, width)).as("kc"))
      .groupBy(col("kc.k").as("k"), col("kc.cell").as("cell"))
      .agg(count(lit(1)).as("n"))

  private def cmsCellsOf(hc: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(k =>
      struct(lit(k).as("k"), (Portable.rehash(hc, k) % width).as("cell"))): _*)

  def countMinFreq(items: DataFrame, itemCol: Column, probes: Seq[String],
      depth: Int = 4, width: Int = 1024): DataFrame =
    cmsEstimate(cmsCells(items, itemCol, depth, width), probes, depth, width)

  /** Probe-side estimate over an already-built (possibly
    * streaming-maintained or merged) cell grid: min over the probe's
    * depth cells — split out of [[countMinFreq]] so a stored/streamed
    * grid estimates through the identical join. */
  def cmsEstimate(cells: DataFrame, probes: Seq[String],
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val probeCells = probes.toDF("word")
      .select(col("word"),
        explode(cmsCellsOf(native.poly_hash(col("word")), depth, width)).as("kc"))
      .select(col("word"), col("kc.k").as("k"), col("kc.cell").as("cell"))
    probeCells.join(cells, Seq("k", "cell"), "left")
      .groupBy(col("word"))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }

  /** CMS INNER-PRODUCT estimate between per-key token streams — the
    * sketch answer to "how much does source A's token distribution
    * overlap source B's" without materializing either frequency vector:
    * for grids sharing the hash functions, est = min over rows k of
    * Σ_cell n_A[k][cell]·n_B[k][cell], which upper-bounds the true
    * Σ_w f_A(w)·f_B(w) (collisions only inflate — the classic CMS dot
    * guarantee). All-integer, so batch/merged/streamed grids give the
    * IDENTICAL estimate and the oracle verifies it exactly.
    *
    * Scale: each per-key grid is ≤ depth·width counters regardless of
    * corpus size (the same map-side-combined agg as [[cmsCells]]); the
    * pairwise stage joins grid tables of O(#keys · depth · width) rows —
    * model-state-sized, never corpus-sized. Overflow bound: cell counts
    * up to ~3·10⁶ keep Σ_cell n·n inside int64 by ~10³×; corpora beyond
    * that should sample or widen the grid. */
  def cmsDot(items: DataFrame, keyCol: Column, itemCol: Column,
      depth: Int = 4, width: Int = 1024): DataFrame =
    cmsDotFromGrids(cmsGridsByKey(items, keyCol, itemCol, depth, width))

  /** The per-key grid stage of [[cmsDot]] as (__src, k, cell, n) —
    * plain-sum cells, so the SAME aggregation runs batch or as a
    * complete-mode streaming aggregation across micro-batches (the
    * [[cmsCells]] property, per key). */
  def cmsGridsByKey(items: DataFrame, keyCol: Column, itemCol: Column,
      depth: Int = 4, width: Int = 1024): DataFrame =
    items
      .select(keyCol.as("__src"),
        explode(cmsCellsOf(native.poly_hash(itemCol), depth, width)).as("kc"))
      .groupBy(col("__src"), col("kc.k").as("k"), col("kc.cell").as("cell"))
      .agg(count(lit(1)).as("n"))

  /** The pairwise stage of [[cmsDot]] over an already-built (possibly
    * streaming-maintained or merged) per-key grid — split out so a
    * stored/streamed grid estimates through the identical join. */
  def cmsDotFromGrids(g: DataFrame): DataFrame = {
    val a = g.select(col("__src").as("source_a"), col("k"), col("cell"),
      col("n").as("na"))
    val b = g.select(col("__src").as("source_b"), col("k"), col("cell"),
      col("n").as("nb"))
    a.join(b, Seq("k", "cell"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"), col("k"))
      .agg(sum(col("na") * col("nb")).as("dk"),
        count(lit(1)).as("__nc"),
        max(col("na").cast("decimal(19,0)") * col("nb").cast("decimal(19,0)"))
          .as("__mp"))
      .withColumn("dk", col("dk") + Guards.sumBound(col("__nc"), col("__mp"),
        "cmsDot: Σ na·nb can exceed int64 at these cell counts — " +
          "deepen/widen the grid or shard the sources"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(min(col("dk")).as("est_dot"))
  }

  /** CMS-gated exact heavy hitters: items whose frequency is at least
    * `1/fracDenom` of the total item count, found in two passes —
    * (1) build the depth×width count-min grid (a map-side-combined agg
    * to ≤ depth·width rows, O(1) state at any corpus size) and inline it
    * as literal arrays (the IVF-centroid trick: the grid is model-state,
    * ~32 KB); (2) re-scan with a NARROW map-side gate
    * `est(w) ≥ threshold` — CMS only over-estimates, so no true heavy
    * hitter is dropped — and exactly count just the survivors, whose
    * recount drops the CMS false positives. The result is therefore
    * EXACTLY the true heavy-hitter set (oracle: plain HAVING), but the
    * wide exact-count stage only ever shuffles rows whose key passed the
    * sketch — at 100 TB that is the difference between shuffling the
    * full Zipf tail and shuffling only the head's rows.
    *
    * The total item count needed for the threshold falls out of the
    * grid itself (row 0 sums to it) — no extra pass. The gate compares
    * `est · fracDenom ≥ total` in exact int64 arithmetic. */
  def heavyHitters(items: DataFrame, itemCol: Column, fracDenom: Long = 50,
      depth: Int = 4, width: Int = 1024): DataFrame =
    heavyHittersFromGrid(items, itemCol,
      cmsCells(items, itemCol, depth, width), fracDenom, depth, width)

  /** [[heavyHitters]] pass 2 over an already-built (possibly
    * streaming-maintained or merged) cell grid — split out so a
    * stored/streamed grid gates the exact recount through the identical
    * literal-array probe. */
  def heavyHittersFromGrid(items: DataFrame, itemCol: Column,
      cells: DataFrame, fracDenom: Long = 50,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val h = native.poly_hash(itemCol)
    val gridRows = cells.collect()
    val grid = Array.fill(depth, width)(0L)
    gridRows.foreach(r => grid(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2))
    val total = grid(0).sum
    val est = (0 until depth).map { k =>
      val row = array(grid(k).map(lit): _*)
      element_at(row, (Portable.rehash(h, k) % width).cast("int") + 1)
    }.reduce(least(_, _))
    items
      .filter(est * fracDenom >= total) // narrow sketch gate, no false negatives
      .groupBy(itemCol.as("item"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") * fracDenom >= total)
      .withColumn("total_items", lit(total))
  }

  /** HLL registers per key group — a PORTABLE HyperLogLog built on the
    * poly-hash (the header's "HLL is engine-specific" caveat applies to
    * library HLLs with their private hash/bias tables; with the portable
    * hash and no bias table the register arithmetic is exact integers in
    * both engines). m = 64 registers: `bucket = h mod 64`, the remaining
    * 25 hash bits form `w`, and the register value is
    * `rho = first-one position of w` (1..25, 26 when w = 0) — computed by
    * an integer comparison chain, never floating log2 (whose boundary at
    * exact powers of two could flip cross-engine). `max(rho)` per bucket
    * is the O(groups·64) stored sketch.
    *
    * MERGEABLE: registers from disjoint batches max-merge ≡ the
    * full-corpus registers (max is associative/commutative/idempotent —
    * so unlike KMV no distinct pass is needed and duplicate arrivals are
    * free). One map-side-combined shuffle on (group, bucket). */
  def hllRegisters(df: DataFrame, keys: Seq[String],
      valueCol: Column): DataFrame = {
    val h = Portable.rehash(
      native.poly_hash(concat(lit("hll:"), valueCol.cast("string"))), 0)
    val w = shiftright(h, 6)
    val rho = (0 until 25)
      .map(i => (1L << (24 - i), (i + 1).toLong))
      .foldLeft(null: Column) { case (acc, (thr, r)) =>
        if (acc == null) when(w >= thr, r) else acc.when(w >= thr, r)
      }.otherwise(lit(26L))
    df.select(keys.map(col) :+ pmod(h, lit(64L)).as("bucket")
      :+ rho.as("rho"): _*)
      .groupBy(keys.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("m_j"))
  }

  /** HLL cardinality estimate per key group from [[hllRegisters]].
    *
    * Determinism: the harmonic-mean denominator Σ 2^−M_j is computed as
    * the SCALED integer Σ 2^(26−M_j) (empty buckets contribute 2^26) —
    * an exact int64 sum under any partitioning; the estimate is then ONE
    * double division by the α·m²·2^26 constant (powers-of-two factors
    * scale the exponent only, so both engines hold the identical
    * double), with the standard small-range fallback to linear counting
    * (m·ln(m/V)) when E ≤ 2.5m and zero registers remain — the ln is the
    * same single-call IEEE arithmetic the linear-counting sketch already
    * relies on. Round at 4 dp. */
  def hllDistinct(df: DataFrame, keys: Seq[String],
      valueCol: Column): DataFrame =
    hllEstimate(hllRegisters(df, keys, valueCol), keys)

  /** Estimate from an EXPLICIT register table (columns: keys, bucket,
    * m_j) — the seam the stored/merged sketch paths use: registers
    * max-merge across shards or corpus versions, then estimate here.
    * Same arithmetic as the inline path (see [[hllDistinct]]). */
  def hllEstimate(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val term = (1 to 26).map(m => (m, 1L << (26 - m)))
      .foldLeft(null: Column) { case (acc, (m, t)) =>
        if (acc == null) when(col("m_j") === m, t)
        else acc.when(col("m_j") === m, t)
      }
    val alphaM2 = lit(0.709) * lit(64.0) * lit(64.0) * lit(67108864.0)
    regs
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("occupied"), sum(term).as("s_present"))
      .withColumn("e_raw", alphaM2 /
        (col("s_present") + (lit(64L) - col("occupied")) * lit(67108864L))
          .cast("double"))
      .withColumn("hll_est",
        when(col("e_raw") <= 160.0 && col("occupied") < 64,
          round(lit(64.0) * log(lit(64.0) / (lit(64L) - col("occupied"))), 4))
          .otherwise(round(col("e_raw"), 4)))
      .drop("s_present", "e_raw")
  }

  /** Mergeable MOMENT sketch: per key, (n, Σq, Σq²) over the integer
    * lattice q = floor(value·scale) — the three sums a distributed
    * mean/variance rollup ships per shard and ADDS to merge (the
    * HLL-merge theorem's trivial cousin, but the one every metrics
    * pipeline actually runs). Integer-exact, so merge ≡ direct is a
    * hash-level fact, not an approximation. Bounds at scale = 10³ and
    * values ≤ ~10³: q ≤ 10⁶, Σq² grows ≤ 10¹² per row → safe to ~10⁶
    * rows per key; larger corpora lower `scale` (the sketch's
    * resolution knob). Values are assumed non-negative (the regime
    * where Spark's `div` and DuckDB's `//` agree). */
  def moments(rows: DataFrame, keys: Seq[String], value: Column,
      scale: Long = 1000L): DataFrame =
    rows.withColumn("__q", floor(value * scale).cast("long"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__q")).as("s1"),
        sum(col("__q") * col("__q")).as("s2"),
        max(abs(col("__q"))).as("__mq"))
      .withColumn("s2", col("s2") + Guards.sumSqBound(col("n"), col("__mq"),
        "moments: Σq² can exceed int64 at this row count — lower `scale`"))
      .drop("__mq")
}
