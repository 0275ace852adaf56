package graft

import graft.operators.Dedup
import graft.plans.native
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The bitset-dictionary jaccard fast path must produce exactly the rows
  * and values of the sorted-merge path, and the 64-bit simhash blocking
  * must keep the pigeonhole exactness the 32-bit path proved. */
class DedupParitySpec extends SparkSpec {
  test("ngramJaccardPairsDict == ngramJaccardPairs == blocked all-pairs") {
    val docs = Tables.documents(spark, sf())
    val merge = Dedup.ngramJaccardPairs(docs, 3, 7, 10, "lang")
      .orderBy("doc_a", "doc_b").collect().toSeq
    val dict = Dedup.ngramJaccardPairsDict(docs, 3, 7, 10, "lang")
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(dict == merge)
    assert(dict.nonEmpty)
    // the adaptive gate is a pure physical choice: forcing the prefix
    // branch (budget 0 — the 100 TB regime) must not change one row
    val dictPrefix = Dedup.ngramJaccardPairsDict(docs, 3, 7, 10, "lang",
        blockPairBudget = 0L)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(dictPrefix == merge)
    val mergePrefix = Dedup.ngramJaccardPairs(docs, 3, 7, 10, "lang",
        blockPairBudget = 0L)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(mergePrefix == merge)
    // the prefix filter is lossless: candidates pruned before verify can
    // never reach τ, so both paths must equal the blocked ALL-PAIRS join
    val g = docs.select(col("doc_id"), col("lang"),
      native.ngram_hash_set(col("text"), 3).as("ng"))
    val a = g.select(col("lang").as("la"), col("doc_id").as("doc_a"),
      col("ng").as("ng_a"))
    val b = g.select(col("lang").as("lb"), col("doc_id").as("doc_b"),
      col("ng").as("ng_b"))
    val brute = a.join(b, col("la") === col("lb") &&
        col("doc_a") < col("doc_b"))
      .withColumn("jac", native.sorted_jaccard(col("ng_a"), col("ng_b")))
      .filter(col("jac") >= 0.7)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(merge == brute)
  }

  test("simhash64: low-31-bit parity with simhash32") {
    // per-token votes on bits 0-30 come from the same polyHash, so the
    // two hashes must agree exactly on those bits (bit 31 of the 32-bit
    // hash is structurally dead; bit 31 of the 64-bit one is live)
    val docs = Tables.documents(spark, sf())
    val mask = lit(0x7FFFFFFFL)
    val mismatches = docs.select(
        native.simhash32(col("text")).bitwiseAND(mask).as("lo32"),
        native.simhash64(col("text")).bitwiseAND(mask).as("lo64"))
      .filter(col("lo32") =!= col("lo64")).count()
    assert(mismatches == 0)
  }

  test("simhash64Pairs: 16-bit-band blocking == all-pairs at hamming <= 3") {
    val docs = Tables.documents(spark, sf()).limit(300)
    val blocked = Dedup.simhash64Pairs(docs, maxHamming = 3)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val h = docs.select(col("doc_id"), native.simhash64(col("text")).as("sh"))
    val a = h.select(col("doc_id").as("doc_a"), col("sh").as("ha"))
    val b = h.select(col("doc_id").as("doc_b"), col("sh").as("hb"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hd"))
      .filter(col("hd") <= 3)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(blocked == brute)
    assert(blocked.nonEmpty)
  }

  test("sourceMinhashSlots: per-batch sketches merge by slot-wise min to the full-corpus sketch") {
    // the mergeability contract: a daily ingest stores per-batch
    // (source, slot, mh) tables; min-merging them must equal the sketch
    // of the union corpus — no history rescan
    val docs = Tables.documents(spark, sf())
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 === 1)
    val merged = Dedup.sourceMinhashSlots(b1)
      .unionAll(Dedup.sourceMinhashSlots(b2))
      .groupBy(col("src"), col("slot")).agg(min(col("mh")).as("mh"))
      .orderBy("src", "slot").collect().toSeq
    val full = Dedup.sourceMinhashSlots(docs)
      .orderBy("src", "slot").collect().toSeq
    assert(merged == full)
    assert(full.nonEmpty)
  }

  test("minhashEstimates: same candidate set as minhashCandidates, exact-dup pairs estimate 1.0") {
    val docs = Tables.documents(spark, sf())
    val est = Dedup.minhashEstimates(docs, k = 16, bands = 4)
    val estPairs = est.select("doc_a", "doc_b")
      .orderBy("doc_a", "doc_b").collect().toSeq
    val candPairs = Dedup.minhashCandidates(docs, k = 16, bands = 4)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(estPairs == candPairs,
      "the estimate table must cover exactly the LSH candidate pairs")
    // bounds: n_match ∈ [1·rows, 16] (≥ one full band matched to collide)
    val bad = est.filter(col("n_match") < 4 || col("n_match") > 16 ||
      col("est_jaccard") < 0.25 || col("est_jaccard") > 1.0).count()
    assert(bad == 0, "a colliding pair shares ≥ one full 4-slot band")
    // planted exact duplicates (identical text ⇒ identical signature)
    // must estimate exactly 1.0
    val dup = docs.limit(3).select(col("doc_id") + 1000000L, col("text"),
      col("lang"), col("source"), col("n_chars"))
      .toDF(docs.columns: _*)
    val withDups = docs.unionAll(dup)
    val dupEst = Dedup.minhashEstimates(withDups, k = 16, bands = 4)
      .filter(col("doc_b") === col("doc_a") + 1000000L)
    assert(dupEst.count() == 3)
    assert(dupEst.filter(col("est_jaccard") =!= 1.0).count() == 0)
  }

  test("prefixJaccardPairs: lossless vs all-pairs, and the prefix prunes") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf()).limit(300)
    val shingles = Dedup.wordShingleHashSet(col("text"), 3)
    val pp = Dedup.prefixJaccardPairs(docs, shingles, tauNum = 4, tauDen = 5)
      .orderBy("doc_a", "doc_b").collect().toSeq
    // brute force over the SAME hashed shingle sets, integer thresholds
    val g = docs.select(col("doc_id"), shingles.as("ng"))
    val a = g.select(col("doc_id").as("doc_a"), col("ng").as("ng_a"))
    val b = g.select(col("doc_id").as("doc_b"), col("ng").as("ng_b"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("inter_sz",
        size(array_intersect(col("ng_a"), col("ng_b"))).cast("long"))
      .withColumn("union_sz",
        size(col("ng_a")).cast("long") + size(col("ng_b")) - col("inter_sz"))
      .filter(col("inter_sz") * 5 >= col("union_sz") * 4)
      .select(col("doc_a"), col("doc_b"), col("inter_sz"), col("union_sz"))
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(pp == brute)
    assert(pp.nonEmpty)
    // identical docs always survive (jaccard 1 ≥ any τ) — degenerate
    // single-shingle docs included (prefix length 1 must still emit)
    val tiny = Seq((1L, "ab"), (2L, "ab"), (3L, "zq")).toDF("doc_id", "text")
    val tinyPairs = Dedup.prefixJaccardPairs(tiny,
      Dedup.wordShingleHashSet(col("text"), 3), 4, 5).collect()
    assert(tinyPairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("lineDedup strips exactly the >= minSupport lines, keeps order") {
    import spark.implicits._
    // lineLen = 2: "w1 w2" is the planted chrome (support 4, incl. the
    // fully-boilerplate doc 5); "a b" repeats across 2 docs (UNDER the
    // threshold, must stay); "q r" repeats only WITHIN doc 6 (support
    // counts docs, not instances — must stay)
    val docs = Seq(
      (1L, "w1 w2 a b c d"),
      (2L, "w1 w2 e f"),
      (3L, "w1 w2 g"),
      (4L, "a b x y"),
      (5L, "w1 w2"),
      (6L, "q r q r")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, lineLen = 2, minSupport = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(out == Seq(
      (1L, 3L, 2L, "a b c d"),
      (2L, 2L, 1L, "e f"),
      (3L, 2L, 1L, "g"),
      (4L, 2L, 2L, "a b x y"),
      (5L, 1L, 0L, ""), // fully-boilerplate doc survives, empty
      (6L, 2L, 2L, "q r q r")))
    // the support half counts documents once, however often the line
    // repeats inside one
    val sup = Dedup.lineSupport(Dedup.docLines(docs, lineLen = 2))
      .orderBy("line").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sup.contains(("q r", 1L)) && sup.contains(("w1 w2", 4L)))
    // degenerate parameters fail at plan-build time, never silently
    intercept[IllegalArgumentException](Dedup.lineDedup(docs, lineLen = 0))
    intercept[IllegalArgumentException](
      Dedup.lineDedup(docs, minSupport = 1))
  }

  test("lineDedupIncremental: empty registry == batch pass; either side crosses") {
    import spark.implicits._
    val docs = Seq(
      (1L, "w1 w2 a b c d"),
      (2L, "w1 w2 e f"),
      (3L, "w1 w2 g"),
      (4L, "a b x y")).toDF("doc_id", "text")
    // the claimed identity: an empty registry IS the batch pass
    val empty = Seq.empty[(String, Long)].toDF("line", "sup")
    val inc = Dedup.lineDedupIncremental(docs, empty, lineLen = 2,
      minSupport = 3).orderBy("doc_id").collect().toSeq
    val batch = Dedup.lineDedup(docs, lineLen = 2, minSupport = 3)
      .orderBy("doc_id").collect().toSeq
    assert(inc == batch && inc.nonEmpty)
    // combined crossing: stored 2 + batch 1 reaches the threshold, so
    // the registry strips a line the batch alone would keep; the
    // registry is a UNION of daily outputs (duplicate line rows) — the
    // counts must ADD, and the join must not fan out
    val stored = Seq(("a b", 1L), ("a b", 1L)).toDF("line", "sup")
    val out = Dedup.lineDedupIncremental(
        Seq((9L, "a b z z")).toDF("doc_id", "text"), stored,
        lineLen = 2, minSupport = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
      .toSeq
    assert(out == Seq((9L, 1L, "z z")))
    // identity invariant on the REAL corpus: a threshold above the
    // corpus size can strip nothing, so reassembly must be a pure
    // token-normalization round-trip for every document
    val corpus = Tables.documents(spark, sf())
    val n = corpus.count().toInt
    val idOut = Dedup.lineDedup(corpus, lineLen = 10, minSupport = n + 1)
    val bad = idOut.join(corpus, "doc_id")
      .filter(col("n_kept") =!= col("n_lines") ||
        col("text_clean") =!=
          concat_ws(" ", graft.functions.Portable.tokens(col("text"))))
      .count()
    assert(bad == 0L, s"$bad docs fail the identity round-trip")
    assert(idOut.count() > 0)
  }

  test("bloomGateWith (frozen bits, narrow) == decontaminateBloom; empty benchmark admits all") {
    // r11: the ingest-side gate applies OFFLINE-collected bits as one
    // narrow expression and must reproduce the batch gate exactly —
    // per-doc flagged counts included, on the REAL corpus split
    val docs = Tables.documents(spark, sf())
    val isBench = pmod(col("doc_id"), lit(97)) === 0
    val bench = docs.filter(isBench)
    val corpus = docs.filter(!isBench)
    val bits = Dedup.bloomBits(bench, n = 8)
    val narrow = Dedup.bloomGateWith(corpus, bits, n = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = Dedup.decontaminateBloom(corpus, bench, n = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(narrow.nonEmpty && narrow == batch)
    // empty benchmark: all-zero bits, gate admits everything
    val zeroBits = Dedup.bloomBits(bench.limit(0), n = 8)
    assert(zeroBits.forall(_ == 0L) && zeroBits.length == 64)
    assert(Dedup.bloomGateWith(corpus, zeroBits, n = 8).count() === 0L)
    // wrong-size bits fail at plan-build time, not as silent garbage
    intercept[IllegalArgumentException](
      Dedup.bloomGateWith(corpus, Array.fill(3)(0L)))
  }

  test("lineDedupIntra: first occurrence survives, repeats strip, no corpus state") {
    import spark.implicits._
    // doc 1: line "a b" at windows 0 and 2 — second strips, order kept;
    // doc 2: the SAME line once — untouched (no corpus support gate);
    // doc 3: all-distinct — identity
    val docs = Seq(
      (1L, "a b x y a b"),
      (2L, "a b q r"),
      (3L, "m n o p")).toDF("doc_id", "text")
    val out = Dedup.lineDedupIntra(docs, lineLen = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out(0) == ((1L, 3L, 2L, "a b x y")))
    assert(out(1) == ((2L, 2L, 2L, "a b q r")))
    assert(out(2) == ((3L, 2L, 2L, "m n o p")))
    // composition: intra-first leaves the corpus gate's verdicts on a
    // per-page-deduped stream — a doc's chrome counts once per page
    val both = Dedup.lineDedup(
      Dedup.lineDedupIntra(docs, lineLen = 2)
        .select(col("doc_id"), col("text_clean").as("text")),
      lineLen = 2, minSupport = 2)
      .orderBy("doc_id").collect()
    // "a b" support after intra = 2 docs (1 and 2) → stripped by the
    // corpus gate at minSupport=2; doc 3 untouched
    assert(both.map(_.getLong(2)).toSeq == Seq(1L, 1L, 2L))
  }
}
