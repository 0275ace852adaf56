package graft

import graft.operators.Tokenizer
import org.apache.spark.sql.functions._

/** BPE trainer semantics on hand-computable corpora: greedy left-to-right
  * merge (including the self-overlap case), merged symbols feeding later
  * rounds, early exhaustion, and the compression-audit invariants. */
class TokenizerSpec extends SparkSpec {

  import spark.implicits._

  private def mergeOf(word: String, l: String, r: String): String = {
    Seq(word).toDF("w")
      .select(Tokenizer.mergePair(
        array_join(graft.functions.Portable.chars(col("w")), Tokenizer.Sep),
        l, r).as("enc"))
      .head.getString(0)
  }

  test("mergePair: greedy left-to-right, self-overlap handled") {
    val S = Tokenizer.Sep
    // "abab" under (a,b): both occurrences merge
    assert(mergeOf("abab", "a", "b") === s"ab${S}ab")
    // "aaa" under (a,a): greedy gives [aa, a] — the fused symbol no
    // longer matches l, so the overlap does NOT double-merge
    assert(mergeOf("aaa", "a", "a") === s"aa${S}a")
    assert(mergeOf("aaaa", "a", "a") === s"aa${S}aa")
    // no occurrence → unchanged encoding
    assert(mergeOf("xyz", "a", "b") === s"x${S}y${S}z")
  }

  test("bpeMerges: known corpus trains the expected merge sequence") {
    // corpus: "abab abab cd" ×3 — pairs: (a,b)×6·… most frequent is
    // (a,b); after merging, (ab,ab) dominates; then (c,d)
    val docs = (0 until 3).map(i => (i.toLong, "abab abab cd"))
      .toDF("doc_id", "text")
    val m = Tokenizer.bpeMerges(docs, rounds = 3)
      .orderBy("round")
      .as[(Int, String, String, Long)].collect()
    assert(m(0) === ((1, "a", "b", 12L)), s"round 1: ${m.toSeq}")
    assert(m(1) === ((2, "ab", "ab", 6L)), s"round 2: ${m.toSeq}")
    assert(m(2) === ((3, "c", "d", 3L)), s"round 3: ${m.toSeq}")
  }

  test("bpeMerges: exhaustion stops early on single-char words") {
    val docs = Seq((0L, "a b c"), (1L, "a b")).toDF("doc_id", "text")
    // only pairs ACROSS words don't exist; every word is one symbol →
    // zero mergeable pairs → empty merge table
    val m = Tokenizer.bpeMerges(docs, rounds = 5).collect()
    assert(m.isEmpty)
  }

  test("bpeCompressionAudit: invariants vs the raw corpus") {
    val docs = sourcesDocs
    val audit = Tokenizer.bpeCompressionAudit(docs, rounds = 3).cache()
    // chars never grow, merges only shrink; every merge round reduces
    // the total symbol count by exactly its cnt (checked in aggregate)
    val bad = audit.filter(col("n_symbols") > col("n_chars") ||
      col("n_symbols") < 1).count()
    assert(bad === 0)
    val (merges, _) = Tokenizer.bpeTrain(docs, rounds = 3)
    val totChars = audit.agg(sum("n_chars")).head.getLong(0)
    val totSyms = audit.agg(sum("n_symbols")).head.getLong(0)
    assert(totChars - totSyms === merges.map(_._4).sum,
      "each merge removes exactly cnt symbols")
  }

  test("bpeEncode: id sequences decode back to the tokenized text") {
    val docs = sourcesDocs
    val enc = Tokenizer.bpeEncode(docs, rounds = 3).cache()
    // concatenating syms in pos order must reproduce the doc's
    // whitespace-stripped text — the lossless-round-trip property an
    // id-level export needs
    val rebuilt = enc.groupBy("doc_id")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("pos"), col("sym")))),
        x => x.getField("sym"))).as("joined"))
    val want = docs.select(col("doc_id"),
      array_join(graft.functions.Portable.tokens(col("text")), "").as("want"))
      .filter(col("want") =!= "")
    val joined = rebuilt.join(want, "doc_id").cache()
    assert(joined.count() === want.count())
    assert(joined.filter(col("joined") =!= col("want")).count() === 0)
    // tok_id ↔ sym is a bijection
    val pairs = enc.select("sym", "tok_id").distinct().count()
    assert(pairs === enc.select("sym").distinct().count())
    assert(pairs === enc.select("tok_id").distinct().count())
    // id count per doc ≡ the compression audit's n_symbols
    val audit = Tokenizer.bpeCompressionAudit(docs, rounds = 3)
    val cnts = enc.groupBy("doc_id").agg(count(lit(1)).as("n"))
    assert(audit.join(cnts, "doc_id")
      .filter(col("n") =!= col("n_symbols")).count() === 0)
  }

  test("packIds: slices tile sequences contiguously, full except stream-last") {
    val docs = sourcesDocs
    val packed = Tokenizer.packIds(docs, rounds = 3, seqLen = 32).cache()
    // slices within a (stream, sequence) tile [0, fill) with no gap
    val seqs = packed.groupBy("source", "seq_id")
      .agg(min("off_start").as("mn"), sum("n_ids").as("fill"),
        max(col("off_start") + col("n_ids")).as("end")).cache()
    assert(seqs.filter(col("mn") =!= 0 || col("end") =!= col("fill"))
      .count() === 0)
    // every sequence except each stream's last is exactly seqLen full
    val last = seqs.groupBy("source").agg(max("seq_id").as("last"))
    assert(seqs.join(last, "source")
      .filter(col("seq_id") < col("last") && col("fill") =!= 32)
      .count() === 0)
    // id conservation vs the encode, and the ids string length matches
    assert(packed.agg(sum("n_ids")).head.getLong(0) ===
      Tokenizer.bpeEncode(docs, rounds = 3).count())
    assert(packed.filter(size(split(col("ids"), ",")) =!= col("n_ids"))
      .count() === 0)
  }

  test("encodeWith (frozen artifacts, narrow) == bpeEncode, batch and streaming") {
    val docs = sourcesDocs.cache()
    // train offline, freeze the artifacts
    val merges = Tokenizer.bpeMerges(docs, rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val ids = Tokenizer.bpeVocab(docs, rounds = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch parity: the narrow expression reproduces the full
    // join+window encode's id sequences exactly
    val narrow = docs.select(col("doc_id"),
        Tokenizer.encodeWith(col("text"), merges, ids).as("ids"))
      .filter(size(col("ids")) > 0)
    val grouped = Tokenizer.bpeEncode(docs, rounds = 3)
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("tok_id")))),
        x => x.getField("tok_id")).as("ids"))
    val j = narrow.as("n").join(grouped.as("g"), "doc_id").cache()
    assert(j.count() === grouped.count())
    assert(j.filter(col("n.ids") =!= col("g.ids")).count() === 0)
    // no unknown-symbol nulls when artifacts come from this corpus
    assert(narrow.filter(exists(col("ids"), x => x.isNull)).count() === 0)

    // streaming: the same expression in a streaming projection (file
    // source → narrow select → memory sink) lands the identical ids
    val tmp = java.nio.file.Files.createTempDirectory("graft-tok-stream").toString
    docs.select(col("doc_id"), col("text")).write.parquet(s"$tmp/src")
    val q = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(s"$tmp/src")
      .select(col("doc_id"),
        Tokenizer.encodeWith(col("text"), merges, ids).as("ids"))
      .writeStream.format("memory").queryName("tok_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("tok_stream").filter(size(col("ids")) > 0)
    val sj = streamed.as("s").join(narrow.as("n"), "doc_id")
    assert(streamed.count() === narrow.count())
    assert(sj.filter(col("s.ids") =!= col("n.ids")).count() === 0)
  }

  private def sourcesDocs =
    graft.sources.Tables.documents(spark, sf()).limit(100)

  test("encodeWith native expression == HOF reference, nulls and edges included") {
    // r11: encodeWith moved from the per-merge HOF unroll to one native
    // BpeModel reference object — exact parity on the real corpus plus
    // the edge rows the corpus lacks (null text, empty, spaces-only,
    // single char, OOV symbols under sample-trained artifacts)
    val docs = sourcesDocs
    val merges = Tokenizer.bpeMerges(docs, rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val ids = Tokenizer.bpeVocab(docs, rounds = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val edges = Seq((9001L, null.asInstanceOf[String]), (9002L, ""),
      (9003L, "   "), (9004L, "q"), (9005L, "ÿ unseen"),
      // non-BMP (r12, ADVICE): surrogate-pair code points must seed ONE
      // symbol each in both implementations, not two lone surrogates
      (9006L, "😀😁 a😀"),
      (9007L, "𝕏 x 𝕏𝕏"))
      .toDF("doc_id", "text")
    val all = docs.select(col("doc_id"), col("text")).unionByName(edges)
    val cmp = all.select(col("doc_id"),
      Tokenizer.encodeWith(col("text"), merges, ids).as("nat"),
      Tokenizer.encodeWithHof(col("text"), merges, ids).as("hof"))
    assert(cmp.count() === all.count())
    val diff = cmp.filter(
      !(col("nat") <=> col("hof"))).collect()
    assert(diff.isEmpty, diff.take(3).mkString("; "))

    // non-BMP merges end-to-end: artifacts whose symbols ARE
    // supplementary code points fuse identically in both seams and land
    // the expected ids (a lone-surrogate seeding would OOV-null these)
    val emoji = "😀" // U+1F600
    val emoji2 = "😁" // U+1F601
    val eMerges = Seq((emoji, emoji2))
    val eIds = Map(emoji + emoji2 -> 1L, emoji -> 2L, emoji2 -> 3L, "a" -> 4L)
    val eDocs = Seq((1L, s"$emoji$emoji2 $emoji a$emoji2")).toDF("doc_id", "text")
    val eCmp = eDocs.select(
      Tokenizer.encodeWith(col("text"), eMerges, eIds).as("nat"),
      Tokenizer.encodeWithHof(col("text"), eMerges, eIds).as("hof")).head()
    assert(eCmp.getSeq[java.lang.Long](0) === Seq(1L, 2L, 4L, 3L))
    assert(eCmp.getSeq[java.lang.Long](0) === eCmp.getSeq[java.lang.Long](1))
  }

  test("encodeWith at a 30k-merge vocab: constant-size plan, padded merges are no-ops") {
    // the guard the r10 verdict asked for: at a production-scale vocab
    // the expression tree must NOT grow with the merge count (the HOF
    // unroll measured the C173 blowup class). 30k padding merges whose
    // symbols never occur must leave the output identical to the real
    // merges alone, and plan+execute must stay in seconds.
    val docs = sourcesDocs
    val merges = Tokenizer.bpeMerges(docs, rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val ids = Tokenizer.bpeVocab(docs, rounds = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // pad symbols carry \u0001/\u0002 prefixes so they can never match
    // corpus chars or real merge outputs — provably inert no-ops
    val padded = merges ++ (0 until 30000).map(i =>
      ("\u0001" + i, "\u0002" + i))
    val idsPadded = ids ++ (0 until 30000).map(i =>
      ("\u0001" + i + "\u0002" + i) -> (100000L + i))
    val t0 = System.nanoTime()
    val out = docs.select(col("doc_id"),
      Tokenizer.encodeWith(col("text"), padded, idsPadded).as("ids"))
    val base = docs.select(col("doc_id"),
      Tokenizer.encodeWith(col("text"), merges, ids).as("ids"))
    val j = out.as("p").join(base.as("b"), "doc_id")
    assert(j.filter(!(col("p.ids") <=> col("b.ids"))).count() === 0)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"30k-merge encode plan+execute: $secs%.1f s")
    assert(secs < 60.0,
      f"30k-merge vocab took $secs%.1f s — the artifact seam regressed to tree growth")
  }
}
