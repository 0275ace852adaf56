package graft.operators

import graft.functions.Portable
import graft.plans.native
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines (SURVEY.md §2.C):
  * sequence packing, unigram-LM quality scoring, a feature-hashed linear
  * classifier, deterministic shard export, and prefix-containment dedup.
  * Every operator is a declarative plan; the only shuffles are the ones the
  * semantics require (one window per packing stream, one word-count agg,
  * one stats agg per shard, one blocked self-join).
  */
object Curation {

  /** GPT-style sequence-packing manifest: per packing stream (`streamCol`),
    * documents are concatenated in deterministic `idCol` order and split
    * into fixed `seqLen`-token training sequences. Returns one row per
    * (stream, sequence) with the number of contributing docs and the token
    * fill (the last sequence of a stream may be short).
    *
    * Scale: ONE shuffle — the window partitioned by the stream column.
    * Streams are independent, so parallelism = #streams; for a corpus where
    * one stream dominates, pass a finer stream key (e.g. source+shard from
    * [[shardAssign]]) — packing quality is unaffected because sequence ids
    * are per-stream. The explode fan-out is bounded: a doc spans at most
    * n_tok/seqLen + 1 sequences, so the exploded row count is
    * O(total_tokens / seqLen + n_docs). */
  def packSequences(docs: DataFrame, seqLen: Int,
      streamCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col(streamCol)).orderBy(col(idCol))
    docs
      .withColumn("n_tok", size(Portable.tokens(col(textCol))).cast("long"))
      .filter(col("n_tok") > 0)
      .withColumn("tok_end", sum(col("n_tok")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tok"))
      .withColumn("seq_id", explode(sequence(
        floor(col("tok_start") / seqLen),
        floor((col("tok_end") - 1) / seqLen))))
      .groupBy(col(streamCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("tok_end"), (col("seq_id") + 1) * seqLen)
          - greatest(col("tok_start"), col("seq_id") * seqLen))
          .as("n_tokens"))
  }

  /** Unigram-LM quality proxy (the CCNet/KenLM-filter shape with a
    * corpus-trained unigram model): per doc, the average corpus frequency
    * of its tokens and the count of rare tokens (frequency below the
    * corpus mean — an integer comparison, `cnt * n_words < n_total`, so
    * the flag is engine-exact). Low avg_freq / high n_rare = gibberish.
    *
    * Scale: word counts are a map-side-combined agg on a Zipf-spread key;
    * the count table is O(vocab) so AQE broadcasts the score join here.
    * On web-scale vocabularies too big to broadcast, the join shuffles by
    * word and the Zipf head ("the") concentrates in single partitions —
    * the shape AQE skew-join splits (the build side is one row per word,
    * so the hot partition splits freely). Caveat proven in
    * ScaleTechniquesSpec: OptimizeSkewedJoin only matches a sort-merge
    * join whose Sort children sit DIRECTLY on shuffle stages, so the
    * count table must be materialized ([[Materialize]], or read from a
    * stored vocab artifact — the norm at web scale) rather than kept as
    * an inline aggregate under the join. The token explode is
    * evaluated twice (count pass + score pass) — a cheap split, not worth
    * materializing O(corpus) tokens to avoid. */
  def lmUnigramScore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val words = docs.select(col(idCol),
      explode(Portable.tokens(col(textCol))).as("word"))
    val counts = words.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(count(lit(1)).as("n_words"),
      sum(col("cnt")).as("n_total"))
    words.join(counts, "word")
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        sum(col("cnt")).as("freq_sum"),
        sum(when(col("cnt") * col("n_words") < col("n_total"), 1L)
          .otherwise(0L)).as("n_rare"))
      .withColumn("avg_freq", col("freq_sum") / col("n_tok"))
  }

  /** Feature-hashed linear classifier (fasttext-shaped): each token hashes
    * to a weight, the doc score is the weight sum, predict = score > 0.
    * Weights are deterministic functions of the token hash (stand-in for a
    * trained vector — no pretrained models in the sandbox); the plumbing
    * (hash → weight → sum as ONE native codegen'd expression, zero shuffle,
    * pipelined with the scan) is the production shape: a real model swaps
    * the weight formula for a broadcast array lookup at the same hash. */
  def hashedLinearScore(docs: DataFrame, halfRange: Int = 1000,
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_tok", native.token_count(col(textCol)))
      .withColumn("score", native.hashed_linear_score(col(textCol), halfRange))
      .withColumn("pred", col("score") > 0)

  /** Deterministic shard assignment for training-data export: shard =
    * portable-hash(id) mod nShards. Content-independent, reproducible
    * across engines and reruns, and uniform (the id hash is well spread).
    * Writers `partitionBy("shard")` this column; a global shuffle on the
    * shard key is exactly the decorrelation (example shuffling) a training
    * pipeline wants. */
  def shardAssign(docs: DataFrame, nShards: Int,
      idCol: String = "doc_id"): DataFrame =
    docs.withColumn("shard",
      native.poly_hash(col(idCol).cast("string")) % nShards)

  /** Shard manifest: per-shard doc counts, byte/char totals, id range —
    * the export audit (balanced shards, no gaps). One agg on the shard key. */
  def shardStats(sharded: DataFrame, idCol: String = "doc_id",
      sizeCol: String = "n_chars"): DataFrame =
    sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).as("chars_sum"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))

  /** Prefix-containment duplicate pairs: (shorter, longer) where the
    * shorter doc is a strict prefix of the longer (truncation/re-crawl
    * duplicates that exact dedup misses). Blocked self-join on (hash of
    * the first `prefixLen` characters, LENGTH BAND of the shorter side) —
    * containment implies the prefix keys match, so recall is exact for
    * docs ≥ prefixLen chars.
    *
    * Scale / skew: the prefix hash alone collapses boilerplate-heavy
    * corpora (every page starts "<!DOCTYPE html>") into one giant block
    * with a quadratic within-block join. Folding a log2 length band of
    * the SHORTER side into the key splits such blocks by size: the short
    * side emits one key (its own band), the longer side explodes over the
    * bands ≤ its own — a bounded ×log2(maxLen) fan-out (≤ ~40 keys for
    * any realistic document) — and a prefix-sharing block now subdivides
    * into per-band cells whose sizes follow the corpus length
    * distribution instead of one hot key. Containment needs
    * len_in ≤ len_out, i.e. band_in ≤ band_out, so recall stays exact
    * (CurationSpec asserts parity against the unbanded join on a
    * single-prefix corpus). */
  def containedPairs(docs: DataFrame, prefixLen: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val keyed = docs.select(col(idCol), col(textCol))
      .withColumn("pfx", native.poly_hash(
        col(textCol).substr(lit(1), lit(prefixLen))))
      .withColumn("band",
        floor(log2(greatest(length(col(textCol)), lit(1)))).cast("long"))
    val short = keyed.select(col("pfx"), col("band"), col(idCol).as("doc_in"),
      col(textCol).as("text_in"), length(col(textCol)).as("len_in"))
    val long = keyed
      .withColumn("band", explode(sequence(lit(0L), col("band"))))
      .select(col("pfx"), col("band"), col(idCol).as("doc_out"),
        col(textCol).as("text_out"), length(col(textCol)).as("len_out"))
    short.join(long, Seq("pfx", "band"))
      .filter(col("len_in") < col("len_out") &&
        col("text_out").startsWith(col("text_in")))
      .select(col("doc_in"), col("doc_out"))
  }
}
