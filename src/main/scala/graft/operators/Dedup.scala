package graft.operators

import graft.functions.Portable
import graft.plans.native
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY.md §2.C).
  *
  * Scale posture (100 TB): signature computation (minhash/simhash/key
  * normalization) is a narrow per-row pass with a native expression — no
  * shuffle. The only wide stages are the groupBy on (band, bucket) /
  * normalized key, which shuffle once on well-distributed hash keys, and
  * the within-bucket candidate self-joins, whose cost is bounded by bucket
  * size (band count and rows-per-band tune the bucket-collision rate).
  * Never an all-pairs join except the explicitly-bounded variants here.
  */
object Dedup {

  /** Content-normalized exact dedup: documents whose sorted distinct token
    * sets are identical form one group; the keeper is the smallest id.
    * One shuffle on the normalized-key hash. */
  def exactGroups(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val key = concat_ws(" ", array_sort(array_distinct(Portable.tokens(col(textCol)))))
    docs.groupBy(native.poly_hash(key).as("key_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_docs"))
  }

  /** MinHash+LSH near-dup candidates: K-slot signature over word-n-shingles
    * (native single-pass expression), split into `bands` bands; documents
    * sharing any band bucket become a candidate pair. */
  def minhashCandidates(docs: DataFrame, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val rows = k / bands
    val sig = docs.select(col(idCol).as("doc_id"),
      native.minhash_sig(col(textCol), k, shingleN).as("sig"))
    val banded = sig.select(col("doc_id"), posexplode(
      array((0 until bands).map(b => Portable.bandHash(col("sig"), b, rows)): _*)))
      .toDF("doc_id", "band", "bh")
    val a = banded.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band").as("band_b"), col("bh").as("bh_b"),
      col("doc_id").as("doc_b"))
    a.join(b, col("band") === col("band_b") && col("bh") === col("bh_b") &&
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming. The
    * all-pairs form here is for small corpora / verification; at scale,
    * block on simhash bit-bands first (same LSH pattern as minhash). */
  def simhashPairs(docs: DataFrame, maxHamming: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val h = docs.select(col(idCol).as("doc_id"),
      native.simhash32(col(textCol)).as("sh"))
    val a = h.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = h.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("hd", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hd") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hd"))
  }

  /** Character-n-gram Jaccard near-dup pairs within blocks (e.g. language):
    * blocking bounds the self-join; jaccard on distinct n-gram sets. */
  def ngramJaccardPairs(docs: DataFrame, n: Int, tau: Double,
      blockCol: String, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val g = docs.select(col(idCol).as("doc_id"), col(blockCol).as("blk"),
      array_distinct(Portable.charNgrams(col(textCol), n)).as("ng"))
    val a = g.select(col("blk"), col("doc_id").as("doc_a"), col("ng").as("ng_a"))
    val b = g.select(col("blk").as("blk_b"), col("doc_id").as("doc_b"),
      col("ng").as("ng_b"))
    a.join(b, col("blk") === col("blk_b") && col("doc_a") < col("doc_b"))
      .withColumn("jac", Portable.jaccard(col("ng_a"), col("ng_b")))
      .filter(col("jac") >= tau)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"))
  }
}
