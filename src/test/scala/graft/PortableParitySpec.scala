package graft

import graft.functions.Portable
import graft.plans.native
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The native expressions (graft.plans, used on hot paths) must compute
  * the exact arithmetic of the Portable higher-order-function formulas
  * (which in turn mirror the DuckDB oracle SQL). Any drift here silently
  * breaks the oracle gate, so it is asserted on real corpus data. */
class PortableParitySpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf()).limit(100)

  test("poly_hash native == Portable formula") {
    val n = docs.select(
        native.poly_hash(col("text")).as("a"),
        Portable.polyHash(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("minhash_sig native == Portable formula") {
    val n = docs.select(
        native.minhash_sig(col("text"), 16, 3).as("a"),
        Portable.minhashSignature(col("text"), 16, 3).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("simhash32 native == Portable formula") {
    val n = docs.select(
        native.simhash32(col("text")).as("a"),
        Portable.simhash32(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("min_char_ngram_hash native == min over Portable charNgrams hashes") {
    val hofMin = array_min(transform(Portable.charNgrams(col("text"), 8),
      g => Portable.polyHash(g)))
    val n = docs.select(
        native.min_char_ngram_hash(col("text"), 8).as("a"), hofMin.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("cosine_sim native == Portable formula (bit-identical doubles)") {
    val emb = Tables.embeddings(spark, sf())
    val a = emb.limit(30).select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.limit(30).select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
    val dbl = (c: org.apache.spark.sql.Column) => transform(c, x => x.cast("double"))
    val n = pairs.select(
        native.cosine_sim(col("ea"), col("eb")).as("x"),
        Portable.cosine(dbl(col("ea")), dbl(col("eb"))).as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(n == 0)
  }

  test("l2sq native == HOF formula (bit-identical doubles)") {
    val emb = Tables.embeddings(spark, sf())
    val a = emb.limit(30).select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.limit(30).select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val n = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(native.l2sq(col("ea"), col("eb")).as("x"),
        graft.operators.Similarity.l2sqHof(col("ea"), col("eb")).as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(n == 0)
  }

  test("lsh_bucket native == HOF formula") {
    val emb = Tables.embeddings(spark, sf())
    val n = emb.select(
        native.lsh_bucket(col("embedding"), 8).as("x"),
        graft.operators.Similarity.lshBucketHof(col("embedding"), 8, 64).as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(n == 0)
  }

  test("sorted_jaccard native == set ops on hashed ngrams") {
    val d = docs.limit(40)
    val a = d.select(col("doc_id").as("ia"),
      native.ngram_hash_set(col("text"), 3).as("ga"))
    val b = d.select(col("doc_id").as("ib"),
      native.ngram_hash_set(col("text"), 3).as("gb"))
    val n = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(native.sorted_jaccard(col("ga"), col("gb")).as("x"),
        Portable.jaccard(col("ga"), col("gb")).as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(n == 0)
  }

  test("winnow_set native == HOF windowed-minima formula") {
    val n = 8; val w = 4
    val hs = transform(sequence(lit(1), length(col("text")) - (n - 1)),
      i => Portable.polyHash(col("text").substr(i, lit(n))))
    val hof = when(length(col("text")) < n, array(Portable.polyHash(col("text"))))
      .when(size(hs) <= w, array(array_min(hs)))
      .otherwise(array_sort(array_distinct(
        transform(sequence(lit(1), size(hs) - (w - 1)),
          i => array_min(slice(hs, i, lit(w)))))))
    val bad = docs.select(native.winnow_set(col("text"), n, w).as("a"),
        hof.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0)
  }

  test("short/degenerate strings: fewer tokens than shingle width") {
    import spark.implicits._
    val df = Seq("ab", "one two", "x y z", "").toDF("text")
    val bad = df.filter(col("text") =!= "").select(
        native.minhash_sig(col("text"), 4, 3).as("a"),
        Portable.minhashSignature(col("text"), 4, 3).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0)
  }
}
