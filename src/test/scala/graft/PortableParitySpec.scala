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
