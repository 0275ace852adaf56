package graft

import graft.operators.Dedup
import graft.sources.Tables

/** The bitset-dictionary jaccard fast path must produce exactly the rows
  * and values of the sorted-merge path. */
class DedupParitySpec extends SparkSpec {
  test("ngramJaccardPairsDict == ngramJaccardPairs") {
    val docs = Tables.documents(spark, sf())
    val merge = Dedup.ngramJaccardPairs(docs, 3, 0.7, "lang")
      .orderBy("doc_a", "doc_b").collect().toSeq
    val dict = Dedup.ngramJaccardPairsDict(docs, 3, 0.7, "lang")
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(dict == merge)
    assert(dict.nonEmpty)
  }
}
