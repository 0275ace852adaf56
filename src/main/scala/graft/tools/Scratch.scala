package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main for local iteration (not part of the library
  * surface; the driver never runs it). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val g = graft.operators.Materialize(docs.select(col("doc_id"),
      col("lang").as("blk"),
      graft.plans.native.ngram_hash_set(col("text"), 3).as("ng")))
    t("g rows")(println(g.count()))
    val toks = graft.operators.Materialize(
      g.select(col("doc_id"), col("blk"), explode(col("ng")).as("tok")))
    t("toks rows")(println(toks.count()))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("f"))
    t("distinct toks")(println(freq.count()))
    val ranked = graft.operators.Curation.globalRank(freq,
      Seq(col("f").asc, col("tok")), "rk")
    val docRks = toks.join(ranked.select(col("tok"), col("rk")), "tok")
      .groupBy(col("doc_id"), col("blk"))
      .agg(sort_array(collect_list(col("rk"))).as("rks"),
        count(lit(1)).as("sz"))
    val (tauNum, tauDen) = (4, 5)
    val prefLen = (col("sz") -
      expr(s"(sz * $tauNum + ${tauDen - 1}) div $tauDen") + 1).cast("int")
    val pref = graft.operators.Materialize(
      docRks.select(col("doc_id"), col("blk"), col("sz"),
        posexplode(slice(col("rks"), lit(1), prefLen)).as(Seq("pos", "key"))))
    t("pref postings")(println(pref.count()))
    val a = pref.select(col("blk"), col("key"), col("doc_id").as("doc_a"),
      col("sz").as("sz_a"), col("pos").as("pos_a"))
    val b = pref.select(col("blk").as("blk_b"), col("key").as("key_b"),
      col("doc_id").as("doc_b"), col("sz").as("sz_b"), col("pos").as("pos_b"))
    val joined = a.join(b, col("blk") === col("blk_b") &&
      col("key") === col("key_b") && col("doc_a") < col("doc_b") &&
      least(col("sz_a") - col("pos_a"), col("sz_b") - col("pos_b")) *
        (tauNum + tauDen) >= (col("sz_a") + col("sz_b")) * tauNum)
    t("joined instances")(println(joined.count()))
    val cand = joined.select(col("doc_a"), col("doc_b")).distinct()
    t("candidates")(println(cand.count()))
    spark.stop()
  }
}
