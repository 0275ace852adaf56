package graft.tools

/** Prints the query-surface counts (driver-facing sanity tool). */
object Surface {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries
    val o = graft.SparkEntry.oracleSql
    println(s"NQUERIES=${q.size} NORACLES=${o.size}")
    println("NOORACLE=" + (q.keySet -- o.keySet).toSeq.sorted.mkString(","))
    println("NAMES=" + q.keySet.toSeq.sorted.mkString(","))
  }
}
