package graft.operators

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON config parsing mirroring the reference's CLI argument formats
  * (args.rs FromStr impls), so a reference deployment's flags port
  * verbatim:
  *  - namespace filter:  {"namespace": "kube-system", "filters": ["p1"]}
  *  - rewrite rules:     {"rules": [["app-.*", "app"], ...]}
  *  - rate limits:       {"rate_limits": {"app-titan": 1000}}
  */
object SyncConfigJson {
  private implicit val formats: Formats = DefaultFormats

  /** args.rs:6-19 NamespaceFilter — one JSON object per --namespace-filters
    * occurrence. */
  def parseNamespaceFilter(s: String): (String, Seq[String]) = {
    val j = JsonMethods.parse(s)
    ((j \ "namespace").extract[String], (j \ "filters").extract[Seq[String]])
  }

  /** args.rs:21-37 IndicesRewriteRules — ordered (pattern, target) pairs. */
  def parseRewriteRules(s: String): Seq[(String, String)] = {
    val j = JsonMethods.parse(s)
    (j \ "rules").extract[Seq[Seq[String]]].map { case Seq(p, t) => (p, t) }
  }

  /** args.rs:39-55 RateLimits — app → docs/sec. */
  def parseRateLimits(s: String): Map[String, Int] = {
    val j = JsonMethods.parse(s)
    (j \ "rate_limits").extract[Map[String, Int]]
  }

  /** Assemble a SyncConfig from reference-style flag values. */
  def fromArgs(
      globalFilters: Seq[String] = Nil,
      namespaceFilterJsons: Seq[String] = Nil,
      rewriteRulesJson: Option[String] = None,
      rateLimitsJson: Option[String] = None,
      timeKey: Option[String] = None,
      debugLogPatterns: Seq[String] = Nil,
      bufferSize: Int = 1000,
      topicRegex: Option[String] = None,
      debugTopics: Option[String] = None,
      injectKey: Boolean = false,
      injectedKeyName: Option[String] = None,
      injectedNamespaces: Option[String] = None,
      // args.rs:117-119 --flush-interval (ms, default 5000)
      flushInterval: Long = 5000): SyncConfig = {
    // comma-separated lists, exactly like the reference flags
    // (pulsar.rs:145, 186: debug_topics / injected_namespaces .split(','))
    def csv(o: Option[String]): Seq[String] =
      o.toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    SyncConfig(
      globalFilters = globalFilters,
      namespaceFilters = namespaceFilterJsons.map(parseNamespaceFilter)
        .groupBy(_._1).map { case (ns, fs) => ns -> fs.flatMap(_._2) },
      rewriteRules = rewriteRulesJson.map(parseRewriteRules).getOrElse(Nil),
      rateLimits = rateLimitsJson.map(parseRateLimits).getOrElse(Map.empty),
      timeKey = timeKey,
      debugLogPatterns = debugLogPatterns,
      bufferSize = bufferSize,
      topicRegex = topicRegex,
      debugTopics = csv(debugTopics),
      injectKey = injectKey,
      injectedKeyName = injectedKeyName.getOrElse("__INJECTED_DATA__"),
      injectedNamespaces = csv(injectedNamespaces),
      flushIntervalMs = flushInterval)
  }
}
