package graft

import graft.operators.SyncConfigJson
import org.scalatest.funsuite.AnyFunSuite

/** Reference-format config strings (args.rs / es.rs:397 comment) must
  * parse into the engine's SyncConfig. */
class SyncConfigJsonSpec extends AnyFunSuite {

  test("namespace filter json (args.rs NamespaceFilter)") {
    val (ns, fs) = SyncConfigJson.parseNamespaceFilter(
      """{"namespace": "kube-system", "filters": ["\\[DEBU\\]", "healthz"]}""")
    assert(ns == "kube-system" && fs == Seq("\\[DEBU\\]", "healthz"))
  }

  test("rewrite rules json (args.rs IndicesRewriteRules)") {
    val rules = SyncConfigJson.parseRewriteRules(
      """{"rules": [["app-.*", "app"], ["etcd.*", "eks-logstash"]]}""")
    assert(rules == Seq("app-.*" -> "app", "etcd.*" -> "eks-logstash"))
  }

  test("rate limits json (args.rs RateLimits)") {
    val rl = SyncConfigJson.parseRateLimits(
      """{"rate_limits": {"app-titan": 1000, "shop": 10}}""")
    assert(rl == Map("app-titan" -> 1000, "shop" -> 10))
  }

  test("fromArgs assembles a full SyncConfig") {
    val cfg = SyncConfigJson.fromArgs(
      globalFilters = Seq("drop-me"),
      namespaceFilterJsons = Seq(
        """{"namespace": "a", "filters": ["x"]}""",
        """{"namespace": "a", "filters": ["y"]}"""),
      rewriteRulesJson = Some("""{"rules": [["p.*", "t"]]}"""),
      rateLimitsJson = Some("""{"rate_limits": {"app": 5}}"""))
    assert(cfg.namespaceFilters == Map("a" -> Seq("x", "y")))
    assert(cfg.rewriteRules == Seq("p.*" -> "t"))
    assert(cfg.rateLimits == Map("app" -> 5))
  }

  test("subscription/injection flags: csv lists, key-name default") {
    val cfg = SyncConfigJson.fromArgs(
      topicRegex = Some("^app-.*"),
      debugTopics = Some(" error, signup ,,"),
      injectKey = true,
      injectedNamespaces = Some("click,error"))
    assert(cfg.topicRegex.contains("^app-.*"))
    assert(cfg.debugTopics == Seq("error", "signup"))
    assert(cfg.injectKey && cfg.injectedKeyName == "__INJECTED_DATA__")
    assert(cfg.injectedNamespaces == Seq("click", "error"))
    val named = SyncConfigJson.fromArgs(injectKey = true,
      injectedKeyName = Some("__trace__"))
    assert(named.injectedKeyName == "__trace__")
  }
}
