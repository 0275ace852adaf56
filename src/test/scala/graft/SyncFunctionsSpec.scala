package graft

import graft.functions.SyncFunctions._
import org.apache.spark.sql.functions._

/** Semantics checks against the reference's own behavior, including the
  * rewrite-rule test vectors from /root/reference/src/es.rs:396-432. */
class SyncFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("topicPart extracts the last URI segment (util.rs:53)") {
    val got = Seq("persistent://public/default/test", "bare-topic")
      .toDF("t").select(topicPart(col("t"))).as[String].collect()
    assert(got.toSeq == Seq("test", "bare-topic"))
  }

  test("rewrite rules: reference test vectors (es.rs:396-432)") {
    val rules = Seq(
      ("app-biz.*", "app"), ("app-mutants.*", "mutants"),
      ("app-biz1.*", "app"), ("app-.*", "app"),
      ("etcd.*", "eks-logstash"), ("istio-system.*", "eks-logstash"),
      ("kube-system.*", "eks-logstash"), ("kong.*", "eks-logstash"),
      ("pular.*", "pulsar"))
    val expected = Seq(
      "app-biz" -> "app", "app-mutants" -> "mutants", "app-biz1" -> "app",
      "app-biz2" -> "app", "app-foo" -> "app", "logstash" -> "logstash",
      "etcd" -> "eks-logstash", "kube-system" -> "eks-logstash",
      "istio-system" -> "eks-logstash", "kong" -> "eks-logstash",
      "pulsar-partition-0" -> "pulsar")
    val got = expected.map(_._1).toDF("t")
      .select(col("t"), rewriteIndex(col("t"), rules).as("r"))
      .as[(String, String)].collect().toSeq
    assert(got == expected)
  }

  test("appOf accepts only string-typed app (util.rs:167)") {
    val got = Seq(
        """{"app": "shop"}""", """{"app": 7}""", """{"x": 1}""")
      .toDF("d").select(appOf(col("d"))).as[String].collect()
    assert(got.toSeq == Seq("shop", DefaultApp, DefaultApp))
  }

  test("isDebugLog: level==debug OR regex (util.rs:141,159)") {
    val pats = Seq("\\[DEBU\\]", "\\[Gin-Debug\\]")
    val got = Seq(
        """{"level": "debug"}""", """{"level": "info"}""",
        "[DEBU]: xxx", "[Gin-Debug]: xxx", "DEBU: xxx")
      .toDF("d").select(isDebugLog(col("d"), pats)).as[Boolean].collect()
    assert(got.toSeq == Seq(true, false, true, true, false))
  }

  test("resolveTimestamp: numeric time key in millis, else publish time (es.rs:61-97)") {
    val df = Seq(
        ("""{"ts": 1626057993894}""", "2024-01-01 00:00:00"),
        ("""{"ts": "not-a-number"}""", "2024-01-01 00:00:00"),
        ("""{"other": 1}""", "2024-01-01 00:00:00"))
      .toDF("d", "pt").withColumn("pt", col("pt").cast("timestamp"))
    val got = df.select(resolveTimestamp(col("d"), Some("ts"), col("pt"))
      .cast("string")).as[String].collect()
    assert(got(0).startsWith("2021-07-12"))
    assert(got(1) == "2024-01-01 00:00:00")
    assert(got(2) == "2024-01-01 00:00:00")
  }

  test("sanitizeKeysFlat replaces dots in keys (es.rs:99)") {
    val got = Seq("""{"a.b": "1", "c": "2"}""").toDF("d")
      .select(sanitizeKeysFlat(col("d"))).as[String].collect().head
    assert(got == """{"a_b":"1","c":"2"}""")
  }

  test("native sanitize_json_keys recurses into nested objects (es.rs:99-102)") {
    import graft.plans.native
    val got = Seq(
        """{"a.b": {"c.d": 1, "e": [{"f.g": 2}, 3]}, "h": "x.y"}""",
        """not json""",
        """[1, 2]""")
      .toDF("d").select(native.sanitize_json_keys(col("d"))).as[String]
      .collect()
    assert(got(0) == """{"a_b":{"c_d":1,"e":[{"f_g":2},3]},"h":"x.y"}""")
    assert(got(1) == null) // non-JSON → null (caller drops)
    assert(got(2) == "[1,2]") // arrays pass through with elements visited
  }

  test("buildDocument: @timestamp first, fields spliced in order") {
    val df = Seq((1L, """{"k": 87, "z": 1}""", "2024-01-05 06:07:08.123456"))
      .toDF("id", "d", "pt")
      .withColumn("pt", col("pt").cast("timestamp"))
    val doc = df.select(buildDocument(col("d"), col("pt"))).as[String]
      .collect().head
    assert(doc ==
      """{"@timestamp": "2024-01-05T06:07:08.123456", "k": 87, "z": 1}""")
  }

  test("injectKey and buildDocument emit valid JSON for the empty object") {
    // the reference inserts into a parsed map, which handles {} for free;
    // the splice-based builders must special-case it (no dangling comma)
    val df = Seq((7L, "{}", "2024-01-05 06:07:08.123456"))
      .toDF("id", "d", "pt").withColumn("pt", col("pt").cast("timestamp"))
    val inj = df.select(injectKey(col("d"), col("id"), deterministic = true))
      .as[String].collect().head
    assert(inj == """{"__INJECTED_DATA__": "msg-7"}""")
    val doc = df.select(buildDocument(col("d"), col("pt")))
      .as[String].collect().head
    assert(doc == """{"@timestamp": "2024-01-05T06:07:08.123456"}""")
    // both must parse as JSON objects
    val parsed = Seq(inj, doc).toDF("j")
      .select(json_object_keys(col("j")).as("ks"))
      .collect()
    assert(parsed.forall(_.getSeq[String](0).nonEmpty))
  }

  test("collapsePartitionTopic (es.rs:252)") {
    val got = Seq("foo-partition-3", "foo", "a-partition-x")
      .toDF("t").select(collapsePartitionTopic(col("t"))).as[String].collect()
    assert(got.toSeq == Seq("foo", "foo", "a-partition-x"))
  }
}
