package graft.plans

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Recursive JSON key sanitization `.` → `_` for arbitrarily nested
  * documents — the exact semantics of the reference's transform
  * (es.rs:77-107), which recurses into objects (and only objects; array
  * elements are visited but scalars pass through). Implemented over
  * Jackson (already on Spark's classpath) as a native expression: one
  * parse + one serialize per row. Non-JSON input returns null (caller
  * drops, mirroring deserialize-error handling). */
object JsonSanitizer {
  private val mapper = new ObjectMapper()

  private def sanitize(node: JsonNode): JsonNode = node match {
    case obj: ObjectNode =>
      val out = mapper.createObjectNode()
      obj.properties().forEach { e =>
        out.set[JsonNode](e.getKey.replace('.', '_'), sanitize(e.getValue))
      }
      out
    case arr: ArrayNode =>
      val out = mapper.createArrayNode()
      arr.forEach(v => out.add(sanitize(v)))
      out
    case other => other
  }

  def sanitizeJson(s: UTF8String): UTF8String =
    try {
      val node = mapper.readTree(s.toString)
      if (node == null || !node.isContainerNode) null
      else UTF8String.fromString(mapper.writeValueAsString(sanitize(node)))
    } catch { case _: Exception => null }
}

case class SanitizeJsonKeysExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    JsonSanitizer.sanitizeJson(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.JsonSanitizer.sanitizeJson($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(newChild: Expression): SanitizeJsonKeysExpr =
    copy(child = newChild)
}
