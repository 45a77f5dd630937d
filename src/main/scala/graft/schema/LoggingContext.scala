package graft.schema

/**
 * Diagnostic context/description strings — port of
 * `utils/LoggingContext.java:11-44` adapted to the engine's shapes: batch
 * context replaces per-record context (topic/partition/key become
 * stream/epoch/bucket), and schema description walks the JType AST.
 */
object LoggingContext {

  /** Per-record context (`LoggingContext.java:12-28`): topic, partition,
    * readable key, optional offset. */
  def createContext(topic: String, partition: Integer, key: Any, offset: Option[Long] = None): String = {
    val readableKey = key match {
      case b: Array[Byte] => new String(b, java.nio.charset.StandardCharsets.UTF_8)
      case other => String.valueOf(other)
    }
    val base = s"topic=$topic, partition=$partition, key=$readableKey"
    offset match {
      case Some(o) => s"$base, offset=$o"
      case None => base
    }
  }

  /** Batch-level context for the engine's set-at-a-time lifecycle. */
  def batchContext(streamId: String, epochId: Long, rows: Long): String =
    s"stream=$streamId, epoch=$epochId, rows=$rows"

  /** Schema description (`LoggingContext.java:30-44`): type, optionality,
    * fields for structs, recursive element for arrays. */
  def describeSchema(schema: JType): String = {
    if (schema == null) return null
    val tpe = schema match {
      case JPrim(t, _, _) => t.wire
      case _: JArray => "ARRAY"
      case _: JStruct => "STRUCT"
    }
    val base = s"${schema.name.getOrElse("<anonymous>")} (#${schema.hashCode}) optional=${schema.optional} type=$tpe"
    schema match {
      case JStruct(fields, _, _) =>
        base + " fields=" + fields.map { case (n, t) => s"$n:${describeSchema(t)}" }.mkString("[", ", ", "]")
      case JArray(elem, _, _) => base + "\n-> " + describeSchema(elem)
      case _ => base
    }
  }
}
