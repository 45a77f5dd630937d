package graft.schema

import com.fasterxml.jackson.databind.JsonNode
import scala.jdk.CollectionConverters._
import scala.collection.immutable.ListMap

/** Thrown when a JSON value does not fit a known schema (fast-path miss). */
class SchemaMapException(msg: String) extends IllegalArgumentException(msg)

/**
 * Strict JSON->schema mapping, the "probabilistic fast path" kernel —
 * semantic port of `json/SchemaMapper.java:19-66` plus the post-mapping
 * validation hook (`smt/DebeziumJsonDeserializer.java:183-185,205` ->
 * `ConnectSchema.validateValue`):
 *
 *  - null maps to null only if the target is optional, else throws;
 *  - objects map onto STRUCT; an unknown field throws (strictness is the
 *    point: a miss falls back to full inference);
 *  - arrays map elementwise;
 *  - literals are coerced with the inference rules, then validated against
 *    the target primitive type.
 */
object StrictMapper {

  def mapJsonToSchema(schema: JType, json: JsonNode, opts: InferOptions): Any = {
    val v = mapRec(schema, json, opts)
    validate(schema, v)
    v
  }

  private def mapRec(schema: JType, json: JsonNode, opts: InferOptions): Any = {
    if (json == null || json.isNull) {
      if (schema.optional) return null
      throw new SchemaMapException("Empty value for non optional field.")
    }
    schema match {
      case JStruct(fields, _, _) =>
        if (!json.isObject) throw new SchemaMapException("Expected an object to map to a structure.")
        val fm = fields.toMap
        var out = ListMap.empty[String, Any]
        json.fields().asScala.foreach { e =>
          val fv = e.getValue
          if (fv != null && !fv.isNull) {
            val fname = if (opts.sanitizeFieldNames) JsonSchemaInfer.sanitizeName(e.getKey) else e.getKey
            val ft = fm.getOrElse(fname,
              throw new SchemaMapException(s"Field $fname does not seem to exist here."))
            out += (fname -> mapRec(ft, fv, opts))
          }
        }
        out
      case JArray(elem, _, _) =>
        if (!json.isArray) throw new SchemaMapException("Expected an array to map to an array.")
        json.elements().asScala.map(e => mapRec(elem, e, opts)).toList
      case _: JPrim =>
        JsonSchemaInfer.inferLiteral(json, opts)._2
    }
  }

  /** Recursive type/requiredness validation, the analog of
    * `ConnectSchema.validateValue` used at `DebeziumJsonDeserializer.java:205`. */
  def validate(schema: JType, value: Any): Unit = (schema, value) match {
    case (s, null) =>
      if (!s.optional) throw new SchemaMapException(s"Invalid value: null used for required field")
    case (JStruct(fields, _, _), m: ListMap[_, _]) =>
      val mm = m.asInstanceOf[ListMap[String, Any]]
      fields.foreach { case (fn, ft) =>
        val v = mm.getOrElse(fn, null)
        validate(ft, v)
      }
    case (_: JStruct, v) => throw new SchemaMapException(s"Expected STRUCT value, got ${v.getClass.getName}")
    case (JArray(elem, _, _), l: List[_]) => l.foreach(v => validate(elem, v))
    case (_: JArray, v) => throw new SchemaMapException(s"Expected ARRAY value, got ${v.getClass.getName}")
    case (JPrim(t, _, _), v) =>
      val ok = t match {
        case PrimT.BOOLEAN => v.isInstanceOf[java.lang.Boolean]
        case PrimT.INT8 => v.isInstanceOf[java.lang.Byte]
        case PrimT.INT16 => v.isInstanceOf[java.lang.Short]
        case PrimT.INT32 => v.isInstanceOf[java.lang.Integer]
        case PrimT.INT64 => v.isInstanceOf[java.lang.Long]
        case PrimT.FLOAT32 => v.isInstanceOf[java.lang.Float]
        case PrimT.FLOAT64 => v.isInstanceOf[java.lang.Double]
        case PrimT.STRING => v.isInstanceOf[String]
        case PrimT.BYTES => v.isInstanceOf[Array[Byte]]
      }
      if (!ok) throw new SchemaMapException(s"Invalid Java object for schema type ${t.wire}: ${v.getClass.getName}")
  }

  /** Fast-path attempt over a registry list: first schema that maps+validates
    * wins (`smt/DebeziumJsonDeserializer.java:195-212`). */
  def tryFastPath(known: Seq[JType], json: JsonNode, opts: InferOptions): Option[(JType, Any)] = {
    known.foreach { schema =>
      try return Some((schema, mapJsonToSchema(schema, json, opts)))
      catch { case _: Exception => () }
    }
    None
  }
}
