package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._
import scala.collection.immutable.ListMap

/** Thrown when a JSON payload cannot be parsed (strict mode mirrors
  * `smt/DebeziumJsonDeserializer.java:188-193`). */
class JsonParseException(msg: String, cause: Throwable = null)
  extends IllegalArgumentException(msg, cause)

/**
 * Per-record JSON schema inference — semantic port of the reference's
 * `json/SchemaTransformer.java:50-147` (structural recursion), with the
 * reference's exact drop/union/typing rules:
 *
 *  - JSON object  -> STRUCT, fields in insertion order; a field whose value
 *                    infers to nothing (null / empty array) is dropped.
 *  - JSON array   -> ARRAY of the union of element schemas; empty array is
 *                    dropped; all-null elements -> empty STRUCT named
 *                    `<key>_array_item`; mixed-type elements throw.
 *  - JSON null    -> dropped.
 *  - literals     -> Integer->INT32, Long->INT64, BigInteger->FLOAT64
 *                    (value widened to double), Double->FLOAT64,
 *                    Boolean->BOOLEAN, String->STRING
 *                    (`json/SchemaTransformer.java:126-147,292-310`).
 *  - `convertNumbersToDouble` widens INT8..FLOAT32 (incl. INT64) to FLOAT64.
 *  - `sanitizeFieldsName` applies Avro-name sanitization to field names
 *    (`utils/AvroUtils.java:26-48`) before path construction.
 *  - `ignoredFields` are normalized config paths (`.`->`_`, `[]`->`_array_item`,
 *    `smt/DebeziumJsonDeserializer.java:127-130`) checked against the key path.
 *
 * Inference is a pure function String -> Option[(JType, Any)]; values use
 * ListMap (structs), List (arrays) and JVM primitives, so the same kernel
 * backs both the distributed batch-inference aggregate and the strict
 * fast-path mapper.
 */
final case class InferOptions(
    optionalStructFields: Boolean = false,
    convertNumbersToDouble: Boolean = false,
    sanitizeFieldNames: Boolean = false,
    ignoredFields: Seq[String] = Nil) {
  /** Config-path normalization per `smt/DebeziumJsonDeserializer.java:127-130`. */
  def normalizedIgnored: Set[String] =
    ignoredFields.map(_.replace(".", "_").replace("[]", "_array_item")).toSet
}

object JsonSchemaInfer {

  /** Avro-legal name sanitization, same rules as `utils/AvroUtils.java:26-48`
    * (itself Debezium's FieldNameSelector): leading digit gets `_` prefix,
    * any char outside [a-zA-Z0-9_] becomes `_`. */
  def sanitizeName(s: String): String = {
    val sb = new StringBuilder(s.length + 1)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (i == 0 && c >= '0' && c <= '9') { sb.append('_'); sb.append(c) }
      else if (c == '_' || (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else sb.append('_')
      i += 1
    }
    sb.toString
  }

  // ObjectMapper is thread-safe for read; one per JVM.
  private val mapper = new ObjectMapper()

  /** Total parse() invocations (LongAdder — negligible under contention).
    * Lets tests pin the one-parse-per-row contract of the classify path. */
  val parseCount = new java.util.concurrent.atomic.LongAdder

  def parse(json: String): JsonNode = {
    parseCount.increment()
    try mapper.readTree(json)
    catch { case e: Exception => throw new JsonParseException(s"""Cannot parse JSON value "$json"""", e) }
  }

  /** Mutable collector of sanitize-time key renames, filled during
    * inference: sanitized key PATH (the same `_`-joined path language as
    * `ignoredFields`) -> every ORIGINAL key text seen at that path. The
    * output pass uses it to parse with the original-name schema and rename
    * via struct cast — zero re-serialization of the JSON text. */
  type RenameCollector = scala.collection.mutable.Map[String, Set[String]]

  /** Infer schema+value for a JSON string under root key `key` (the column
    * name). Returns None when the whole value infers to nothing (JSON null /
    * empty array), mirroring the reference's dropped field. */
  def inferString(json: String, key: String, opts: InferOptions): Option[(JType, Any)] =
    infer(parse(json), key, opts)

  /** Schema-only variant (value discarded) for the batch inference pass;
    * `renames` (optional) collects original key spellings per sanitized
    * path while the walk is already visiting every key. */
  def inferSchemaOnly(json: String, key: String, opts: InferOptions,
                      renames: RenameCollector = null): Option[JType] =
    inferRec(parse(json), key, opts, opts.normalizedIgnored, renames).map(_._1)

  /** Port of `SchemaTransformer.transformJsonValue` (`json/SchemaTransformer.java:50-124`). */
  def infer(node: JsonNode, key: String, opts: InferOptions): Option[(JType, Any)] = {
    val ignored = opts.normalizedIgnored
    inferRec(node, key, opts, ignored, null)
  }

  private def inferRec(node: JsonNode, key: String, opts: InferOptions, ignored: Set[String],
                       renames: RenameCollector): Option[(JType, Any)] = {
    if (ignored.contains(key)) return None
    if (node.isObject) {
      // STRUCT: insertion order preserved; dropped children omitted.
      var fields = Vector.empty[(String, JType)]
      var values = ListMap.empty[String, Any]
      node.fieldNames().asScala.foreach { raw =>
        val fname = if (opts.sanitizeFieldNames) sanitizeName(raw) else raw
        val path = s"${key}_$fname"
        // Record EVERY original spelling (unchanged ones too): the output
        // pass must detect when two different spellings — or a renamed key
        // plus its already-sanitized twin — collapse onto one sanitized
        // name, where a single parse-name cannot represent both rows.
        if (renames != null && opts.sanitizeFieldNames)
          renames.update(path, renames.getOrElse(path, Set.empty) + raw)
        inferRec(node.path(raw), path, opts, ignored, renames) match {
          case Some((ft, fv)) =>
            fields :+= (fname -> ft)
            values += (fname -> fv)
          case None => ()
        }
      }
      Some((JStruct(fields, opts.optionalStructFields, Some(key)), values))
    } else if (node.isArray) {
      if (node.size() == 0) return None // can't type an empty array -> dropped
      var elemSchemas = Vector.empty[JType]
      var elemValues = Vector.empty[Any]
      node.elements().asScala.foreach { child =>
        inferRec(child, s"${key}_array_item", opts, ignored, renames) match {
          case Some((es, ev)) => elemSchemas :+= es; elemValues :+= ev
          case None => elemValues :+= null
        }
      }
      val elemSchema: JType =
        if (elemSchemas.nonEmpty) SchemaUnion.union(elemSchemas, opts.optionalStructFields)
        else JStruct(Nil, opts.optionalStructFields, Some(s"${key}_array_item")) // all-null elements
      val repacked =
        if (elemSchema.isInstanceOf[JStruct]) elemValues.map(v => repackage(elemSchema, v))
        else elemValues
      Some((JArray(elemSchema, opts.optionalStructFields, Some(s"${key}_array")), repacked.toList))
    } else if (node.isNull) {
      None
    } else Some(inferLiteral(node, opts))
  }

  /** Port of `SchemaTransformer.transformJsonLiteral` (`json/SchemaTransformer.java:126-147`)
    * with Jackson literal extraction (`:292-310`). */
  def inferLiteral(node: JsonNode, opts: InferOptions): (JType, Any) = {
    val (t0, v0): (PrimT, Any) =
      if (node.isBoolean) (PrimT.BOOLEAN, node.booleanValue())
      else if (node.isNumber) {
        val n = node.numberValue()
        n match {
          case i: java.lang.Integer => (PrimT.INT32, i)
          case l: java.lang.Long => (PrimT.INT64, l)
          case b: java.math.BigInteger => (PrimT.FLOAT64, b.doubleValue()) // `SchemaTransformer.java:129-133`
          case d: java.lang.Double => (PrimT.FLOAT64, d)
          case f: java.lang.Float => (PrimT.FLOAT32, f)
          case bd: java.math.BigDecimal => (PrimT.FLOAT64, bd.doubleValue())
          case other => (PrimT.FLOAT64, other.doubleValue())
        }
      }
      else if (node.isTextual) (PrimT.STRING, node.textValue())
      else if (node.isBinary) (PrimT.BYTES, node.binaryValue())
      else throw new IllegalArgumentException(s"Found JSON node of type '${node.getNodeType}' but not supported.")

    if (opts.convertNumbersToDouble && t0.isNumber)
      (JPrim(PrimT.FLOAT64, opts.optionalStructFields), java.lang.Double.valueOf(v0.toString))
    else (JPrim(t0, opts.optionalStructFields), v0)
  }

  /** Re-wrap a value under a (wider) unioned schema — port of
    * `SchemaTransformer.repackage` (`json/SchemaTransformer.java:149-206`).
    * With ListMap-backed structs this only needs recursion, absent fields
    * are simply missing (null on read). */
  def repackage(schema: JType, value: Any): Any = (schema, value) match {
    case (_, null) => null
    case (JArray(elem, _, _), l: List[_]) => l.map(v => repackage(elem, v))
    case (JStruct(fields, _, _), m: ListMap[_, _]) =>
      val mm = m.asInstanceOf[ListMap[String, Any]]
      val fm = fields.toMap
      // Keep the target schema's field order for determinism.
      ListMap(fields.collect { case (fn, ft) if mm.contains(fn) => fn -> repackage(ft, mm(fn)) }: _*) ++
        (mm.keySet -- fm.keySet).map(k => k -> mm(k)) // unknown keys impossible post-union; keep defensively
    case (_, v) => v
  }
}
