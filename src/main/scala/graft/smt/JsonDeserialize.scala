package graft.smt

import graft.schema._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}

/**
 * Batch JSON deserialization — the set-at-a-time re-expression of the
 * reference's `DebeziumJsonDeserializer` (O1-O13, `smt/DebeziumJsonDeserializer.java:59-256`).
 *
 * The reference infers a schema PER RECORD, unions it into a registry of
 * mutually-incompatible known schemas, and re-emits the record under the
 * widened schema. Per-microbatch, the engine:
 *
 *  1. runs one distributed inference pass (a typed [[Aggregator]] whose
 *     buffer is the registry-list fold; per-partition memoization of seen
 *     shapes plays the role of the reference's probabilistic fast path —
 *     a repeated shape skips the union entirely);
 *  2. unions the batch's compatibility classes into the cross-batch
 *     registry (driver-side, tiny);
 *  3. applies ONE `from_json` per compatibility class — the batch-level
 *     fast path: every row parses under the final widened schema at
 *     whole-stage-codegen speed, no per-row trial loop;
 *  4. emits class 0 under the original column name; additional mutually
 *     incompatible classes (rare; `DebeziumJsonDeserializerTest.java:605-649`)
 *     become sibling columns `<col>__v<i>` — the relational analog of the
 *     reference's per-record heterogeneous output schemas.
 *
 * Strictness contract preserved: unparseable JSON throws (task failure)
 * unless `lenient`; null/empty strings produce null (the reference drops
 * the field from that record's schema — the columnar equivalent is null).
 */
final case class JsonDeserializeConfig(
    columns: Seq[String],
    topic: String = "default",
    opts: InferOptions = InferOptions(),
    union: Boolean = true,
    lenient: Boolean = false)

final class JsonDeserialize(val cfg: JsonDeserializeConfig, val registry: SchemaRegistry)
    extends SmtStage {
  val name = "json-deserialize"

  def apply(df: DataFrame): DataFrame =
    cfg.columns.foldLeft(df)((d, c) => applyColumn(d, c))

  private def applyColumn(df0: DataFrame, column: String): DataFrame = {
    import df0.sparkSession.implicits._

    // Sanitize mode: inference produces Avro-sanitized field names, so the
    // JSON text's keys must be rewritten to match before from_json
    // (`utils/AvroUtils.java:26-48` applied at parse time).
    val df =
      if (cfg.opts.sanitizeFieldNames)
        df0.withColumn(column, JsonDeserialize.sanitizeKeysUdf(col(column)))
      else df0

    // Pass 1: distributed inference + union fold over non-empty values.
    val agg = new SchemaInferAggregator(column, cfg.opts, cfg.lenient)
    val inferredJson = df
      .select(col(column).cast(StringType))
      .filter(col(column).isNotNull && col(column) =!= "")
      .as[String]
      .select(agg.toColumn.name("classes"))
      .head()
    val batchClasses = JType.deserializeMany(inferredJson).toList

    // Cross-batch registry union (driver-side; registry persists in the
    // sink table's snapshot — fixes the reference's restart amnesia).
    val classes: List[JType] =
      if (cfg.union) {
        val merged = SchemaUnion.mergeLists(registry.get(cfg.topic, column), batchClasses, cfg.opts.optionalStructFields)
        registry.put(cfg.topic, column, merged)
        merged
      } else batchClasses

    if (classes.isEmpty) {
      // Nothing inferable this batch: empty column, or (lenient) all rows
      // unparseable -> null column.
      return if (cfg.lenient) df.withColumn(column, lit(null).cast(StringType)) else df
    }

    // Pass 2: one from_json per class.
    if (classes.size == 1) {
      df.withColumn(column, parseAs(col(column), classes.head))
    } else {
      // Rare fan-out: classify each row to its compatibility class, emit
      // one typed column per class.
      val serialized = JType.serializeMany(classes)
      val opts = cfg.opts
      val lenient = cfg.lenient
      val classify = udf { (s: String) =>
        if (s == null || s.isEmpty) -1
        else try {
          val inferred = JsonSchemaInfer.inferSchemaOnly(s, column, opts)
          inferred match {
            case None => -1
            case Some(t) =>
              val known = JType.deserializeMany(serialized)
              val idx = known.indexWhere { k =>
                try { SchemaUnion.union2(k, t, opts.optionalStructFields); true }
                catch { case _: IllegalArgumentException => false }
              }
              idx
          }
        } catch { case _: JsonParseException if lenient => -1 }
      }
      val cls = classify(col(column))
      val withCols = classes.zipWithIndex.foldLeft(df.withColumn("__cls", cls)) {
        case (d, (jt, i)) =>
          val outName = if (i == 0) s"${column}__v0" else s"${column}__v$i"
          d.withColumn(outName, when(col("__cls") === i, parseAs(col(column), jt)))
      }
      withCols.drop(column, "__cls")
        .withColumnRenamed(s"${column}__v0", column)
    }
  }

  /** Parse a JSON string column under a compatibility class: structs/arrays
    * via from_json; root literals (unsupported by from_json) via
    * get_json_object + cast (`DebeziumJsonDeserializerTest.java:506-550`). */
  private def parseAs(c: Column, jt: JType): Column = jt match {
    case _: JStruct | _: JArray =>
      val dt: DataType = jt.toSpark
      from_json(c, dt, Map.empty[String, String])
    case JPrim(t, _, _) =>
      get_json_object(c, "$").cast(t.sparkType)
  }
}

object JsonDeserialize {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

  /** Recursively rewrite object keys with Avro-name sanitization so the
    * JSON text matches the sanitized inferred schema. */
  private[smt] def sanitizeJsonKeys(s: String): String = {
    if (s == null || s.isEmpty) return s
    val m = new ObjectMapper()
    def rec(n: JsonNode): JsonNode = n match {
      case o: ObjectNode =>
        val out = m.createObjectNode()
        val it = o.fields()
        while (it.hasNext) {
          val e = it.next()
          out.set[JsonNode](graft.schema.JsonSchemaInfer.sanitizeName(e.getKey), rec(e.getValue))
        }
        out
      case a: ArrayNode =>
        val out = m.createArrayNode()
        a.elements().forEachRemaining(e => out.add(rec(e)))
        out
      case other => other
    }
    try m.writeValueAsString(rec(m.readTree(s)))
    catch { case _: Exception => s } // unparseable: leave for the strictness path
  }

  private[smt] val sanitizeKeysUdf =
    org.apache.spark.sql.functions.udf((s: String) => sanitizeJsonKeys(s))
}

/**
 * Typed aggregator folding JSON strings into a registry-style list of
 * mutually incompatible schemas. Buffer = (classes, memo of recently seen
 * shapes). The memo is the batch analog of the reference's probabilistic
 * fast path (`smt/DebeziumJsonDeserializer.java:195-212`): repeated shapes
 * skip the union.
 */
final class SchemaInferAggregator(column: String, opts: InferOptions, lenient: Boolean)
    extends Aggregator[String, SchemaInferAggregator.Buf, String] {
  import SchemaInferAggregator.Buf

  def zero: Buf = Buf(Nil, Set.empty)

  def reduce(b: Buf, json: String): Buf = {
    val inferred =
      try JsonSchemaInfer.inferSchemaOnly(json, column, opts)
      catch { case e: JsonParseException => if (lenient) None else throw e }
    inferred match {
      case None => b
      case Some(t) =>
        if (b.seen.contains(t)) b // fast path: shape already folded
        else {
          val (updated, _) = SchemaUnion.unionIntoList(b.classes, t, opts.optionalStructFields)
          Buf(updated, cap(b.seen + t))
        }
    }
  }

  def merge(a: Buf, b: Buf): Buf =
    Buf(SchemaUnion.mergeLists(a.classes, b.classes, opts.optionalStructFields), cap(a.seen ++ b.seen))

  def finish(b: Buf): String = JType.serializeMany(b.classes)

  private def cap(s: Set[JType]): Set[JType] = if (s.size > 64) Set.empty else s

  def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  def outputEncoder: Encoder[String] = Encoders.STRING
}

object SchemaInferAggregator {
  final case class Buf(classes: List[JType], seen: Set[JType])
}
