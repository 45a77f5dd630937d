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
    lenient: Boolean = false,
    /** Opt-in logging of schema-union failures, the analog of the
      * reference's `log-schema-union-failures` flag
      * (`smt/DebeziumJsonDeserializer.java:124,229-236`): when a batch
      * schema class cannot union with any known class, the serialized
      * (round-trippable) schema is logged and [[JsonDeserialize.unionFailures]]
      * is incremented. */
    logUnionFailures: Boolean = false)

final class JsonDeserialize(val cfg: JsonDeserializeConfig, val registry: SchemaRegistry)
    extends SmtStage {
  val name = "json-deserialize"

  /** Count of union failures (new incompatible classes registered) across
    * batches — the metric surface for `log-schema-union-failures`. */
  val unionFailures = new java.util.concurrent.atomic.AtomicLong()

  def apply(df: DataFrame): DataFrame =
    cfg.columns.foldLeft(df)((d, c) => applyColumn(d, c))

  private def applyColumn(df0: DataFrame, column: String): DataFrame = {
    import df0.sparkSession.implicits._

    // Sanitize mode needs NO text rewrite before inference or classification:
    // both the inference walk (`JsonSchemaInfer.inferRec`) and the strict
    // mapper sanitize keys as they traverse the raw JSON
    // (`utils/AvroUtils.java:26-48` applied at parse time). Only from_json
    // matches keys literally, so the rewrite happens exactly once, inside
    // [[parseAs]] on the output path — one Jackson parse per row per pass.
    val df = df0

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
    // A batch class that fails to union with every known class registers a
    // NEW class — that is the reference's "schema union failure"
    // (`DebeziumJsonDeserializer.java:229-236`), counted and (opt-in) logged
    // with the round-trippable serialized schema.
    val classes: List[JType] =
      if (cfg.union) {
        var acc = registry.get(cfg.topic, column)
        batchClasses.foreach { bc =>
          val (updated, idx) = SchemaUnion.unionIntoList(acc, bc, cfg.opts.optionalStructFields)
          if (idx == acc.size && acc.nonEmpty) {
            unionFailures.incrementAndGet()
            if (cfg.logUnionFailures)
              System.err.println(
                s"[json-deserialize] topic=${cfg.topic} field=$column: inferred schema " +
                  s"unions with no known schema, registering new class: ${JType.serialize(bc)}")
          }
          acc = updated
        }
        registry.put(cfg.topic, column, acc)
        acc
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
      // one typed column per class. Fast path first (O13 as designed,
      // `json/SchemaMapper.java:19-66` via `DebeziumJsonDeserializer.java:195-212`):
      // strict-map the parsed node onto each known class — ONE JSON parse
      // per row and no per-row registry deserialization (the class list is
      // a serializable closure capture); a miss falls back to infer + a
      // union-compat test against the same captured list.
      val known: List[JType] = classes
      val opts = cfg.opts
      val lenient = cfg.lenient
      val colName = column
      val classify = udf { (s: String) =>
        if (s == null || s.isEmpty) -1
        else try {
          val node = JsonSchemaInfer.parse(s)
          val fast = known.indexWhere { k =>
            try { StrictMapper.mapJsonToSchema(k, node, opts); true }
            catch { case _: Exception => false }
          }
          if (fast >= 0) fast
          else JsonSchemaInfer.infer(node, colName, opts) match {
            case None => -1
            case Some((t, _)) =>
              known.indexWhere { k =>
                try { SchemaUnion.union2(k, t, opts.optionalStructFields); true }
                catch { case _: IllegalArgumentException => false }
              }
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
    * get_json_object + cast (`DebeziumJsonDeserializerTest.java:506-550`).
    * In sanitize mode the text's keys are rewritten to the sanitized names
    * HERE (from_json matches keys literally) — the only Jackson pass on the
    * output path. */
  private def parseAs(c: Column, jt: JType): Column = {
    val src =
      if (cfg.opts.sanitizeFieldNames) JsonDeserialize.sanitizeKeysUdf(c)
      else c
    jt match {
      case _: JStruct | _: JArray =>
        val dt: DataType = jt.toSpark
        from_json(src, dt, Map.empty[String, String])
      case JPrim(t, _, _) =>
        get_json_object(src, "$").cast(t.sparkType)
    }
  }
}

object JsonDeserialize {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

  /** Recursively rewrite object keys with Avro-name sanitization so the
    * JSON text matches the sanitized inferred schema. Parses through
    * [[graft.schema.JsonSchemaInfer.parse]] so the pass shows up in
    * `parseCount` (the one-parse-per-row unit assertions). */
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
    try m.writeValueAsString(rec(graft.schema.JsonSchemaInfer.parse(s)))
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
