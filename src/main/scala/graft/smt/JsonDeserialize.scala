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
    logUnionFailures: Boolean = false,
    /** Shape of the multi-class fan-out (single-class batches are a plain
      * typed column either way):
      *  - "siblings" (default, faithful to the reference's per-record
      *    heterogeneous output, `DebeziumJsonDeserializerTest.java:605-649`):
      *    class 0 under the original column name, further classes as
      *    positional sibling columns `<col>__v<i>` — unstable for downstream
      *    consumers when the class set grows;
      *  - "variant": ONE struct column `{class_id int, v0 t0, v1 t1, ...}`
      *    with exactly the matching vN non-null — a stable tagged union
      *    (class_id = -1 for rows that classify to no class, e.g. empty
      *    strings in lenient mode; null input stays null). */
    outputMode: String = "siblings")

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

    // Sanitize mode needs NO text rewrite anywhere: the inference walk and
    // the strict mapper sanitize keys as they traverse the raw JSON
    // (`utils/AvroUtils.java:26-48` applied at parse time), and the output
    // pass parses under the ORIGINAL key names (collected by the inference
    // walk) then renames via a positional struct cast — from_json is the
    // only parser on the output path, zero Jackson work.
    val df = df0

    // Pass 1: distributed inference + union fold over non-empty values.
    val agg = new SchemaInferAggregator(column, cfg.opts, cfg.lenient)
    val inferredJson = df
      .select(col(column).cast(StringType))
      .filter(col(column).isNotNull && col(column) =!= "")
      .as[String]
      .select(agg.toColumn.name("classes"))
      .head()
    val (batchClasses, renames) = SchemaInferAggregator.deserializeResult(inferredJson)

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
      df.withColumn(column, parseAs(col(column), classes.head, column, renames))
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
      if (cfg.outputMode == "variant") {
        // Tagged union: one stable struct column. class_id is the registry
        // index (stable across batches once registered); exactly the
        // matching vN parses non-null. Null input -> null struct (O2).
        val d1 = df.withColumn("__cls", cls)
        val variant = struct(
          col("__cls").cast(org.apache.spark.sql.types.IntegerType).as("class_id") +:
            classes.zipWithIndex.map { case (jt, i) =>
              when(col("__cls") === i, parseAs(col(column), jt, column, renames)).as(s"v$i")
            }: _*)
        d1.withColumn(column, when(col(column).isNotNull, variant)).drop("__cls")
      } else {
        val withCols = classes.zipWithIndex.foldLeft(df.withColumn("__cls", cls)) {
          case (d, (jt, i)) =>
            val outName = if (i == 0) s"${column}__v0" else s"${column}__v$i"
            d.withColumn(outName, when(col("__cls") === i, parseAs(col(column), jt, column, renames)))
        }
        withCols.drop(column, "__cls")
          .withColumnRenamed(s"${column}__v0", column)
      }
    }
  }

  /** Parse a JSON string column under a compatibility class: structs/arrays
    * via from_json; root literals (unsupported by from_json) via
    * get_json_object + cast (`DebeziumJsonDeserializerTest.java:506-550`).
    *
    * Sanitize mode is ZERO-UDF: the class schema carries sanitized names,
    * but from_json matches keys literally — so the parse runs under a
    * schema rebuilt with the ORIGINAL key spellings (collected during
    * inference) and the result is renamed by a positional struct cast
    * (Cast matches struct fields by position, names are free). The one
    * unrepresentable case — two different original spellings collapsing
    * onto one sanitized name at the same path — falls back to the Jackson
    * key-rewrite UDF for that column (a single parse name cannot match
    * both rows' texts). */
  private def parseAs(c: Column, jt: JType, column: String,
                      renames: Map[String, Set[String]]): Column =
    jt match {
      case _: JStruct | _: JArray =>
        val dt: DataType = jt.toSpark
        if (!cfg.opts.sanitizeFieldNames)
          from_json(c, dt, Map.empty[String, String])
        else JsonDeserialize.originalNamesDt(dt, column, renames) match {
          case Some(parseDt) =>
            from_json(c, parseDt, Map.empty[String, String])
              .cast(JsonDeserialize.deepNullable(dt))
          case None => // ambiguous collision: rewrite the text (rare)
            from_json(JsonDeserialize.sanitizeKeysUdf(c), dt, Map.empty[String, String])
        }
      case JPrim(t, _, _) =>
        // root literal: no keys to sanitize
        get_json_object(c, "$").cast(t.sparkType)
    }
}

object JsonDeserialize {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
  import org.apache.spark.sql.types.{StructField, StructType}

  /** Rebuild a (sanitized-name) DataType with the ORIGINAL key spellings
    * the batch's text actually contains, walking the same `_`-joined path
    * language the inference collector used. None when any path is
    * ambiguous (>= 2 original spellings for one sanitized name — e.g.
    * "b-x" and "b.x" in different rows); the caller falls back to the
    * text-rewrite UDF. A path absent from `renames` kept its sanitized
    * spelling (or never occurs in this batch — either way the sanitized
    * name is correct for from_json). */
  private[smt] def originalNamesDt(dt: DataType, path: String,
                                   renames: Map[String, Set[String]]): Option[DataType] = dt match {
    case st: StructType =>
      val fields = st.fields.map { f =>
        val p = s"${path}_${f.name}"
        val orig = renames.get(p) match {
          case Some(os) if os.size == 1 => os.head
          case Some(_) => return None // ambiguous: one sanitized name, many spellings
          case None => f.name
        }
        originalNamesDt(f.dataType, p, renames) match {
          case Some(ft) => StructField(orig, ft, f.nullable, f.metadata)
          case None => return None
        }
      }
      Some(StructType(fields))
    case at: ArrayType =>
      originalNamesDt(at.elementType, s"${path}_array_item", renames)
        .map(et => at.copy(elementType = et))
    case other => Some(other)
  }

  /** Deep fully-nullable copy — from_json's output type is the schema's
    * asNullable, so the rename cast must target the same nullability. */
  private[smt] def deepNullable(dt: DataType): DataType = dt match {
    case st: StructType =>
      StructType(st.fields.map(f => f.copy(dataType = deepNullable(f.dataType), nullable = true)))
    case at: ArrayType => ArrayType(deepNullable(at.elementType), containsNull = true)
    case other => other
  }

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

  def zero: Buf = Buf(Nil, Set.empty, Map.empty)

  def reduce(b: Buf, json: String): Buf = {
    // In sanitize mode the walk also collects original key spellings per
    // sanitized path — the output pass parses under the ORIGINAL names and
    // renames via struct cast, so the rename map must cover every key the
    // batch contains (it does: every row walks here, memo-hit or not).
    val coll: JsonSchemaInfer.RenameCollector =
      if (opts.sanitizeFieldNames) scala.collection.mutable.Map.empty else null
    val inferred =
      try JsonSchemaInfer.inferSchemaOnly(json, column, opts, coll)
      catch { case e: JsonParseException => if (lenient) None else throw e }
    val renames =
      if (coll == null || coll.isEmpty) b.renames
      else coll.foldLeft(b.renames) { case (m, (p, os)) =>
        m.updated(p, m.getOrElse(p, Set.empty) ++ os)
      }
    inferred match {
      case None => if (renames eq b.renames) b else b.copy(renames = renames)
      case Some(t) =>
        if (b.seen.contains(t)) { if (renames eq b.renames) b else b.copy(renames = renames) }
        else {
          val (updated, _) = SchemaUnion.unionIntoList(b.classes, t, opts.optionalStructFields)
          Buf(updated, cap(b.seen + t), renames)
        }
    }
  }

  def merge(a: Buf, b: Buf): Buf =
    Buf(SchemaUnion.mergeLists(a.classes, b.classes, opts.optionalStructFields), cap(a.seen ++ b.seen),
      b.renames.foldLeft(a.renames) { case (m, (p, os)) => m.updated(p, m.getOrElse(p, Set.empty) ++ os) })

  def finish(b: Buf): String = SchemaInferAggregator.serializeResult(b.classes, b.renames)

  private def cap(s: Set[JType]): Set[JType] = if (s.size > 64) Set.empty else s

  def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  def outputEncoder: Encoder[String] = Encoders.STRING
}

object SchemaInferAggregator {
  final case class Buf(classes: List[JType], seen: Set[JType], renames: Map[String, Set[String]])

  import com.fasterxml.jackson.databind.ObjectMapper
  private val mapper = new ObjectMapper()

  /** Wire format of the inference aggregate's result: the SchemaDto class
    * list (unchanged, `utils/SchemaSerDer.java:11-40` format) plus the
    * sanitize-rename observations. */
  private[smt] def serializeResult(classes: List[JType], renames: Map[String, Set[String]]): String = {
    val root = mapper.createObjectNode()
    root.put("classes", JType.serializeMany(classes))
    val rn = root.putObject("renames")
    renames.foreach { case (p, os) =>
      val arr = rn.putArray(p)
      os.toSeq.sorted.foreach(arr.add)
    }
    mapper.writeValueAsString(root)
  }

  private[smt] def deserializeResult(s: String): (List[JType], Map[String, Set[String]]) = {
    val root = mapper.readTree(s)
    val classes = JType.deserializeMany(root.path("classes").asText()).toList
    val rn = scala.collection.mutable.Map.empty[String, Set[String]]
    val it = root.path("renames").fields()
    while (it.hasNext) {
      val e = it.next()
      val os = scala.collection.mutable.Set.empty[String]
      e.getValue.elements().forEachRemaining(n => os += n.asText())
      rn(e.getKey) = os.toSet
    }
    (classes, rn.toMap)
  }
}
