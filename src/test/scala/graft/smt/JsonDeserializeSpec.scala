package graft.smt

import graft.SparkTestBase
import graft.schema.{InferOptions, SchemaRegistry}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-level port of the DebeziumJsonDeserializer contract
  * (`smt/DebeziumJsonDeserializerTest.java`) against DataFrames. */
class JsonDeserializeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def stage(reg: SchemaRegistry = new SchemaRegistry(true),
                    opts: InferOptions = InferOptions(optionalStructFields = true),
                    union: Boolean = true, lenient: Boolean = false) =
    new JsonDeserialize(JsonDeserializeConfig(Seq("json"), "t", opts, union, lenient), reg)

  test("types an array-of-strings column") {
    val df = Seq(("1", """["foo", "bar"]""")).toDF("id", "json")
    val out = stage()(df)
    assert(out.schema("json").dataType.isInstanceOf[ArrayType])
    assert(out.select(element_at(col("json"), 1)).head().getString(0) == "foo")
  }

  test("null and empty values stay null; schema comes from other rows") {
    val df = Seq(("1", """{"foo": "bar"}"""), ("2", null), ("3", "")).toDF("id", "json")
    val out = stage()(df).orderBy("id").collect()
    assert(out(0).getStruct(1).getString(0) == "bar")
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("schemas union across rows within a batch") {
    val df = Seq(
      ("1", """{"foo": "da value"}"""),
      ("2", """{"bar": "oh a value"}"""),
      ("3", """{"foo": "way", "bar": "plop"}""")).toDF("id", "json")
    val out = stage()(df)
    val st = out.schema("json").dataType.asInstanceOf[StructType]
    assert(st.fieldNames.toSeq == Seq("bar", "foo")) // sorted union
    val rows = out.orderBy("id").select("json.foo", "json.bar").collect()
    assert(rows(0).getString(0) == "da value" && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).getString(1) == "oh a value")
    assert(rows(2).getString(0) == "way" && rows(2).getString(1) == "plop")
  }

  test("registry unions across batches and persists") {
    val reg = new SchemaRegistry(true)
    val s = stage(reg)
    s(Seq(("1", """{"foo": "x"}""")).toDF("id", "json")).collect()
    val out2 = s(Seq(("2", """{"bar": "y"}""")).toDF("id", "json"))
    // second batch output carries the unioned schema (foo from batch 1)
    val st = out2.schema("json").dataType.asInstanceOf[StructType]
    assert(st.fieldNames.toSet == Set("foo", "bar"))
    // registry round-trips through serde (snapshot persistence)
    val restored = SchemaRegistry.deserialize(reg.serialize, optionalStructFields = true)
    assert(restored.entries == reg.entries)
  }

  test("incompatible classes fan out to sibling columns") {
    val df = Seq(
      ("1", """{"foo": "string"}"""),
      ("2", """{"foo": ["array"]}""")).toDF("id", "json")
    val out = stage()(df)
    assert(out.columns.contains("json") && out.columns.contains("json__v1"))
    val rows = out.orderBy("id").collect()
    assert(!rows(0).isNullAt(rows(0).fieldIndex("json")) && rows(0).isNullAt(rows(0).fieldIndex("json__v1")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("json")) && !rows(1).isNullAt(rows(1).fieldIndex("json__v1")))
  }

  test("two-class classify uses the strict fast path: one parse per row") {
    // DebeziumJsonDeserializer.java:195-212 / SchemaMapper.java:19-66 — the
    // classify path must parse each row ONCE and strict-map it onto the
    // closure-captured class list, never re-deserialize the registry per row.
    val df = Seq(
      ("1", """{"foo": "string"}"""),
      ("2", """{"foo": ["array"]}"""),
      ("3", """{"foo": "other"}"""),
      ("4", """{"foo": ["more"]}""")).toDF("id", "json")
    val s = stage()
    val before = graft.schema.JsonSchemaInfer.parseCount.sum()
    val out = s(df)
    val rows = out.orderBy("id").collect()
    val parses = graft.schema.JsonSchemaInfer.parseCount.sum() - before
    // 4 rows x (1 parse in the inference aggregate + 1 parse in classify);
    // a per-row fallback re-infer would add more.
    assert(parses <= 8, s"expected <= 2 parses per row, got $parses for 4 rows")
    assert(rows(0).isNullAt(rows(0).fieldIndex("json__v1")) && !rows(1).isNullAt(rows(1).fieldIndex("json__v1")))
    assert(!rows(2).isNullAt(rows(2).fieldIndex("json")) && rows(2).isNullAt(rows(2).fieldIndex("json__v1")))
  }

  test("sanitize mode is zero-UDF: one Jackson parse per row TOTAL") {
    // The inference walk sanitizes keys while traversing RAW text and
    // collects the original spellings; the output pass parses under the
    // original-name schema with from_json and renames via struct cast —
    // NO Jackson work on the output path at all.
    val df = Seq(("1", """{"b-x": 1, "c.y": "s"}"""), ("2", """{"b-x": 2, "c.y": "t"}"""))
      .toDF("id", "json")
    val reg = new SchemaRegistry(true)
    val s = new JsonDeserialize(JsonDeserializeConfig(Seq("json"), "t",
      InferOptions(optionalStructFields = true, sanitizeFieldNames = true)), reg)
    val before = graft.schema.JsonSchemaInfer.parseCount.sum()
    val out = s(df) // runs the inference action
    val inferParses = graft.schema.JsonSchemaInfer.parseCount.sum() - before
    assert(inferParses <= 2, s"inference pass should parse once per row, got $inferParses for 2 rows")
    val rows = out.orderBy("id").collect() // output action: from_json only
    val total = graft.schema.JsonSchemaInfer.parseCount.sum() - before
    assert(total <= 2, s"output pass must be Jackson-free, got $total parses for 2 rows")
    val st = out.schema("json").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st.fieldNames.toSet == Set("b_x", "c_y"))
    assert(rows(0).getStruct(rows(0).fieldIndex("json")).getAs[Int]("b_x") == 1)
    assert(rows(1).getStruct(rows(1).fieldIndex("json")).getAs[String]("c_y") == "t")
  }

  test("sanitize collision (two spellings, one sanitized name) still parses every row") {
    // "b-x" and "b.x" both sanitize to b_x: one parse-schema name cannot
    // match both texts, so this column falls back to the key-rewrite UDF —
    // values from BOTH spellings must land in b_x.
    val df = Seq(("1", """{"b-x": 1}"""), ("2", """{"b.x": 2}""")).toDF("id", "json")
    val reg = new SchemaRegistry(true)
    val s = new JsonDeserialize(JsonDeserializeConfig(Seq("json"), "t",
      InferOptions(optionalStructFields = true, sanitizeFieldNames = true)), reg)
    val rows = s(df).orderBy("id").collect()
    assert(rows(0).getStruct(rows(0).fieldIndex("json")).getAs[Int]("b_x") == 1)
    assert(rows(1).getStruct(rows(1).fieldIndex("json")).getAs[Int]("b_x") == 2)
  }

  test("variant output mode: one tagged-union struct column") {
    val df = Seq(
      ("1", """{"foo": "string"}"""),
      ("2", """[1, 2]"""),
      ("3", """{"foo": "other"}"""),
      ("4", null.asInstanceOf[String])).toDF("id", "json")
    val reg = new SchemaRegistry(true)
    val s = new JsonDeserialize(JsonDeserializeConfig(Seq("json"), "t",
      InferOptions(optionalStructFields = true), outputMode = "variant"), reg)
    val out = s(df)
    val vt = out.schema("json").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(vt.fieldNames.toSeq == Seq("class_id", "v0", "v1"))
    val rows = out.orderBy("id").collect()
    def v(r: org.apache.spark.sql.Row) = r.getStruct(r.fieldIndex("json"))
    // struct rows and array rows carry distinct class ids; the matching vN
    // is non-null, the other null; null input stays a null struct (O2)
    val cls1 = v(rows(0)).getInt(0)
    val cls2 = v(rows(1)).getInt(0)
    assert(cls1 != cls2)
    assert(v(rows(0)).isNullAt(1) != v(rows(0)).isNullAt(2))
    assert(v(rows(1)).isNullAt(1) != v(rows(1)).isNullAt(2))
    assert(v(rows(2)).getInt(0) == cls1)
    assert(rows(3).isNullAt(rows(3).fieldIndex("json")))
  }

  test("union failures are counted and opt-in logged") {
    // DebeziumJsonDeserializer.java:124,229-236 — a schema that unions with
    // no known class registers a new class; the failure count is surfaced.
    val reg = new SchemaRegistry(true)
    val s = new JsonDeserialize(JsonDeserializeConfig(
      Seq("json"), "t", InferOptions(optionalStructFields = true),
      union = true, lenient = false, logUnionFailures = true), reg)
    s(Seq(("1", """{"foo": "string"}""")).toDF("id", "json")).collect()
    assert(s.unionFailures.get() == 0L) // first class of an empty registry is not a failure
    s(Seq(("2", """{"foo": 42}""")).toDF("id", "json")).collect()
    assert(s.unionFailures.get() == 1L) // STRING vs INT32 cannot union -> new class
    s(Seq(("3", """{"foo": "more text"}""")).toDF("id", "json")).collect()
    assert(s.unionFailures.get() == 1L) // unions with class 0, no new failure
    assert(reg.get("t", "json").size == 2)
  }

  test("root literals parse via cast (boolean/int classes)") {
    val df = Seq(("1", "true"), ("2", "500"), ("3", "false"), ("4", "1000")).toDF("id", "json")
    val out = stage()(df)
    // two classes: BOOLEAN + INT32
    assert(out.columns.contains("json") && out.columns.contains("json__v1"))
    val byId = out.orderBy("id").collect()
    val jIdx = byId(0).fieldIndex("json")
    val vIdx = byId(0).fieldIndex("json__v1")
    // class order: boolean first (first seen)
    assert(byId(0).getBoolean(jIdx) == true && byId(1).getInt(vIdx) == 500)
    assert(byId(2).getBoolean(jIdx) == false && byId(3).getInt(vIdx) == 1000)
  }

  test("unparseable JSON throws by default, lenient nulls") {
    val bad = Seq(("1", """{"foo": unquoted}""")).toDF("id", "json")
    intercept[Exception] { stage()(bad).collect() }
    val out = stage(lenient = true)(bad).collect()
    assert(out(0).isNullAt(1))
  }

  test("convert-numbers-to-double and big integers") {
    val df = Seq(("1", """{"temperature": 37, "big": 190000000000000100000}""")).toDF("id", "json")
    val opts = InferOptions(optionalStructFields = true, convertNumbersToDouble = true)
    val out = stage(opts = opts)(df)
    val st = out.schema("json").dataType.asInstanceOf[StructType]
    assert(st("temperature").dataType == DoubleType && st("big").dataType == DoubleType)
    val r = out.select("json.temperature", "json.big").head()
    assert(r.getDouble(0) == 37.0)
    assert(r.getDouble(1) == new java.math.BigInteger("190000000000000100000").doubleValue())
  }

  test("sanitized field names are queryable") {
    val df = Seq(("1", """{"with space": 10, "1some_details": {"plenty": "x"}}""")).toDF("id", "json")
    val opts = InferOptions(optionalStructFields = true, sanitizeFieldNames = true)
    val out = stage(opts = opts)(df)
    val r = out.select("json.with_space", "json._1some_details.plenty").head()
    assert(r.getInt(0) == 10 && r.getString(1) == "x")
  }

  test("ignored fields are pruned from the output schema") {
    val df = Seq(("1", """{"keep": 1, "baz": 2}""")).toDF("id", "json")
    val opts = InferOptions(optionalStructFields = true, ignoredFields = Seq("json.baz"))
    val out = stage(opts = opts)(df)
    val st = out.schema("json").dataType.asInstanceOf[StructType]
    assert(st.fieldNames.toSet == Set("keep"))
  }

  test("multiple json columns in one stage") {
    val reg = new SchemaRegistry(true)
    val cfg = JsonDeserializeConfig(Seq("a", "b"), "t", InferOptions(optionalStructFields = true))
    val df = Seq(("1", """{"x": 1}""", """["y"]""")).toDF("id", "a", "b")
    val out = new JsonDeserialize(cfg, reg)(df)
    assert(out.schema("a").dataType.isInstanceOf[StructType])
    assert(out.schema("b").dataType.isInstanceOf[ArrayType])
  }

  test("metadata drift from the generator unions additively") {
    val reg = new SchemaRegistry(true)
    val s = stage(reg)
    val events = graft.stream.ChangeGen.events(spark,
      graft.stream.GenConfig(numDocs = 20, numEvents = 200, driftAt = 100))
      .select(col("source.lsn").as("id"), col("metadata").as("json"))
    val out = s(events)
    val st = out.schema("json").dataType.asInstanceOf[StructType]
    assert(st.fieldNames.toSet == Set("lang", "pipeline", "quality"))
    assert(st("pipeline").dataType.asInstanceOf[StructType].fieldNames.toSet == Set("version", "tokenizer"))
  }
}
