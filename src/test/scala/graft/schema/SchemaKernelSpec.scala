package graft.schema

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.ListMap

/**
 * Port of the reference's JSON-deserializer behavioral contract to the
 * engine's schema kernel. Each test cites the reference assertion it mirrors
 * (file:line in birdiecare/connect-smts).
 */
class SchemaKernelSpec extends AnyFunSuite {
  private val defaults = InferOptions()
  private val osf = InferOptions(optionalStructFields = true)

  private def infer(json: String, opts: InferOptions = defaults): Option[(JType, Any)] =
    JsonSchemaInfer.inferString(json, "json", opts)

  private def schemaOf(json: String, opts: InferOptions = defaults): JType =
    infer(json, opts).get._1

  // DebeziumJsonDeserializerTest.java:46-60
  test("transforms an array of strings") {
    val s = schemaOf("""["foo", "bar"]""")
    assert(s.isInstanceOf[JArray])
    val JArray(elem, _, name) = s: @unchecked
    assert(elem == JPrim(PrimT.STRING, optional = false))
    assert(name.contains("json_array"))
  }

  // DebeziumJsonDeserializerTest.java:62-75 — null JSON value drops the field
  test("null value drops the field") {
    assert(JsonSchemaInfer.inferString("null", "json", defaults).isEmpty)
  }

  // DebeziumJsonDeserializerTest.java:263-273 / :276-286
  test("empty array dropped, quoted empty string kept as STRING") {
    assert(infer("[]").isEmpty)
    val (s, v) = infer("\"\"").get
    assert(s == JPrim(PrimT.STRING, optional = false))
    assert(v == "")
  }

  // DebeziumJsonDeserializerTest.java:97-123
  test("transforms struct with literals and array") {
    val (s, v) = infer("""{"foo":"bar","baz":10,"plop":["a","b"]}""").get
    val st = s.asInstanceOf[JStruct]
    assert(st.fields.map(_._1) == Seq("foo", "baz", "plop")) // insertion order
    assert(st.fieldMap("foo") == JPrim(PrimT.STRING, false))
    assert(st.fieldMap("baz") == JPrim(PrimT.INT32, false))
    assert(st.fieldMap("plop").isInstanceOf[JArray])
    val m = v.asInstanceOf[ListMap[String, Any]]
    assert(m("foo") == "bar" && m("baz") == 10 && m("plop") == List("a", "b"))
  }

  // DebeziumJsonDeserializerTest.java:125-141 — cross-element struct union in arrays
  test("arrays of structs union their element schemas") {
    val s = schemaOf("""{"field1": [{"id": 1}], "field2": [{"id": 2}, {"id": 3}]}""")
    val st = s.asInstanceOf[JStruct]
    val f1 = st.fieldMap("field1").asInstanceOf[JArray].elem.asInstanceOf[JStruct]
    val f2 = st.fieldMap("field2").asInstanceOf[JArray].elem.asInstanceOf[JStruct]
    assert(f1.fields.map(_._1) == f2.fields.map(_._1))
  }

  // DebeziumJsonDeserializerTest.java:158-193 — required vs optional union rules
  test("heterogeneous struct arrays: common fields required, others optional") {
    val s = schemaOf(
      """[
        |  {"type": "care_task", "id": "a", "note": "My note", "task_definition_id": "1234"},
        |  {"type": "regular_task", "id": "b", "external_schedule_id": "123", "time_of_day": "MORNING", "execution_offset": 3600}
        |]""".stripMargin)
    val elem = s.asInstanceOf[JArray].elem.asInstanceOf[JStruct]
    assert(!elem.fieldMap("type").optional)
    assert(!elem.fieldMap("id").optional)
    assert(elem.fieldMap("note").optional)
    assert(elem.fieldMap("note") == JPrim(PrimT.STRING, true))
    assert(elem.fieldMap("execution_offset").optional)
    assert(elem.fieldMap("execution_offset").asInstanceOf[JPrim].t == PrimT.INT32)
    // fields sorted alphabetically after union (SchemaTransformerTest.java:58-82)
    assert(elem.fields.map(_._1) == elem.fields.map(_._1).sorted)
  }

  // DebeziumJsonDeserializerTest.java:196-214
  test("optional-struct-fields makes everything optional") {
    val s = schemaOf("""[{"type": "a", "id": "b"}]""", osf)
    val elem = s.asInstanceOf[JArray].elem.asInstanceOf[JStruct]
    assert(elem.fields.forall(_._2.optional))
    assert(s.optional && elem.optional)
  }

  // DebeziumJsonDeserializerTest.java:238-261 — empty array dropped inside struct; empty object kept
  test("empty array dropped from struct; empty object becomes empty struct") {
    val s = schemaOf("""{"a": [], "b": {}}""")
    val st = s.asInstanceOf[JStruct]
    assert(!st.fieldMap.contains("a"))
    assert(st.fieldMap("b") == JStruct(Nil, false, Some("json_b")))
  }

  // DebeziumJsonDeserializerTest.java:288-295 — mixed-type array throws
  test("mixed-type array throws") {
    intercept[IllegalArgumentException] { infer("""["a", 12]""") }
  }

  // DebeziumJsonDeserializerTest.java:297-311
  test("integers stay int32, decimals are float64 without convert option") {
    val elem = schemaOf("""[{"id": 1, "temperature": 37.5}]""").asInstanceOf[JArray].elem.asInstanceOf[JStruct]
    assert(elem.fieldMap("id").asInstanceOf[JPrim].t == PrimT.INT32)
    assert(elem.fieldMap("temperature").asInstanceOf[JPrim].t == PrimT.FLOAT64)
  }

  // DebeziumJsonDeserializerTest.java:314-330
  test("convert-numbers-to-double widens ints") {
    val opts = InferOptions(convertNumbersToDouble = true)
    val (s, v) = infer("""{"temperature": 37}""", opts).get
    val st = s.asInstanceOf[JStruct]
    assert(st.fieldMap("temperature").asInstanceOf[JPrim].t == PrimT.FLOAT64)
    assert(v.asInstanceOf[ListMap[String, Any]]("temperature") == 37.0d)
  }

  // DebeziumJsonDeserializerTest.java:332-349
  test("BigInteger becomes float64 double") {
    val opts = InferOptions(convertNumbersToDouble = true)
    val (s, v) = infer("""{"big_number": 190000000000000100000}""", opts).get
    assert(s.asInstanceOf[JStruct].fieldMap("big_number").asInstanceOf[JPrim].t == PrimT.FLOAT64)
    val expected = new java.math.BigInteger("190000000000000100000").doubleValue()
    assert(v.asInstanceOf[ListMap[String, Any]]("big_number") == expected)
  }

  test("big integers are float64 even without convert option") {
    val s = schemaOf("""{"big_number": 190000000000000100000}""")
    assert(s.asInstanceOf[JStruct].fieldMap("big_number").asInstanceOf[JPrim].t == PrimT.FLOAT64)
  }

  // DebeziumJsonDeserializerTest.java:351-376 + AvroUtils.java:26-48
  test("sanitizes field names and derives nested schema names") {
    val opts = InferOptions(sanitizeFieldNames = true)
    val s = schemaOf("""{"with space": 10, "1some_details": {"plenty": "of details"}}""", opts)
    val st = s.asInstanceOf[JStruct]
    assert(st.fieldMap.contains("with_space"))
    assert(st.fieldMap.contains("_1some_details"))
    val nested = st.fieldMap("_1some_details").asInstanceOf[JStruct]
    assert(nested.name.contains("json__1some_details"))
  }

  test("sanitizeName rules") {
    assert(JsonSchemaInfer.sanitizeName("1abc") == "_1abc")
    assert(JsonSchemaInfer.sanitizeName("a b-c.d") == "a_b_c_d")
    assert(JsonSchemaInfer.sanitizeName("ok_name9") == "ok_name9")
    // idempotence
    val weird = "9 weird!name"
    assert(JsonSchemaInfer.sanitizeName(JsonSchemaInfer.sanitizeName(weird)) == JsonSchemaInfer.sanitizeName(weird))
  }

  // DebeziumJsonDeserializerTest.java:378-436 — nested arrays/structs
  test("nested arrays and structs") {
    val s = schemaOf("""{"a": [{"b": [{"c": 1}]}]}""")
    val a = s.asInstanceOf[JStruct].fieldMap("a").asInstanceOf[JArray]
    val b = a.elem.asInstanceOf[JStruct].fieldMap("b").asInstanceOf[JArray]
    val c = b.elem.asInstanceOf[JStruct].fieldMap("c")
    assert(c.asInstanceOf[JPrim].t == PrimT.INT32)
    assert(a.elem.name.contains("json_a_array_item"))
  }

  // DebeziumJsonDeserializerTest.java:651-672 — null array elements
  test("all-null array elements produce empty struct element schema") {
    val (s, v) = infer("""[null, null]""", osf).get
    val arr = s.asInstanceOf[JArray]
    assert(arr.elem == JStruct(Nil, true, Some("json_array_item")))
    assert(v == List(null, null))
  }

  test("array with some null elements keeps nulls in values") {
    val (s, v) = infer("""[{"foo": 1}, null]""", osf).get
    val elem = s.asInstanceOf[JArray].elem.asInstanceOf[JStruct]
    assert(elem.fieldMap.contains("foo"))
    val vs = v.asInstanceOf[List[Any]]
    assert(vs.size == 2 && vs(1) == null)
  }

  // DebeziumJsonDeserializerTest.java:755-778,801-839 — ignored fields
  test("ignored fields are pruned during inference, including [] paths") {
    val opts = InferOptions(ignoredFields = Seq("json[].ignored", "json.nested.again[].nay", "json.baz", "json.ignored.yes"))
    val s = schemaOf("""[{"kept": 1, "ignored": "x"}]""", opts)
    val elem = s.asInstanceOf[JArray].elem.asInstanceOf[JStruct]
    assert(elem.fieldMap.contains("kept") && !elem.fieldMap.contains("ignored"))

    val s2 = schemaOf("""{"baz": 1, "nested": {"again": [{"nay": 2, "yay": 3}]}}""", opts)
    val st2 = s2.asInstanceOf[JStruct]
    assert(!st2.fieldMap.contains("baz"))
    val again = st2.fieldMap("nested").asInstanceOf[JStruct].fieldMap("again").asInstanceOf[JArray].elem.asInstanceOf[JStruct]
    assert(again.fieldMap.contains("yay") && !again.fieldMap.contains("nay"))
  }

  test("ignoring the whole column drops it") {
    val opts = InferOptions(ignoredFields = Seq("json"))
    assert(infer("""{"a": 1}""", opts).isEmpty)
  }

  // Unparseable JSON throws (DebeziumJsonDeserializer.java:188-193)
  test("unparseable JSON throws JsonParseException") {
    intercept[JsonParseException] { infer("""{"foo": unquoted}""") }
  }

  // --- Schema union: SchemaTransformerTest.java ---

  // SchemaTransformerTest.java:15-31 — idempotence
  test("union is idempotent") {
    val a = schemaOf("""{"foo": "x", "bar": 1}""")
    assert(SchemaUnion.union2(a, a) == SchemaUnion.union2(SchemaUnion.union2(a, a), a))
  }

  // SchemaTransformerTest.java:33-56 — nested struct merge
  test("union merges nested structs") {
    val a = schemaOf("""{"outer": {"a": 1}}""")
    val b = schemaOf("""{"outer": {"b": "s"}}""")
    val u = SchemaUnion.union2(a, b).asInstanceOf[JStruct]
    val outer = u.fieldMap("outer").asInstanceOf[JStruct]
    assert(outer.fieldMap.contains("a") && outer.fieldMap.contains("b"))
    assert(outer.fieldMap("a").optional && outer.fieldMap("b").optional)
  }

  // SchemaTransformerTest.java:58-82 — determinism/commutativity
  test("union is commutative up to determinism (sorted fields)") {
    val a = schemaOf("""{"zeta": 1, "alpha": "x"}""")
    val b = schemaOf("""{"mid": true}""")
    val u1 = SchemaUnion.union2(a, b).asInstanceOf[JStruct]
    val u2 = SchemaUnion.union2(b, a).asInstanceOf[JStruct]
    assert(u1.fields.map(_._1) == Seq("alpha", "mid", "zeta"))
    assert(u1.fields == u2.fields)
  }

  test("union of different types throws") {
    intercept[IllegalArgumentException] {
      SchemaUnion.union2(schemaOf("\"s\""), schemaOf("1"))
    }
    intercept[IllegalArgumentException] {
      SchemaUnion.union2(schemaOf("""["a"]"""), schemaOf("""[1]"""))
    }
  }

  test("union keeps first schema's name") {
    val a = JPrim(PrimT.STRING, false, Some("first"))
    val b = JPrim(PrimT.STRING, true, Some("second"))
    val u = SchemaUnion.union2(a, b)
    assert(u.name.contains("first") && u.optional) // optionality contagious
  }

  // --- Registry semantics: DebeziumJsonDeserializerTest.java:449-504,605-649 ---

  test("union across messages widens the registry entry") {
    val reg = new SchemaRegistry(optionalStructFields = true)
    val t = "topic"
    def obs(json: String): JType =
      reg.observe(t, "json", schemaOf(json, osf))._1
    val s1 = obs("""{"foo": "da value"}""")
    assert(s1.asInstanceOf[JStruct].fieldMap.contains("foo"))
    assert(!s1.asInstanceOf[JStruct].fieldMap.contains("bar"))
    val s2 = obs("""{"bar": "oh a value"}""")
    assert(s2.asInstanceOf[JStruct].fieldMap.contains("foo") && s2.asInstanceOf[JStruct].fieldMap.contains("bar"))
    val s3 = obs("""{"foo": "way", "bar": "plop"}""")
    assert(s2 == s3) // same union-widened schema (DebeziumJsonDeserializerTest.java:484)
    val s4 = obs("""{"foo": "way", "baz": {"one": 1}}""")
    val st4 = s4.asInstanceOf[JStruct]
    assert(st4.fieldMap.contains("foo") && st4.fieldMap.contains("bar") && st4.fieldMap.contains("baz"))
  }

  // DebeziumJsonDeserializerTest.java:506-550 — root literals fan out the registry
  test("root literals register separate incompatible schemas") {
    val reg = new SchemaRegistry(optionalStructFields = true)
    def obs(json: String): (JType, Int) = reg.observe("t", "json", schemaOf(json, osf))
    assert(obs("true")._1.asInstanceOf[JPrim].t == PrimT.BOOLEAN)
    assert(obs("500")._1.asInstanceOf[JPrim].t == PrimT.INT32)
    assert(obs("""{"enabled": true}""")._1.isInstanceOf[JStruct])
    val (s4, i4) = obs("false")
    assert(s4.asInstanceOf[JPrim].t == PrimT.BOOLEAN && i4 == 0)
    val (s5, i5) = obs("1000")
    assert(s5.asInstanceOf[JPrim].t == PrimT.INT32 && i5 == 1)
    assert(reg.get("t", "json").size == 3)
  }

  // DebeziumJsonDeserializerTest.java:605-649
  test("incompatible messages fan out, compatible ones re-union") {
    val reg = new SchemaRegistry(optionalStructFields = true)
    def obs(json: String): (JType, Int) = reg.observe("t", "json", schemaOf(json, osf))
    obs("""{"foo": "da value", "bar": "somethingElse"}""")
    val (s2, i2) = obs("""{"foo": ["oh a value"]}""")
    assert(i2 == 1) // own class: foo STRING vs ARRAY
    assert(s2.asInstanceOf[JStruct].fieldMap.contains("foo") && !s2.asInstanceOf[JStruct].fieldMap.contains("bar"))
    val (s3, i3) = obs("""{"foo": "way"}""")
    assert(i3 == 0 && s3.asInstanceOf[JStruct].fieldMap.contains("bar"))
    val (s4, _) = obs("""[{"un": 1}]""")
    assert(s4.isInstanceOf[JArray])
    val (s5, _) = obs("""[{"deux": 1}]""")
    val elem5 = s5.asInstanceOf[JArray].elem.asInstanceOf[JStruct]
    assert(elem5.fieldMap.contains("un") && elem5.fieldMap.contains("deux"))
  }

  // DebeziumJsonDeserializerTest.java:651-672
  test("null nested array elements union with previously seen structs") {
    val reg = new SchemaRegistry(optionalStructFields = true)
    def obs(json: String): JType = reg.observe("t", "json", schemaOf(json, osf))._1
    obs("""[{"bar": "da value", "foo": [{"meh": "yay"}]}]""")
    val s2 = obs("""[{"foo":[null]}]""")
    val elem = s2.asInstanceOf[JArray].elem.asInstanceOf[JStruct]
    assert(elem.fieldMap.contains("foo") && elem.fieldMap.contains("bar"))
  }

  // DebeziumJsonDeserializerTest.java:674-712 — config-seeded schema
  test("seeded initial schema is used and can union") {
    val seeded = """[{"type":"STRUCT","name":"json","isOptional":true,"fields":[{"name":"bar","index":0,"schema":{"type":"STRING","isOptional":true}},{"name":"foo","index":1,"schema":{"type":"STRING","isOptional":true}}]}]"""
    val reg = new SchemaRegistry(optionalStructFields = true)
    reg.seed("t", "json", JType.deserializeMany(seeded))
    val s = reg.observe("t", "json", schemaOf("""{"something_else": 1}""", osf))._1
    val st = s.asInstanceOf[JStruct]
    assert(st.fieldMap.contains("foo") && st.fieldMap.contains("bar") && st.fieldMap.contains("something_else"))
  }

  // --- serde round trips (utils/SchemaSerDer.java, SchemaDto.java) ---
  test("schema serde round-trips") {
    val schemas = Seq(
      schemaOf("""{"foo": "bar", "baz": [1, 2], "nested": {"a": true}}""", osf),
      schemaOf("""["x"]"""),
      schemaOf("3.5"))
    schemas.foreach { s =>
      assert(JType.deserialize(JType.serialize(s)) == s)
    }
    assert(JType.deserializeMany(JType.serializeMany(schemas)) == schemas)
  }

  test("registry serde round-trips") {
    val reg = new SchemaRegistry(optionalStructFields = true)
    reg.observe("topic.a", "json", schemaOf("""{"foo": 1}""", osf))
    reg.observe("topic.a", "json", schemaOf("""["x"]""", osf))
    reg.observe("topic.b", "metadata", schemaOf("true", osf))
    val restored = SchemaRegistry.deserialize(reg.serialize, optionalStructFields = true)
    assert(restored.entries == reg.entries)
  }

  // --- strict mapper (fast path): DebeziumJsonDeserializerTest.java:714-753 ---
  test("fast path maps onto known schema and rejects unknown fields") {
    val known = schemaOf("""{"foo": "x", "bar": 1}""", osf)
    val hit = StrictMapper.tryFastPath(List(known), JsonSchemaInfer.parse("""{"foo": "y"}"""), osf)
    assert(hit.isDefined && hit.get._1 == known)
    val miss = StrictMapper.tryFastPath(List(known), JsonSchemaInfer.parse("""{"quux": "?"}"""), osf)
    assert(miss.isEmpty)
  }

  test("fast path rejects value of wrong type (validation hook)") {
    val known = schemaOf("""{"foo": "x"}""", osf)
    // foo is STRING; an int value must miss so inference+union runs
    val miss = StrictMapper.tryFastPath(List(known), JsonSchemaInfer.parse("""{"foo": 5}"""), osf)
    assert(miss.isEmpty)
  }

  test("strict mapper honors required fields") {
    val known = schemaOf("""{"foo": "x"}""") // foo required
    intercept[SchemaMapException] {
      StrictMapper.mapJsonToSchema(known, JsonSchemaInfer.parse("""{}"""), defaults)
    }
  }

  // Invariant used by the engine's batch fast path (O13):
  // after union(inference(x), inference(y)) with osf, both x and y map strictly.
  test("union result accepts both inputs via strict mapper") {
    val x = """{"foo": "a", "n": 1}"""
    val y = """{"bar": [1, 2]}"""
    val u = SchemaUnion.union2(schemaOf(x, osf), schemaOf(y, osf), optionalStructFields = true)
    assert(StrictMapper.tryFastPath(List(u), JsonSchemaInfer.parse(x), osf).isDefined)
    assert(StrictMapper.tryFastPath(List(u), JsonSchemaInfer.parse(y), osf).isDefined)
  }

  // --- Spark DataType conversion ---
  test("toSpark maps types and nullability") {
    import org.apache.spark.sql.types._
    val s = schemaOf("""{"foo": "x", "n": 1, "big": 190000000000000100000, "arr": [1], "nested": {"b": true}}""", osf)
    val dt = s.toSpark.asInstanceOf[StructType]
    assert(dt("foo").dataType == StringType && dt("foo").nullable)
    assert(dt("n").dataType == IntegerType)
    assert(dt("big").dataType == DoubleType)
    assert(dt("arr").dataType == ArrayType(IntegerType, containsNull = true))
    assert(dt("nested").dataType.asInstanceOf[StructType]("b").dataType == BooleanType)
    assert(dt("nested").metadata.getString(JType.NameMetaKey) == "json_nested")
  }
}
