package graft.schema

import org.apache.spark.sql.types._
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/**
 * Connect-style schema AST for the JSON schema-inference/union subsystem.
 *
 * The reference (birdiecare/connect-smts) models inferred JSON schemas as
 * Kafka Connect `Schema` trees carrying (type, isOptional, name) at every
 * level (`json/SchemaTransformer.java:50-124`). Spark's `DataType` cannot
 * carry a per-node name or a top-level optional flag, so the engine keeps
 * this small AST for inference/union/registry logic and converts to Spark
 * `StructType`/`DataType` (names preserved in `Metadata`) only at the edge
 * where `from_json` is applied.
 */
sealed trait JType {
  def optional: Boolean
  def name: Option[String]
  def withOptional(o: Boolean): JType
  def withName(n: Option[String]): JType

  /** Spark DataType equivalent; names land in field metadata. */
  def toSpark: DataType = this match {
    case JPrim(t, _, _) => t.sparkType
    case JArray(elem, _, _) => ArrayType(elem.toSpark, containsNull = true)
    case JStruct(fields, _, _) =>
      StructType(fields.map { case (fname, ft) =>
        val mb = new MetadataBuilder()
        ft.name.foreach(n => mb.putString(JType.NameMetaKey, n))
        StructField(fname, ft.toSpark, nullable = ft.optional, mb.build())
      })
  }
}

object JType {
  /** Metadata key carrying the Connect-style schema name on struct fields. */
  val NameMetaKey = "connect.name"

  private val mapper = new ObjectMapper()

  /**
   * JSON serde mirroring the reference's SchemaDto wire format
   * (`utils/SchemaDto.java:10-70`, `utils/SchemaSerDer.java:11-40`):
   * `{type, name?, isOptional, valueSchema?, fields?: [{name, index, schema}]}`.
   * Used for registry persistence in table metadata and config seeding.
   */
  def serialize(t: JType): String = mapper.writeValueAsString(toNode(t))

  def serializeMany(ts: Seq[JType]): String = {
    val arr = mapper.createArrayNode()
    ts.foreach(t => arr.add(toNode(t)))
    mapper.writeValueAsString(arr)
  }

  private def toNode(t: JType): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("type", typeName(t))
    t.name.foreach(n => o.put("name", n))
    o.put("isOptional", t.optional)
    t match {
      case JArray(elem, _, _) => o.set[ObjectNode]("valueSchema", toNode(elem))
      case JStruct(fields, _, _) =>
        val arr = mapper.createArrayNode()
        fields.zipWithIndex.foreach { case ((fname, ft), i) =>
          val f = mapper.createObjectNode()
          f.put("name", fname); f.put("index", i)
          f.set[ObjectNode]("schema", toNode(ft))
          arr.add(f)
        }
        o.set[ArrayNode]("fields", arr)
      case _ => ()
    }
    o
  }

  private def typeName(t: JType): String = t match {
    case JPrim(p, _, _) => p.wire
    case _: JArray => "ARRAY"
    case _: JStruct => "STRUCT"
  }

  def deserialize(s: String): JType = fromNode(mapper.readTree(s))

  def deserializeMany(s: String): Seq[JType] = {
    val n = mapper.readTree(s)
    require(n.isArray, s"Expected a JSON array of schemas, got: $s")
    n.elements().asScala.map(fromNode).toSeq
  }

  private def fromNode(n: com.fasterxml.jackson.databind.JsonNode): JType = {
    val tpe = n.path("type").asText()
    val name = Option(n.get("name")).filter(!_.isNull).map(_.asText())
    val opt = n.path("isOptional").asBoolean(false)
    tpe match {
      case "ARRAY" => JArray(fromNode(n.get("valueSchema")), opt, name)
      case "STRUCT" =>
        val fields = n.path("fields").elements().asScala.toSeq
          .sortBy(_.path("index").asInt())
          .map(f => f.path("name").asText() -> fromNode(f.get("schema")))
        JStruct(fields, opt, name)
      case p => JPrim(PrimT.fromWire(p), opt, name)
    }
  }
}

/** Primitive Connect types used by the reference (`json/SchemaTransformer.java:25-31`). */
sealed abstract class PrimT(val wire: String, val sparkType: DataType) {
  def isNumber: Boolean = PrimT.numberTypes(this)
}
object PrimT {
  case object BOOLEAN extends PrimT("BOOLEAN", BooleanType)
  case object INT8 extends PrimT("INT8", ByteType)
  case object INT16 extends PrimT("INT16", ShortType)
  case object INT32 extends PrimT("INT32", IntegerType)
  case object INT64 extends PrimT("INT64", LongType)
  case object FLOAT32 extends PrimT("FLOAT32", FloatType)
  case object FLOAT64 extends PrimT("FLOAT64", DoubleType)
  case object STRING extends PrimT("STRING", StringType)
  case object BYTES extends PrimT("BYTES", BinaryType)

  val all: Seq[PrimT] = Seq(BOOLEAN, INT8, INT16, INT32, INT64, FLOAT32, FLOAT64, STRING, BYTES)
  // Widenable-to-double set: `json/SchemaTransformer.java:25-31`.
  val numberTypes: Set[PrimT] = Set(INT8, INT16, INT32, INT64, FLOAT32)
  def fromWire(s: String): PrimT =
    all.find(_.wire == s).getOrElse(throw new IllegalArgumentException(s"Unknown schema type: $s"))
}

final case class JPrim(t: PrimT, optional: Boolean, name: Option[String] = None) extends JType {
  def withOptional(o: Boolean): JType = copy(optional = o)
  def withName(n: Option[String]): JType = copy(name = n)
}
final case class JArray(elem: JType, optional: Boolean, name: Option[String] = None) extends JType {
  def withOptional(o: Boolean): JType = copy(optional = o)
  def withName(n: Option[String]): JType = copy(name = n)
}
final case class JStruct(fields: Seq[(String, JType)], optional: Boolean, name: Option[String] = None) extends JType {
  def withOptional(o: Boolean): JType = copy(optional = o)
  def withName(n: Option[String]): JType = copy(name = n)
  def fieldMap: Map[String, JType] = fields.toMap
}
