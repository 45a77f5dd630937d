package graft.schema

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/**
 * Known-schema registry: per (topic, field) an ordered list of mutually
 * incompatible schemas — the engine-side analog of the reference's
 * `ConcurrentHashMap<String, CopyOnWriteArrayList<Schema>>`
 * (`smt/DebeziumJsonDeserializer.java:56,174-181,219-253`).
 *
 * Unlike the reference (which forgets this state on restart unless re-seeded
 * from config), the engine persists the registry in the sink table's snapshot
 * metadata and restores it on resume — see `graft.table.IceLite`.
 */
final class SchemaRegistry(val optionalStructFields: Boolean = false) extends Serializable {
  private val known = new ConcurrentHashMap[String, List[JType]]()

  private def key(topic: String, field: String) = s"$topic|$field"

  def get(topic: String, field: String): List[JType] =
    known.getOrDefault(key(topic, field), Nil)

  def seed(topic: String, field: String, schemas: Seq[JType]): Unit =
    known.merge(key(topic, field), schemas.toList, (a, b) => a ++ b)

  /** Union an inferred schema into the registry; returns the schema the
    * record should be emitted under and its compatibility-class index. */
  def observe(topic: String, field: String, inferred: JType): (JType, Int) = {
    val k = key(topic, field)
    known.synchronized {
      val cur = known.getOrDefault(k, Nil)
      val (updated, idx) = SchemaUnion.unionIntoList(cur, inferred, optionalStructFields)
      known.put(k, updated)
      (updated(idx), idx)
    }
  }

  /** Replace the registry list wholesale (batch-level union result). */
  def put(topic: String, field: String, schemas: List[JType]): Unit =
    known.put(key(topic, field), schemas)

  def entries: Map[String, List[JType]] = known.asScala.toMap

  /** JSON for snapshot persistence: {"topic|field": "<serialized list>", ...} */
  def serialize: String = {
    val m = known.asScala.toSeq.sortBy(_._1).map { case (k, v) =>
      k -> JType.serializeMany(v)
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    m.foreach { case (k, v) => node.put(k, v) }
    mapper.writeValueAsString(node)
  }
}

object SchemaRegistry {
  def deserialize(json: String, optionalStructFields: Boolean = false): SchemaRegistry = {
    val reg = new SchemaRegistry(optionalStructFields)
    if (json == null || json.isEmpty) return reg
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    node.fields().asScala.foreach { e =>
      val Array(topic, field) = e.getKey.split("\\|", 2)
      reg.seed(topic, field, JType.deserializeMany(e.getValue.asText()))
    }
    reg
  }
}
