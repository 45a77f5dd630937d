package graft.schema

/** Thrown when two schemas cannot be structurally unioned
  * (`json/SchemaTransformer.java:225-227,229-236`). */
class SchemaUnionException(msg: String) extends IllegalArgumentException(msg)

/**
 * Structural schema union — semantic port of
 * `SchemaTransformer.unionSchemas` (`json/SchemaTransformer.java:208-290`):
 *
 *  - inputs must share a top-level type, else throws;
 *  - ARRAY: element types must match, elements union recursively;
 *  - STRUCT: field-name union with names sorted alphabetically (determinism,
 *    pinned by `SchemaTransformerTest.java:58-82`); a field missing from any
 *    input becomes optional; `optionalStructFields` forces optional;
 *  - name taken from the first schema;
 *  - optionality is contagious: any optional input -> optional result.
 */
object SchemaUnion {

  def union2(a: JType, b: JType, optionalStructFields: Boolean = false): JType =
    union(Seq(a, b), optionalStructFields)

  def union(schemas: Seq[JType], optionalStructFields: Boolean): JType = {
    require(schemas.nonEmpty, "We can't union-ize an empty list of schemas.")
    val head = schemas.head
    val anyOptional = schemas.exists(_.optional)

    val merged: JType = head match {
      case _: JArray =>
        val elems = schemas.map {
          case JArray(e, _, _) => e
          case other => throw new SchemaUnionException(
            s"We can only union schemas of the same type together. Found: ARRAY and ${typeOf(other)}")
        }
        val elemTypes = elems.map(typeOf).distinct
        if (elemTypes.size > 1)
          throw new SchemaUnionException(
            s"We can only union array schemas of the same value type together. Found: ${elemTypes.mkString(" and ")}")
        JArray(union(elems, optionalStructFields), optional = false, name = head.name)

      case _: JStruct =>
        val structs = schemas.map {
          case s: JStruct => s
          case other => throw new SchemaUnionException(
            s"We can only union schemas of the same type together. Found: STRUCT and ${typeOf(other)}")
        }
        // name -> all schemas seen for that field, in input order
        val byName = scala.collection.mutable.LinkedHashMap.empty[String, Vector[JType]]
        structs.foreach(_.fields.foreach { case (fn, ft) =>
          byName(fn) = byName.getOrElse(fn, Vector.empty) :+ ft
        })
        val fields = byName.keys.toSeq.sorted.map { fn =>
          val fschemas = byName(fn)
          val u = union(fschemas, optionalStructFields)
          val opt = fschemas.size != schemas.size || optionalStructFields || u.optional
          fn -> u.withOptional(opt)
        }
        JStruct(fields, optional = false, name = head.name)

      case JPrim(t, _, _) =>
        schemas.foreach { s =>
          if (typeOf(s) != t.wire)
            throw new SchemaUnionException(
              s"We can only union schemas of the same type together. Found: ${t.wire} and ${typeOf(s)}")
        }
        JPrim(t, optional = false, name = head.name)
    }

    merged.withOptional(anyOptional || merged.optional)
  }

  private def typeOf(t: JType): String = t match {
    case JPrim(p, _, _) => p.wire
    case _: JArray => "ARRAY"
    case _: JStruct => "STRUCT"
  }

  /** Union `incoming` into a registry-style list of mutually-incompatible
    * schemas (`smt/DebeziumJsonDeserializer.java:219-255`): first entry that
    * unions successfully is widened in place; if none, `incoming` is
    * appended. Returns (updated list, index the row unified with). */
  def unionIntoList(known: List[JType], incoming: JType, optionalStructFields: Boolean): (List[JType], Int) = {
    var i = 0
    known.foreach { k =>
      try {
        val u = union2(k, incoming, optionalStructFields)
        return (known.updated(i, u), i)
      } catch { case _: SchemaUnionException | _: IllegalArgumentException => i += 1 }
    }
    (known :+ incoming, known.size)
  }

  /** Merge two registry lists (used by the distributed inference aggregate's
    * merge side). Order-dependent like the reference registry, but the union
    * operation itself is order-insensitive (`SchemaTransformerTest.java:58-82`). */
  def mergeLists(a: List[JType], b: List[JType], optionalStructFields: Boolean): List[JType] =
    b.foldLeft(a) { case (acc, s) => unionIntoList(acc, s, optionalStructFields)._1 }
}
