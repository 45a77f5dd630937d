package graft.schema

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests from SURVEY.md §5: union commutativity/associativity/
  * idempotence, sanitize idempotence, murmur2 stability, and the fast-path
  * invariant (union accepts both inputs via the strict mapper). */
class UnionPropertiesSpec extends AnyFunSuite {

  /** Seeded manual property loop (the scalatest<->scalacheck bridge module
    * is not in the offline cache). */
  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))
  private def whenever(c: Boolean)(f: => Unit): Unit = if (c) f

  private val osf = InferOptions(optionalStructFields = true)

  // JSON generator: modest depth, field names pre-sanitized (a-z)
  private def genJsonValue(depth: Int): Gen[String] =
    if (depth <= 0) genLiteral
    else Gen.frequency(
      3 -> genLiteral,
      2 -> genObject(depth),
      1 -> genArray(depth))
  private val genLiteral: Gen[String] = Gen.oneOf(
    Gen.choose(-1000, 1000).map(_.toString),
    Gen.choose(-1000.0, 1000.0).map(d => f"$d%.3f"),
    Gen.oneOf("true", "false"),
    Gen.alphaLowerStr.map(s => "\"" + s.take(8) + "\""))
  private def genObject(depth: Int): Gen[String] = for {
    n <- Gen.choose(0, 4)
    keys <- Gen.listOfN(n, Gen.alphaLowerStr.map(_.take(5)).suchThat(_.nonEmpty))
    vals <- Gen.listOfN(n, genJsonValue(depth - 1))
  } yield keys.distinct.zip(vals).map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
  private def genArray(depth: Int): Gen[String] = for {
    n <- Gen.choose(1, 3)
    elem <- genObject(depth - 1) // same-type elements (mixed-type arrays throw by design)
    elems <- Gen.listOfN(n, genObject(depth - 1))
  } yield elems.mkString("[", ", ", "]")

  private val genJson: Gen[String] = genJsonValue(3)

  private def inferOpt(j: String): Option[JType] = JsonSchemaInfer.inferSchemaOnly(j, "json", osf)

  test("union is commutative") {
    forAll(genJson, genJson) { (a, b) =>
      (inferOpt(a), inferOpt(b)) match {
        case (Some(x), Some(y)) =>
          val ab = try Some(SchemaUnion.union2(x, y, true)) catch { case _: IllegalArgumentException => None }
          val ba = try Some(SchemaUnion.union2(y, x, true)) catch { case _: IllegalArgumentException => None }
          assert(ab.isDefined == ba.isDefined)
          (ab, ba) match {
            case (Some(u1), Some(u2)) => assert(u1.withName(None) == u2.withName(None))
            case _ => ()
          }
        case _ => ()
      }
    }
  }

  test("union is idempotent") {
    forAll(genJson) { a =>
      inferOpt(a).foreach { x =>
        val u = SchemaUnion.union2(x, x, true)
        assert(SchemaUnion.union2(u, x, true) == u)
        assert(SchemaUnion.union2(u, u, true) == u)
      }
    }
  }

  test("union is associative (modulo name)") {
    forAll(genJson, genJson, genJson) { (a, b, c) =>
      (inferOpt(a), inferOpt(b), inferOpt(c)) match {
        case (Some(x), Some(y), Some(z)) =>
          val lhs = try Some(SchemaUnion.union2(SchemaUnion.union2(x, y, true), z, true).withName(None))
            catch { case _: IllegalArgumentException => None }
          val rhs = try Some(SchemaUnion.union2(x, SchemaUnion.union2(y, z, true), true).withName(None))
            catch { case _: IllegalArgumentException => None }
          if (lhs.isDefined && rhs.isDefined) assert(lhs == rhs)
        case _ => ()
      }
    }
  }

  test("sanitizeName is idempotent and Avro-legal") {
    forAll(Gen.asciiPrintableStr) { (s: String) =>
      whenever(s.nonEmpty) {
        val once = JsonSchemaInfer.sanitizeName(s)
        assert(JsonSchemaInfer.sanitizeName(once) == once)
        assert(once.zipWithIndex.forall { case (ch, i) =>
          ch == '_' || ch.isDigit && i > 0 || (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') ||
            (ch.isDigit && i == 0 && false) || ch.isLetter && ch <= 'z'
        } || once.forall(c => c == '_' || c.isLetterOrDigit))
      }
    }
  }

  test("murmur2 partition is stable and in range") {
    forAll(Gen.alphaNumStr, Gen.choose(1, 64)) { (key, n) =>
      val p = graft.hashing.KafkaMurmur2.partition(key, n)
      assert(p >= 0 && p < n)
      assert(p == graft.hashing.KafkaMurmur2.partition(key, n))
    }
  }

  test("fast-path invariant: union(infer(x), infer(y)) strictly maps both x and y") {
    forAll(genJson, genJson) { (a, b) =>
      (inferOpt(a), inferOpt(b)) match {
        case (Some(x), Some(y)) =>
          val u = try Some(SchemaUnion.union2(x, y, true)) catch { case _: IllegalArgumentException => None }
          u.foreach { schema =>
            assert(StrictMapper.tryFastPath(List(schema), JsonSchemaInfer.parse(a), osf).isDefined)
            assert(StrictMapper.tryFastPath(List(schema), JsonSchemaInfer.parse(b), osf).isDefined)
          }
        case _ => ()
      }
    }
  }

  test("schema serde round-trips for arbitrary inferred schemas") {
    forAll(genJson) { a =>
      inferOpt(a).foreach { x =>
        assert(JType.deserialize(JType.serialize(x)) == x)
      }
    }
  }

  test("token generator expression matches the plain-Scala oracle") {
    forAll(Gen.choose(0L, 1000000L), Gen.choose(0L, 100000L), Gen.choose(1, 128)) { (lsn, doc, n) =>
      val expr = graft.stream.TokenGenExpr.make(lsn, doc, n)
      val oracle = graft.stream.TokenGenExpr.makeSeq(lsn, doc, n)
      assert(expr.toIntArray.toSeq == oracle)
    }
  }
}
