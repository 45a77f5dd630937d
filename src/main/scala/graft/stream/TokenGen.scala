package graft.stream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Exprs
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/**
 * Deterministic token-array generator as a native Catalyst expression:
 * tokens[i] = (lsn*31 + i*7 + doc*13) mod 50000 for i in [0, n).
 *
 * The naive `transform(sequence(...), ...)` formulation evaluates Spark's
 * higher-order lambda interpreter per element (no codegen, boxed longs):
 * profiled as the #1 CPU sink of the synthetic change stream and the main
 * GC-pressure source killing 16->32 thread scaling. This expression emits a
 * tight primitive loop (doGenCode) and builds the array via
 * UnsafeArrayData.fromPrimitiveArray — zero boxing.
 */
case class TokenGenExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  // first = lsn (long), second = docIdx (long), third = nTok (int)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = first.nullable || second.nullable || third.nullable

  override protected def nullSafeEval(lsnV: Any, docV: Any, nV: Any): Any = {
    TokenGenExpr.make(lsnV.asInstanceOf[Long], docV.asInstanceOf[Long], nV.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lsn, doc, n) =>
      s"graft.stream.TokenGenExpr.make($lsn, $doc, $n)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): TokenGenExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "token_gen"
}

object TokenGenExpr {
  /** Shared kernel for interpreted eval, codegen, and the plain-Scala test
    * oracle: identical arithmetic in all three. */
  def make(lsn: Long, doc: Long, n: Int): UnsafeArrayData = {
    val out = new Array[Int](n)
    var i = 0
    val base = lsn * 31L + doc * 13L
    while (i < n) {
      out(i) = java.lang.Math.floorMod(base + i * 7L, 50000L).toInt
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Oracle-side (driver) version returning a plain Seq. */
  def makeSeq(lsn: Long, doc: Long, n: Int): Seq[Int] =
    (0 until n).map(i => java.lang.Math.floorMod(lsn * 31L + doc * 13L + i * 7L, 50000L).toInt)

  def tokens(lsn: Column, doc: Column, n: Column): Column =
    Exprs.column(TokenGenExpr(Exprs.expression(lsn), Exprs.expression(doc), Exprs.expression(n)))
}
