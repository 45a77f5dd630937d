package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Exprs
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native text-hash kernels. The composable-expression formulations
 * (split -> transform -> concat_ws -> hash) re-evaluate the full upstream
 * expression tree inside every higher-order-function lambda element (no
 * common-subexpression elimination across lambda scopes — profiled: 5000
 * docs x 52 shingles took ~10s because each shingle re-split the text
 * three times). These expressions tokenize once per row and never
 * materialize shingle strings at all — a shingle is an xxhash64 fold of
 * its w word hashes.
 */
object TextHashKernel {
  /** Lowercased word hashes (xxhash64 seed 42 over UTF-8 bytes) of
    * whitespace-separated tokens. */
  def wordHashes(text: UTF8String): Array[Long] = {
    if (text == null) return Array.empty
    val s = text.toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        val w = UTF8String.fromString(s.substring(start, i))
        out += MinHashSigExpr.hashUTF8(w, 42L)
      }
    }
    out.toArray
  }

  /** Distinct, sorted hashes of w-word shingles (hash = xx fold of the w
    * word hashes). Empty/short texts produce a single whole-text shingle,
    * mirroring Dedup.shingles' short-text behavior. */
  def shingleHashes(text: UTF8String, w: Int): UnsafeArrayData = {
    val words = wordHashes(text)
    val n = words.length - (w - 1)
    val hs: Array[Long] =
      if (n <= 0) {
        if (words.isEmpty) Array(MinHashSigExpr.hashUTF8(UTF8String.fromString(""), 42L))
        else Array(foldRange(words, 0, words.length))
      } else {
        val out = new Array[Long](n)
        var i = 0
        while (i < n) { out(i) = foldRange(words, i, i + w); i += 1 }
        out
      }
    val distinct = hs.distinct
    java.util.Arrays.sort(distinct)
    UnsafeArrayData.fromPrimitiveArray(distinct)
  }

  private def foldRange(words: Array[Long], from: Int, until: Int): Long = {
    var h = 0x9747b28cL
    var i = from
    while (i < until) { h = XXH64.hashLong(words(i), h); i += 1 }
    h
  }

  private val md5TL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5-derived 64-bit word hash: little-endian int64 of md5 bytes [8,16) —
    * the signed view of DuckDB's `md5_number_lower`, chosen so the SimHash
    * signature is reproducible in plain SQL (the correctness oracle
    * recomputes it); md5's diffusion is also the textbook SimHash choice. */
  def md5Lower(w: UTF8String): Long = {
    val md = md5TL.get()
    md.reset()
    val d = md.digest(w.getBytes)
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h
  }

  /** Lowercased md5 word hashes of whitespace-separated tokens. */
  def wordHashesMd5(text: UTF8String): Array[Long] = {
    if (text == null) return Array.empty
    val s = text.toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) out += md5Lower(UTF8String.fromString(s.substring(start, i)))
    }
    out.toArray
  }

  /** Deterministic token ids: unsigned md5Lower(word) mod `vocab` over the
    * lowercased whitespace tokens — the same word walk as [[wordHashesMd5]],
    * so the ids are reproducible in plain SQL as
    * `md5_number_lower(w) % vocab` (the correctness oracle recomputes them).
    * A stand-in for a real BPE vocabulary with the right column shape
    * (array<int>, bounded ids) for downstream token ops. */
  def tokenizeMd5(text: UTF8String, vocab: Int): UnsafeArrayData = {
    val words = wordHashesMd5(text)
    val out = new Array[Int](words.length)
    var i = 0
    while (i < words.length) {
      out(i) = java.lang.Long.remainderUnsigned(words(i), vocab.toLong).toInt
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Unsigned md5Lower(s) mod n — a SQL-reproducible deterministic shard
    * assignment (`md5_number_lower(s) % n` in the oracle). */
  def md5Mod(s: UTF8String, n: Int): Int =
    java.lang.Long.remainderUnsigned(md5Lower(s), n.toLong).toInt

  /** 64-bit SimHash over word hashes: bit votes +1/-1, sign collapse. */
  def simhash(text: UTF8String): Long = {
    val words = wordHashesMd5(text)
    val votes = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val h = words(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

case class ShingleHashesExpr(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires STRING, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernel.shingleHashes(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.TextHashKernel.shingleHashes($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash requires STRING, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernel.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.TextHashKernel.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
  override def prettyName: String = "simhash"
}

case class TokenizeMd5Expr(child: Expression, vocab: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"tokenize_md5 requires STRING, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernel.tokenizeMd5(input.asInstanceOf[UTF8String], vocab)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.TextHashKernel.tokenizeMd5($c, $vocab)")
  override protected def withNewChildInternal(newChild: Expression): TokenizeMd5Expr =
    copy(child = newChild)
  override def prettyName: String = "tokenize_md5"
}

case class Md5ModExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5_mod requires STRING, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernel.md5Mod(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.TextHashKernel.md5Mod($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Md5ModExpr =
    copy(child = newChild)
  override def prettyName: String = "md5_mod"
}

object TextHashExprs {
  def shingleHashes(text: Column, w: Int): Column =
    Exprs.column(ShingleHashesExpr(Exprs.expression(text), w))
  def simhash(text: Column): Column =
    Exprs.column(SimHashExpr(Exprs.expression(text)))
  def tokenizeMd5(text: Column, vocab: Int): Column =
    Exprs.column(TokenizeMd5Expr(Exprs.expression(text), vocab))
  def md5Mod(s: Column, n: Int): Column =
    Exprs.column(Md5ModExpr(Exprs.expression(s), n))
}
