package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Exprs
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * md5-based MinHash kernels — the SAME banding algorithm as
 * [[MinHashSigExpr]] but with every hash primitive reproducible in plain SQL
 * (DuckDB `md5_number_lower` = little-endian uint64 of md5 bytes [8,16)),
 * so the full candidate generation + verification is oracle-checkable:
 *
 *  - shingle hash: md5-lower-LE of the w-word shingle string;
 *  - permutation j: (a_j * (h mod M) + b_j) mod M over the Mersenne prime
 *    M = 2^31-1 (fits 64-bit signed products — no wraparound, which checked
 *    SQL arithmetic cannot express), a_j/b_j themselves md5-derived;
 *  - band key: md5-lower-LE of the band's signature slice joined by ','.
 *
 * The xxhash64 kernels stay the default for perf paths; this variant exists
 * so the MinHash pipeline itself has a correctness gate.
 */
object Md5MinHash {
  val M: Long = 2147483647L // 2^31 - 1

  private def pmod(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }

  def md5LowerLE(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h
  }

  // permutation coefficients, memoized per numHashes
  private val coefCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  def coefs(numHashes: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(numHashes, _ => {
      val a = Array.tabulate(numHashes)(j => pmod(md5LowerLE(s"mh_a_$j"), M - 1) + 1)
      val b = Array.tabulate(numHashes)(j => pmod(md5LowerLE(s"mh_b_$j"), M))
      (a, b)
    })

  /** Distinct, sorted md5 hashes of w-word shingles (lowercased words joined
    * by single spaces; short texts fall back to one whole-words shingle). */
  def shingleHashes(text: UTF8String, w: Int): UnsafeArrayData = {
    val words: Array[String] =
      if (text == null) Array.empty
      else text.toLowerCase.toString.split("\\s+").filter(_.nonEmpty)
    val n = words.length - (w - 1)
    val hs: Array[Long] =
      if (n <= 0) Array(md5LowerLE(words.mkString(" ")))
      else {
        val out = new Array[Long](n)
        var i = 0
        while (i < n) {
          val sb = new java.lang.StringBuilder(words(i))
          var j = 1
          while (j < w) { sb.append(' '); sb.append(words(i + j)); j += 1 }
          out(i) = md5LowerLE(sb.toString)
          i += 1
        }
        out
      }
    val distinct = hs.distinct
    java.util.Arrays.sort(distinct)
    UnsafeArrayData.fromPrimitiveArray(distinct)
  }

  /** Banded LSH keys from shingle hashes: sig[j] = min over shingles of
    * (a_j*(h mod M)+b_j) mod M; band key = md5 of the slice joined by ','. */
  def bandKeys(hashes: ArrayData, numHashes: Int, bands: Int): UnsafeArrayData = {
    val (a, b) = coefs(numHashes)
    val n = hashes.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < numHashes) {
      var k = 0
      var mn = Long.MaxValue
      while (k < n) {
        val hm = pmod(hashes.getLong(k), M)
        val p = (a(j) * hm + b(j)) % M
        if (p < mn) mn = p
        k += 1
      }
      sig(j) = mn
      j += 1
    }
    val r = numHashes / bands
    val out = new Array[Long](bands)
    var bi = 0
    while (bi < bands) {
      val sb = new java.lang.StringBuilder()
      var k = 0
      while (k < r) {
        if (k > 0) sb.append(',')
        sb.append(sig(bi * r + k))
        k += 1
      }
      out(bi) = md5LowerLE(sb.toString)
      bi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def shingleHashes(text: Column, w: Int): Column =
    Exprs.column(Md5ShingleHashesExpr(Exprs.expression(text), w))
  def minhashBands(hashes: Column, numHashes: Int, bands: Int): Column =
    Exprs.column(Md5MinHashBandsExpr(Exprs.expression(hashes), numHashes, bands))
}

case class Md5ShingleHashesExpr(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5_shingle_hashes requires STRING, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(input: Any): Any =
    Md5MinHash.shingleHashes(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Md5MinHash.shingleHashes($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): Md5ShingleHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "md5_shingle_hashes"
}

case class Md5MinHashBandsExpr(child: Expression, numHashes: Int, bands: Int) extends UnaryExpression {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_minhash_bands requires ARRAY<LONG>, got ${other.catalogString}")
    }
  override protected def nullSafeEval(input: Any): Any =
    Md5MinHash.bandKeys(input.asInstanceOf[ArrayData], numHashes, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Md5MinHash.bandKeys($c, $numHashes, $bands)")
  override protected def withNewChildInternal(newChild: Expression): Md5MinHashBandsExpr =
    copy(child = newChild)
  override def prettyName: String = "md5_minhash_bands"
}
