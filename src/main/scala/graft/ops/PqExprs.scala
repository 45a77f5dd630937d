package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Exprs
import org.apache.spark.sql.types._

/**
 * Native codegen kernels for product quantization. Semantically IDENTICAL
 * to the composed-Catalyst formulation (same md5-derived codebooks, same
 * left-fold order, same first-argmin tie rule — the DuckDB oracles pin
 * this), but ONE expression node instead of a few thousand: the literal
 * expansion (m x ksub folds of subDim terms each) cost ~2s of analysis +
 * codegen per plan at the gate shape, which dominated the operator's
 * runtime. The kernels also skip the per-element null checks Catalyst
 * `element_at` carries.
 */
object PqKernel {
  /** (codebooks[m][ksub][subDim], norms2[m][ksub]) — memoized per shape;
    * values re-derived from md5 exactly as [[Similarity.pqCentroid]]. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int),
      (Array[Array[Array[Double]]], Array[Array[Double]])]()

  def books(m: Int, ksub: Int, subDim: Int): (Array[Array[Array[Double]]], Array[Array[Double]]) =
    cache.computeIfAbsent((m, ksub, subDim), _ => {
      val cents = Array.tabulate(m, ksub)((mm, j) =>
        Similarity.pqCentroid(mm, j, subDim).toArray)
      val norms = Array.tabulate(m, ksub)((mm, j) =>
        cents(mm)(j).foldLeft(0.0)((s, x) => s + x * x))
      (cents, norms)
    })

  private def elem(vec: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)

  /** codes[mm] = first argmin_j of the left-fold squared distance. */
  def encode(vec: ArrayData, m: Int, ksub: Int, subDim: Int, isFloat: Boolean): UnsafeArrayData = {
    val (cents, _) = books(m, ksub, subDim)
    val out = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      val base = mm * subDim
      var bestJ = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        val c = cents(mm)(j)
        var d2 = 0.0
        var d = 0
        while (d < subDim) {
          val diff = elem(vec, base + d, isFloat) - c(d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; bestJ = j } // strict < = first argmin
        j += 1
      }
      out(mm) = bestJ
      mm += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** lut[mm][j] = left-fold dot of the mm-th subvector with centroid j. */
  def lut(vec: ArrayData, m: Int, ksub: Int, subDim: Int, isFloat: Boolean): ArrayData = {
    val (cents, _) = books(m, ksub, subDim)
    val rows = new Array[ArrayData](m)
    var mm = 0
    while (mm < m) {
      val base = mm * subDim
      val dps = new Array[Double](ksub)
      var j = 0
      while (j < ksub) {
        val c = cents(mm)(j)
        var dp = 0.0
        var d = 0
        while (d < subDim) { dp += elem(vec, base + d, isFloat) * c(d); d += 1 }
        dps(j) = dp
        j += 1
      }
      rows(mm) = UnsafeArrayData.fromPrimitiveArray(dps)
      mm += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }
}

sealed trait PqShape { self: UnaryExpression =>
  def dim: Int
  def m: Int
  def ksub: Int
  def subDim: Int = dim / m
  def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  def checkVec(name: String): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
        if m > 0 && ksub > 0 && m * (dim / m) == dim =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$name requires ARRAY<FLOAT|DOUBLE> and dim divisible by m, got ${t.catalogString}")
    }
}

case class PqCodesExpr(child: Expression, dim: Int, m: Int, ksub: Int)
    extends UnaryExpression with PqShape {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVec("pq_codes")
  override protected def nullSafeEval(input: Any): Any =
    PqKernel.encode(input.asInstanceOf[ArrayData], m, ksub, subDim, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.PqKernel.encode($c, $m, $ksub, $subDim, $isFloat)")
  override protected def withNewChildInternal(newChild: Expression): PqCodesExpr =
    copy(child = newChild)
  override def prettyName: String = "pq_codes"
}

case class PqLutExpr(child: Expression, dim: Int, m: Int, ksub: Int)
    extends UnaryExpression with PqShape {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVec("pq_lut")
  override protected def nullSafeEval(input: Any): Any =
    PqKernel.lut(input.asInstanceOf[ArrayData], m, ksub, subDim, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.PqKernel.lut($c, $m, $ksub, $subDim, $isFloat)")
  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
  override def prettyName: String = "pq_lut"
}

object PqExprs {
  def pqCodes(vec: Column, dim: Int, m: Int, ksub: Int): Column =
    Exprs.column(PqCodesExpr(Exprs.expression(vec), dim, m, ksub))
  def pqLut(vec: Column, dim: Int, m: Int, ksub: Int): Column =
    Exprs.column(PqLutExpr(Exprs.expression(vec), dim, m, ksub))
}
