package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Nearest-centroid assignment as a PURE PROJECTION: the centroid
  * matrix (k × dim doubles, driver-fit) rides into the generated code
  * as a reference object, so assigning the full corpus is one
  * codegen'd scan — no crossJoin(broadcast(centroids)) row blow-up,
  * no per-vector Window, no shuffle. This is the Lloyd's-iteration
  * hot path of [[graft.operators.Clustering]].
  *
  * Cosines are computed EXACTLY as the oracle states them —
  * dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) with sequential
  * double folds — so the argmax (strict >, ascending cell order ==
  * `ORDER BY cosine DESC, cell_id`) is bit-reproducible against
  * DuckDB.
  */
object CentroidKernels {
  private def dotVC(emb: ArrayData, c: Array[Double],
      isFloat: Boolean): Double = {
    val n = math.min(emb.numElements(), c.length)
    var acc = 0.0
    var i = 0
    if (isFloat) while (i < n) { acc += emb.getFloat(i).toDouble * c(i); i += 1 }
    else while (i < n) { acc += emb.getDouble(i) * c(i); i += 1 }
    acc
  }

  private def selfNorm(emb: ArrayData, isFloat: Boolean): Double = {
    val n = emb.numElements()
    var acc = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) {
        val v = emb.getFloat(i).toDouble; acc += v * v; i += 1
      }
    } else {
      while (i < n) { val v = emb.getDouble(i); acc += v * v; i += 1 }
    }
    Math.sqrt(acc)
  }

  /** Index (into the ascending-cell_id centroid order) of the
    * max-cosine centroid; strict > keeps the smallest cell on ties.
    */
  def nearestIdx(emb: ArrayData, cents: Array[Array[Double]],
      norms: Array[Double], isFloat: Boolean): Int = {
    val en = selfNorm(emb, isFloat)
    var best = Double.NegativeInfinity
    var bestJ = 0
    var j = 0
    while (j < cents.length) {
      val cos = dotVC(emb, cents(j), isFloat) / (en * norms(j))
      if (cos > best) { best = cos; bestJ = j }
      j += 1
    }
    bestJ
  }

  def nearestCell(emb: ArrayData, cents: Array[Array[Double]],
      cellIds: Array[Int], norms: Array[Double], isFloat: Boolean): Int =
    cellIds(nearestIdx(emb, cents, norms, isFloat))

  def nearestCos(emb: ArrayData, cents: Array[Array[Double]],
      norms: Array[Double], isFloat: Boolean): Double = {
    val j = nearestIdx(emb, cents, norms, isFloat)
    dotVC(emb, cents(j), isFloat) / (selfNorm(emb, isFloat) * norms(j))
  }

  /** v as its scale-4 decimal's unscaled long — EXACTLY
    * `cast(v as decimal(18,4))` (BigDecimal.valueOf → setScale(4,
    * HALF_UP), the rounding Spark's cast performs), as a raw integer.
    * Summing these longs is bit-equivalent to summing the decimals —
    * order-independent, overflow-safe to ~9e14 summed units — which
    * is what lets the k-means update run as primitive long
    * accumulators instead of per-row Decimal allocation.
    */
  def dec4Scaled(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValue()

  /** [[dec4Scaled]] at scale 12 — the LM-scoring precision: a
    * per-token `ln` term (|x| ≤ ~30) becomes an exact long ≤ 3·10¹³,
    * so per-doc sums stay order-free and overflow-safe through
    * 3·10⁵-token documents.
    */
  def dec12Scaled(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValue()
}

private[functions] trait CentroidBase extends UnaryExpression {
  def cents: Array[Array[Double]]
  def cellIds: Array[Int]
  protected lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"nearest_* requires array<float|double>, got $other")
  }
  // sqrt(dot(c,c)) per centroid, same sequential fold the oracle uses
  protected lazy val norms: Array[Double] = cents.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    Math.sqrt(acc)
  }
}

/** nearest_cell(emb) → int — cell_id of the max-cosine centroid. */
case class NearestCell(child: Expression, cellIds: Array[Int],
    cents: Array[Array[Double]]) extends CentroidBase {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    CentroidKernels.nearestCell(input.asInstanceOf[ArrayData], cents,
      cellIds, norms, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("cents", cents, "double[][]")
    val ids = ctx.addReferenceObj("cellIds", cellIds, "int[]")
    val nr = ctx.addReferenceObj("norms", norms, "double[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.CentroidKernels.nearestCell($x, $c, $ids, $nr, $isFloat)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** nearest_cos(emb) → double — cosine to the max-cosine centroid. */
case class NearestCos(child: Expression, cellIds: Array[Int],
    cents: Array[Array[Double]]) extends CentroidBase {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    CentroidKernels.nearestCos(input.asInstanceOf[ArrayData], cents,
      norms, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("cents", cents, "double[][]")
    val nr = ctx.addReferenceObj("norms", norms, "double[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.CentroidKernels.nearestCos($x, $c, $nr, $isFloat)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CentroidFunctions {
  /** cells must be sorted ascending by cell_id. */
  def nearest_cell(emb: Column, cells: Array[(Int, Array[Double])]): Column =
    ColumnBridge.column(NearestCell(ColumnBridge.expression(emb),
      cells.map(_._1), cells.map(_._2)))
  def nearest_cos(emb: Column, cells: Array[(Int, Array[Double])]): Column =
    ColumnBridge.column(NearestCos(ColumnBridge.expression(emb),
      cells.map(_._1), cells.map(_._2)))
}
