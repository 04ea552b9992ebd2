package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Vector math over `array<float>` embedding columns (SURVEY §2.4).
  *
  * The dot product is a native Catalyst expression whose generated
  * code calls a tight primitive loop (no intermediate zipped array,
  * no boxing) — the hot path of every ANN/similarity operator. The
  * fold is sequential left-to-right over doubles, bit-identical to
  * DuckDB's list_dot_product on DOUBLE[] (verified by the oracle).
  */
object VectorKernels {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** float×float dot with DOUBLE accumulation: every product is
    * (double)a * (double)b, so the result is bit-identical to casting
    * both arrays to array<double> first (float→double is exact) —
    * without materializing the doubled-width copies.
    */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** float×double dot (e.g. raw embedding vs k-means centroid). */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    acc
  }
}

/** dot_product(array<double>, array<double>) → double.
  * ImplicitCastInputTypes: an array<float> embedding column passed
  * directly (e.g. via the SQL function, skipping toDouble) is cast to
  * array<double> by the analyzer instead of mis-reading 4-byte floats
  * as 8-byte doubles at runtime.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot product over array<float> / array<double> inputs in any
  * combination, accumulating in double — the hot path of every ANN
  * operator. Unlike [[DotProduct]] (which ImplicitCasts float arrays
  * to array<double>, materializing a 2×-width copy per row), this
  * dispatches to a per-type primitive loop at codegen time, so raw
  * float embeddings flow through scans, shuffles, and broadcasts at
  * float width. Values are bit-identical to the cast-then-dot form:
  * every product is computed as (double)a * (double)b and
  * float→double conversion is exact.
  */
case class DotProductAny(left: Expression, right: Expression)
    extends BinaryExpression {
  private def elem(e: Expression): DataType = e.dataType match {
    case ArrayType(t @ (org.apache.spark.sql.types.FloatType |
      DoubleType), _) => t
    case other => throw new IllegalArgumentException(
      s"dot requires array<float|double> input, got $other")
  }
  private lazy val kernel: String = (elem(left), elem(right)) match {
    case (org.apache.spark.sql.types.FloatType,
      org.apache.spark.sql.types.FloatType) => "dotFF"
    case (org.apache.spark.sql.types.FloatType, DoubleType) => "dotFD"
    case (DoubleType, org.apache.spark.sql.types.FloatType) => "dotFDrev"
    case _ => "dot"
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    kernel match {
      case "dotFF" => VectorKernels.dotFF(x, y)
      case "dotFD" => VectorKernels.dotFD(x, y)
      case "dotFDrev" => VectorKernels.dotFD(y, x)
      case _ => VectorKernels.dot(x, y)
    }
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => kernel match {
      case "dotFDrev" => s"graft.functions.VectorKernels.dotFD($b, $a)"
      case k => s"graft.functions.VectorKernels.$k($a, $b)"
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-fold dot product: sum_i a_i * b_i. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Type-dispatching dot: float and double arrays in any mix, no
    * widening cast materialized (see [[DotProductAny]]).
    */
  def dotAny(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductAny(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def normAny(a: Column): Column = sqrt(dotAny(a, a))

  /** Cosine over float/double arrays, bit-identical to
    * cosine(toDouble(a), toDouble(b)).
    */
  def cosineAny(a: Column, b: Column): Column =
    dotAny(a, b) / (normAny(a) * normAny(b))
}
