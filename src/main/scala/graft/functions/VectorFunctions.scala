package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY §2.4).
  *
  * Everything is built from Spark's higher-order array functions
  * (`zip_with`/`aggregate`), which are codegen'd — the fold is a tight
  * sequential loop per row, no UDF serialization. Elements are cast
  * to double before arithmetic so the fold is bit-identical to the
  * DuckDB oracle's sequential double accumulation.
  */
object VectorFunctions {

  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-fold dot product: sum_i a_i * b_i. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
