package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns, built
  * entirely from codegen'd higher-order functions (`transform`,
  * `zip_with`, `aggregate`) — no UDFs, so the whole similarity
  * pipeline stays inside WholeStageCodegen and scales columnar.
  *
  * All math is done in double: the fixtures store `array<float>`, and
  * cross-engine (Spark vs DuckDB oracle) parity needs one precision.
  */
object VectorFunctions {

  /** Cast an array<float> column to array<double>. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-fold sum of an array<double> (deterministic order — matches
    * DuckDB's list_reduce fold direction). */
  def arraySum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  def arrayMean(v: Column): Column = arraySum(v) / size(v)
}
