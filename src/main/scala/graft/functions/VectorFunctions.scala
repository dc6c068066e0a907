package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Column
  * expressions (codegen'd — no UDF boxing on the 100 TB path).
  *
  * Floats are widened to double BEFORE any multiply and summed
  * left-to-right, so DuckDB (`list_sum(list_transform(range(1,d+1),
  * i -> a[i]::DOUBLE * b[i]::DOUBLE))`) computes bit-identical values
  * for the oracle compare.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ in double precision. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))
}
