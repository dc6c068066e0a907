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

  /** Σ aᵢ·bᵢ in double precision, via the native codegen'd
    * [[graft.expressions.FloatDotProduct]] (registered per-session by
    * [[graft.core.Tables.load]]). The higher-order-function equivalent
    * (`aggregate(zip_with(...))`) is CodegenFallback — ~40× slower on the
    * kNN/near-dup hot path. */
  def dot(a: Column, b: Column): Column = call_function("graft_fdot", a, b)

  /** ‖a‖₂ in double precision. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))
}
