package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Hilbert curve index for 2-d data layout (Hilbert 1891; the clustering
  * curve behind Databricks liquid clustering and Hudi/Iceberg's
  * hilbert-sort OPTIMIZE modes). Z-order ([[ZOrderLayout]]) is the
  * simpler interleave but jumps across the key space at every power-of-2
  * boundary; the Hilbert curve visits every cell of the 2^bits × 2^bits
  * grid in a path whose CONSECUTIVE positions are always grid-adjacent,
  * so equal-size partitions of the curve get tighter (a, b) bounding
  * boxes — fewer files touched per box probe at 100 TB. q253 measures
  * exactly that as oracle-hashed integers.
  *
  * The standard xy2d loop (one step per bit, most-significant first)
  * carries mutable (x, y) state through conditional reflect+swap
  * rotations, so unlike Morton it has no closed per-bit form. It IS a
  * fixed `bits`-step unroll, and each step is pure integer CASE/div/mod
  * arithmetic — [[steps]] emits the three per-step expression texts
  * (quadrant digit accumulation, rotated x, rotated y) that both engines
  * run verbatim (modulo the integral-division token, the
  * [[ZOrderLayout.zText]] convention):
  *
  *   rx = (x DIV s) % 2; ry = (y DIV s) % 2   -- quadrant digit
  *   xl = x % s;         yl = y % s           -- quadrant-LOCAL coords
  *   d += s*s*(3*rx + (1-2*rx)*ry)            -- == s²·((3rx) XOR ry)
  *   (x, y) = ry==1 ? (xl, yl)
  *          : rx==1 ? (s-1-yl, s-1-xl)        -- reflect, then swap
  *          :         (yl, xl)                -- swap
  *
  * (the `3*rx + (1-2*rx)*ry` spelling replaces the XOR with arithmetic
  * on {0,1} digits — enumerating the four cases gives 0,1,3,2, the
  * Gray-code quadrant order — so no engine-specific bit operator is
  * needed). The textbook `rot` complements against the FULL grid
  * (`n-1-x`) and leaves already-consumed high bits dirty; reducing to
  * quadrant-local coordinates first is the equivalent overflow-safe
  * form (lower bits of `n-1-x` == `s-1-(x % s)`) — HilbertCurveSpec
  * pins equality with the textbook loop on full grids. Every
  * intermediate stays in [0, s): no negatives, no overflow on the
  * lattice. Codegen folds the whole unroll into one projection —
  * `bits` chained CASE steps per row, no UDF, no shuffle.
  */
object HilbertCurve {

  /** Per-step SQL texts, most-significant bit first. Step i rewrites
    * (`dn`, `xn`, `yn`) → the same names suffixed for the NEXT step; the
    * caller chains them (withColumn on Spark, CTEs on an oracle).
    * Returns (dExpr, xExpr, yExpr) over input names `(dn, xn, yn)` —
    * default `(d, x, y)` for the oracle CTE chain; [[withHilbert]]
    * passes collision-resistant `__hc_*` names so a caller frame that
    * happens to own columns d/x/y is never clobbered. */
  def steps(bits: Int, div: String, dn: String = "d", xn: String = "x",
      yn: String = "y"): Seq[(String, String, String)] = {
    require(bits >= 1 && bits <= 20, s"bits out of range: $bits")
    (bits - 1 to 0 by -1).map { i =>
      val s = 1L << i
      val rx = s"(($xn $div $s) % 2)"
      val ry = s"(($yn $div $s) % 2)"
      val xl = s"($xn % $s)"
      val yl = s"($yn % $s)"
      val dE = s"$dn + ${s * s} * (3 * $rx + (1 - 2 * $rx) * $ry)"
      val xE = s"CASE WHEN $ry = 1 THEN $xl WHEN $rx = 1 THEN ${s - 1} - $yl ELSE $yl END"
      val yE = s"CASE WHEN $ry = 1 THEN $yl WHEN $rx = 1 THEN ${s - 1} - $xl ELSE $xl END"
      (dE, xE, yE)
    }
  }

  /** Hilbert index as a Column: the native codegen'd
    * [[graft.expressions.HilbertIndex]] loop (`graft_hilbert`).
    * `a`/`b` must already be `bits`-wide codes (see
    * [[ZOrderLayout.quantize]]).
    *
    * Round-12 optimization note: this used to chain [[steps]] as ~6·bits
    * stacked Project expressions. The chain was semantically right but
    * executed at ~10 µs/row (the generated projection pipeline is too
    * large to JIT — q253's 600 k-row materialization alone cost ~6 s of
    * its 8.7 s), and every ACTION over the lazy frame re-planned and
    * re-compiled it (the q253 r9 driver-OOM lesson). The expression
    * computes the identical per-bit recurrence (HilbertCurveSpec pins
    * it against the textbook loop and the oracle keeps the [[cteChain]]
    * text), in a few hundred bytes of codegen. The checkpoint-once rule
    * for multi-job consumers still applies to whatever frame this lands
    * on, but the recompute is now one cheap projection. */
  def withHilbert(df: DataFrame, outCol: String, a: Column, b: Column,
      bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 20, s"bits out of range: $bits")
    graft.expressions.GraftFunctions.ensureRegistered(df.sparkSession)
    df.withColumn(outCol, org.apache.spark.sql.functions.call_function(
      "graft_hilbert", a.cast("long"), b.cast("long"),
      org.apache.spark.sql.functions.lit(bits)))
  }

  /** The same walk as chained oracle CTEs: `withName` is the seeded CTE
    * exposing columns (d, x, y, ...carry); returns the SQL text of a CTE
    * CHAIN `h0 AS (...), h1 AS (...), ...` whose last CTE is named
    * `outCte` and carries `d` = the Hilbert index (plus every column of
    * the seed CTE except x/y, listed in `carryCols`). */
  def cteChain(seedCte: String, outCte: String, carryCols: Seq[String],
      bits: Int, div: String): String = {
    val carry = carryCols.mkString(", ")
    val chain = steps(bits, div).zipWithIndex.map { case ((dE, xE, yE), i) =>
      val src = if (i == 0) seedCte else s"h${i - 1}"
      val name = if (i == bits - 1) outCte else s"h$i"
      s"$name AS (SELECT $carry, $dE AS d, $xE AS x, $yE AS y FROM $src)"
    }
    chain.mkString(",\n      ")
  }
}
