package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[HilbertCurve]]: the unrolled CASE walk against the textbook
  * xy2d loop (full grids — this caught the `s-1-x` vs local-coordinate
  * reflection bug), the bijection + ADJACENCY property that defines the
  * curve (consecutive indexes are always grid neighbors — Morton fails
  * this at every power-of-2 seam), and the q253 locality claim (Hilbert
  * partitions carry less bounding-box mass than Z-order's over the same
  * coded data). */
class HilbertCurveSpec extends SparkSpec {

  /** Textbook xy2d (Wikipedia spelling: full-grid complement in rot). */
  private def xy2dRef(n: Int, x0: Int, y0: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("withHilbert matches the textbook loop on the full 5-bit grid; bijection") {
    val s = spark; import s.implicits._
    val n = 32
    val grid = for (a <- 0 until n; b <- 0 until n) yield (a.toLong, b.toLong)
    val got = HilbertCurve.withHilbert(grid.toDF("a", "b"), "hd",
        col("a"), col("b"), 5)
      .orderBy("a", "b").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    got.foreach { case ((a, b), hd) =>
      assert(hd == xy2dRef(n, a.toInt, b.toInt), s"hilbert($a, $b)")
    }
    assert(got.map(_._2).distinct.length == n * n, "bijection")
  }

  test("graft_hilbert expression == the steps CTE chain the oracle runs (r12)") {
    // withHilbert switched from the 10-step column unroll to the native
    // codegen'd expression in round 12; the DuckDB oracle still runs the
    // steps text, so the two forms must stay bit-identical — pinned here
    // by evaluating the chain through Spark SQL on a full 4-bit grid,
    // plus null propagation (the unroll's CASEs propagated nulls).
    val s = spark; import s.implicits._
    val bits = 4
    val n = 1 << bits
    val grid = for (a <- 0 until n; b <- 0 until n) yield (a.toLong, b.toLong)
    val seeded = grid.toDF("a", "b")
      .withColumn("d", lit(0L)).withColumn("x", col("a"))
      .withColumn("y", col("b"))
    val chained = HilbertCurve.steps(bits, "DIV").foldLeft(seeded) {
      case (acc, (dE, xE, yE)) =>
        acc.select(col("a"), col("b"), expr(dE).as("d2"),
            expr(xE).as("x2"), expr(yE).as("y2"))
          .withColumnRenamed("d2", "d").withColumnRenamed("x2", "x")
          .withColumnRenamed("y2", "y")
    }.select(col("a"), col("b"), col("d"))
    val viaExpr = HilbertCurve.withHilbert(grid.toDF("a", "b"), "d",
      col("a"), col("b"), bits)
    assert(chained.orderBy("a", "b").collect().toSeq ==
      viaExpr.orderBy("a", "b").collect().toSeq)
    val withNull = Seq((Some(1L), Some(2L)), (None, Some(3L)),
      (Some(4L), None)).toDF("a", "b")
    val out = HilbertCurve.withHilbert(withNull, "d", col("a"), col("b"), bits)
      .select("d").collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out(1).isEmpty && out(2).isEmpty && out(0).nonEmpty)
  }

  test("adjacency: consecutive Hilbert indexes are grid neighbors (|Δa|+|Δb| == 1)") {
    val s = spark; import s.implicits._
    val n = 64 // 6-bit grid exercises a non-trivial rotation depth
    val grid = for (a <- 0 until n; b <- 0 until n) yield (a.toLong, b.toLong)
    val walk = HilbertCurve.withHilbert(grid.toDF("a", "b"), "hd",
        col("a"), col("b"), 6)
      .orderBy("hd").collect().map(r => (r.getLong(0), r.getLong(1)))
    walk.zip(walk.tail).foreach { case ((a1, b1), (a2, b2)) =>
      assert(math.abs(a1 - a2) + math.abs(b1 - b2) == 1L,
        s"jump between ($a1,$b1) and ($a2,$b2)")
    }
  }

  test("q253 census: Hilbert carries less box mass than Z-order, both balanced") {
    val out = graft.SparkEntry.queries("q253_hilbert_locality")(spark, sfDir)
      .collect()
    val byLayout = out.groupBy(_.getString(0))
    assert(byLayout.keySet == Set("hilbert", "zorder"))
    byLayout.foreach { case (layout, rows) =>
      assert(rows.length == 32, s"$layout partition count")
      val counts = rows.map(_.getLong(2))
      assert(counts.max - counts.min <= 1L, s"$layout balance")
    }
    def mass(l: String) = byLayout(l).map(_.getLong(3)).sum
    def touched(l: String) = byLayout(l).map(_.getInt(8)).sum
    assert(mass("hilbert") < mass("zorder"),
      s"box mass: hilbert=${mass("hilbert")} vs zorder=${mass("zorder")}")
    assert(touched("hilbert") <= touched("zorder"),
      s"touched: hilbert=${touched("hilbert")} vs zorder=${touched("zorder")}")
  }

  test("withHilbert never clobbers caller columns named d/x/y (ADVICE r9)") {
    val s = spark; import s.implicits._
    // frame that OWNS d/x/y: the unroll's carry columns must not eat them
    val df = Seq((3L, 5L, "dv", 7L, 9L)).toDF("a", "b", "d", "x", "y")
    val out = HilbertCurve.withHilbert(df, "hd", col("a"), col("b"), 5)
    assert(out.columns.toSeq == Seq("a", "b", "d", "x", "y", "hd"))
    val r = out.head()
    assert(r.getString(2) == "dv" && r.getLong(3) == 7L && r.getLong(4) == 9L,
      "caller d/x/y survive untouched")
    assert(r.getLong(5) == xy2dRef(32, 3, 5), "index still correct")
  }
}
