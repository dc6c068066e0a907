package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OPQ-style rotation for product quantization (Ge, He, Ke, Sun,
  * "Optimized Product Quantization", CVPR 2013 — the parametric/
  * eigenvalue-allocation variant): decorrelate embeddings with PCA,
  * then PERMUTE the rotated dimensions so every PQ subspace carries a
  * balanced share of the variance (greedy assignment of eigenvalues,
  * largest first, to the subspace with the smallest variance product —
  * Ge et al. §4.1). An orthogonal rotation preserves every L2 distance,
  * so ADC/rerank semantics are unchanged while each subspace codebook
  * quantizes a comparable energy budget — the classic fix for PQ's
  * weakness on correlated dimensions.
  *
  * Scale shape: the covariance accumulates in ONE narrow pass —
  * per-partition (n, Σx, Σxxᵀ) via mapPartitions, combined driver-side
  * (O(parts·d²) doubles total, d=64 → 4 KB/partition); the d×d Jacobi
  * eigensolve is driver-side and microseconds at these d. The model is
  * a d×d matrix broadcast once; transform is a narrow typed map — no
  * shuffle anywhere. Never collects data rows.
  */
object Opq {

  /** Learned whitening-free rotation: y = rows · (x − mean). `rows(t)`
    * is the eigenvector assigned to output position t (subspace t/sub);
    * `eigvals(t)` its variance, for audit. Orthonormal by construction. */
  final case class OpqModel(mean: Array[Double], rows: Array[Array[Double]],
      eigvals: Array[Double]) {
    def dim: Int = mean.length
  }

  /** One-pass (n, mean, population covariance) of `vecCol`. */
  def moments(embs: DataFrame, vecCol: String, dim: Int)
      : (Long, Array[Double], Array[Array[Double]]) = {
    val spark = embs.sparkSession
    import spark.implicits._
    val d = dim
    val parts = embs.select(col(vecCol).cast("array<float>"))
      .as[Array[Float]]
      .mapPartitions { it =>
        var n = 0L
        val s = new Array[Double](d)
        val ss = new Array[Double](d * d)
        it.foreach { v =>
          require(v.length == d, s"vector dim ${v.length} != $d")
          n += 1
          var i = 0
          while (i < d) {
            val vi = v(i).toDouble
            s(i) += vi
            var j = i // symmetric: accumulate upper triangle only
            while (j < d) { ss(i * d + j) += vi * v(j); j += 1 }
            i += 1
          }
        }
        Iterator.single((n, s, ss))
      }
      .collect()
    val n = parts.map(_._1).sum
    require(n > 0, "moments of an empty vector column")
    val sum = new Array[Double](d)
    val ss = new Array[Double](d * d)
    parts.foreach { case (_, s, q) =>
      var i = 0
      while (i < d * d) { ss(i) += q(i); if (i < d) sum(i) += s(i); i += 1 }
    }
    val mean = sum.map(_ / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      ss(a * d + b) / n - mean(i) * mean(j)
    }
    (n, mean, cov)
  }

  /** Driver-side cyclic Jacobi eigensolver for a symmetric matrix:
    * (eigenvalues desc, matching orthonormal eigenvectors as ROWS).
    * Deterministic; converges quadratically — d=64 is microseconds. */
  def jacobiEigen(a0: Array[Array[Double]], maxSweeps: Int = 64,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol * 1e-4) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta match { case 0.0 => 1.0; case th => th }) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(p)(i); val viq = v(q)(i)
              v(p)(i) = c * vip - s * viq
              v(q)(i) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { off = math.max(off, math.abs(a(i)(j))); j += 1 }
        i += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray, order.map(i => v(i)).toArray)
  }

  /** Ge et al. §4.1 eigenvalue allocation: assign eigen-directions,
    * largest eigenvalue first, to the subspace with the smallest
    * current log-variance product (capacity d/m each). Returns, per
    * output position t (subspace t/sub, slot t%sub), the index of the
    * eigen-direction placed there. */
  def eigenAllocation(eigvals: Array[Double], m: Int): Array[Int] = {
    val d = eigvals.length
    require(d % m == 0, s"dim $d must divide into m=$m subspaces")
    val sub = d / m
    val logSum = new Array[Double](m)
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer[Int]())
    // eigvals arrive desc from jacobiEigen; re-sort defensively
    val order = eigvals.indices.sortBy(i => -eigvals(i))
    order.foreach { e =>
      var best = -1; var bestLs = Double.MaxValue
      var j = 0
      while (j < m) {
        if (buckets(j).size < sub && logSum(j) < bestLs) {
          bestLs = logSum(j); best = j
        }
        j += 1
      }
      buckets(best) += e
      logSum(best) += math.log(math.max(eigvals(e), 1e-300))
    }
    buckets.flatMap(_.toSeq)
  }

  /** Fit the full model: covariance pass → Jacobi → eigenvalue
    * allocation → permuted-eigenvector rotation rows. */
  def fit(embs: DataFrame, vecCol: String, dim: Int, m: Int): OpqModel = {
    val (_, mean, cov) = moments(embs, vecCol, dim)
    val (vals, vecs) = jacobiEigen(cov)
    val perm = eigenAllocation(vals, m)
    OpqModel(mean, perm.map(vecs), perm.map(vals))
  }

  /** Rotate every vector: (idCol, vecCol as rotated array<float>).
    * Narrow typed map over the broadcast model — no shuffle. Pairwise
    * and query L2 distances are preserved exactly (orthogonal rows,
    * shared translation), so downstream PQ/ANN semantics carry over. */
  def transform(embs: DataFrame, idCol: String, vecCol: String,
      model: OpqModel): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    embs.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .map { case (id, x) => (id, transformOne(x, bc.value)) }
      .toDF(idCol, vecCol)
  }

  /** Rotate one vector (queries go through the same map as the corpus). */
  def transformOne(x: Array[Float], model: OpqModel): Array[Float] = {
    val d = model.dim
    require(x.length == d, s"vector dim ${x.length} != $d")
    Array.tabulate(d) { t =>
      val row = model.rows(t)
      var acc = 0.0; var i = 0
      while (i < d) { acc += row(i) * (x(i) - model.mean(i)); i += 1 }
      acc.toFloat
    }
  }
}
