package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Pins [[Opq]]: the one-pass moment accumulator against a local
  * computation, the Jacobi eigensolve (A·v = λ·v, orthonormal, desc),
  * the Ge et al. eigenvalue-allocation balance, exact L2-distance
  * preservation of the rotation, and the end-to-end payoff — PQ
  * quantization error on cross-subspace-correlated data drops under
  * the OPQ transform. */
class OpqSpec extends SparkSpec {

  private def localMoments(rows: Seq[Array[Float]], d: Int)
      : (Array[Double], Array[Array[Double]]) = {
    val n = rows.size
    val mean = Array.tabulate(d)(i => rows.map(_(i).toDouble).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n)
    (mean, cov)
  }

  test("one-pass moments equal the local mean/covariance on the fixture") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, sfDir).select($"vec_id", $"embedding")
    val rows = e.select($"embedding").as[Array[Float]].collect().toSeq
    val (n, mean, cov) = Opq.moments(e, "embedding", 64)
    assert(n == rows.size)
    val (lm, lc) = localMoments(rows, 64)
    for (i <- 0 until 64) {
      assert(math.abs(mean(i) - lm(i)) < 1e-9, s"mean($i)")
      for (j <- 0 until 64)
        assert(math.abs(cov(i)(j) - lc(i)(j)) < 1e-7, s"cov($i)($j)")
    }
  }

  test("jacobiEigen: A v = lambda v, orthonormal rows, descending values") {
    val rnd = new scala.util.Random(5)
    val d = 12
    val b = Array.fill(d, d)(rnd.nextDouble() - 0.5)
    val a = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => b(i)(k) * b(j)(k)).sum) // SPD by construction
    val (vals, vecs) = Opq.jacobiEigen(a)
    assert(vals.zip(vals.tail).forall { case (x, y) => x >= y - 1e-12 }, "desc")
    for (k <- 0 until d) {
      val av = Array.tabulate(d)(i => (0 until d).map(j => a(i)(j) * vecs(k)(j)).sum)
      for (i <- 0 until d)
        assert(math.abs(av(i) - vals(k) * vecs(k)(i)) < 1e-8,
          s"eigenpair $k component $i")
    }
    for (k1 <- 0 until d; k2 <- k1 until d) {
      val dot = (0 until d).map(i => vecs(k1)(i) * vecs(k2)(i)).sum
      val want = if (k1 == k2) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-10, s"orthonormality ($k1,$k2)")
    }
  }

  test("eigenvalue allocation balances subspace log-variance products") {
    val vals = Array(100.0, 50.0, 10.0, 8.0, 4.0, 2.0, 1.0, 0.5)
    val perm = Opq.eigenAllocation(vals, m = 2)
    assert(perm.sorted.toSeq == (0 until 8), "a permutation")
    val halves = perm.grouped(4).toSeq
    val lp = halves.map(_.map(e => math.log(vals(e))).sum)
    // greedy max-min gap is bounded by one item's log-value
    assert(math.abs(lp(0) - lp(1)) <= math.log(vals.max) + 1e-9,
      s"log-products too far apart: $lp")
    // and is far tighter than the naive contiguous split (first-half
    // product / second-half product gap)
    val naive = Seq((0 until 4), (4 until 8)).map(_.map(e => math.log(vals(e))).sum)
    assert(math.abs(lp(0) - lp(1)) < math.abs(naive(0) - naive(1)),
      "allocation must beat the contiguous split")
  }

  test("transform preserves pairwise and query L2 distances exactly") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, sfDir).select($"vec_id", $"embedding")
    val model = Opq.fit(e, "embedding", 64, m = 8)
    // orthonormal rotation rows
    for (i <- 0 until 64 by 13; j <- i until 64 by 13) {
      val dot = (0 until 64).map(t => model.rows(i)(t) * model.rows(j)(t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"rows ($i,$j)")
    }
    val raw = e.as[(Long, Array[Float])].collect().sortBy(_._1).take(20)
    val rot = Opq.transform(e, "vec_id", "embedding", model)
      .as[(Long, Array[Float])].collect().toMap
    def d2(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum
    for (Seq((ia, va), (ib, vb)) <- raw.toSeq.combinations(2).take(80)) {
      val before = d2(va, vb)
      val after = d2(rot(ia), rot(ib))
      assert(math.abs(before - after) <= 1e-3 * (before + 1.0),
        s"pair ($ia,$ib): $before vs $after")
    }
  }

  test("OPQ never degrades PQ quantization error on the fixture embeddings") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, sfDir)
      .select($"vec_id", $"embedding").localCheckpoint()

    def mse(embs: org.apache.spark.sql.DataFrame): Double = {
      val model = ProductQuantizer.train(embs, "vec_id", "embedding", 64, 8, 16, iters = 3)
      val enc = ProductQuantizer.encode(embs, "vec_id", "embedding", model)
        .as[(Long, Array[Int])].collect().toMap
      val raw = embs.as[(Long, Array[Float])].collect()
      raw.map { case (id, v) =>
        val codes = enc(id)
        (0 until 64).map { t =>
          val j = t / 8
          val rec = model.codebooks(j)(codes(j))(t % 8)
          (v(t) - rec).toDouble * (v(t) - rec)
        }.sum
      }.sum / raw.length
    }

    val rawMse = mse(e)
    val model = Opq.fit(e, "embedding", 64, m = 8)
    val opqMse = mse(Opq.transform(e, "vec_id", "embedding", model).localCheckpoint())
    info(s"fixture PQ MSE raw=$rawMse opq=$opqMse (ratio ${opqMse / rawMse})")
    assert(opqMse <= rawMse * 1.05,
      s"OPQ must not degrade fixture quantization: raw=$rawMse opq=$opqMse")
  }

  test("OPQ transform cuts PQ quantization error on cross-subspace-correlated data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    // x = (g, g) + tiny noise: the two PQ subspaces (m=2, d=8) see
    // perfectly correlated copies — the regime plain PQ wastes bits on
    val data = (0 until 240).map { i =>
      val g = Array.fill(4)((rnd.nextGaussian() * 2.0).toFloat)
      val x = g ++ g.map(v => v + (rnd.nextGaussian() * 0.05).toFloat)
      (i.toLong, x)
    }
    val df = data.toDF("vec_id", "embedding").localCheckpoint()

    def mse(embs: org.apache.spark.sql.DataFrame): Double = {
      val model = ProductQuantizer.train(embs, "vec_id", "embedding", 8, 2, 8, iters = 3)
      val enc = ProductQuantizer.encode(embs, "vec_id", "embedding", model)
        .as[(Long, Array[Int])].collect().toMap
      val raw = embs.as[(Long, Array[Float])].collect()
      raw.map { case (id, v) =>
        val codes = enc(id)
        (0 until 8).map { t =>
          val j = t / 4
          val rec = model.codebooks(j)(codes(j))(t % 4)
          (v(t) - rec).toDouble * (v(t) - rec)
        }.sum
      }.sum / raw.length
    }

    val rawMse = mse(df)
    val model = Opq.fit(df, "embedding", 8, m = 2)
    val rotated = Opq.transform(df, "vec_id", "embedding", model).localCheckpoint()
    val opqMse = mse(rotated)
    // PCA concentrates the duplicated signal into 4 strong directions and
    // the allocation splits them evenly: each subspace quantizes ~2 live
    // dims instead of 4 — the error drop is structural, not noise
    assert(opqMse < rawMse * 0.8,
      s"OPQ must cut quantization MSE >=20%: raw=$rawMse opq=$opqMse")
  }
}
