package graft.operators

import graft.SparkSpec

class KMeansSpec extends SparkSpec {

  // 3 tight clusters around orthogonal corners of a 4-dim cube
  private def clusteredData: Seq[(Long, Array[Float])] = {
    val centers = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 30
    } yield {
      // deterministic jitter in [-0.5, 0.5)
      val jit = (d: Int) => (((ci * 97 + j * 31 + d * 13) % 10) - 5) / 10.0f
      ((ci * 30 + j).toLong, c.zipWithIndex.map { case (v, d) => v + jit(d) })
    }
  }

  test("recovers well-separated clusters exactly") {
    val s = spark
    import s.implicits._
    val df = clusteredData.toDF("vec_id", "embedding")
    val out = KMeans.lloyd(df, "vec_id", "embedding", k = 3, iters = 5)
      .as[(Long, Long)].collect().toMap
    // every true cluster maps to exactly one k-means cluster and the
    // 3 learned ids partition the 3 true groups perfectly
    val byTrue = out.groupBy { case (id, _) => id / 30 }
      .map { case (t, m) => t -> m.values.toSet }
    assert(byTrue.values.forall(_.size == 1), s"impure clusters: $byTrue")
    assert(byTrue.values.flatten.toSet.size == 3, "clusters must be distinct")
  }

  test("deterministic across runs") {
    val s = spark
    import s.implicits._
    val df = clusteredData.toDF("vec_id", "embedding")
    def run() = KMeans.lloyd(df, "vec_id", "embedding", k = 3, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(run() == run())
  }

  test("k larger than distinct points still assigns every row") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.lloyd(df, "vec_id", "embedding", k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L, 2L))
  }
}
