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

  test("seed-1 selection plans as TakeOrderedAndProject, never a global window") {
    val s = spark
    import s.implicits._
    val e = clusteredData.toDF("vec_id", "embedding")
      .select($"vec_id".as("__id"), $"embedding".cast("array<float>").as("__v"))
    val p = KMeans.seedFirst(e).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(!p.contains("Window"), p.take(600))
  }

  test("no un-partitioned WindowExec anywhere in lloyd training") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[SparkPlan]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
        seen.add(qe.executedPlan)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    s.listenerManager.register(l)
    try {
      KMeans.lloyd(clusteredData.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 3, iters = 2).collect()
      // listener delivery is async on the bus: wait until the count is
      // stable for a beat before asserting over the captured plans
      var last = -1
      var tries = 0
      while (seen.size() != last && tries < 100) {
        last = seen.size(); tries += 1; Thread.sleep(100)
      }
      // AQE wraps the final plan in leaf-like nodes, so walk explicitly
      def badWindows(p: SparkPlan): Seq[WindowExec] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        (p match {
          case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
          case _ => Nil
        }) ++ kids.flatMap(badWindows)
      }
      import scala.jdk.CollectionConverters._
      val bad = seen.asScala.toSeq.flatMap(badWindows)
      assert(bad.isEmpty,
        s"single-task windows in training plans:\n${bad.mkString("\n")}")
    } finally s.listenerManager.unregister(l)
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

  test("k exceeding the DISTINCT vector count: duplicate seeds, empty clusters, total assignment") {
    val s = spark
    import s.implicits._
    // 4 rows but only 2 distinct vectors, k = 3: farthest-first must pick
    // a duplicate seed (max distance 0 after round 2), some cluster ends
    // empty every iteration (keeping its previous centroid), and the
    // argmin tie rule must still assign EVERY row deterministically
    val df = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(1f, 0f)), (4L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    def run() = KMeans.lloyd(df, "vec_id", "embedding", k = 3, iters = 3)
      .as[(Long, Long)].collect().toMap
    val out = run()
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    // identical vectors land in the same cluster (tie broken on cluster id)
    assert(out(1L) == out(3L) && out(2L) == out(4L))
    assert(out(1L) != out(2L), "the two distinct vectors must separate")
    assert(run() == out, "degenerate-k path must stay deterministic")
  }
}
