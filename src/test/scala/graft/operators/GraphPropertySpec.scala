package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the three connected-components forms: on ANY
  * random graph, min-label propagation, alternating-star contraction,
  * and (via shared-bucket encoding) the bipartite form must all equal
  * an in-memory union-find. Spark-backed, so few-but-larger cases. */
class GraphPropertySpec extends SparkSpec {

  private def check[A](g: Gen[A], n: Int)(f: A => Boolean): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n),
      Prop.forAll(g)(f))
    assert(res.passed, res.status.toString)
  }

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private val edgeList: Gen[List[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 40L)))
      .map(_.filter { case (a, b) => a != b })

  test("minLabel and alternatingStar both equal union-find on random graphs") {
    val s = spark
    import s.implicits._
    check(edgeList, 12) { edges =>
      val truth = unionFind(edges)
      if (edges.isEmpty) {
        ConnectedComponents.minLabel(
          edges.toDF("src", "dst"), "src", "dst").count() == 0
      } else {
        val a = ConnectedComponents
          .minLabel(edges.toDF("src", "dst"), "src", "dst", maxIter = 100)
          .as[(Long, Long)].collect().toMap
        val b = ConnectedComponents
          .alternatingStar(edges.toDF("src", "dst"), "src", "dst")
          .as[(Long, Long)].collect().toMap
        a == truth && b == truth
      }
    }
  }

  test("bipartite bucket form equals union-find over its induced pair graph") {
    val s = spark
    import s.implicits._
    val memberships: Gen[List[(Long, String)]] =
      Gen.listOf(Gen.zip(Gen.choose(0L, 30L), Gen.choose(0, 12).map(i => s"b$i")))
        .map(_.distinct)
    check(memberships, 12) { ms =>
      val pairs = for {
        (a, ba) <- ms; (b, bb) <- ms if ba == bb && a < b
      } yield (a, b)
      val truth = unionFind(pairs.distinct)
      val got = ConnectedComponents
        .minLabelByBucket(ms.toDF("id", "bkt"), "id", "bkt")
        .as[(Long, Long)].collect().toMap
      got == truth
    }
  }
}
