package graft.operators

import graft.SparkSpec

/** ConnectedComponents must compute the exact transitive closure — its
  * whole point over lshDropIds is exact recall. Truth computed with an
  * in-memory union-find. */
class ConnectedComponentsSpec extends SparkSpec {

  private def compute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    ConnectedComponents
      .minLabel(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
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

  test("matches union-find on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(200)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    assert(compute(edges) == unionFind(edges))
  }

  test("long chain converges (diameter >> 1)") {
    val chain = (0L until 20L).map(i => (i, i + 1))
    val got = compute(chain)
    assert(got.values.toSet == Set(0L), got.toString)
    assert(got.keySet == (0L to 20L).toSet)
  }

  test("two disjoint cliques get their own minimum labels") {
    val edges = Seq((10L, 11L), (11L, 12L), (10L, 12L), (50L, 51L))
    assert(compute(edges) ==
      Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 50L -> 50L, 51L -> 50L))
  }

  test("bipartite bucket form equals pair-list form on random memberships") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // 60 ids scattered over 25 buckets, some buckets singleton
    val members = (0 until 120)
      .map(_ => (rnd.nextInt(60).toLong, s"b${rnd.nextInt(25)}"))
      .distinct
    val viaBucket = ConnectedComponents
      .minLabelByBucket(members.toDF("id", "bkt"), "id", "bkt")
      .as[(Long, Long)].collect().toMap
    // explicit pair list: ids sharing any bucket
    val pairs = for {
      (a, ba) <- members; (b, bb) <- members
      if ba == bb && a < b
    } yield (a, b)
    val viaPairs = compute(pairs.distinct)
    assert(viaBucket == viaPairs)
  }

  test("bipartite form drops ids appearing only in singleton buckets") {
    val s = spark
    import s.implicits._
    val members = Seq((1L, "shared"), (2L, "shared"), (3L, "alone"))
    val out = ConnectedComponents
      .minLabelByBucket(members.toDF("id", "bkt"), "id", "bkt")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }

  test("alternatingStar matches union-find on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      .filter { case (a, b) => a != b }
    val got = ConnectedComponents
      .alternatingStar(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == unionFind(edges))
  }

  test("alternatingStar handles a 300-chain in O(log n) rounds") {
    val s = spark
    import s.implicits._
    // diameter 300: plain minLabel at its default 25 rounds must refuse,
    // the star form must finish
    val chain = (0L until 300L).sliding(2).map(p => (p(0), p(1))).toSeq
    val got = ConnectedComponents
      .alternatingStar(chain.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 300 && got.values.forall(_ == 0L))
    intercept[IllegalStateException] {
      ConnectedComponents.minLabel(chain.toDF("src", "dst"), "src", "dst")
    }
  }

  test("empty edge list yields empty labeling, not a crash") {
    assert(compute(Seq.empty).isEmpty)
  }
}
