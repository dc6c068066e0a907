package graft.functions

import graft.SparkSpec

class SkewUtilsSpec extends SparkSpec {

  test("saltedSum equals direct sum on a skewed key") {
    import spark.implicits._
    // one hot key (k=hot, 10k rows) + long tail
    val df = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "v")
    val direct = df.groupBy("k").sum("v")
      .as[(String, Long)].collect().toMap
    val salted = SkewUtils.saltedSum(df, Seq("k"), "v", Seq("v"), buckets = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
  }

  test("saltedCountDistinct is exact under duplicates") {
    import spark.implicits._
    val df = ((1 to 5000).map(i => ("hot", (i % 997).toLong)) ++
      Seq(("cold", 1L), ("cold", 1L), ("cold", 2L))).toDF("k", "u")
    val out = SkewUtils.saltedCountDistinct(df, Seq("k"), "u")
      .as[(String, Long)].collect().toMap
    assert(out == Map("hot" -> 997L, "cold" -> 2L))
  }

  test("saltedJoin equals the plain equi join and spreads the hot key") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, countDistinct}
    // one hot key with 5000 fact rows against a 3-row dim
    val fact = ((1 to 5000).map(i => (1L, i.toLong)) ++
      (1 to 50).map(i => (2L + i % 2, i.toLong))).toDF("k", "row_id")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "attr")
    val plain = fact.join(dim, Seq("k"))
      .groupBy("k", "attr").count().as[(Long, String, Long)].collect().toSet
    val salted = SkewUtils.saltedJoin(fact, dim, Seq("k"), Seq("row_id"), buckets = 8)
      .groupBy("k", "attr").count().as[(Long, String, Long)].collect().toSet
    assert(salted == plain)
    // the hot key's rows must actually occupy many salt buckets
    val spread = fact.filter($"k" === 1L)
      .select(SkewUtils.salt(8, col("row_id")).as("s"))
      .agg(countDistinct(col("s"))).first().getLong(0)
    assert(spread == 8L, s"hot key must spread over all 8 buckets (got $spread)")
  }

  test("salt is deterministic and bounded") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val s1 = Seq("a", "b", "c").toDF("x")
      .select(SkewUtils.salt(16, col("x"))).as[Long].collect().toSeq
    val s2 = Seq("a", "b", "c").toDF("x")
      .select(SkewUtils.salt(16, col("x"))).as[Long].collect().toSeq
    assert(s1 == s2)
    assert(s1.forall(v => v >= 0 && v < 16))
  }
}
