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
