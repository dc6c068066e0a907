package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The bucket decomposition must return EXACTLY the naive inequality
  * join's pair set — for any interval population (clustered, nested,
  * touching, negative coordinates) and ANY bucket width: width tunes
  * cost, never results. Exactly-once is the sharp edge: an interval
  * spanning many buckets meets its partner in every shared bucket, and
  * only the overlap-start rule may keep one. */
class IntervalJoinSpec extends SparkSpec {

  private def check[A](g: Gen[A], n: Int)(f: A => Boolean): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n),
      Prop.forAll(g)(f))
    assert(res.passed, res.status.toString)
  }

  // (st, len) pairs — sts straddle 0 so bucket ids go negative; lens
  // from empty (0) to many-bucket (120)
  private val intervals: Gen[List[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(-200L, 200L), Gen.choose(0L, 120L)))

  // max(st) < min(en) — NOT the pairwise `a.st < b.en && b.st < a.en`,
  // which wrongly admits an empty [x, x) sitting strictly inside a
  // non-empty partner (equivalent only when both are non-empty)
  private def overlaps(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
    math.max(a._2, b._2) < math.min(a._3, b._3)

  private def naiveSelfPairs(iv: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      a <- iv; b <- iv
      if a._1 < b._1 && overlaps(a, b)
    } yield (a._1, b._1)).toSet

  test("self-join pair set equals the naive quadratic join at widths 1/7/64") {
    val s = spark
    import s.implicits._
    check(intervals, 15) { raw =>
      val iv = raw.zipWithIndex.map { case ((st, len), i) =>
        (i.toLong, st, st + len) }
      val truth = naiveSelfPairs(iv)
      val df = iv.toDF("id", "st", "en")
      Seq(1L, 7L, 64L).forall { w =>
        val got = IntervalJoin.overlapJoin(df, df, "st", "en", w)
          .where($"l_id" < $"r_id")
          .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
        got == truth
      }
    }
  }

  test("two-sided join equals naive and carries both sides' payload columns") {
    val s = spark
    import s.implicits._
    check(Gen.zip(intervals, intervals), 10) { case (lr, rr) =>
      val lv = lr.zipWithIndex.map { case ((st, len), i) => (i.toLong, st, st + len) }
      val rv = rr.zipWithIndex.map { case ((st, len), i) => (i.toLong, st, st + len) }
      val truth = (for {
        a <- lv; b <- rv
        if overlaps(a, b)
      } yield (a._1, b._1)).toSet
      val got = IntervalJoin.overlapJoin(
          lv.toDF("id", "st", "en"), rv.toDF("id", "st", "en"), "st", "en", 16L)
        .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
      got == truth
    }
  }

  test("empty intervals (en <= st) overlap nothing") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5L, 5L), (2L, 0L, 10L), (3L, 4L, 6L)).toDF("id", "st", "en")
    val got = IntervalJoin.overlapJoin(df, df, "st", "en", 4L)
      .where($"l_id" < $"r_id")
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 3L)))
  }
}
