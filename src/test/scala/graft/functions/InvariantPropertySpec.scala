package graft.functions

import graft.SparkSpec
import graft.sources.RankListCodec
import graft.etl.Backfill
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests over the engine's algebraic invariants: the varint
  * codec inverts itself, the two-pass distributed rank equals the
  * single-task global rank, ntile partitions exactly, and backfill
  * patching converges to the all-data truth for ANY split of rows into
  * on-time and late. Raw ScalaCheck (the scalatestplus bridge is not in
  * the offline cache); Spark-backed properties use few, larger cases. */
class InvariantPropertySpec extends SparkSpec {

  private def check[A](g: Gen[A], n: Int = 200)(f: A => Boolean): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n),
      Prop.forAll(g)(f))
    assert(res.passed, res.status.toString)
  }

  test("RankListCodec decode inverts encode for any id pairs incl. bit-63 values") {
    val pair = Gen.zip(
      Gen.oneOf(Gen.choose(0L, 300L), Gen.choose(0L, Long.MaxValue)),
      Gen.oneOf(Gen.choose(0L, 300L), Gen.choose(0L, Long.MaxValue)))
    check(Gen.listOf(pair)) { pairs =>
      RankListCodec.decode(RankListCodec.encode(pairs)) == pairs
    }
  }

  test("distributed row number equals the single-task global row number") {
    import spark.implicits._
    // duplicate-heavy values force rows to straddle quantile boundaries;
    // id tiebreak makes the total order unique
    val gen = Gen.chooseNum(50, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-5, 5)))
    check(gen, n = 5) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (v.toLong, i.toLong) }
        .toDF("v", "id")
      val got = DistributedRank
        .withRowNumber(df, "rn", col("v"), col("id"))
        .select($"v", $"id", $"rn")
        .as[(Long, Long, Long)].collect().sortBy(_._3)
      val want = vs.zipWithIndex
        .map { case (v, i) => (v.toLong, i.toLong) }
        .sortBy(identity)
        .zipWithIndex.map { case ((v, i), r) => (v, i, r + 1L) }
      got.toList == want
    }
  }

  test("ntileOf partitions 1..N into n contiguous buckets, sizes differing by <= 1") {
    import spark.implicits._
    check(Gen.zip(Gen.chooseNum(1, 50), Gen.chooseNum(1, 12)), n = 30) {
      case (total, n) =>
        val rows = (1 to total).map(_.toLong).toDF("rn")
          .select($"rn", DistributedRank.ntileOf($"rn", lit(total.toLong), n).as("b"))
          .as[(Long, Int)].collect().sortBy(_._1)
        val sizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
        val contiguous = rows.map(_._2).sliding(2).forall {
          case Array(a, b) => b == a || b == a + 1; case _ => true }
        contiguous &&
          rows.head._2 == 1 && rows.last._2 == math.min(n, total) &&
          (sizes.values.max - sizes.values.min) <= (if (total % n == 0) 0 else 1)
    }
  }

  test("backfill patch converges to the all-data truth for any on-time/late split") {
    import spark.implicits._
    // rows: (day 1..3, dim a/b, user 1..4, measure); mask bit i says row i
    // arrives late
    val rows = Gen.chooseNum(5, 40).flatMap(n => Gen.listOfN(n, Gen.zip(
      Gen.chooseNum(1, 3), Gen.oneOf("a", "b"),
      Gen.chooseNum(1, 4), Gen.chooseNum(0L, 100L))))
    check(Gen.zip(rows, Gen.long), n = 5) { case (rs, mask) =>
      val all = rs.zipWithIndex.map { case ((d, dim, u, m), i) =>
        (s"2026-01-0$d", dim, u.toLong, m, (mask >> (i % 64) & 1) == 1) }
        .toDF("day", "dim", "user_id", "measure", "late")
      val store = "/tmp/graft_prop_backfill"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
      val onTime = all.where(!$"late").drop("late")
      val late = all.where($"late").drop("late")
      Backfill.publish(Backfill.toPartials(onTime, Seq("dim"), "measure"), store)
      Backfill.patchLate(spark, store, onTime, late, Seq("dim"), "measure")
      val got = spark.read.parquet(store)
        .groupBy($"day".cast("string").as("day"), $"dim")
        .agg(sum($"n").as("n"), sum($"measure").as("m"))
        .as[(String, String, Long, Long)].collect().toSet
      val want = all.drop("late")
        .groupBy($"day", $"dim")
        .agg(count(lit(1)).as("n"), sum($"measure").as("m"))
        .as[(String, String, Long, Long)].collect().toSet
      got == want
    }
  }
}
