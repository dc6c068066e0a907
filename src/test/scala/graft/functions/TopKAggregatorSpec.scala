package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** TopKAggregator: bounded per-task top-k (q132's operator). Property:
  * for ANY input set and partitioning, the typed heap aggregation
  * equals the window row_number form — plus the plan-level point of the
  * operator: partial (map-side) aggregation exists, so the exchange
  * carries ≤k-row buffers, not raw rows. Spark-backed, so
  * few-but-larger cases (the GraphPropertySpec pattern). */
class TopKAggregatorSpec extends SparkSpec {

  private def topkOf(rows: Seq[(String, Long, Long)], parts: Int, k: Int) = {
    import spark.implicits._
    rows.toDF("g", "id", "score").repartition(parts)
      .select($"g", struct($"id", $"score").as("s"))
      .as[(String, ScoredId)]
      .groupByKey(_._1)
      .agg(new TopKAggregator(k).toColumn.name("top"))
      .flatMap { case (g, hits) =>
        hits.iterator.zipWithIndex.map { case (h, i) => (g, (i + 1).toLong, h.id, h.score) }
      }.collect().toSet
  }

  private def windowOf(rows: Seq[(String, Long, Long)], k: Int) = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"id")
    rows.toDF("g", "id", "score")
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select($"g", $"rnk".cast("long"), $"id", $"score")
      .as[(String, Long, Long, Long)].collect().toSet
  }

  test("heap top-k equals window top-k on random data, any partitioning") {
    val gen = for {
      n <- Gen.choose(1, 50)
      raw <- Gen.listOfN(n,
        Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 40L), Gen.choose(-100L, 100L)))
      parts <- Gen.choose(1, 7)
      k <- Gen.choose(1, 4)
    } yield (raw.distinctBy(r => (r._1, r._2)), parts, k)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8),
      Prop.forAll(gen) { case (rows, parts, k) =>
        topkOf(rows, parts, k) == windowOf(rows, k)
      })
    assert(res.passed, res.status.toString)
  }

  test("merge is a commutative monoid on sorted-k buffers (what makes partial agg correct)") {
    // pure, no Spark: associativity + commutativity + zero identity over
    // buffers that arose from reduce (sorted, ≤ k) — the precondition
    // Spark's partial aggregation actually provides
    val agg = new TopKAggregator(3)
    def bufOf(xs: Seq[(Long, Long)]): Seq[ScoredId] =
      xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, ("g", ScoredId(x._1, x._2))))
    val gen = Gen.listOfN(10, Gen.zip(Gen.choose(0L, 20L), Gen.choose(-9L, 9L)))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(gen, gen, gen) { (xs, ys, zs) =>
        val (a, b, c) = (bufOf(xs), bufOf(ys), bufOf(zs))
        agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)) &&
          agg.merge(a, b) == agg.merge(b, a) &&
          agg.merge(a, agg.zero) == a
      })
    assert(res.passed, res.status.toString)
  }

  test("aggregation is partial: exchange carries buffers, not raw rows") {
    import spark.implicits._
    val plan = Seq(("a", 1L, 5L), ("a", 2L, 7L), ("b", 3L, 1L)).toDF("g", "id", "score")
      .select($"g", struct($"id", $"score").as("s"))
      .as[(String, ScoredId)]
      .groupByKey(_._1)
      .agg(new TopKAggregator(2).toColumn.name("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"),
      s"expected a partial typed aggregation before the exchange:\n$plan")
  }
}
