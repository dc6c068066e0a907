package graft.functions

import graft.SparkSpec
import graft.operators.HeavyHitters

class MisraGriesSpec extends SparkSpec {

  /** Drive the aggregator exactly as Spark would: partition the stream,
    * reduce each slice from zero, then merge the summaries in the given
    * order. */
  private def summarize(k: Int, slices: Seq[Seq[String]],
      mergeOrder: Seq[Int]): MgSummary = {
    val agg = new MisraGriesAggregator(k)
    val parts = slices.map(_.foldLeft(agg.zero)(agg.reduce))
    mergeOrder.map(parts).reduceLeft(agg.merge)
  }

  test("superset guarantee holds on random streams under random partitioning") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 40) {
      val k = 1 + rnd.nextInt(6)
      // zipf-ish: item i drawn with weight ~ 1/(i+1)
      val alphabet = (0 until (2 + rnd.nextInt(20))).map(i => s"w$i")
      val stream = Seq.fill(50 + rnd.nextInt(400)) {
        val r = math.pow(rnd.nextDouble(), 2.5)
        alphabet((r * alphabet.size).toInt.min(alphabet.size - 1))
      }
      val nSlices = 1 + rnd.nextInt(5)
      val slices = stream.grouped(math.max(1, stream.size / nSlices)).toSeq
      val order = rnd.shuffle(slices.indices.toList)
      val got = summarize(k, slices, order)
      assert(got.n == stream.size, s"trial $trial: n must be exact")
      assert(got.items.size <= k, s"trial $trial: buffer bound violated")
      val counts = stream.groupBy(identity).view.mapValues(_.size.toLong)
      val mustSurvive = counts.filter { case (_, c) => c * (k + 1) > stream.size }
      mustSurvive.foreach { case (item, c) =>
        assert(got.items.contains(item),
          s"trial $trial (k=$k): item '$item' (count $c of ${stream.size}) " +
            s"exceeds n/(k+1) but was evicted: ${got.items}")
        assert(got.items(item) <= c, s"trial $trial: weight must undercount")
        assert(c - got.items(item) <= stream.size / (k + 1),
          s"trial $trial: undercount beyond n/(k+1) bound")
      }
    }
  }

  test("adversarial k=1: strict majority item always survives") {
    // alternating noise designed to trigger a decrement on every other
    // arrival; the majority item must still be the survivor (Boyer-Moore)
    val stream = Seq.fill(30)(Seq("maj", "maj", "noise")).flatten
    val got = summarize(1, Seq(stream), Seq(0))
    assert(got.items.keySet == Set("maj"))
  }

  test("HeavyHitters.exact equals the naive groupBy form and ignores partitioning") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 3).flatMap { g =>
      Seq.fill(800) {
        val r = math.pow(rnd.nextDouble(), 3.0)
        (s"g$g", s"t${(r * 40).toInt}")
      }
    }
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("lang", "tok").repartition(parts)
      val k = 9
      val got = HeavyHitters.exact(df, "lang", "tok", k)
        .orderBy($"lang", $"tok").collect().toSeq
      val naive = df.groupBy($"lang", $"tok").agg(count(lit(1)).as("cnt"))
        .withColumn("n_grp", sum($"cnt").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"lang")))
        .filter($"cnt" * (k + 1) > $"n_grp")
        .orderBy($"lang", $"tok").collect().toSeq
      assert(got == naive, s"parts=$parts")
      assert(got.nonEmpty, "fixture must produce heavy hitters")
    }
  }

  test("pass-1 exchange is bounded: candidate frame holds <= groups x k rows") {
    val s = spark
    import s.implicits._
    val rows = (1 to 2).flatMap(g => (1 to 500).map(i => (s"g$g", s"t${i % 200}")))
    val df = rows.toDF("lang", "tok").repartition(5)
    val k = 3
    val agg = new MisraGriesAggregator(k)
    val summaries = df.as[(String, String)]
      .groupByKey(_._1).mapValues(_._2).agg(agg.toColumn.name("s"))
      .collect()
    summaries.foreach { case (_, sm) =>
      assert(sm.items.size <= k)
      assert(sm.n == 500L)
    }
  }
}
