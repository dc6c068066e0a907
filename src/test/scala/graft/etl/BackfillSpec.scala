package graft.etl

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Delayed-log patch semantics beyond the q83 oracle: write shapes
  * (files per day) and the affected-days-only contract. */
class BackfillSpec extends SparkSpec {

  private def mkRows = {
    val s = spark
    import s.implicits._
    Seq(
      ("2024-01-01", "click", 1L, 10L), ("2024-01-01", "click", 2L, 20L),
      ("2024-01-01", "view", 1L, 5L), ("2024-01-02", "click", 3L, 30L),
      ("2024-01-02", "view", 2L, 7L), ("2024-01-03", "view", 3L, 9L))
      .toDF("day", "event_type", "user_id", "measure")
  }

  private def dayFiles(store: String, day: String): Seq[String] = {
    val dir = new java.io.File(store, s"day=$day")
    Option(dir.listFiles()).toSeq.flatten
      .map(_.getName).filter(_.endsWith(".parquet"))
  }

  test("publish writes one file per day by default, filesPerDay when asked") {
    val store = Files.createTempDirectory("graft_bf1").toString + "/s"
    Backfill.publish(
      Backfill.toPartials(mkRows, Seq("event_type"), "measure"), store)
    assert(dayFiles(store, "2024-01-01").size == 1)
    assert(dayFiles(store, "2024-01-02").size == 1)
    // mixed-type partials (strings + longs) through the filesPerDay hash
    Backfill.publish(
      Backfill.toPartials(mkRows, Seq("event_type"), "measure"), store,
      filesPerDay = 3)
    val n = dayFiles(store, "2024-01-01").size
    assert(n >= 1 && n <= 3, s"expected 1..3 files, got $n")
  }

  test("patchLate rewrites only the late days and converges to the truth") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("graft_bf2").toString + "/s"
    val all = mkRows
    val late = all.where($"day" === "2024-01-02" && $"user_id" === 3L)
    val onTime = all.exceptAll(late)
    Backfill.publish(Backfill.toPartials(onTime, Seq("event_type"), "measure"), store)
    val d1Before = Files.getLastModifiedTime(
      Paths.get(store, "day=2024-01-01")).toMillis

    val days = Backfill.patchLate(spark, store, onTime, late,
      Seq("event_type"), "measure")
    assert(days == Seq("2024-01-02"), s"affected days: $days")

    val got = spark.read.parquet(store)
      .select($"day", $"event_type", $"user_id", $"n", $"measure")
      .as[(String, String, Long, Long, Long)].collect().toSet
    val want = Backfill.toPartials(all, Seq("event_type"), "measure")
      .select($"day", $"event_type", $"user_id", $"n", $"measure")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == want, "patched store must equal the all-events truth")
    // dynamic overwrite must not have touched the untouched day
    val d1After = Files.getLastModifiedTime(
      Paths.get(store, "day=2024-01-01")).toMillis
    assert(d1After == d1Before, "day=2024-01-01 was rewritten")
  }

  test("patchLate drops NULL-day stragglers instead of crashing") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("graft_bf3").toString + "/s"
    val all = mkRows
    Backfill.publish(Backfill.toPartials(all, Seq("event_type"), "measure"), store)
    val late = Seq((null: String, "click", 9L, 99L),
      ("2024-01-03", "view", 3L, 1L))
      .toDF("day", "event_type", "user_id", "measure")

    val days = Backfill.patchLate(spark, store, all, late,
      Seq("event_type"), "measure")
    assert(days == Seq("2024-01-03"), s"affected days: $days")
    // no __HIVE_DEFAULT_PARTITION__ directory, no user 9 anywhere
    val dirs = Option(new java.io.File(store).listFiles()).toSeq.flatten
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("day=2024-")), dirs.mkString(", "))
    assert(spark.read.parquet(store).where($"user_id" === 9L).isEmpty)
  }
}
