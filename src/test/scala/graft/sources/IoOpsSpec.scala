package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class IoOpsSpec extends SparkSpec {

  test("replaceDayPartitions overwrites only the written partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_io").toString
    val d1 = Seq((1L, "a", "20240101"), (2L, "b", "20240102"))
      .toDF("id", "v", "day")
    IoOps.replaceDayPartitions(d1, dir)
    // rewrite day 20240102 only; 20240101 must survive
    val d2 = Seq((9L, "z", "20240102")).toDF("id", "v", "day")
    IoOps.replaceDayPartitions(d2, dir)
    val back = spark.read.parquet(dir)
      .select("id", "day").as[(Long, String)].collect().toSet
    assert(back == Set((1L, "20240101"), (9L, "20240102")))
  }

  test("readDayPartition prunes partitions in the plan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_io2").toString
    IoOps.replaceDayPartitions(
      Seq((1L, "20240101"), (2L, "20240102")).toDF("id", "day"), dir)
    val df = IoOps.readDayPartition(spark, dir, "20240101")
    assert(df.as[(Long, String)].collect().toSeq == Seq((1L, "20240101")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("day#"),
      s"expected partition pruning in plan:\n$plan")
  }

  test("textLogs reads multiple paths as one dataset") {
    val dir = Files.createTempDirectory("graft_txt")
    val f1 = dir.resolve("a.log"); val f2 = dir.resolve("b.log")
    Files.writeString(f1, "line1\nline2\n")
    Files.writeString(f2, "line3\n")
    val ds = IoOps.textLogs(spark, Seq(f1.toString, f2.toString))
    assert(ds.collect().sorted.toSeq == Seq("line1", "line2", "line3"))
  }
}
