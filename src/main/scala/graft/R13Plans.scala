package graft

/** Optimization-round dev tool (r13 twin of [[R12Plans]]): dump
  * `explain("formatted")` for the named queries into
  * `plans/r13/<query>_<tag>.txt` under the BENCH session shape
  * (local[32], 32 shuffle partitions, 200 MB broadcast threshold, AQE
  * on) so the dumped plan is the one the bench actually runs.
  *
  * Run: `sbt "runMain graft.R13Plans <tag> <query...>"`
  * (sfDir from SPARK_GRAFT_SF_DIR, default sf0.1). */
object R13Plans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: R13Plans <tag> <query...>")
    val tag = args.head
    val names = args.tail.toSeq
    val missing = names.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: $missing")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get("plans/r13")
    java.nio.file.Files.createDirectories(dir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
        .split("\n", -1)
        .map(l => if (l.length > 500)
          l.take(300) + s"… [truncated ${l.length - 300} chars]" else l)
        .mkString("\n")
      java.nio.file.Files.write(dir.resolve(s"${name}_$tag.txt"),
        (s"# $name — $tag (sf=$sfDir, local[$cpus])\n\n" + plan)
          .getBytes("UTF-8"))
      println(s"[r13plans] wrote plans/r13/${name}_$tag.txt")
    }
    spark.stop()
  }
}
