package graft

/** Completeness monitor (SURVEY §0 family 4: `monitor/MonitorApp.scala:16-48`
  * re-queries every report table for the day and writes a completeness
  * report). Here: run every registered query against a scale dir and
  * write one TSV line per query — name, status, rows, seconds — plus a
  * summary line. Ops tooling, not part of the driver contract.
  *
  * Usage: `sbt "runMain graft.Monitor [sfDir] [outFile]"`.
  */
object Monitor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = args.lift(1).getOrElse("/tmp/graft_monitor.tsv")
    val spark = graft.core.GraftSession.local(
      math.min(32, Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("ERROR")
    val lines = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val (status, rows) =
        try { ("OK", fn(spark, sfDir).count()) }
        catch { case e: Throwable => (s"FAIL:${e.getClass.getSimpleName}", -1L) }
      val sec = (System.nanoTime() - t0) / 1e9
      f"$name\t$status\t$rows%d\t$sec%.2f"
    }
    val nOk = lines.count(_.contains("\tOK\t"))
    val report = (lines :+ s"TOTAL\t$nOk/${lines.size} ok").mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), report + "\n")
    println(report.linesIterator.toSeq.last)
    spark.stop()
  }
}
