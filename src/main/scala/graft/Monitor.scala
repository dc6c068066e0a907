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

  /** Ops health view over the persisted STREAMING STATE tables — the
    * consumer seam between the foreachBatch sinks and whoever pages the
    * on-call: one row per monitored family.
    *
    *  - `centroids`: the [[graft.streaming.StreamingCentroidMonitor]]
    *    moment table served as running centroids and scored for cosine
    *    drift against the frozen training-time `reference` — `n` is the
    *    monitored label count, `metric` the WORST (minimum) drift_cos.
    *  - `uv_sketch`: a persisted [[graft.operators.SketchRollup]] table
    *    — `n` is the stored cell count, `metric` the global UV estimate
    *    from unioning every cell's sketch (O(cells) rows read; the raw
    *    stream is never rescanned).
    *
    * Both reads are O(state), not O(history) — this report stays cheap
    * at any corpus size, which is what makes it safe to run on a
    * schedule next to ingest. */
  def stateReport(spark: org.apache.spark.sql.SparkSession,
      momentsPath: String, reference: org.apache.spark.sql.DataFrame,
      sketchPath: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingCentroidMonitor
    import graft.operators.SketchRollup
    val cur = StreamingCentroidMonitor.centroids(spark, momentsPath)
    val drift = StreamingCentroidMonitor.drift(cur, reference)
    val centRow = drift
      .agg(count(lit(1)).as("n"), min(col("drift_cos")).as("worst"))
      .select(lit("centroids").as("family"), col("n"),
        round(col("worst"), 6).cast("double").as("metric"))
    val sk = spark.read.parquet(sketchPath)
    val uvRow = sk.agg(count(lit(1)).as("n"))
      .crossJoin(SketchRollup.rollupEstimate(sk, Nil))
      .select(lit("uv_sketch").as("family"), col("n"),
        col("uv").cast("double").as("metric"))
    centRow.unionByName(uvRow)
  }

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
