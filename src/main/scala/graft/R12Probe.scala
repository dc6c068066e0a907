package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Optimization-round dev tool: run one query under the BENCH session
  * shape with a job listener attached and print every Spark job's wall
  * time + description — the empirical decomposition the guide's §1.1
  * asks for, with the UI disabled. Two timed passes (cold, warm) so
  * artifact-gated queries show both regimes.
  *
  * Run: `sbt "runMain graft.R12Probe <query> [passes]"`. */
object R12Probe {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    require(SparkEntry.queries.contains(name), s"unknown query $name")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          rows.add((je.jobId, (System.nanoTime() - t0) / 1e9, desc))
        }
      }
    })
    // same warmup as Bench
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (p <- 1 to passes) {
      rows.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val tot = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      println(f"== pass $p: $name total $tot%.2f s ==")
      import scala.jdk.CollectionConverters._
      val rs = rows.asScala.toSeq.sortBy(_._1)
      rs.foreach { case (id, s, desc) =>
        println(f"  job $id%4d  $s%7.3f s  $desc")
      }
      println(f"  [sum of jobs ${rs.map(_._2).sum}%.2f s over ${rs.size} jobs]")
    }
    spark.stop()
  }
}
