package graft.core

import graft.SparkSpec

class JobTimerSpec extends SparkSpec {

  test("records completed actions and drains to a text report") {
    val t = JobTimer.install(spark)
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      // listener bus is async — poll for delivery
      val deadline = System.currentTimeMillis + 30000
      while (t.entries.isEmpty && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      val es = t.entries
      assert(es.nonEmpty, "expected at least one timed action")
      assert(es.forall(_.succeeded))
      assert(es.exists(_.millis >= 0))
      assert(es.forall(_.planHead.nonEmpty))

      val dir = java.nio.file.Files
        .createTempDirectory("graft_timer").toString + "/log"
      t.report(spark, dir)
      val lines = spark.read.textFile(dir).collect()
      assert(lines.length == es.length)
      assert(lines.head.split("\\|").length == 4)
    } finally JobTimer.uninstall(spark, t)
  }

  test("queue stays bounded at maxEntries") {
    val t = new JobTimer(maxEntries = 3)
    (1 to 10).foreach(i =>
      t.onSuccess(s"a$i", spark.range(1).queryExecution, i * 1000000L))
    assert(t.entries.length == 3)
    assert(t.entries.map(_.action) == Seq("a8", "a9", "a10"))
  }
}
