package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Replay equality of the streaming CDC apply against the batch q227
  * snapshot: the changelog is shuffled deterministically and split into
  * uneven micro-batches, so within-batch arrival order AND the batch
  * boundary are both adversarial — the total (seqUs, opId) order must
  * make the final state independent of both. */
class CdcMachineSpec extends SparkSpec {

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      body
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("shuffled uneven replay converges to the batch q227 snapshot") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ops = Tables.events(spark, sfDir)
      .where($"user_id".isNotNull && $"ts".isNotNull)
      .select($"user_id", unix_micros($"ts").as("seq_us"), $"event_id",
        ($"event_type" === "error").as("is_del"),
        floor($"value" * 100).cast("long").as("cents"))
      .as[(Long, Long, Long, Boolean, Long)].collect()
      .map { case (k, t, id, d, c) => CdcOp(k, t, id, d, c) }
      // deterministic adversarial order: md5 of the op id
      .sortBy(op => java.security.MessageDigest.getInstance("MD5")
        .digest(s"cdc:${op.opId}".getBytes("UTF-8")).map("%02x".format(_))
        .mkString)
    // three uneven batches
    val (b1, rest) = ops.splitAt(ops.length / 5)
    val (b2, b3) = rest.splitAt(rest.length / 2)

    val rows = withRocksDb {
      val in = MemoryStream[CdcOp]
      val q = CdcMachine.snapshots(in.toDS())
        .writeStream.format("memory").queryName("cdc_t")
        .outputMode("append").start()
      Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table("cdc_t").as[CdcRow].collect().toSeq
    }
    // nOps strictly increases per key, so argmax(nOps) is the final state
    val fin = rows.groupBy(_.key).map { case (_, rs) => rs.maxBy(_.nOps) }
    val streaming = fin.filterNot(_.isDel)
      .map(r => (r.key, r.nOps, r.nDeletes, r.cents)).toSet
    val batch = graft.SparkEntry.queries("q227_cdc_apply")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (k, n, d, c) => (k, n, d, c) }.toSet
    assert(streaming == batch,
      "streaming snapshot must equal the batch CDC apply exactly")
    // dead keys: present in state, absent from the batch snapshot
    val dead = fin.filter(_.isDel).map(_.key).toSet
    assert(dead.intersect(batch.map(_._1)).isEmpty)
    assert((streaming.map(_._1) ++ dead) == rows.map(_.key).toSet)
  }
}
