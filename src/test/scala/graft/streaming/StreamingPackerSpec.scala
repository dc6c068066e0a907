package graft.streaming

import graft.SparkSpec
import graft.operators.SeqPacker
import graft.operators.SeqPacker.{Piece, Placed}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Replay equality of the streaming next-fit packer against batch
  * [[SeqPacker.pack]]: the piece stream is cut into uneven micro-batches
  * at ADVERSARIAL mid-bucket boundaries (open-sequence state must carry
  * across the cut) and shuffled within each batch (the processor owns
  * within-batch order; only cross-batch per-key ord order is the
  * documented contract). */
class StreamingPackerSpec extends SparkSpec {

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

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("mid-bucket uneven replay equals the batch next-fit pack exactly") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 9 (lang, bucket) groups x ~33 pieces, sizes exercising both the
    // fits-stay and misfit-opens branches at cap 512
    val pieces = (1L to 300L).map(i =>
      Piece("l" + (i % 3), i % 3, i, 0L, i, (i * 37 % 500) + 1))

    // cross-batch contract: per-key ord order — a global (ord1, ord2)
    // sort then three uneven cuts preserves it for every key; the cuts
    // land mid-bucket so open-sequence state must survive the boundary
    val ordered = pieces.sortBy(p => (p.ord1, p.ord2))
    val (b1, rest) = ordered.splitAt(ordered.length / 5)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    // within-batch arrival order is adversarial (md5 shuffle)
    val batches = Seq(b1, b2, b3).map(_.sortBy(p => md5(s"pk:${p.docId}")))

    val streamed = withRocksDb {
      val in = MemoryStream[Piece]
      val q = StreamingPacker.placed(in.toDS(), 512)
        .writeStream.format("memory").queryName("pack_t")
        .outputMode("append").start()
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table("pack_t").as[Placed].collect().toSeq
    }
    def key(p: Placed) = (p.lang, p.bucket, p.ord1, p.ord2, p.docId, p.size, p.seq)
    val batch = SeqPacker.pack(pieces.toDS(), 512).collect().toSeq
    assert(streamed.map(key).sorted == batch.map(key).sorted,
      "streaming assignment must equal the batch next-fit pack exactly")
    // the cuts actually landed mid-bucket (state carried): some group
    // has pieces in more than one batch
    val spans = pieces.groupBy(p => (p.lang, p.bucket)).map { case (k, ps) =>
      batches.zipWithIndex.count { case (b, _) =>
        b.exists(p => (p.lang, p.bucket) == k)
      }
    }
    assert(spans.exists(_ > 1), "split must cross a bucket boundary")
  }

  test("every emission respects capacity and no-straddle by construction") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pieces = (1L to 60L).map(i =>
      Piece("en", i % 2, i, 0L, i, (i * 91 % 512) + 1))
    val streamed = withRocksDb {
      val in = MemoryStream[Piece]
      val q = StreamingPacker.placed(in.toDS(), 512)
        .writeStream.format("memory").queryName("pack_cap_t")
        .outputMode("append").start()
      in.addData(pieces.sortBy(p => (p.ord1, p.ord2)))
      q.processAllAvailable()
      q.stop()
      spark.table("pack_cap_t").as[Placed].collect().toSeq
    }
    assert(streamed.size == pieces.size, "every piece placed exactly once")
    val seqSums = streamed.groupBy(p => (p.lang, p.bucket, p.seq))
      .view.mapValues(_.map(_.size).sum)
    assert(seqSums.values.forall(_ <= 512L), "no sequence over capacity")
  }
}
