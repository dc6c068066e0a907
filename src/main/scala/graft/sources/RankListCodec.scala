package graft.sources

import org.apache.spark.sql.DataFrame

/** K6: the Redis rank-list sink's value encoding
  * (`rank/reports/SetFavoriteRank.scala:133-163` `encodeToRedisDD`): a
  * rank list is LEB128-style varints — 7 value bits per byte, high bit =
  * continuation, little-endian — starting with `2 × #pairs`, then each
  * (reason, id) pair. The byte layout is the contract consumers parse,
  * so it is rebuilt exactly; the Redis CLIENT is the only out-of-env
  * piece and stays behind the `write` function parameter of
  * [[pushRankLists]] (a Jedis `hset` slots straight in). */
object RankListCodec {

  def encode(pairs: Seq[(Long, Long)]): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    def varint(n: Long): Unit = {
      var m = n
      while ((m & ~0x7FL) != 0L) {
        out += ((m & 0x7F) | 0x80).toByte
        m = m >>> 7
      }
      out += m.toByte
    }
    varint(pairs.length * 2L)
    pairs.foreach { case (reason, id) => varint(reason); varint(id) }
    out.toArray
  }

  /** Inverse of [[encode]] (consumers + round-trip tests). */
  def decode(bytes: Array[Byte]): Seq[(Long, Long)] = {
    var i = 0
    def varint(): Long = {
      var v = 0L; var shift = 0
      var b = 0
      do {
        b = bytes(i) & 0xFF; i += 1
        v |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    val n = varint() / 2
    (0L until n).map(_ => (varint(), varint()))
  }

  /** Encode a small ranked result per key and hand each (key, bytes) to
    * `write` — driver-side like [[HttpPush]]: rank exports are top-N
    * small, and per-executor clients would re-push on task retry. The
    * DataFrame needs (keyCol: string, reasonCol: long, idCol: long) and
    * must already be in rank order within each key (the reference sorts
    * before encoding); `maxRows` bounds the collect. */
  def pushRankLists(df: DataFrame, keyCol: String, reasonCol: String,
      idCol: String, write: (String, Array[Byte]) => Unit,
      maxRows: Int = 100000): Unit = {
    val rows = df.select(keyCol, reasonCol, idCol).limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"refusing to collect more than $maxRows rank rows")
    rows.groupBy(_.getString(0)).foreach { case (key, rs) =>
      write(key, encode(rs.toSeq.map(r => (r.getLong(1), r.getLong(2)))))
    }
  }
}
