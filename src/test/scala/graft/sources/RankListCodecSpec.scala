package graft.sources

import graft.SparkSpec

class RankListCodecSpec extends SparkSpec {

  test("varint round trip covers 1-byte, multi-byte, and 64-bit values") {
    val pairs = Seq((0L, 1L), (127L, 128L), (300L, 1L << 21),
      (Long.MaxValue, 987654321098765L))
    assert(RankListCodec.decode(RankListCodec.encode(pairs)) == pairs)
    assert(RankListCodec.decode(RankListCodec.encode(Nil)) == Nil)
  }

  test("byte layout matches the reference encoding") {
    // one pair (1, 200): header varint 2, then 1, then 200 = 0xC8 -> two
    // bytes little-endian 7-bit groups: 0xC8 & 0x7F | 0x80 = 0xC8, 0x01
    val bytes = RankListCodec.encode(Seq((1L, 200L)))
    assert(bytes.toSeq == Seq(2, 1, 0xC8.toByte, 1).map(_.toByte))
  }

  test("pushRankLists encodes each key's ordered rank list") {
    import spark.implicits._
    val sunk = scala.collection.mutable.Map[String, Array[Byte]]()
    val df = Seq(
      ("coll", 1L, 100L), ("coll", 2L, 200L), ("focus", 1L, 300L))
      .toDF("key", "reason", "pid")
    RankListCodec.pushRankLists(df, "key", "reason", "pid",
      (k, b) => sunk(k) = b)
    assert(RankListCodec.decode(sunk("coll")) == Seq((1L, 100L), (2L, 200L)))
    assert(RankListCodec.decode(sunk("focus")) == Seq((1L, 300L)))
  }

  test("pushRankLists refuses unbounded results") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      RankListCodec.pushRankLists(
        spark.range(100).selectExpr("'k' AS key", "id AS reason", "id AS pid"),
        "key", "reason", "pid", (_, _) => (), maxRows = 10)
    }
  }
}
