package graft.multimodal

import graft.SparkSpec

class MediaCodecSpec extends SparkSpec {

  private def blob(id: Long, kind: String, payload: String) =
    MediaBlob(id, kind, payload.getBytes("UTF-8"), Map("source" -> "t"))

  test("decodeOne is deterministic and in documented ranges") {
    val m1 = MediaCodec.decodeOne(blob(1, "video", "hello world"))
    val m2 = MediaCodec.decodeOne(blob(1, "video", "hello world"))
    assert(m1 == m2)
    assert(m1.width >= 64 && m1.width < 64 + 1857)
    assert(m1.height >= 64 && m1.height < 64 + 1017)
    assert(m1.channels >= 1 && m1.channels <= 3)
    assert(m1.n_frames >= 1 && m1.n_frames <= 300)
    assert(m1.byte_len == 11L)
    assert(m1.content_hash.matches("[0-9a-f]{32}"))
    // stills always have exactly one frame
    assert(MediaCodec.decodeOne(blob(2, "image", "hello world")).n_frames == 1)
  }

  test("typed decode runs through mapPartitions with real encoders") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val ds = Seq(blob(1, "image", "aa"), blob(2, "video", "bbbb")).toDS()
    val metas = MediaCodec.decode(ds).collect().sortBy(_.media_id)
    assert(metas.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(metas.forall(_.content_hash.nonEmpty))
  }

  test("sampleFrames covers every stride-th frame and slices bytes") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val b = blob(7, "video", "x" * 1000)
    val nFrames = MediaCodec.decodeOne(b).n_frames
    val frames = MediaCodec.sampleFrames(Seq(b).toDS(), stride = 30).collect()
    assert(frames.length == (nFrames + 29) / 30)
    assert(frames.map(_.frame_idx).toSeq == (0 until nFrames by 30).toSeq)
    assert(frames.forall(_.frame_bytes.nonEmpty))
  }

  test("features: identical payloads embed identically, bounded values") {
    val a = MediaCodec.featuresOne(blob(1, "image", "same bytes"))
    val b = MediaCodec.featuresOne(blob(2, "image", "same bytes"))
    val c = MediaCodec.featuresOne(blob(3, "image", "other bytes"))
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
    assert(a.length == 16 && a.forall(v => v >= -1f && v < 1f))
  }

  test("media dedup end to end: blobs -> features -> LSH drop list") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    // 8 distinct payloads + exact duplicates of payloads 0 and 3
    val blobs = (0L until 8L).map(i => blob(i, "image", s"payload-$i")) ++
      Seq(blob(100L, "image", "payload-0"), blob(101L, "image", "payload-3"))
    val feats = MediaCodec.features(blobs.toDS())
      .toDF("media_id", "embedding")
    val dropped = graft.operators.VectorLsh
      .cosineDropIds(feats, "media_id", "embedding",
        nBands = 4, bandBits = 4, threshold = 0.999)
      .as[Long].collect().toSet
    // the duplicate (larger) ids must drop; the 8 originals must survive
    assert(dropped.contains(100L) && dropped.contains(101L))
    assert(dropped.intersect((0L until 8L).toSet).isEmpty)
  }

  test("REAL image decode: PNG/BMP encode->decode round-trips the exact " +
    "raster dims; non-image payloads keep the deterministic stub") {
    for (fmt <- Seq("png", "bmp")) {
      val bytes = MediaCodec.encodeImage(37, 21, seed = 7L, fmt)
      assert(MediaCodec.decodeImage(bytes).contains((37, 21, 3)),
        s"$fmt round-trip")
      val m = MediaCodec.decodeOne(MediaBlob(1L, "image", bytes, Map.empty))
      assert(m.width == 37 && m.height == 21 && m.channels == 3 &&
        m.n_frames == 1 && m.byte_len == bytes.length.toLong)
    }
    // encoding is deterministic: same inputs, same bytes (the artifact/
    // oracle hash contract)
    assert(java.util.Arrays.equals(
      MediaCodec.encodeImage(37, 21, 7L, "png"),
      MediaCodec.encodeImage(37, 21, 7L, "png")))
    // garbage bytes: real decode declines, stub dims serve (q54's
    // text-payload blobs must be byte-identical to pre-r11 behavior)
    val garbage = blob(2L, "image", "not an image at all")
    assert(MediaCodec.decodeImage(garbage.bytes).isEmpty)
    val g = MediaCodec.decodeOne(garbage)
    assert(g.width >= 64 && g.width < 64 + 1857 &&
      g.height >= 64 && g.height < 64 + 1017)
    // audio/video payloads never take the real path even if decodable
    val audio = MediaBlob(3L, "audio",
      MediaCodec.encodeImage(37, 21, 7L, "png"), Map.empty)
    assert(MediaCodec.decodeOne(audio).width != 37 ||
      MediaCodec.decodeOne(audio).height != 21)
  }

  test("resizeMeta preserves aspect and never upsizes") {
    val m = MediaCodec.decodeOne(blob(9, "image", "payload")).copy(
      width = 1920, height = 1080)
    val r = MediaCodec.resizeMeta(m, 256)
    assert(r.width == 256 && r.height == 1080 * 256 / 1920)
    val small = m.copy(width = 100, height = 50)
    assert(MediaCodec.resizeMeta(small, 256) == small)
  }
}
