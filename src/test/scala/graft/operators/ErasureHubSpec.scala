package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[ErasureHub]]'s fan-out contract (round-11 VERDICT #3): the
  * deletion commitment is hub-WAL'd BEFORE the first target, a crash
  * mid-fan-out leaves it pending, and a retry — even with an EMPTY
  * feed — finishes every remaining target and only then releases the
  * WAL. Targets are REAL artifacts (band index + suffix index) so the
  * convergence claim exercises the per-artifact forgets, not mocks. */
class ErasureHubSpec extends SparkSpec {

  private def dir(tag: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_ehub_$tag").toString
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    p
  }

  private val fixture = Seq(
    (1L, "a b c d e f"), (2L, "g h i j k l"), (3L, "a b c x y z"),
    (4L, "m n o p q r"), (5L, "s t u v w x"))

  test("crash mid-fan-out: the hub WAL keeps the commitment; an empty-" +
    "feed retry finishes the remaining targets and clears it") {
    val s = spark; import s.implicits._
    val d = dir("crash")
    val docs = fixture.toDF("doc_id", "text")
    val bandDir = BandIndex.ensure(s"$d/band", docs, "doc_id", "text",
      k = 2, nh = 8, b = 4, r = 2)
    val sufDir = s"$d/suffix"
    SuffixIndex.ensure(sufDir, docs,
      docs.select($"doc_id", posexplode(split(trim($"text"), "\\s+")))
        .toDF("doc_id", "pos", "tok"))
    def bandT = ErasureHub.Target("band_index",
      () => BandIndex.readFps(s, bandDir).select($"doc_id"),
      ids => { BandIndex.forget(s, bandDir, ids, "id"); () })
    def sufT = ErasureHub.Target("suffix_index",
      () => SuffixIndex.read(s, sufDir).select($"doc_id"),
      ids => { SuffixIndex.forget(s, sufDir, ids, "id"); () })
    val bomb = ErasureHub.Target("bomb",
      () => Seq.empty[Long].toDF("id"),
      _ => throw new RuntimeException("simulated crash mid-fan-out"))
    val hub = s"$d/hub"
    val del = Seq(2L).toDF("doc_id")
    // run 1 (sequential — pins the ordered crash window): band forgets
    // doc 2, then the crash lands before suffix
    val e = intercept[RuntimeException] {
      ErasureHub.run(s, hub, del, "doc_id", Seq(bandT, bomb, sufT),
        parallel = false)
    }
    assert(e.getMessage.contains("simulated crash"))
    assert(ErasureHub.pending(s, hub), "commitment survives the crash")
    assert(BandIndex.readFps(s, bandDir).where($"doc_id" === 2L).count() == 0L,
      "completed target stays erased")
    assert(SuffixIndex.read(s, sufDir).where($"doc_id" === 2L).count() > 0L,
      "interrupted target still holds the condemned doc")
    // run 2 (default CONCURRENT drains): EMPTY feed — the retry must
    // drain the WAL'd commitment
    val census = ErasureHub.run(s, hub, Seq.empty[Long].toDF("doc_id"),
      "doc_id", Seq(bandT, sufT)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(SuffixIndex.read(s, sufDir).where($"doc_id" === 2L).count() == 0L)
    assert(census("suffix_index") == ((5L, 1L, 4L)),
      "census: 5 docs before, 1 hit from the WAL'd feed, 4 after")
    assert(census("band_index")._2 == 0L && census("band_index")._3 == 4L,
      "already-erased target: zero-op, 4 survivors")
    assert(!ErasureHub.pending(s, hub), "WAL released after the last target")
    // run 3: full success already landed — a same-feed rerun is a zero-op
    val again = ErasureHub.run(s, hub, del, "doc_id", Seq(bandT, sufT))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(again("band_index") == 4L && again("suffix_index") == 4L)
    assert(!ErasureHub.pending(s, hub))
  }

  test("streaming deletion feed: one queue drains to every store per " +
    "micro-batch, redelivery converges") {
    val s = spark; import s.implicits._
    val d = dir("stream")
    val docs = fixture.toDF("doc_id", "text")
    val bandDir = BandIndex.ensure(s"$d/band", docs, "doc_id", "text",
      k = 2, nh = 8, b = 4, r = 2)
    val sufDir = s"$d/suffix"
    SuffixIndex.ensure(sufDir, docs,
      docs.select($"doc_id", posexplode(split(trim($"text"), "\\s+")))
        .toDF("doc_id", "pos", "tok"))
    val targets = Seq(
      ErasureHub.Target("band_index",
        () => BandIndex.readFps(s, bandDir).select($"doc_id"),
        ids => { BandIndex.forget(s, bandDir, ids, "id"); () }),
      ErasureHub.Target("suffix_index",
        () => SuffixIndex.read(s, sufDir).select($"doc_id"),
        ids => { SuffixIndex.forget(s, sufDir, ids, "id"); () }))
    val sink = ErasureHub.sink(s"$d/hub", "doc_id", targets)
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long](s)
    val q = src.toDF().toDF("doc_id").writeStream.foreachBatch(sink)
      .option("checkpointLocation", s"$d/ckpt").start()
    src.addData(3L)
    q.processAllAvailable()
    src.addData(5L)
    q.processAllAvailable()
    q.stop()
    assert(BandIndex.readFps(s, bandDir).select($"doc_id")
      .as[Long].collect().toSet == Set(1L, 2L, 4L))
    assert(SuffixIndex.read(s, sufDir).select($"doc_id").distinct()
      .as[Long].collect().toSet == Set(1L, 2L, 4L))
    // redelivery of an already-drained id: a clean zero-op
    sink(Seq(3L).toDF("doc_id"), 99L)
    assert(SuffixIndex.read(s, sufDir).select($"doc_id").distinct()
      .as[Long].collect().toSet == Set(1L, 2L, 4L))
    assert(!ErasureHub.pending(s, s"$d/hub"))
  }
}
