package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index lifecycle: build → save → load must be a
  * lossless round trip (identical search results), the frozen-model
  * append path must make new vectors findable without a retrain, the
  * build must be deterministic, and the end-to-end rerank recall must
  * hold the IvfPqSpec-level gate through the index API. */
class VectorIndexSpec extends SparkSpec {

  private val Dim = 64
  private val Cells = 8
  private val M = 8
  private val Ks = 16
  private val Probes = 3
  private val TopK = 10

  private def embs = {
    val s = spark
    import s.implicits._
    Tables.embeddings(s, sfDir).select($"vec_id", $"embedding")
  }

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  test("save → load round-trips the index: identical search results") {
    val s = spark
    import s.implicits._
    val idx = VectorIndex.build(embs, "vec_id", "embedding", Dim, Cells, M, Ks)
    val path = tmp("vidx_rt")
    VectorIndex.save(idx, "vec_id", path)
    val (loaded, idCol) = VectorIndex.load(s, path)
    assert(idCol == "vec_id")
    assert(loaded.dim == Dim && loaded.m == M && loaded.ks == Ks)
    assert(loaded.centroids.map(_._1) == idx.centroids.map(_._1))
    assert(loaded.centroids.zip(idx.centroids)
      .forall { case ((_, a), (_, b)) => a.sameElements(b) })
    assert(loaded.pq == idx.pq)
    val q = embs.where($"vec_id" === 3L).select($"embedding")
      .as[Array[Float]].head()
    val a = VectorIndex.search(idx, "vec_id", q, Probes, TopK)
      .select($"vec_id", $"adc_dist2").as[(Long, Double)].collect().toSeq
    val b = VectorIndex.search(loaded, "vec_id", q, Probes, TopK)
      .select($"vec_id", $"adc_dist2").as[(Long, Double)].collect().toSeq
    assert(a == b, "loaded index must search identically to the built one")
  }

  test("assignCells matches the codes table of an index built on the same centroids") {
    val s = spark
    import s.implicits._
    val idx = VectorIndex.build(embs, "vec_id", "embedding", Dim, Cells, M, Ks)
    val fromIndex = idx.codes.select($"vec_id", $"cluster")
      .as[(Long, Long)].collect().toMap
    val standalone = VectorIndex
      .assignCells(embs, "vec_id", "embedding", idx.centroids)
      .as[(Long, Long)].collect().toMap
    assert(standalone == fromIndex,
      "assignment-only routing must agree with the encode path cell-for-cell")
  }

  test("build is deterministic: two builds produce identical codes") {
    val s = spark
    import s.implicits._
    val a = VectorIndex.build(embs, "vec_id", "embedding", Dim, Cells, M, Ks)
      .codes.as[(Long, Long, Array[Int])].collect()
      .map(t => (t._1, t._2, t._3.toSeq)).toSet
    val b = VectorIndex.build(embs, "vec_id", "embedding", Dim, Cells, M, Ks)
      .codes.as[(Long, Long, Array[Int])].collect()
      .map(t => (t._1, t._2, t._3.toSeq)).toSet
    assert(a == b)
  }

  test("frozen-model append makes new vectors findable without retrain") {
    val s = spark
    import s.implicits._
    val cut = embs.agg(expr("approx_percentile(vec_id, 0.8, 1000000)"))
      .head().getLong(0)
    val base = embs.where($"vec_id" <= cut)
    val extra = embs.where($"vec_id" > cut)
    val nExtra = extra.count()
    assert(nExtra > 0, "fixture must leave an append slice")
    val idx = VectorIndex.build(base, "vec_id", "embedding", Dim, Cells, M, Ks)
    val path = tmp("vidx_app")
    VectorIndex.save(idx, "vec_id", path)
    VectorIndex.appendTo(path, idx, "vec_id", extra, "embedding", batchId = 0L)
    // at-least-once RETRY of the same batch must not duplicate rows
    VectorIndex.appendTo(path, idx, "vec_id", extra, "embedding", batchId = 0L)
    val (loaded, _) = VectorIndex.load(s, path)
    assert(loaded.codes.count() == embs.count(),
      "codes table must hold base + appended vectors exactly once (retry-stable)")
    // an appended vector must find ITSELF first under exact rerank
    val probe = extra.orderBy($"vec_id").limit(1)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].head()
    val top = VectorIndex
      .searchRerank(loaded, embs, "vec_id", "embedding", probe._2,
        probes = Probes, k = 1, shortlist = 10)
      .select($"vec_id").as[Long].head()
    assert(top == probe._1,
      s"appended vector ${probe._1} must be its own nearest neighbor, got $top")
  }

  test("streaming ingest: micro-batches land via foreachBatch, searchable after") {
    val s = spark
    import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = s.sqlContext
    val cut = embs.agg(expr("approx_percentile(vec_id, 0.8, 1000000)"))
      .head().getLong(0)
    val base = embs.where($"vec_id" <= cut)
    val extra = embs.where($"vec_id" > cut)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val idx = VectorIndex.build(base, "vec_id", "embedding", Dim, Cells, M, Ks)
    val path = tmp("vidx_stream")
    VectorIndex.save(idx, "vec_id", path)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val q = in.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch(VectorIndex.ingestSink(path, idx, "vec_id", "embedding"))
      .outputMode("append").start()
    try {
      val (b1, b2) = extra.splitAt(extra.length / 2)
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val (loaded, _) = VectorIndex.load(s, path)
    assert(loaded.codes.count() == embs.count(),
      "both micro-batches must land exactly once")
    val probe = extra.last
    val top = VectorIndex
      .searchRerank(loaded, embs, "vec_id", "embedding", probe._2,
        probes = Probes, k = 1, shortlist = 10)
      .select($"vec_id").as[Long].head()
    assert(top == probe._1,
      s"streamed vector ${probe._1} must be its own nearest neighbor, got $top")
    // compacting batch partitions changes nothing a reader can observe
    val before = VectorIndex
      .search(loaded, "vec_id", probe._2, Probes, TopK)
      .as[(Long, Long, Double)].collect().toSeq
    VectorIndex.compactBatches(s, path)
    val (compacted, _) = VectorIndex.load(s, path)
    assert(compacted.codes.count() == embs.count())
    val after = VectorIndex
      .search(compacted, "vec_id", probe._2, Probes, TopK)
      .as[(Long, Long, Double)].collect().toSeq
    assert(after == before, "search results must survive compaction exactly")
  }

  test("probe-3 rerank recall@10 holds the IvfPq gate through the index API") {
    val s = spark
    import s.implicits._
    val idx = VectorIndex.build(embs, "vec_id", "embedding", Dim, Cells, M, Ks)
    idx.codes.localCheckpoint()
    val corpus = embs.as[(Long, Array[Float])].collect()
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var x = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i); x += d * d; i += 1 }
      x
    }
    val queries = corpus.filter(_._1 < 8).sortBy(_._1)
    var hit = 0; var tot = 0
    queries.foreach { case (_, qv) =>
      val got = VectorIndex
        .searchRerank(idx, embs, "vec_id", "embedding", qv,
          probes = Probes, k = TopK, shortlist = 90)
        .select($"vec_id").as[Long].collect().toSet
      val truth = corpus.map { case (id, v) => (id, d2(v, qv)) }
        .sortBy { case (id, d) => (d, id) }.take(TopK).map(_._1).toSet
      hit += got.intersect(truth).size; tot += TopK
    }
    val recall = hit.toDouble / tot
    info(f"VectorIndex probe-$Probes rerank recall@$TopK = $recall%.3f")
    assert(recall >= 0.60, f"index recall regressed: $recall%.3f")
  }

  test("OPQ-rotated lifecycle: round-trip, rotated append, recall holds the gate") {
    val s = spark
    import s.implicits._
    val idx = VectorIndex.buildRotated(
      embs.where($"vec_id" % 10 =!= 0), "vec_id", "embedding", Dim, Cells, M, Ks)
    assert(idx.rotation.isDefined)
    val path = tmp("vidx_opq")
    VectorIndex.save(idx, "vec_id", path)
    val (loaded, _) = VectorIndex.load(s, path)
    // rotation round-trips exactly (doubles persisted, not re-fit)
    assert(loaded.rotation.isDefined)
    assert(loaded.rotation.get.mean.sameElements(idx.rotation.get.mean))
    assert(loaded.rotation.get.rows.zip(idx.rotation.get.rows)
      .forall { case (a, b) => a.sameElements(b) })
    // frozen-model append rotates the incoming batch through the SAME
    // matrix — appended vectors must be findable
    VectorIndex.appendTo(path, loaded, "vec_id",
      embs.where($"vec_id" % 10 === 0), "embedding", batchId = 1L)
    val (full, _) = VectorIndex.load(s, path)
    full.codes.localCheckpoint()
    val corpus = embs.as[(Long, Array[Float])].collect()
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var x = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i); x += d * d; i += 1 }
      x
    }
    val queries = corpus.filter(_._1 < 8).sortBy(_._1)
    var hit = 0; var tot = 0
    queries.foreach { case (_, qv) =>
      // raw-space query: search rotates it internally; rerank stays raw
      val got = VectorIndex
        .searchRerank(full, embs, "vec_id", "embedding", qv,
          probes = Probes, k = TopK, shortlist = 90)
        .select($"vec_id").as[Long].collect().toSet
      val truth = corpus.map { case (id, v) => (id, d2(v, qv)) }
        .sortBy { case (id, d) => (d, id) }.take(TopK).map(_._1).toSet
      hit += got.intersect(truth).size; tot += TopK
    }
    val recall = hit.toDouble / tot
    info(f"OPQ-rotated lifecycle recall@$TopK = $recall%.3f")
    assert(recall >= 0.60, f"rotated-index recall below gate: $recall%.3f")
  }

  // ---- forget (round-8 verdict #4: erasure as an index operation) ----

  /** Recursively lists (relative path, size, bytes-md5) of every data
    * file under a partition dir — the byte-identity witness. */
  private def partitionFingerprint(dir: java.nio.file.Path): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.exists(dir)) Map.empty
    else java.nio.file.Files.walk(dir).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .filterNot(_.getFileName.toString.startsWith(".")) // no CRCs
      .map { f =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(java.nio.file.Files.readAllBytes(f))
          .map("%02x".format(_)).mkString
        dir.relativize(f).toString -> h
      }.toMap
  }

  test("forget: ids gone from disk and from every search path; " +
    "untouched partitions byte-identical; retry is a no-op") {
    val s = spark
    import s.implicits._
    val idx = VectorIndex.build(embs, "vec_id", "embedding", Dim, Cells, M, Ks)
    val path = tmp("vidx_forget")
    VectorIndex.save(idx, "vec_id", path)
    // deletion list: every 7th id of ONE victim cluster, so at least one
    // cluster's partition is provably untouched
    val byCell = idx.codes.groupBy($"cluster").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc).as[(Long, Long)].collect()
    val victim = byCell.head._1
    val spared = byCell.last._1
    assert(victim != spared)
    val delIds = idx.codes.where($"cluster" === victim && $"vec_id" % 7 === 0)
      .select($"vec_id")
    val nDel = delIds.count()
    assert(nDel > 0, "fixture must give the victim cluster deletable ids")
    val sparedDir = java.nio.file.Paths.get(
      path, "codes", "batch_id=-1", s"cluster=$spared")
    val fpBefore = partitionFingerprint(sparedDir)
    assert(fpBefore.nonEmpty, "spared partition must exist on disk")
    val total = idx.codes.count()

    val stats = VectorIndex.forget(s, path, delIds.toDF(), "vec_id")
    assert(stats.nForgotten == nDel)
    assert(stats.nPartsRewritten + stats.nPartsDeleted == 1L,
      "only the victim cluster's single (batch, cell) partition is touched")

    // disk truth: forgotten ids gone, survivors intact, spared bytes equal
    val (reloaded, _) = VectorIndex.load(s, path)
    assert(reloaded.codes.count() == total - nDel)
    val delSet = delIds.as[Long].collect().toSet
    assert(reloaded.codes.where($"vec_id".isin(delSet.toSeq: _*)).count() == 0)
    assert(partitionFingerprint(sparedDir) == fpBefore,
      "untouched partition must keep its exact bytes")

    // no search path may surface a forgotten id (probe ALL cells so the
    // victim cell is definitely searched)
    val q = embs.where($"vec_id".isin(delSet.toSeq.sorted.take(1): _*))
      .select($"embedding").as[Array[Float]].head()
    val adc = VectorIndex.search(reloaded, "vec_id", q, Cells, 50)
      .select($"vec_id").as[Long].collect()
    val flat = VectorIndex.searchFlat(reloaded, embs, "vec_id", "embedding",
      q, Cells, 50).select($"vec_id").as[Long].collect()
    val rr = VectorIndex.searchRerank(reloaded, embs, "vec_id", "embedding",
      q, Cells, 20, 50).select($"vec_id").as[Long].collect()
    assert((adc ++ flat ++ rr).forall(id => !delSet(id)),
      "a forgotten id surfaced from a search path")

    // retry-idempotence: same call again converges to a zero-op
    val again = VectorIndex.forget(s, path, delIds.toDF(), "vec_id")
    assert(again == VectorIndex.ForgetStats(0L, 0L, 0L))
    assert(VectorIndex.load(s, path)._1.codes.count() == total - nDel)
  }

  test("forgetSink: a streaming deletion feed drains through foreachBatch, " +
    "redelivery is a no-op") {
    val s = spark
    import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = s.sqlContext
    val idx = VectorIndex.build(embs, "vec_id", "embedding", Dim, Cells, M, Ks)
    val path = tmp("vidx_forget_stream")
    VectorIndex.save(idx, "vec_id", path)
    val total = idx.codes.count()
    val dels = embs.where($"vec_id" % 5 === 0).select($"vec_id")
      .as[Long].collect().sorted
    assert(dels.length > 1)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = in.toDF().toDF("vec_id")
      .writeStream
      .foreachBatch(VectorIndex.forgetSink(path, "vec_id"))
      .outputMode("append").start()
    try {
      val (b1, b2) = dels.splitAt(dels.length / 2)
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
      in.addData(b1.toIndexedSeq); q.processAllAvailable() // redelivery
    } finally q.stop()
    val (reloaded, _) = VectorIndex.load(s, path)
    assert(reloaded.codes.count() == total - dels.length,
      "each deletion applied exactly once across batches + redelivery")
    assert(reloaded.codes
      .where($"vec_id".isin(dels.toSeq: _*)).count() == 0)
  }

  test("forget: a fully-erased partition's directory is deleted, " +
    "and the index stays loadable and searchable") {
    val s = spark
    import s.implicits._
    val idx = VectorIndex.build(embs, "vec_id", "embedding", Dim, Cells, M, Ks)
    val path = tmp("vidx_forget_all")
    VectorIndex.save(idx, "vec_id", path)
    val victim = idx.codes.groupBy($"cluster").agg(count(lit(1)).as("n"))
      .orderBy($"n".asc).as[(Long, Long)].collect().head._1
    val delIds = idx.codes.where($"cluster" === victim).select($"vec_id")
    val nDel = delIds.count()
    val stats = VectorIndex.forget(s, path, delIds.toDF(), "vec_id")
    assert(stats == VectorIndex.ForgetStats(nDel, 0L, 1L))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      path, "codes", "batch_id=-1", s"cluster=$victim")),
      "emptied partition directory must be removed")
    val (reloaded, _) = VectorIndex.load(s, path)
    assert(reloaded.codes.where($"cluster" === victim).count() == 0)
    val q = embs.orderBy($"vec_id").limit(1)
      .select($"embedding").as[Array[Float]].head()
    assert(VectorIndex.searchFlat(reloaded, embs, "vec_id", "embedding",
      q, Cells, 10).count() > 0, "index must keep serving after the erase")
  }
}
