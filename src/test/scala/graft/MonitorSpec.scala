package graft

import graft.core.Tables
import graft.operators.SketchRollup
import graft.streaming.StreamingCentroidMonitor
import org.apache.spark.sql.functions._

/** The ops-report consumer seam (r6 verdict #8): [[Monitor.stateReport]]
  * must actually read BOTH persisted streaming-state table families —
  * the centroid moment table (served + drift-scored) and the HLL sketch
  * table (cell census + global UV by union) — and report the numbers
  * the underlying operators' own specs prove. */
class MonitorSpec extends SparkSpec {

  test("stateReport reads both persisted state families") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_monitor").toString

    // centroid moment table: two batches through the foreachBatch sink
    val moments = s"$dir/moments.parquet"
    val emb = Tables.embeddings(s, sfDir)
      .where($"label".isNotNull && $"embedding".isNotNull)
      .select($"vec_id", $"label".cast("long").as("label"), $"embedding")
    val sink = StreamingCentroidMonitor.sink(moments, "label", "embedding")
    sink(emb.where($"vec_id" % 2 === 0), 0L)
    sink(emb.where($"vec_id" % 2 === 1), 1L)

    // sketch table: per-event-type UV sketches persisted once
    val sketches = s"$dir/uv.parquet"
    SketchRollup.sketchTable(Tables.events(s, sfDir),
        Seq("event_type"), "user_id")
      .write.mode("overwrite").parquet(sketches)

    // reference = the served centroids themselves => drift exactly 1.0
    val ref = StreamingCentroidMonitor.centroids(s, moments)
      .select($"label", $"centroid")
    val report = Monitor.stateReport(s, moments, ref, sketches)
      .orderBy($"family").collect()

    assert(report.map(_.getString(0)).toSeq == Seq("centroids", "uv_sketch"))
    val cent = report(0)
    val nLabels = emb.select($"label").distinct().count()
    assert(cent.getLong(1) == nLabels, "one monitored row per label")
    assert(cent.getDouble(2) == 1.0, "self-reference drift must be exactly 1.0")

    val uv = report(1)
    val nCells = spark.read.parquet(sketches).count()
    assert(uv.getLong(1) == nCells, "cell census must match the stored table")
    // union-served estimate == direct whole-table sketch estimate (the
    // SketchRollupSpec exactness claim, consumed through the report)
    val direct = Tables.events(s, sfDir)
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(14)))
        .cast("double").as("uv"))
      .collect().head.getDouble(0)
    assert(uv.getDouble(2) == direct,
      s"report UV ${uv.getDouble(2)} != direct sketch estimate $direct")
  }

  test("stateReport warehouse tables report column-grain completeness") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_monitor2").toString
    val moments = s"$dir/moments.parquet"
    val emb = Tables.embeddings(s, sfDir)
      .where($"label".isNotNull && $"embedding".isNotNull)
      .select($"label".cast("long").as("label"), $"embedding")
    StreamingCentroidMonitor.sink(moments, "label", "embedding")(emb, 0L)
    val sketches = s"$dir/uv.parquet"
    SketchRollup.sketchTable(Tables.events(s, sfDir),
        Seq("event_type"), "user_id")
      .write.mode("overwrite").parquet(sketches)
    val ref = StreamingCentroidMonitor.centroids(s, moments)
      .select($"label", $"centroid")

    val wh = Seq(
      "docs" -> Seq((1L, "a"), (2L, null.asInstanceOf[String]),
        (3L, "c"), (4L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val report = Monitor.stateReport(s, moments, ref, sketches, wh)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // the state families are still there
    assert(report.contains("centroids") && report.contains("uv_sketch"))
    // one row per profiled column, completeness = integer ppm (round 12:
    // round(fraction, 6) was the q149 cross-engine round-boundary class)
    assert(report("profile:docs.doc_id") == ((4L, 1000000.0)))
    assert(report("profile:docs.text") == ((4L, 500000.0)))
  }

  test("stateReport serves the ingest-maintained MV census per language") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_monitor3").toString
    val moments = s"$dir/moments.parquet"
    val emb = Tables.embeddings(s, sfDir)
      .where($"label".isNotNull && $"embedding".isNotNull)
      .select($"label".cast("long").as("label"), $"embedding")
    StreamingCentroidMonitor.sink(moments, "label", "embedding")(emb, 0L)
    val sketches = s"$dir/uv.parquet"
    SketchRollup.sketchTable(Tables.events(s, sfDir),
        Seq("event_type"), "user_id")
      .write.mode("overwrite").parquet(sketches)
    val ref = StreamingCentroidMonitor.centroids(s, moments)
      .select($"label", $"centroid")

    val docs = Tables.documents(s, sfDir)
      .where($"doc_id".isNotNull && $"text".isNotNull)
    graft.streaming.StreamingMvCensus
      .sink(s"$dir/mv_doc", s"$dir/mv_vocab")(docs, 0L)
    val report = Monitor.stateReport(s, moments, ref, sketches,
        mvCensus = Some((s"$dir/mv_doc", s"$dir/mv_vocab")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val perLang = docs.groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    perLang.foreach { case (lang, n) =>
      val (gotN, gotVocab) = report(s"mv:$lang")
      assert(gotN == n, s"mv:$lang doc count")
      assert(gotVocab > 0, s"mv:$lang vocabulary")
    }
  }

  test("stateReport serves the CountMin and CDC state families " +
    "(round-9: every persisted streaming state table is consumable)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_monitor4").toString
    val moments = s"$dir/moments.parquet"
    val emb = Tables.embeddings(s, sfDir)
      .where($"label".isNotNull && $"embedding".isNotNull)
      .select($"label".cast("long").as("label"), $"embedding")
    StreamingCentroidMonitor.sink(moments, "label", "embedding")(emb, 0L)
    val sketches = s"$dir/uv.parquet"
    SketchRollup.sketchTable(Tables.events(s, sfDir),
        Seq("event_type"), "user_id")
      .write.mode("overwrite").parquet(sketches)
    val ref = StreamingCentroidMonitor.centroids(s, moments)
      .select($"label", $"centroid")

    // CountMin store: two micro-batches + an at-least-once RETRY of the
    // second — the served item count must see each item exactly once
    val cmPath = s"$dir/cm"
    val ev = Tables.events(s, sfDir)
      .where($"user_id".isNotNull).select($"event_type", $"user_id")
    val cmSink = graft.operators.CountMin
      .sink(cmPath, Seq("event_type"), "user_id", d = 3, w = 64)
    cmSink(ev.where($"user_id" % 2 === 0), 0L)
    cmSink(ev.where($"user_id" % 2 === 1), 1L)
    cmSink(ev.where($"user_id" % 2 === 1), 1L) // retry overwrites itself

    // CDC append sink: key 1 updated twice (the nOps=1 emission is
    // STALE and must lose to nOps=2), key 2 ends tombstoned, key 3 live
    val cdcPath = s"$dir/cdc"
    Seq(
      graft.streaming.CdcRow(1L, 1L, 0L, isDel = false, 10L),
      graft.streaming.CdcRow(1L, 2L, 0L, isDel = false, 25L),
      graft.streaming.CdcRow(2L, 1L, 0L, isDel = false, 7L),
      graft.streaming.CdcRow(2L, 2L, 1L, isDel = true, 7L),
      graft.streaming.CdcRow(3L, 1L, 0L, isDel = false, 3L))
      .toDF().write.mode("overwrite").parquet(cdcPath)

    val report = Monitor.stateReport(s, moments, ref, sketches,
        countMin = Some((cmPath, Seq("event_type"))),
        cdc = Some(cdcPath))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val (cmCells, cmItems) = report("countmin")
    assert(cmItems == ev.count().toDouble,
      "row-0 counter mass must equal the exact delivered item count")
    val served = graft.operators.CountMin.served(s, cmPath, Seq("event_type"))
    assert(cmCells == served.count(), "served sparse-cell census")
    val (cdcKeys, cdcLive) = report("cdc")
    assert(cdcKeys == 3L, "keys ever tracked")
    assert(cdcLive == 2.0, "tombstoned key excluded from live count")
    // the reconstruction picked the LATEST emission for key 1
    val k1 = graft.streaming.CdcMachine
      .reconstruct(s.read.parquet(cdcPath))
      .where($"key" === 1L).select($"cents").as[Long].head()
    assert(k1 == 25L)
  }

  test("stateReport serves the shard-export manifest (round-9: every " +
    "persisted artifact is monitor-consumable)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    import graft.operators.SeqPacker
    val dir = java.nio.file.Files.createTempDirectory("graft_monitor5").toString
    val moments = s"$dir/moments.parquet"
    val emb = Tables.embeddings(s, sfDir)
      .where($"label".isNotNull && $"embedding".isNotNull)
      .select($"label".cast("long").as("label"), $"embedding")
    StreamingCentroidMonitor.sink(moments, "label", "embedding")(emb, 0L)
    val sketches = s"$dir/uv.parquet"
    SketchRollup.sketchTable(Tables.events(s, sfDir),
        Seq("event_type"), "user_id")
      .write.mode("overwrite").parquet(sketches)
    val ref = StreamingCentroidMonitor.centroids(s, moments)
      .select($"label", $"centroid")
    val exp = s"$dir/export"
    val pieces = Seq(
      SeqPacker.Piece("en", 0L, 0L, 0L, 1L, 400L),
      SeqPacker.Piece("en", 0L, 1L, 0L, 2L, 200L),
      SeqPacker.Piece("fr", 0L, 0L, 0L, 3L, 512L)).toDS()
    SeqPacker.writeShards(SeqPacker.pack(pieces, 512), exp)
    val report = Monitor.stateReport(s, moments, ref, sketches,
        export = Some(exp))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val (nShards, fill) = report("export")
    assert(nShards == 2L, "one manifest row per shard")
    // (400+200) packs as two seqs in (en,0) + 512 fills (fr,0): 3 seqs
    assert(math.abs(fill - 1112.0 * 1000000 / (3 * 512)) < 1e-6,
      "global fill ppm off the manifest alone")
  }

  test("stateReport serves the bpe_vocab and suffix_index artifacts " +
    "(round-10: meta-only health rows)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_monitor6").toString
    val moments = s"$dir/moments.parquet"
    val emb = Tables.embeddings(s, sfDir)
      .where($"label".isNotNull && $"embedding".isNotNull)
      .select($"label".cast("long").as("label"), $"embedding")
    StreamingCentroidMonitor.sink(moments, "label", "embedding")(emb, 0L)
    val sketches = s"$dir/uv.parquet"
    SketchRollup.sketchTable(Tables.events(s, sfDir),
        Seq("event_type"), "user_id")
      .write.mode("overwrite").parquet(sketches)
    val ref = StreamingCentroidMonitor.centroids(s, moments)
      .select($"label", $"centroid")
    val vocab = s"$dir/vocab"
    graft.operators.BpeTrainer.save(s,
      Seq("a" -> "b", "ab" -> "c", "x" -> "y"), vocab)
    val six = s"$dir/suffix"
    val docs = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val toks = docs.select($"doc_id",
      posexplode(split(trim($"text"), "\\s+"))).toDF("doc_id", "pos", "tok")
    graft.operators.SuffixIndex.ensure(six, docs, toks)
    val report = Monitor.stateReport(s, moments, ref, sketches,
        bpeVocab = Some(vocab), suffixIndex = Some(six))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(report("bpe_vocab") == ((3L, 3.0)),
      "merge count with contiguous ranks: n == metric")
    assert(report("suffix_index") == ((8L, 2.0)),
      "8 positions over 2 docs, unscrubbed")
    graft.operators.SuffixIndex.forget(s, six, Seq(2L).toDF("gone"), "gone")
    val after = Monitor.stateReport(s, moments, ref, sketches,
        suffixIndex = Some(six))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(after("suffix_index") == ((4L, -2.0)),
      "scrubbed index signals with -(docs+1) — distinguishable from a " +
        "clean empty index even when a scrub removed every doc")
    assert(!after.contains("suffix_ingest"),
      "no quarantine ⟹ no suffix_ingest row")
    // quarantined batches surface as the companion row (round 12):
    // n pending docs, metric pending batches — the exact tier's lag
    graft.operators.SuffixIndex.append(s, six,
      Seq((7L, "x y"), (8L, "z w")).toDF("doc_id", "text"), 0L)
    graft.operators.SuffixIndex.append(s, six,
      Seq((9L, "q r")).toDF("doc_id", "text"), 1L)
    val pending = Monitor.stateReport(s, moments, ref, sketches,
        suffixIndex = Some(six))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(pending("suffix_ingest") == ((3L, 2.0)),
      "3 pending docs across 2 batches")
    // a crashed compact's sidecar counts too (round-12 review: the
    // in-tree-only count showed zero lag in exactly the crashed state)
    graft.sources.ArtifactCommit.writeFrameWal(
      Seq((20L, "side doc", 5L)).toDF("doc_id", "text", "batch_id"),
      graft.operators.SuffixIndex.compactPendingPath(six))
    val withSide = Monitor.stateReport(s, moments, ref, sketches,
        suffixIndex = Some(six))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(withSide("suffix_ingest") == ((4L, 3.0)),
      "sidecar doc joins the pending census")
  }

  test("erasure families: an empty drain log yields NO rows — a 0.0 s " +
    "SLA with zero runs would read as healthy when no erasure ever ran") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_monitor7").toString
    val moments = s"$dir/moments.parquet"
    val emb = Tables.embeddings(s, sfDir)
      .where($"label".isNotNull && $"embedding".isNotNull)
      .select($"label".cast("long").as("label"), $"embedding")
    StreamingCentroidMonitor.sink(moments, "label", "embedding")(emb, 0L)
    val sketches = s"$dir/uv.parquet"
    SketchRollup.sketchTable(Tables.events(s, sfDir),
        Seq("event_type"), "user_id")
      .write.mode("overwrite").parquet(sketches)
    val ref = StreamingCentroidMonitor.centroids(s, moments)
      .select($"label", $"centroid")
    val fams = Monitor.stateReport(s, moments, ref, sketches,
        erasureHub = Some(s"$dir/empty_hub"))
      .collect().map(_.getString(0)).toSet
    assert(!fams.exists(_.startsWith("erasure")),
      s"no drains logged ⟹ no erasure rows, got $fams")
  }

  test("stateReport serves the erasure SLA off the hub's persisted " +
    "drain log — latest run per store, slowest store as the summary " +
    "(round 12: previously stderr-only)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_monitor6").toString
    val moments = s"$dir/moments.parquet"
    val emb = Tables.embeddings(s, sfDir)
      .where($"label".isNotNull && $"embedding".isNotNull)
      .select($"label".cast("long").as("label"), $"embedding")
    StreamingCentroidMonitor.sink(moments, "label", "embedding")(emb, 0L)
    val sketches = s"$dir/uv.parquet"
    SketchRollup.sketchTable(Tables.events(s, sfDir),
        Seq("event_type"), "user_id")
      .write.mode("overwrite").parquet(sketches)
    val ref = StreamingCentroidMonitor.centroids(s, moments)
      .select($"label", $"centroid")
    // two real stores drained through the hub (the ErasureHubSpec shape)
    val docs = Seq((1L, "a b c d"), (2L, "e f g h"), (3L, "i j k l"))
      .toDF("doc_id", "text")
    val bandDir = graft.operators.BandIndex.ensure(s"$dir/band", docs,
      "doc_id", "text", k = 2, nh = 8, b = 4, r = 2)
    val six = s"$dir/suffix"
    graft.operators.SuffixIndex.ensure(six, docs,
      docs.select($"doc_id", posexplode(split(trim($"text"), "\\s+")))
        .toDF("doc_id", "pos", "tok"))
    val targets = Seq(
      graft.operators.ErasureHub.Target("band_index",
        () => graft.operators.BandIndex.readFps(s, bandDir)
          .select($"doc_id"),
        ids => { graft.operators.BandIndex.forget(s, bandDir, ids, "id"); () }),
      graft.operators.ErasureHub.Target("suffix_index",
        () => graft.operators.SuffixIndex.read(s, six).select($"doc_id"),
        ids => { graft.operators.SuffixIndex.forget(s, six, ids, "id"); () }))
    val hub = s"$dir/hub"
    graft.operators.ErasureHub.run(s, hub,
      Seq(2L).toDF("doc_id"), "doc_id", targets)
    // second run (different feed) — the monitor must serve the LATEST
    graft.operators.ErasureHub.run(s, hub,
      Seq(1L, 3L).toDF("doc_id"), "doc_id", targets)
    assert(graft.operators.ErasureHub.drainLog(s, hub).count() == 4L,
      "two runs × two stores logged")
    val report = Monitor.stateReport(s, moments, ref, sketches,
        erasureHub = Some(hub))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // latest run hit 2 keys per store (the WAL unions run 1's already-
    // erased id 2 back into run 2's feed; it no longer matches stored
    // keys, so hits are ids 1 and 3)
    assert(report("erasure:band_index")._1 == 2L)
    assert(report("erasure:suffix_index")._1 == 2L)
    assert(report("erasure:band_index")._2 >= 0.0)
    val (nStores, slowest) = report("erasure_sla")
    assert(nStores == 2L)
    assert(slowest >= report("erasure:band_index")._2 &&
      slowest >= report("erasure:suffix_index")._2,
      "the SLA summary is the slowest store's latest drain")
  }
}
