package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the [[SuffixIndex]] incremental-ingest tier (round 12, VERDICT
  * r11 #1): [[SuffixIndex.append]] quarantines batches idempotently
  * without touching the exact tables, [[SuffixIndex.compact]] folds
  * them into ONE ladder rebuild that equals a from-scratch build over
  * the merged corpus, the out-of-tree sidecar carries pending docs
  * across every compact crash window, a crashed forget's erasure
  * commitment survives the compaction, and [[SuffixIndex.forget]]
  * scrubs quarantined raw text too. */
class SuffixIngestSpec extends SparkSpec {

  private def dir(tag: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_suffix_ing_$tag").toString
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    fs.delete(SuffixIndex.compactPendingPath(p), true)
    fs.delete(new org.apache.hadoop.fs.Path(
      SuffixIndex.compactPendingPath(p).toString + "_staged"), true)
    p
  }

  private val baseRows = Seq(
    (1L, "a b c d e f g h"),
    (2L, "a b c d x y z w"),
    (3L, "q r s t u v"))
  private val deltaRows = Seq(
    (60L, "a b c d e f g h"), // exact dup of doc 1: changes doc 1's best
    (61L, "m n o p q r s t"))

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def tokenize(df: org.apache.spark.sql.DataFrame) = {
    val s = spark; import s.implicits._
    df.select($"doc_id",
      posexplode(split(trim($"text"), "\\s+"))).toDF("doc_id", "pos", "tok")
  }

  private def bestSet(d: String): Set[(Long, Long, Long)] =
    SuffixIndex.read(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def bruteSet(rows: Seq[(Long, String)]): Set[(Long, Long, Long)] =
    SuffixRank.bestPerPosition(tokenize(docsDf(rows)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("append quarantines without touching the exact tables; " +
    "redelivery is idempotent; compact == full rebuild over the merge") {
    val s = spark; import s.implicits._
    val d = dir("fold")
    SuffixIndex.ensure(d, docsDf(baseRows), tokenize(docsDf(baseRows)))
    val baseBest = bestSet(d)
    SuffixIndex.append(s, d, docsDf(deltaRows.take(1)), 0L)
    SuffixIndex.append(s, d, docsDf(deltaRows.drop(1)), 1L)
    // redelivery of batch 0: rewrites itself, no duplication
    SuffixIndex.append(s, d, docsDf(deltaRows.take(1)), 0L)
    assert(SuffixIndex.readPending(s, d).count() == 2L)
    assert(SuffixIndex.tierPending(s, d))
    // the exact tables are untouched by appends
    assert(bestSet(d) == baseBest, "append must not touch the exact tier")
    // compact: one rebuild over base ∪ pending == a from-scratch build
    val got = SuffixIndex.compact(d, docsDf(baseRows), tokenize)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == bruteSet(baseRows ++ deltaRows),
      "compacted tier must equal the full rebuild")
    assert(got != baseBest, "the dup batch must change base docs' best")
    // ingest tier cleared with the publish; fingerprint = merged corpus
    assert(SuffixIndex.readPending(s, d).count() == 0L)
    assert(!SuffixIndex.tierPending(s, d))
    val (fpM, nM) =
      SuffixIndex.fingerprintOf(docsDf(baseRows ++ deltaRows))
    val m = SuffixIndex.readMeta(s, d).get
    assert(m.fingerprint == fpM && m.nDocs == nM && !m.scrubbed)
    // serve path: ensure with the MERGED slice cache-hits (no rebuild)
    val merged = baseRows ++ deltaRows
    val again = SuffixIndex.ensure(d, docsDf(merged),
      sys.error("cache hit must not tokenize"))
    assert(again.count() == got.size.toLong)
  }

  test("keep-latest: a pending doc shadows its base twin, and within " +
    "the quarantine the max batch_id wins") {
    val s = spark
    val d = dir("latest")
    SuffixIndex.ensure(d, docsDf(baseRows), tokenize(docsDf(baseRows)))
    // doc 2 re-ingested twice with different texts; batch 5 must win
    SuffixIndex.append(s, d, docsDf(Seq((2L, "j k l"))), 3L)
    SuffixIndex.append(s, d, docsDf(Seq((2L, "m n o p"))), 5L)
    SuffixIndex.compact(d, docsDf(baseRows), tokenize)
    val expect = bruteSet(baseRows.filterNot(_._1 == 2L) :+
      ((2L, "m n o p")))
    assert(bestSet(d) == expect, "latest batch version must be the one folded")
  }

  test("compact crash window A (mid-publish): sidecar staged, in-tree " +
    "ingest and live tree gone — retry still folds the pending docs") {
    val s = spark
    val d = dir("crashA")
    SuffixIndex.ensure(d, docsDf(baseRows), tokenize(docsDf(baseRows)))
    SuffixIndex.append(s, d, docsDf(deltaRows), 0L)
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // simulate the worst prefix: pending staged to the sidecar, then the
    // publish deleted the live tree (ingest/ included) and died before
    // the rename
    SuffixIndex.readPending(s, d)
      .write.parquet(SuffixIndex.compactPendingPath(d).toString)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    assert(SuffixIndex.tierPending(s, d), "sidecar visible to the tier")
    val got = SuffixIndex.compact(d, docsDf(baseRows), tokenize)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == bruteSet(baseRows ++ deltaRows),
      "retry must fold the sidecar's docs")
    assert(!SuffixIndex.tierPending(s, d), "sidecar cleared after commit")
  }

  test("compact crash window A': a sidecar-RE-STAGE crash (only the " +
    "_new fallback survives) still folds — the frame-WAL protocol " +
    "(round-12 review: a hand-rolled delete-then-rename lost the docs)") {
    val s = spark
    val d = dir("crashA2")
    SuffixIndex.ensure(d, docsDf(baseRows), tokenize(docsDf(baseRows)))
    SuffixIndex.append(s, d, docsDf(deltaRows), 0L)
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // the state a retry-of-a-crashed-compact crash leaves: pending only
    // in the `_new` WAL stage (live sidecar already deleted), the
    // in-tree ingest and live tree gone with the first publish
    SuffixIndex.readPending(s, d).write.parquet(
      SuffixIndex.compactPendingPath(d).toString + "_new")
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    assert(SuffixIndex.tierPending(s, d), "_new visible to the tier")
    val got = SuffixIndex.compact(d, docsDf(baseRows), tokenize)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == bruteSet(baseRows ++ deltaRows),
      "retry must fold the _new fallback's docs")
    assert(!SuffixIndex.tierPending(s, d))
  }

  test("compact crash window B (post-publish): already-folded retry " +
    "skips the ladder and just clears the sidecar") {
    val s = spark
    val d = dir("crashB")
    SuffixIndex.ensure(d, docsDf(baseRows), tokenize(docsDf(baseRows)))
    SuffixIndex.append(s, d, docsDf(deltaRows), 0L)
    val pendSnapshot = SuffixIndex.readPending(s, d).localCheckpoint()
    SuffixIndex.compact(d, docsDf(baseRows), tokenize)
    // simulate the crash-between-publish-and-sidecar-clear state
    pendSnapshot.write.parquet(SuffixIndex.compactPendingPath(d).toString)
    val mBefore = SuffixIndex.readMeta(s, d).get
    // a tokenize call here would mean a second ladder build — forbid it
    val got = SuffixIndex.compact(d, docsDf(baseRows),
      _ => sys.error("already-folded retry must not rebuild"))
    assert(got.collect().length.toLong == mBefore.nPos)
    assert(SuffixIndex.readMeta(s, d).get == mBefore, "meta untouched")
    assert(!SuffixIndex.tierPending(s, d), "sidecar cleared")
  }

  test("a crashed forget's erasure commitment survives the compaction " +
    "(rebuildWithPending discipline)") {
    val s = spark; import s.implicits._
    val d = dir("ewal")
    SuffixIndex.ensure(d, docsDf(baseRows), tokenize(docsDf(baseRows)))
    SuffixIndex.append(s, d, docsDf(deltaRows), 0L)
    // a forget of doc 60 (pending only) + doc 1 (compacted) crashed
    // right after its ids-WAL write
    Seq(1L, 60L).toDF("doc_id").coalesce(1)
      .write.parquet(s"$d/_forget_pending_ids")
    val got = SuffixIndex.compact(d, docsDf(baseRows), tokenize)
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(got == Set(2L, 3L, 61L),
      "condemned docs erased from the compacted tier")
    assert(!graft.sources.ArtifactCommit.erasurePending(s, d))
  }

  test("forget scrubs quarantined raw text: hit batches rewritten, " +
    "untouched batches byte-identical, emptied batch dirs dropped") {
    val s = spark; import s.implicits._
    val d = dir("fgq")
    SuffixIndex.ensure(d, docsDf(baseRows), tokenize(docsDf(baseRows)))
    SuffixIndex.append(s, d, docsDf(deltaRows), 0L)          // 60, 61
    SuffixIndex.append(s, d, docsDf(Seq((70L, "x y"))), 1L)  // untouched
    def md5Of(f: java.io.File): Map[String, String] = {
      def walk(x: java.io.File): Seq[java.io.File] =
        if (x.isDirectory) x.listFiles().toSeq.flatMap(walk) else Seq(x)
      walk(f).filterNot(_.getName.startsWith(".")).map { x =>
        x.getPath -> java.security.MessageDigest.getInstance("MD5")
          .digest(java.nio.file.Files.readAllBytes(x.toPath))
          .map("%02x".format(_)).mkString
      }.toMap
    }
    val b1Before = md5Of(new java.io.File(s"$d/ingest/batch_id=1"))
    // doc 61 is ONLY in the quarantine — the delete must reach it there
    val stats = SuffixIndex.forget(s, d, Seq(61L).toDF("gone"), "gone")
    assert(stats.nPartsRewritten == 1L, "batch 0 rewritten (60 survives)")
    // audit counts span both tiers (round-12 review: an ingest-only
    // erasure read as a 0-doc no-op in the GDPR record); nForgotten
    // stays in exact-tier POSITION units — none were touched here
    assert(stats.nDocsForgotten == 1L && stats.nForgotten == 0L,
      "the quarantined doc counts as forgotten (docs, not positions)")
    assert(SuffixIndex.readPending(s, d).select($"doc_id")
      .as[Long].collect().toSet == Set(60L, 70L))
    assert(md5Of(new java.io.File(s"$d/ingest/batch_id=1")) == b1Before,
      "untouched batch byte-identical")
    // ingest-only hit: the exact tables and meta stay unscrubbed
    assert(!SuffixIndex.readMeta(s, d).get.scrubbed,
      "ingest-only forget must not force a rebuild")
    // emptying a batch drops its dir
    val stats2 = SuffixIndex.forget(s, d, Seq(70L).toDF("gone"), "gone")
    assert(stats2.nPartsDeleted == 1L)
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$d/ingest/batch_id=1")))
    // post-success retry: zero-op
    assert(SuffixIndex.forget(s, d, Seq(70L).toDF("gone"), "gone") ==
      SuffixIndex.ForgetStats(0L, 0L, 0L, 0L))
    // emptying the WHOLE quarantine drops the ingest/ parent too — a
    // husk would read as mid-cadence forever and defeat every
    // fingerprint-gated warm serve (round-12 review)
    SuffixIndex.forget(s, d, Seq(60L).toDF("gone"), "gone")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$d/ingest")),
      "empty quarantine parent removed")
    assert(!SuffixIndex.tierPending(s, d),
      "nothing pending after the last quarantined doc is erased")
  }

  test("streaming ingest sink: micro-batches quarantine exactly once, " +
    "then one compact folds the whole stream") {
    val s = spark; import s.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = s.sqlContext
    val d = dir("stream")
    SuffixIndex.ensure(d, docsDf(baseRows), tokenize(docsDf(baseRows)))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(SuffixIndex.ingestSink(d))
      .outputMode("append").start()
    try {
      in.addData(deltaRows.take(1).toIndexedSeq); q.processAllAvailable()
      in.addData(deltaRows.drop(1).toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    assert(SuffixIndex.readPending(s, d).count() == 2L,
      "both micro-batches quarantined exactly once")
    val got = SuffixIndex.compact(d, docsDf(baseRows), tokenize)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == bruteSet(baseRows ++ deltaRows))
  }

  test("forget scrubs a crashed compact's SIDECAR too — a retry must " +
    "not resurrect erased docs into the exact index (round-12 review)") {
    val s = spark; import s.implicits._
    val d = dir("sidescrub")
    SuffixIndex.ensure(d, docsDf(baseRows), tokenize(docsDf(baseRows)))
    SuffixIndex.append(s, d, docsDf(deltaRows), 0L)
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // the dominant compact crash window: pending staged to the sidecar,
    // publish consumed the in-tree ingest, ladder build died
    SuffixIndex.readPending(s, d)
      .write.parquet(SuffixIndex.compactPendingPath(d).toString)
    fs.delete(new org.apache.hadoop.fs.Path(s"$d/ingest"), true)
    // GDPR delete of doc 61 (now sidecar-only) + doc 1 (compacted)
    val stats = SuffixIndex.forget(s, d,
      Seq(1L, 61L).toDF("gone"), "gone")
    assert(stats.nDocsForgotten == 2L,
      "sidecar-only doc counts in the audit record")
    assert(SuffixIndex.pendingDocs(s, d).select($"doc_id")
      .as[Long].collect().toSet == Set(60L),
      "condemned doc scrubbed from the sidecar, survivor kept")
    // the compact retry folds only survivors — no resurrection
    val got = SuffixIndex.compact(d,
      docsDf(baseRows.filterNot(_._1 == 1L)), tokenize)
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(got == Set(2L, 3L, 60L), "erased docs stay erased")
    // overlap state (same rows in BOTH stores) counts once in the
    // pending census
    SuffixIndex.append(s, d, docsDf(Seq((80L, "p q"))), 7L)
    graft.sources.ArtifactCommit.writeFrameWal(
      SuffixIndex.readPending(s, d),
      SuffixIndex.compactPendingPath(d))
    assert(SuffixIndex.pendingDocs(s, d).count() == 1L,
      "a doc present in ingest AND sidecar is one pending doc")
  }

  test("compact with nothing pending serves the live tier untouched") {
    val s = spark
    val d = dir("noop")
    SuffixIndex.ensure(d, docsDf(baseRows), tokenize(docsDf(baseRows)))
    val before = bestSet(d)
    val got = SuffixIndex.compact(d, docsDf(baseRows),
      _ => sys.error("nothing pending: no rebuild"))
    assert(got.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == before)
  }
}
