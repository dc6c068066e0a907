package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the [[SuffixIndex]] artifact lifecycle (VERDICT r9 #1):
  * build→save→read round-trips the exact best-per-position table,
  * [[SuffixIndex.ensure]] serves a matching artifact without
  * rebuilding and self-invalidates on corpus change / scrub / pending
  * WAL, and [[SuffixIndex.forget]] erases only the listed docs with
  * untouched partitions byte-identical and converges under the
  * disjoint-retry crash window. */
class SuffixIndexSpec extends SparkSpec {

  private def dir(tag: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_suffix_ix_$tag").toString
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    p
  }

  private val fixture = Seq(
    (1L, "a b c d e f g h"),
    (2L, "a b c d x y z w"),
    (3L, "q r s t u v"),
    (60L, "a b c d e f g h"), // exact dup of doc 1, far doc range
    (61L, "m n o p q r s t"))

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def toksDf(rows: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    docsDf(rows).select($"doc_id",
      posexplode(split(trim($"text"), "\\s+"))).toDF("doc_id", "pos", "tok")
  }

  private def md5Of(f: java.io.File): Map[String, String] = {
    def walk(x: java.io.File): Seq[java.io.File] =
      if (x.isDirectory) x.listFiles().toSeq.flatMap(walk)
      else Seq(x)
    walk(f).filterNot(_.getName.startsWith(".")).map { x =>
      val bytes = java.nio.file.Files.readAllBytes(x.toPath)
      x.getPath -> java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
    }.toMap
  }

  test("save/read round-trips the exact table; ensure serves without " +
    "rebuild (bytes untouched) and rebuilds on corpus change") {
    val s = spark; import s.implicits._
    val d = dir("rt")
    val best = SuffixRank.bestPerPosition(toksDf(fixture))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (fp, n) = SuffixIndex.fingerprintOf(docsDf(fixture))
    assert(n == fixture.size.toLong)
    val got = SuffixIndex.ensure(d, docsDf(fixture), toksDf(fixture))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == best, "artifact must serve the exact built table")
    val meta = SuffixIndex.readMeta(s, d).get
    assert(meta.format == SuffixIndex.FORMAT && meta.fingerprint == fp &&
      meta.nDocs == n && meta.nPos == best.size.toLong && !meta.scrubbed)
    // doc-range partitioning landed (grain spans the 1..61 id range)
    assert(new java.io.File(s"$d/data").listFiles()
      .count(_.getName.startsWith("doc_range=")) >= 2,
      "multiple doc-range partitions expected")
    // second ensure: served from disk, no byte rewritten
    val bytes = md5Of(new java.io.File(d))
    val again = SuffixIndex.ensure(d, docsDf(fixture), toksDf(fixture))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == best)
    assert(md5Of(new java.io.File(d)) == bytes,
      "matching ensure must not rewrite the artifact")
    // corpus change (one doc edited): fingerprint splits, rebuild serves
    // the new corpus's exact values
    val changed = fixture.updated(2, (3L, "q r s t u v extra"))
    val expect2 = SuffixRank.bestPerPosition(toksDf(changed))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got2 = SuffixIndex.ensure(d, docsDf(changed), toksDf(changed))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got2 == expect2 && got2 != best,
      "changed corpus must rebuild to its own exact table")
  }

  test("forget: listed docs gone, untouched doc-range partitions " +
    "byte-identical, meta scrubbed, next ensure rebuilds exact") {
    val s = spark; import s.implicits._
    val d = dir("fg")
    SuffixIndex.ensure(d, docsDf(fixture), toksDf(fixture))
    val before = md5Of(new java.io.File(s"$d/data"))
    val stats = SuffixIndex.forget(s, d, Seq(2L).toDF("gone"), "gone")
    assert(stats.nDocsForgotten == 1L && stats.nForgotten == 8L)
    val left = SuffixIndex.read(s, d)
    assert(left.where($"doc_id" === 2L).count() == 0, "doc 2 erased")
    // survivors keep their rows (values possibly overstated — the
    // documented conservative direction, NOT recomputed)
    assert(left.select($"doc_id").distinct().as[Long].collect().toSet ==
      Set(1L, 3L, 60L, 61L))
    val after = md5Of(new java.io.File(s"$d/data"))
    val common = before.keySet intersect after.keySet
    assert(common.nonEmpty)
    common.foreach { f =>
      assert(before(f) == after(f), s"untouched file changed: $f") }
    assert(SuffixIndex.readMeta(s, d).get.scrubbed, "meta marked scrubbed")
    assert(SuffixIndex.readMeta(s, d).get.nDocs == 4L)
    // post-success retry: zero-op
    assert(SuffixIndex.forget(s, d, Seq(2L).toDF("gone"), "gone") ==
      SuffixIndex.ForgetStats(0L, 0L, 0L, 0L))
    // scrubbed artifact never cache-hits: ensure with the reduced
    // corpus rebuilds EXACT values (doc 60 keeps its full-doc dup with
    // doc 1; doc 1's partner is intact)
    val reduced = fixture.filterNot(_._1 == 2L)
    val expect = SuffixRank.bestPerPosition(toksDf(reduced))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = SuffixIndex.ensure(d, docsDf(reduced), toksDf(reduced))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(!SuffixIndex.readMeta(s, d).get.scrubbed)
  }

  test("forget ids WAL: a disjoint-list retry after a crash still " +
    "erases the condemned docs; a pending WAL blocks ensure cache-hits") {
    val s = spark; import s.implicits._
    val d = dir("wal")
    SuffixIndex.ensure(d, docsDf(fixture), toksDf(fixture))
    val grain = SuffixIndex.readMeta(s, d).get.grain
    // a run that committed to erasing docs 60+61 (emptying their range)
    // crashed right after its WAL writes, before any mutation
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    Seq(60L, 61L).toDF("doc_id").coalesce(1)
      .write.parquet(s"$d/_forget_pending_ids")
    val o = fs.create(new org.apache.hadoop.fs.Path(s"$d/_forget_pending"), true)
    o.write((60L / grain).toString.getBytes("UTF-8"))
    o.write("\n".getBytes("UTF-8")); o.close()
    // a pending WAL must block cache-hits even though meta still matches
    val bytes = md5Of(new java.io.File(s"$d/meta"))
    // disjoint retry list: the ids sidecar must still drive the erasure
    val stats = SuffixIndex.forget(s, d, Seq(999L).toDF("gone"), "gone")
    assert(stats.nDocsForgotten == 2L && stats.nPartsDeleted >= 1L)
    assert(SuffixIndex.read(s, d).select($"doc_id").distinct()
      .as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$d/_forget_pending")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$d/_forget_pending_ids")),
      "both WAL sidecars cleared")
    assert(md5Of(new java.io.File(s"$d/meta")) != bytes, "meta rewritten")
  }

  test("empty corpus: valid empty artifact, ensure round-trips") {
    val s = spark; import s.implicits._
    val d = dir("empty")
    val empty = Seq.empty[(Long, String)]
    val got = SuffixIndex.ensure(d, docsDf(empty), toksDf(empty))
    assert(got.count() == 0L)
    val meta = SuffixIndex.readMeta(s, d).get
    assert(meta.nDocs == 0L && meta.nPos == 0L && !meta.scrubbed)
  }

  test("ensure with a pending WAL: rebuild does not discard the crashed " +
    "erasure commitment -- it is re-applied (or cleanly cleared)") {
    val s = spark; import s.implicits._
    val d = dir("ewal")
    SuffixIndex.ensure(d, docsDf(fixture), toksDf(fixture))
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def plantWal(): Unit = {
      Seq(60L, 61L).toDF("doc_id").coalesce(1)
        .write.mode("overwrite").parquet(s"$d/_forget_pending_ids")
      val o = fs.create(
        new org.apache.hadoop.fs.Path(s"$d/_forget_pending"), true)
      o.write("7\n".getBytes("UTF-8")); o.close()
    }
    // corpus UNCHANGED: ensure must not cache-hit (WAL pending), and the
    // rebuilt index must have the commitment applied
    plantWal()
    val served = SuffixIndex.ensure(d, docsDf(fixture), toksDf(fixture))
    assert(served.select($"doc_id").distinct().as[Long].collect().toSet ==
      Set(1L, 2L, 3L), "commitment re-applied to the rebuilt index")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$d/_forget_pending")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$d/_forget_pending_ids")),
      "WALs cleared after re-apply")
    // corpus DROPPED the docs: re-apply is a clean zero-op, exact serve
    plantWal()
    val reduced = fixture.filterNot(t => t._1 == 60L || t._1 == 61L)
    val expect = SuffixRank.bestPerPosition(toksDf(reduced))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = SuffixIndex.ensure(d, docsDf(reduced), toksDf(reduced))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(!SuffixIndex.readMeta(s, d).get.scrubbed,
      "zero-op re-apply leaves the fresh rebuild unscrubbed")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$d/_forget_pending")))
  }

  test("rebuild crash window (r10 ADVICE medium): a crash AFTER the " +
    "publish but BEFORE the re-applied forget must not drop the " +
    "erasure commitment — the out-of-tree sidecar carries it") {
    val s = spark; import s.implicits._
    val d = dir("rebuildcrash")
    // state a crashed ensure() leaves behind: a freshly published index
    // whose fingerprint MATCHES the corpus, with the captured ids
    // persisted only in the external rebuild sidecar (the in-tree WALs
    // died with the old tree)
    SuffixIndex.ensure(d, docsDf(fixture), toksDf(fixture))
    graft.sources.ArtifactCommit.writeIdsWal(
      Seq(60L, 61L).toDF("doc_id"),
      graft.sources.ArtifactCommit.rebuildPendingPath(d))
    // a fingerprint-matching serve must NOT cache-hit past the sidecar
    val served = SuffixIndex.ensure(d, docsDf(fixture), toksDf(fixture))
    assert(served.select($"doc_id").distinct().as[Long].collect().toSet ==
      Set(1L, 2L, 3L), "commitment honored, condemned docs gone")
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(!graft.sources.ArtifactCommit.erasurePending(s, d),
      "all WALs (incl. the external sidecar) cleared after re-apply")
  }

  test("order table (format 2): suffix-order serialization round-trips, " +
    "best == max of adjacent l's, forget scrubs it in lockstep") {
    val s = spark; import s.implicits._
    val d = dir("ord")
    SuffixIndex.ensure(d, docsDf(fixture), toksDf(fixture))
    val ord = SuffixIndex.readOrder(s, d)
    val n = ord.count()
    assert(n == SuffixIndex.readMeta(s, d).get.nPos, "one row per position")
    // rn is a 1..n permutation
    assert(ord.select($"rn").distinct().count() == n)
    assert(ord.agg(min($"rn"), max($"rn")).head().toSeq == Seq(1L, n))
    // best(p at rn) = max(l(rn), l(rn+1)) reconstructs the data table
    val l2 = ord.select(($"rn" - 1L).as("rn"), $"l".as("l2"))
    val derived = ord.join(l2, Seq("rn"), "left")
      .select($"doc_id", $"pos",
        greatest($"l", coalesce($"l2", lit(0L))).as("best"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stored = SuffixIndex.read(s, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(derived == stored, "order table must reconstruct best exactly")
    // forget scrubs BOTH tables; untouched order partitions byte-same
    val before = md5Of(new java.io.File(s"$d/order"))
    SuffixIndex.forget(s, d, Seq(2L).toDF("gone"), "gone")
    val ord2 = SuffixIndex.readOrder(s, d)
    assert(ord2.where($"doc_id" === 2L).count() == 0, "doc 2 out of order/")
    assert(ord2.count() == n - 8L)
    val after = md5Of(new java.io.File(s"$d/order"))
    val common = before.keySet intersect after.keySet
    assert(common.nonEmpty)
    common.foreach { f =>
      assert(before(f) == after(f), s"untouched order file changed: $f") }
  }

  test("q261 cross-set max-match equals brute force on the real fixture " +
    "corpus (segment-min construction independently pinned)") {
    val s = spark; import s.implicits._
    val docs = graft.core.Tables.documents(s, sfDir)
      .where($"text".isNotNull && $"doc_id".isNotNull &&
        length(trim($"text")) > 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val toksOf = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").toSeq }.toMap
    val evalIds = docs.map(_._1).filter(_ % 97 == 0).toSet
    assume(evalIds.nonEmpty, "fixture must carry an eval slice")
    // brute: every eval suffix into a set-free scan; max common prefix
    // of (train suffix, eval suffix) over all pairs
    val evalSfx = evalIds.toSeq.flatMap { id =>
      val w = toksOf(id); w.indices.map(i => w.drop(i)) }
    def common(a: Seq[String], b: Seq[String]): Long =
      a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong
    val bruteBest: Map[(Long, Int), Long] = (for {
      (id, w) <- docs.toSeq.filterNot(t => evalIds(t._1))
        .map(t => (t._1, toksOf(t._1)))
      i <- w.indices
    } yield {
      val sfx = w.drop(i)
      ((id, i), if (evalSfx.isEmpty) 0L
        else evalSfx.iterator.map(e => common(sfx, e)).max)
    }).toMap
    val got = graft.SparkEntry.queries("q261_substr_decontam")(s, sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val mByDoc = bruteBest.groupBy(_._1._1).map { case (d, m) =>
      d -> m.values.max }
    (1 to 10).foreach { l =>
      val nd = mByDoc.count(_._2 >= l).toLong
      val np = bruteBest.count(_._2 >= l).toLong
      val mx = if (bruteBest.isEmpty) 0L else bruteBest.values.max
      assert(got.find(_._1 == l.toLong).get == ((l.toLong, nd, np, mx)),
        s"threshold $l: expected ($nd docs, $np pos, max $mx)")
    }
  }
}
