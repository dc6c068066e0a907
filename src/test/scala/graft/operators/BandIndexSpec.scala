package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the [[BandIndex]] artifact lifecycle: the persisted index
  * classifies identically to the inline corpus rescan it replaces,
  * append+classify equals a rebuild over the grown corpus, forget
  * unwitnesses erased content (a twin classifies `new`) with
  * untouched partitions byte-identical and disjoint-retry WAL
  * convergence, and ensure cache-hits without a byte rewritten. */
class BandIndexSpec extends SparkSpec {

  private val (k, nh, b, r) = (3, 9, 3, 3)

  private def dir(tag: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_band_ix_$tag").toString
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    p
  }

  // small word-shingle corpus: doc 11 is doc 1's exact copy, doc 12
  // a near-dup of doc 2 (one token changed), doc 13 unrelated
  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "iota kappa lambda mu nu xi omicron pi"),
    (3L, "rho sigma tau upsilon phi chi psi omega"))
  private val batch = Seq(
    (11L, "alpha beta gamma delta epsilon zeta eta theta"),
    (12L, "iota kappa lambda mu nu xi omicron RHO"),
    (13L, "one two three four five six seven eight"))

  private def df(rows: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** The inline q106-form classification (corpus rescan) — the
    * reference semantics the artifact must reproduce. */
  private def inlineClassify(corpusRows: Seq[(Long, String)],
      batchRows: Seq[(Long, String)]): Set[(Long, String)] = {
    val s = spark; import s.implicits._
    val exact = df(batchRows)
      .select($"doc_id", graft.functions.TextFunctions.fingerprint($"text").as("fp"))
      .join(df(corpusRows)
        .select(graft.functions.TextFunctions.fingerprint($"text").as("fp"))
        .distinct(), Seq("fp"), "left_semi")
      .select($"doc_id")
    val near = NearDup.lshBands(df(batchRows), "doc_id", "text", k, nh, b, r)
      .join(NearDup.lshBands(df(corpusRows), "doc_id", "text", k, nh, b, r)
        .select($"band_idx", $"band_hash").distinct(),
        Seq("band_idx", "band_hash"), "left_semi")
      .select($"doc_id").distinct()
    df(batchRows).select($"doc_id")
      .join(exact.withColumn("e", lit(1)), Seq("doc_id"), "left")
      .join(near.withColumn("n", lit(1)), Seq("doc_id"), "left")
      .select($"doc_id", when($"e" === 1, "exact_dup")
        .when($"n" === 1, "near_dup").otherwise("new").as("v"))
      .collect().map(x => (x.getLong(0), x.getString(1))).toSet
  }

  private def classifySet(d: String, rows: Seq[(Long, String)]) =
    BandIndex.classify(spark, d, df(rows), "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSet

  private def md5Of(f: java.io.File): Map[String, String] = {
    def walk(x: java.io.File): Seq[java.io.File] =
      if (x.isDirectory) x.listFiles().toSeq.flatMap(walk) else Seq(x)
    walk(f).filterNot(_.getName.startsWith(".")).map { x =>
      x.getPath -> java.security.MessageDigest.getInstance("MD5")
        .digest(java.nio.file.Files.readAllBytes(x.toPath))
        .map("%02x".format(_)).mkString
    }.toMap
  }

  test("persisted classify == inline rescan; ensure cache-hits without " +
    "a byte rewritten; params live with the data") {
    val s = spark
    val d = dir("cls")
    BandIndex.ensure(d, df(corpus), "doc_id", "text", k, nh, b, r)
    val expect = inlineClassify(corpus, batch)
    assert(expect.exists(_._2 == "exact_dup") &&
      expect.exists(_._2 == "near_dup") && expect.exists(_._2 == "new"),
      s"fixture must exercise all three verdicts: $expect")
    assert(classifySet(d, batch) == expect)
    val m = BandIndex.readMeta(s, d).get
    assert((m.k, m.nh, m.b, m.r) == ((k, nh, b, r)) && m.nDocs == 3L)
    val bytes = md5Of(new java.io.File(d))
    BandIndex.ensure(d, df(corpus), "doc_id", "text", k, nh, b, r)
    assert(md5Of(new java.io.File(d)) == bytes, "matching ensure is a no-op")
    // corpus change invalidates
    val grown = corpus :+ (4L, "one two three four five six seven eight")
    BandIndex.ensure(d, df(grown), "doc_id", "text", k, nh, b, r)
    assert(classifySet(d, batch) == inlineClassify(grown, batch),
      "rebuilt index reflects the grown corpus (doc 13 now a dup)")
  }

  test("appendBatch: classify against the appended index == rebuild " +
    "over the grown corpus; redelivery converges") {
    val s = spark
    val d = dir("app")
    BandIndex.ensure(d, df(corpus), "doc_id", "text", k, nh, b, r)
    val ingest = Seq((21L, "one two three four five six seven eight"))
    BandIndex.appendBatch(s, d, df(ingest), "doc_id", "text", 0L)
    assert(classifySet(d, batch) == inlineClassify(corpus ++ ingest, batch),
      "appended docs witness future batches (doc 13 -> exact_dup)")
    // redelivery: same batch id again, identical result, no duplicates
    BandIndex.appendBatch(s, d, df(ingest), "doc_id", "text", 0L)
    assert(BandIndex.readBands(s, d)
      .where(col("doc_id") === 21L).count() == b.toLong)
    assert(classifySet(d, batch) == inlineClassify(corpus ++ ingest, batch))
  }

  test("forget: erased content is unwitnessed (twin classifies new), " +
    "untouched partitions byte-identical, disjoint retry converges") {
    val s = spark; import s.implicits._
    val d = dir("fg")
    BandIndex.ensure(d, df(corpus), "doc_id", "text", k, nh, b, r)
    val before = md5Of(new java.io.File(d))
    val stats = BandIndex.forget(s, d, Seq(1L).toDF("gone"), "gone")
    assert(stats.nDocsForgotten == 1L)
    assert(BandIndex.readBands(s, d).where($"doc_id" === 1L).count() == 0)
    assert(BandIndex.readFps(s, d).where($"doc_id" === 1L).count() == 0)
    // doc 11 (doc 1's exact copy) now classifies NEW — the erased
    // content is gone from the index, not masked
    val v = classifySet(d, batch)
    assert(v.contains((11L, "new")), s"unwitnessed twin must be new: $v")
    val after = md5Of(new java.io.File(d))
    val common = before.keySet intersect after.keySet
    assert(common.nonEmpty)
    common.foreach { f =>
      assert(before(f) == after(f), s"untouched file changed: $f") }
    // post-success rerun: zero-op
    assert(BandIndex.forget(s, d, Seq(1L).toDF("gone"), "gone") ==
      BandIndex.ForgetStats(0L, 0L, 0L))
    // disjoint-retry crash window: WALs planted for doc 2, fresh list
    // misses — the ids sidecar must still drive the erasure
    Seq(2L).toDF("doc_id").coalesce(1)
      .write.parquet(s"$d/_forget_pending_ids")
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val o = fs.create(new org.apache.hadoop.fs.Path(s"$d/_forget_pending"), true)
    o.write("f\t-1\n".getBytes("UTF-8")); o.close()
    val st2 = BandIndex.forget(s, d, Seq(999L).toDF("gone"), "gone")
    assert(st2.nDocsForgotten == 1L)
    assert(BandIndex.readFps(s, d).where($"doc_id" === 2L).count() == 0)
    assert(BandIndex.readBands(s, d).where($"doc_id" === 2L).count() == 0,
      "band rows of the condemned doc gone even though the footprint " +
        "only named the fp table (hits recomputed from the ids union)")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$d/_forget_pending")))
  }

  test("torn footprint line (r11): a truncated final WAL row is dropped " +
    "and re-derived from the ids sidecar instead of wedging every retry") {
    val s = spark; import s.implicits._
    val d = dir("torn")
    BandIndex.ensure(d, df(corpus), "doc_id", "text", k, nh, b, r)
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    Seq(2L).toDF("doc_id").coalesce(1)
      .write.parquet(s"$d/_forget_pending_ids")
    // one well-formed row, one torn mid-number, one pure garbage
    val o = fs.create(new org.apache.hadoop.fs.Path(s"$d/_forget_pending"), true)
    o.write("f\t-1\nb\t-1\tgarbage\nb\t-".getBytes("UTF-8")); o.close()
    val st = BandIndex.forget(s, d, Seq.empty[Long].toDF("gone"), "gone")
    assert(st.nDocsForgotten == 1L, "the WAL'd commitment still lands")
    assert(BandIndex.readFps(s, d).where($"doc_id" === 2L).count() == 0)
    assert(BandIndex.readBands(s, d).where($"doc_id" === 2L).count() == 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$d/_forget_pending")))
  }

  test("ids-WAL-only crash prefix (r11): forget writes ids BEFORE the " +
    "footprint, so ids-without-footprint must block ensure cache-hits") {
    val s = spark; import s.implicits._
    val d = dir("idsonly")
    BandIndex.ensure(d, df(corpus), "doc_id", "text", k, nh, b, r)
    Seq(1L).toDF("doc_id").coalesce(1)
      .write.parquet(s"$d/_forget_pending_ids")
    assert(graft.sources.ArtifactCommit.erasurePending(s, d))
    // same corpus, matching fingerprint — must still rebuild + re-apply
    BandIndex.ensure(d, df(corpus), "doc_id", "text", k, nh, b, r)
    assert(BandIndex.readFps(s, d).where($"doc_id" === 1L).count() == 0,
      "commitment honored across the fingerprint-matching serve")
    assert(!graft.sources.ArtifactCommit.erasurePending(s, d))
  }

  test("Monitor serves the band_index family") {
    val s = spark; import s.implicits._
    val d = dir("mon")
    BandIndex.ensure(d, df(corpus), "doc_id", "text", k, nh, b, r)
    val dirTmp = java.nio.file.Files.createTempDirectory("graft_bandmon").toString
    val moments = s"$dirTmp/moments.parquet"
    val emb = graft.core.Tables.embeddings(s, sfDir)
      .where($"label".isNotNull && $"embedding".isNotNull)
      .select($"label".cast("long").as("label"), $"embedding")
    graft.streaming.StreamingCentroidMonitor
      .sink(moments, "label", "embedding")(emb, 0L)
    val sketches = s"$dirTmp/uv.parquet"
    graft.operators.SketchRollup.sketchTable(
        graft.core.Tables.events(s, sfDir), Seq("event_type"), "user_id")
      .write.mode("overwrite").parquet(sketches)
    val ref = graft.streaming.StreamingCentroidMonitor.centroids(s, moments)
      .select($"label", $"centroid")
    val report = graft.Monitor.stateReport(s, moments, ref, sketches,
        bandIndex = Some(d))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2)))
      .toMap
    val (n, bk) = report("band_index")
    assert(n == 9L, "3 docs x 3 bands")
    assert(bk >= 3.0 && bk <= 9.0, s"bucket occupancy in range: $bk")
  }
}
