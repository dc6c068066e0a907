package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Pins the KMeans-cell SemDeDup path (the paper's form — q173's oracle
  * covers the hyperplane-cell form) against a driver-side brute-force
  * reference on the fixture: identical cell assignments feed both, so
  * the suppression set must match the definition exactly — x dropped iff
  * its cell holds y with cos(x,y) ≥ t and (q(y), -id(y)) > (q(x),
  * -id(x)). Also pins the pipeline-stage contract (anti-join subset,
  * pass-through for embedding-less docs). */
class SemDeDupSpec extends SparkSpec {

  private val T = 0.3

  private def fixture = {
    val s = spark
    import s.implicits._
    Tables.embeddings(s, sfDir)
      .select($"vec_id", $"embedding")
      .join(Tables.documents(s, sfDir)
        .select($"doc_id".as("vec_id"), $"n_chars"), Seq("vec_id"))
  }

  test("kmeans-cell suppression matches the brute-force within-cell definition") {
    val s = spark
    import s.implicits._
    val embQ = fixture.localCheckpoint()
    val cells = SemDeDup.kmeansCells(embQ, "vec_id", "embedding", k = 4, iters = 2)
    val df = embQ.join(cells, Seq("vec_id"))

    val got = SemDeDup.dropIds(df, "vec_id", "embedding", "cell", "n_chars", T)
      .as[Long].collect().toSet

    // driver-side reference, replicating graft_fdot's fold (sequential
    // double sum of widened float products)
    val rows = df.select($"vec_id", $"embedding", $"cell", $"n_chars")
      .as[(Long, Array[Float], Long, Long)].collect()
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var st = 0.0; var i = 0
      while (i < a.length) { st += a(i).toDouble * b(i).toDouble; i += 1 }
      st
    }
    val expected = (for {
      (ida, va, ca, qa) <- rows
      (idb, vb, cb, qb) <- rows
      if ca == cb && ida != idb
      if qb > qa || (qb == qa && idb < ida)
      na = math.sqrt(dot(va, va)); nb = math.sqrt(dot(vb, vb))
      if na > 0 && nb > 0 && dot(va, vb) / (na * nb) >= T
    } yield ida).toSet

    assert(expected.nonEmpty, "fixture must exercise the suppression path")
    assert(got == expected,
      s"drop set mismatch: extra=${got -- expected} missing=${expected -- got}")
  }

  test("suppressors report a strictly higher-priority representative") {
    val s = spark
    import s.implicits._
    val embQ = fixture
    val cells = SemDeDup.kmeansCells(embQ, "vec_id", "embedding", k = 4, iters = 2)
    val df = embQ.join(cells, Seq("vec_id"))
    val sup = SemDeDup
      .suppressors(df, "vec_id", "embedding", "cell", "n_chars", T)
      .join(embQ.select($"vec_id", $"n_chars".as("own_q")), Seq("vec_id"))
    assert(sup.where(!($"rep_quality" > $"own_q" ||
      ($"rep_quality" === $"own_q" && $"rep_id" < $"vec_id"))).isEmpty,
      "every rep must out-rank the doc it suppresses")
    assert(sup.where($"cos" < T).isEmpty)
  }

  test("pipeline stage drops exactly the suppressed docs and passes embedding-less docs") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, sfDir)
    // hold back some embeddings: those docs must pass through untouched
    val embs = Tables.embeddings(s, sfDir).where($"vec_id" % 5 =!= 0)
    val out = CorpusPipeline.semanticDedup(docs, embs,
      cells = 4, threshold = T)
    val cellAssign = SemDeDup.kmeansCells(embs, "vec_id", "embedding", 4)
    val df = embs.select($"vec_id", $"embedding").join(cellAssign, Seq("vec_id"))
      .join(docs.select($"doc_id".as("vec_id"), $"n_chars"), Seq("vec_id"))
    val dropped = SemDeDup
      .dropIds(df, "vec_id", "embedding", "cell", "n_chars", T)
      .as[Long].collect().toSet
    val outIds = out.select($"doc_id").as[Long].collect().toSet
    val allIds = docs.select($"doc_id").as[Long].collect().toSet
    assert(outIds == allIds -- dropped)
    assert((allIds -- outIds).forall(_ % 5 != 0),
      "docs with no embedding row must never be dropped")
  }

  test("semanticDecontam drops exactly the docs near an eval vector") {
    val s = spark
    import s.implicits._
    // corpus: 1 clone of eval A, 1 near-clone, the rest orthogonal-ish
    val evA = Array(1f, 0f, 0f, 0f)
    val evB = Array(0f, 1f, 0f, 0f)
    val corpusEmb = Seq(
      (1L, evA),                                 // exact eval clone -> drop
      (2L, Array(0.98f, 0.2f, 0f, 0f)),          // near clone -> drop
      (3L, Array(0f, 0f, 1f, 0f)),               // orthogonal -> keep
      (4L, Array(0f, 0f, 0f, 1f)),               // orthogonal -> keep
      (5L, Array(0.5f, -0.5f, 0.5f, -0.5f)))     // cos 0 to A and B -> keep
      .toDF("vec_id", "embedding")
    val evalEmb = Seq((100L, evA), (101L, evB)).toDF("vec_id", "embedding")
    val corpus = (1L to 6L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // cells = 1: everything shares a cell, so the drop set is exactly
    // the cosine-threshold set regardless of the k-means fit
    val out = CorpusPipeline.semanticDecontam(corpus, corpusEmb, evalEmb,
      cells = 1, threshold = 0.9)
    val kept = out.select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L, 6L),
      s"drop the eval clones (1,2), keep orthogonal + embedding-less (6): $kept")
    // a stricter threshold keeps the near-clone
    val strict = CorpusPipeline.semanticDecontam(corpus, corpusEmb, evalEmb,
      cells = 1, threshold = 0.9999)
    assert(strict.select($"doc_id").as[Long].collect().toSet ==
      Set(2L, 3L, 4L, 5L, 6L))
  }
}
