package graft.operators

import graft.SparkSpec
import graft.core.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Count–Min sketch-table claims that make it safe at scale:
  * (1) MERGE EXACTNESS — partial tables built on disjoint slices merge
  *     (plain integer addition) into exactly the one-shot table, under
  *     any split: the property that makes map-side partials, batch
  *     unions and retries sound (the SketchRollup algebra, here proven
  *     on the counter matrix itself);
  * (2) ONE-SIDED ERROR — estimate ≥ exact for every probed key
  *     (collisions only add);
  * (3) the ε-BOUND — overcount ≤ ⌈e/w'⌉·N holds at a production-ish
  *     width on this corpus (the standard CMS guarantee at d=4 rows,
  *     checked empirically like the ANN recall gates). */
class CountMinSpec extends SparkSpec {

  private val D = 4

  test("disjoint-slice sketches merge into exactly the one-shot sketch") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val toks = Tables.documents(s, sfDir)
      .where($"text".isNotNull && $"source".isNotNull)
      .select($"source", $"doc_id", explode(split(trim($"text"), "\\s+")).as("tok"))
    val whole = CountMin.sketchTable(toks, Seq("source"), "tok", D, 64)
    val merged = CountMin.merge(
      Seq(
        CountMin.sketchTable(toks.where($"doc_id" % 3 === 0), Seq("source"), "tok", D, 64),
        CountMin.sketchTable(toks.where($"doc_id" % 3 === 1), Seq("source"), "tok", D, 64),
        CountMin.sketchTable(toks.where($"doc_id" % 3 === 2), Seq("source"), "tok", D, 64)),
      Seq("source"))
    val a = whole.as[(String, Int, Long, Long)].collect().toSet
    val b = merged.as[(String, Int, Long, Long)].collect().toSet
    assert(a == b, "merged partial counters must equal the one-shot counters")
  }

  test("streamed batch partitions serve the one-shot counters; retry is a no-op") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val toks = Tables.documents(s, sfDir)
      .where($"text".isNotNull && $"source".isNotNull)
      .select($"source", $"doc_id", explode(split(trim($"text"), "\\s+")).as("tok"))
    val store = java.nio.file.Files
      .createTempDirectory("graft_cms").toString + "/cms.parquet"
    val sink = CountMin.sink(store, Seq("source"), "tok", D, 64)
    sink(toks.where($"doc_id" % 3 === 0), 0L)
    sink(toks.where($"doc_id" % 3 === 1), 1L)
    sink(toks.where($"doc_id" % 3 === 2), 2L)
    def servedSet() = CountMin.served(s, store, Seq("source"))
      .as[(String, Int, Long, Long)].collect().toSet
    val direct = CountMin.sketchTable(toks, Seq("source"), "tok", D, 64)
      .as[(String, Int, Long, Long)].collect().toSet
    assert(servedSet() == direct,
      "summed batch partitions must equal the one-shot counter table")
    // at-least-once retry of batch 1: identical counters overwrite
    // their own partition — served table unchanged
    sink(toks.where($"doc_id" % 3 === 1), 1L)
    assert(servedSet() == direct, "a retried batch must not double-count")
  }

  test("estimates are one-sided and within the epsilon bound") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val W = 2048 // production-ish width: eps = e/2048 ~ 0.13%
    val toks = Tables.documents(s, sfDir)
      .where($"text".isNotNull)
      .select(lit("all").as("g"), explode(split(trim($"text"), "\\s+")).as("tok"))
    val n = toks.count()
    val sketch = CountMin.sketchTable(toks, Seq("g"), "tok", D, W)
    val probes = TextFunctions.stopwords.toDF("tok").withColumn("g", lit("all"))
    val est = CountMin.estimate(sketch, probes, Seq("g"), "tok", D, W)
    val exact = toks.where($"tok".isin(TextFunctions.stopwords: _*))
      .groupBy($"tok").agg(count(lit(1)).as("n_exact"))
    val rows = est.join(exact, Seq("tok"), "left")
      .select($"tok", $"est", coalesce($"n_exact", lit(0L)).as("n_exact"))
      .as[(String, Long, Long)].collect()
    assert(rows.length == TextFunctions.stopwords.length)
    rows.foreach { case (tok, e, x) =>
      assert(e >= x, s"$tok: estimate $e must never undercount exact $x")
    }
    val bound = math.ceil(math.E / W * n).toLong
    rows.foreach { case (tok, e, x) =>
      assert(e - x <= bound,
        s"$tok: overcount ${e - x} exceeds eps*N bound $bound (N=$n, w=$W)")
    }
  }
}
