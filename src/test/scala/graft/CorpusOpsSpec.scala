package graft

import org.apache.spark.sql.functions._
import graft.queries.CorpusOpsQueries
import graft.core.Tables

/** Semantic invariants for the corpus-lifecycle pack (q103-q108) beyond
  * the DuckDB hash-match: SCD-2 interval tiling, chunk coverage,
  * prefix-filter losslessness, incremental-dedup classification, quota
  * exactness. */
class CorpusOpsSpec extends SparkSpec {
  private def q(name: String) =
    CorpusOpsQueries.queries(name)(spark, sfDir)

  test("q103 SCD-2 intervals tile each customer's history") {
    import spark.implicits._
    val h = q("q103_scd2").cache()
    // versions are contiguous from 1 per customer
    val bad = h.groupBy($"o_custkey")
      .agg(min($"version").as("v0"), max($"version").as("v1"),
        count(lit(1)).as("n"))
      .filter($"v0" =!= 1 || $"v1" =!= $"n")
    assert(bad.count() == 0, "versions must be 1..n per customer")
    // valid_to of version v == valid_from of version v+1; last is open
    val joined = h.as("a").join(h.as("b"),
      $"a.o_custkey" === $"b.o_custkey" && $"a.version" + 1 === $"b.version")
    assert(joined.filter($"a.valid_to" =!= $"b.valid_from").count() == 0,
      "valid_to must chain to the next version's valid_from")
    val last = h.withColumn("mx",
        max($"version").over(org.apache.spark.sql.expressions.Window
          .partitionBy($"o_custkey")))
      .filter($"version" === $"mx")
    assert(last.filter($"valid_to" =!= "9999-12-31").count() == 0)
    // no orders lost in the run-length collapse
    val total = h.agg(sum($"n_orders")).first().getLong(0)
    assert(total == Tables.orders(spark, sfDir).count())
    h.unpersist()
  }

  test("q104 grid is complete: one row per (event_type, day) in the span") {
    import spark.implicits._
    val g = q("q104_gap_fill").cache()
    val types = g.select($"event_type").distinct().count()
    val days = g.select($"day").distinct().count()
    assert(g.count() == types * days, "grid must be the full cross product")
    assert(g.groupBy($"event_type", $"day").count().filter($"count" > 1).count() == 0)
    g.unpersist()
  }

  test("q105 chunk count and sizes follow the size-32/stride-24 layout") {
    import spark.implicits._
    val perDoc = q("q105_chunk_overlap")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"), max($"n_tok").as("mx"),
        min($"n_tok").as("mn"))
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", size(split(trim($"text"), "\\s+")).as("n"))
    val bad = perDoc.join(toks, "doc_id")
      .filter($"n_chunks" =!= floor(($"n" - 1) / 24) + 1 ||
        $"mx" > 32 || $"mn" < 1)
    assert(bad.count() == 0,
      "chunks per doc must be floor((n-1)/24)+1 with 1..32 tokens each")
  }

  test("q106 classifies every batch doc; identical text => exact_dup") {
    import spark.implicits._
    val v = q("q106_incremental_dedup").cache()
    val docs = Tables.documents(spark, sfDir)
    assert(v.count() == docs.filter($"source" === "src19").count())
    // any batch doc whose trimmed text appears in the corpus must be exact
    val batchTxt = docs.filter($"source" === "src19").select($"doc_id", trim($"text").as("t"))
    val corpusTxt = docs.filter($"source" =!= "src19").select(trim($"text").as("t")).distinct()
    val mustExact = batchTxt.join(corpusTxt, "t").select($"doc_id")
    val wrong = mustExact.join(v, "doc_id").filter($"verdict" =!= "exact_dup")
    assert(wrong.count() == 0)
    v.unpersist()
  }

  test("prefix-filtered containmentPairs equals q107's grouped self-join") {
    import spark.implicits._
    val grouped = q("q107_containment")
      .select($"doc_a", $"doc_b", $"inter").as[(Long, Long, Long)]
      .collect().toSet
    val prefixed = graft.operators.NearDup
      .containmentPairs(Tables.documents(spark, sfDir), "doc_id", "text", 3, 8, 10)
      .select($"doc_a", $"doc_b", $"inter").as[(Long, Long, Long)]
      .collect().toSet
    assert(grouped == prefixed,
      "prefix filtering must not change the containment pair set")
  }

  test("q108 keeps exactly min(30, |lang|) docs per language, deterministically") {
    import spark.implicits._
    val a = q("q108_quota_sample")
    val perLang = Tables.documents(spark, sfDir).groupBy($"lang").count()
    val bad = a.groupBy($"lang").agg(count(lit(1)).as("kept"))
      .join(perLang, "lang")
      .filter($"kept" =!= least($"count", lit(30L)))
    assert(bad.count() == 0)
    assert(a.collect().toSeq == q("q108_quota_sample").collect().toSeq)
  }
}
