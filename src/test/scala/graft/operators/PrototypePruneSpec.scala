package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** PrototypePrune: the distributed window-free rank must agree with a
  * brute-force per-cell ranking, the drop count must be the exact
  * ceiling per cell, and the pipeline stage must shrink the corpus by
  * exactly the dropped ids. */
class PrototypePruneSpec extends SparkSpec {

  private def cells = {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, sfDir)
      .where($"embedding".isNotNull)
      .select($"vec_id", $"embedding")
    e.join(SemDeDup.kmeansCells(e, "vec_id", "embedding", 8), Seq("vec_id"))
  }

  test("ranked agrees with a brute-force per-cell (cos desc, id) ranking") {
    val s = spark
    import s.implicits._
    val got = PrototypePrune
      .ranked(cells, "vec_id", "embedding", "cell")
      .select($"cell", $"vec_id", $"proto_cos", $"prank")
      .as[(Long, Long, Double, Long)].collect()
    val brute = got.groupBy(_._1).toSeq.flatMap { case (c, rows) =>
      rows.sortBy(r => (-r._3, r._2)).zipWithIndex
        .map { case (r, i) => (c, r._2) -> (i + 1).toLong }
    }.toMap
    assert(got.nonEmpty)
    got.foreach { case (c, id, _, prank) =>
      assert(brute((c, id)) == prank,
        s"cell $c id $id: distributed rank $prank != brute ${brute((c, id))}")
    }
  }

  test("dropIds removes exactly ceil(cn*num/den) per cell") {
    val s = spark
    import s.implicits._
    val cs = cells.localCheckpoint()
    val sizes = cs.groupBy($"cell").count()
      .as[(Long, Long)].collect().toMap
    val dropped = PrototypePrune
      .dropIds(cs, "vec_id", "embedding", "cell", pruneNum = 1, pruneDen = 4)
      .join(cs.select($"vec_id", $"cell"), Seq("vec_id"))
      .groupBy($"cell").count().as[(Long, Long)].collect().toMap
    sizes.foreach { case (c, n) =>
      val want = (n + 3) / 4
      assert(dropped.getOrElse(c, 0L) == want,
        s"cell $c size $n: dropped ${dropped.getOrElse(c, 0L)}, want $want")
    }
  }

  test("pipeline stage shrinks the corpus by exactly the dropped ids") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, sfDir)
    val embs = Tables.embeddings(s, sfDir)
      .where($"embedding".isNotNull).select($"vec_id", $"embedding")
    val out = CorpusPipeline.prototypePrune(docs, embs, cells = 8)
    val cellAssign = SemDeDup.kmeansCells(embs, "vec_id", "embedding", 8)
    val nDropWithDoc = PrototypePrune
      .dropIds(embs.join(cellAssign, Seq("vec_id")),
        "vec_id", "embedding", "cell")
      .join(docs.select($"doc_id".as("vec_id")), Seq("vec_id"))
      .count()
    assert(out.count() == docs.count() - nDropWithDoc)
    assert(out.columns.sameElements(docs.columns), "stage must preserve schema")
  }
}
