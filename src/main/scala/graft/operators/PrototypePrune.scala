package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dot, l2norm}

/** SSL-prototypes data pruning (Sorscher et al. NeurIPS'22, "Beyond
  * neural scaling laws"): in the abundant-data regime the examples worth
  * dropping are the most PROTOTYPICAL — closest to their cluster's
  * centroid — because they carry the least marginal signal. This is the
  * embedding-space complement of [[SemDeDup]]: SemDeDup removes
  * near-duplicate pairs, prototype pruning thins dense regions even when
  * no pair crosses the duplicate threshold.
  *
  * Scale shape (the q186 plan): centroids are EXACT — components widened
  * float→double, scaled ×2²⁰, rounded and integer-summed per (cell, dim)
  * (order-independent under any partitioning), one narrow posexplode +
  * partial agg; scoring is one broadcast join of the O(cells·dim)
  * centroid frame; the per-cell rank is WINDOW-FREE — cells are
  * corpus-scale partitions, so ranking runs through the global two-pass
  * [[graft.functions.DistributedRank]] over the combined numeric key
  * `cell·4 + (1 − cos)` minus each cell's exclusive prefix count (an
  * O(cells) triangular broadcast join). The keep/drop cut is a pure
  * integer predicate — no float crosses the decision.
  */
object PrototypePrune {

  /** Per-member prototypicality rank: (cellCol, idCol, proto_cos, prank,
    * cn) where prank = 1 is the cell's most prototypical member and cn
    * the cell's size. `cells` must carry (idCol, vecCol, cellCol) with a
    * NUMERIC cell id (e.g. [[SemDeDup.kmeansCells]]' `cluster`, or a
    * hyperplane sign key). */
  def ranked(cells: DataFrame, idCol: String, vecCol: String,
      cellCol: String): DataFrame = {
    graft.expressions.GraftFunctions.ensureRegistered(cells.sparkSession)
    val e = cells
      .select(col(cellCol).cast("long").as("__cell"), col(idCol),
        col(vecCol).cast("array<float>").as("__v"))
      .where(col(idCol).isNotNull && col("__v").isNotNull)
    val comp = e
      .select(col("__cell"), posexplode(col("__v")))
      .toDF("__cell", "__i", "__x")
      .groupBy(col("__cell"), col("__i"))
      .agg(sum(round(col("__x").cast("double") * 1048576).cast("long"))
        .as("__sv"), count(lit(1)).as("__n"))
    val cent = comp
      .select(col("__cell"), col("__i"),
        (col("__sv").cast("double") / (col("__n") * 1048576.0)).as("__c"))
      .groupBy(col("__cell"))
      .agg(sort_array(collect_list(struct(col("__i"), col("__c"))))
        .getField("__c").as("__centroid"))
    val scored = e.join(broadcast(cent), Seq("__cell"))
      .select(col("__cell"), col(idCol),
        round(dot(col("__v"), col("__centroid")) /
          (l2norm(col("__v")) * l2norm(col("__centroid"))), 6)
          .as("proto_cos"))
    val rankedAll = graft.functions.DistributedRank.withRowNumber(
      scored.withColumn("__skey",
        col("__cell").cast("double") * 4.0 + (lit(1.0) - col("proto_cos"))),
      "__rn", col("__skey"), col(idCol)).drop("__skey")
    val cnts = e.groupBy(col("__cell")).agg(count(lit(1)).as("cn"))
    val off = cnts
      .join(broadcast(cnts.select(col("__cell").as("__bcell"),
        col("cn").as("__bcn"))), col("__bcell") < col("__cell"), "left")
      .groupBy(col("__cell"))
      .agg(first(col("cn")).as("cn"),
        coalesce(sum(col("__bcn")), lit(0L)).as("__off"))
    rankedAll.join(broadcast(off), Seq("__cell"))
      .withColumn("prank", col("__rn") - col("__off"))
      .select(col("__cell").as(cellCol), col(idCol), col("proto_cos"),
        col("prank"), col("cn"))
  }

  /** Ids to DROP: per cell the ⌈cn·num/den⌉ most prototypical members
    * (prank·den ≤ cn·num + den − 1 — the pure integer ceiling test).
    * Default drops each cell's most prototypical quartile. */
  def dropIds(cells: DataFrame, idCol: String, vecCol: String,
      cellCol: String, pruneNum: Int = 1, pruneDen: Int = 4): DataFrame = {
    require(pruneNum >= 0 && pruneDen >= 1 && pruneNum <= pruneDen,
      s"prune fraction must be in [0,1]: $pruneNum/$pruneDen")
    ranked(cells, idCol, vecCol, cellCol)
      .where(col("prank") * pruneDen <=
        col("cn") * pruneNum + (pruneDen - 1))
      .select(col(idCol))
  }
}
