package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dot, l2norm}

/** Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
  * the embedding-space complement of the lexical dedup family (q46-q50,
  * q77, q172) — two documents can share almost no n-grams yet say the
  * same thing, and training on both wastes compute. The recipe: cluster
  * the embedding space into CELLS, compare pairs only WITHIN a cell
  * (semantic near-dups land in the same cell by construction — that is
  * what the cell key means), and keep the best-quality representative of
  * every duplicate group.
  *
  * Scale shape: the pairwise cosine runs inside cells only, so join
  * volume is Σ|cell|² — bounded by the cell granularity (the paper uses
  * k≈10⁵ cells for 10⁹ docs, keeping cells ~10⁴ docs), never corpus².
  * Output is O(n) keep/drop decisions (the q77 suppression argument):
  * a document is DROPPED when its cell holds a strictly higher-priority
  * near-duplicate, priority = (quality desc, id asc) — so the
  * quality-argmax of every duplicate group survives without
  * materializing groups. One exchange on the cell key feeds both join
  * sides.
  *
  * Cells are a parameter, not a policy: [[kmeansCells]] gives the
  * paper's k-means cells (deterministic [[KMeans.lloyd]]); a hyperplane
  * sign key ([[VectorLsh]] / SimilarityQueries.bandKey) gives an
  * engine-replicable cell for oracle-gated paths (q173). The
  * within-cell math is identical for either.
  *
  * Reference analogue: none (beyond-reference H-family, like the dedup
  * suite). */
object SemDeDup {

  /** The paper's cells: deterministic k-means assignment over the
    * embedding column → (idCol, cell). */
  def kmeansCells(embs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3): DataFrame =
    KMeans.lloyd(embs, idCol, vecCol, k, iters)
      .withColumnRenamed("cluster", "cell")

  /** One row per DROPPED id with its best suppressor: (idCol, rep_id,
    * rep_quality, cos). `df` carries (id, vector, cell, quality); x is
    * dropped when some same-cell y has cos(x,y) ≥ threshold and
    * strictly higher priority (quality desc, id asc); rep is x's
    * highest-priority such y. Exact within the cell — every candidate
    * pair is compared, no bucket-min shortcut — so the only
    * approximation in the operator is the cell boundary itself.
    * Zero-norm vectors have no direction and are excluded (the
    * [[VectorLsh]] NaN argument). */
  def suppressors(df: DataFrame, idCol: String, vecCol: String,
      cellCol: String, qualityCol: String, threshold: Double): DataFrame = {
    graft.expressions.GraftFunctions.ensureRegistered(df.sparkSession)
    val base = df.select(col(idCol).as("__id"),
        col(vecCol).cast("array<float>").as("__v"),
        col(cellCol).as("__cell"), col(qualityCol).as("__q"))
      .where(col("__v").isNotNull)
      .withColumn("__nrm", l2norm(col("__v")))
      .where(col("__nrm") > 0)
      .repartition(col("__cell"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__rq").desc, col("__rid"))
    base.as("a").join(base.as("b"),
        col("a.__cell") === col("b.__cell") &&
          col("a.__id") =!= col("b.__id") &&
          (col("b.__q") > col("a.__q") ||
            (col("b.__q") === col("a.__q") && col("b.__id") < col("a.__id"))))
      .select(col("a.__id").as("__id"), col("b.__id").as("__rid"),
        col("b.__q").as("__rq"),
        (dot(col("a.__v"), col("b.__v")) /
          (col("a.__nrm") * col("b.__nrm"))).as("__cos"))
      .where(col("__cos") >= threshold)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("__id").as(idCol), col("__rid").as("rep_id"),
        col("__rq").as("rep_quality"), col("__cos").as("cos"))
  }

  /** Just the ids to DROP — the form a pipeline stage anti-joins with. */
  def dropIds(df: DataFrame, idCol: String, vecCol: String,
      cellCol: String, qualityCol: String, threshold: Double): DataFrame =
    suppressors(df, idCol, vecCol, cellCol, qualityCol, threshold)
      .select(col(idCol))
}
