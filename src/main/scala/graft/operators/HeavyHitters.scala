package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-pass EXACT heavy hitters per group — "which tokens exceed
  * N/(k+1) of each language's corpus" without ever shuffling the full
  * vocabulary.
  *
  * The naive form `groupBy(grp, item).count()` exchanges one row per
  * DISTINCT item — at 100 TB that is billions of n-grams shuffled to
  * find the dozens of rows above a frequency threshold. Here:
  *
  *  - pass 1 reduces each partition to a ≤ k-entry Misra–Gries summary
  *    per group ([[graft.functions.MisraGriesAggregator]] — partial
  *    aggregation emits O(k) map-side rows per task, merged summaries
  *    keep the guarantee), so the only full-width exchange carries
  *    O(groups · k) rows;
  *  - the merged summaries' keys — a guaranteed SUPERSET of every item
  *    with true count > N_grp/(k+1), Agarwal et al. PODS'12 — become a
  *    broadcast candidate frame (never a driver collect of data rows);
  *  - pass 2 re-scans the corpus, inner-joins the broadcast candidates
  *    (the prune: non-candidates never reach the aggregation), counts
  *    EXACTLY, and applies the exact integer threshold
  *    `cnt · (k+1) > N_grp`.
  *
  * Output is fully deterministic even though MG weights are partition-
  * order-dependent: the summary is used only as a superset filter, and
  * both the recount and the threshold are exact integers. Costs two
  * scans of the input — the standard trade against a full-vocabulary
  * exchange. */
object HeavyHitters {

  /** Exact items per `grpCol` whose count strictly exceeds
    * N_grp/(k+1): (grp, item, cnt, n_grp) rows, where n_grp is the
    * group's total item count (carried on the MG buffer — pass 1 yields
    * candidates AND group sizes in the same scan, so the whole operator
    * is exactly two input scans). */
  def exact(items: DataFrame, grpCol: String, itemCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val s = items.sparkSession
    import s.implicits._
    val toks = items.select(col(grpCol).cast("string").as("g"),
      col(itemCol).cast("string").as("item"))
    val mg = new graft.functions.MisraGriesAggregator(k)
    val cand = toks.as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(mg.toColumn.name("summary"))
      .toDF("g", "summary")
      .select($"g", $"summary.n".as("n_grp"),
        explode(map_keys($"summary.items")).as("item"))
    toks.join(broadcast(cand), Seq("g", "item"))
      .groupBy($"g", $"item").agg(count(lit(1)).as("cnt"), first($"n_grp").as("n_grp"))
      .filter($"cnt" * (k + 1) > $"n_grp")
      .select($"g".as(grpCol), $"item".as(itemCol), $"cnt", $"n_grp")
  }
}
