package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the dedup-CLUSTERING step of
  * a training-data pipeline: near-dup pair lists (q47-q50) become
  * canonical clusters, and "keep the minimum id per cluster" is then an
  * EXACT dedup policy (full transitive closure), the exact-recall
  * complement to [[NearDup.lshDropIds]]'s bucket-local min-neighbor
  * suppression (which trades recall for a join-free plan).
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round every node takes the minimum label among
  * itself and its neighbors; fixpoint = each node holds the minimum id
  * of its component. Rounds needed = graph diameter. Each round is ONE
  * shuffle (join edges with labels + min-agg) over O(|E|) rows, and each
  * round's result is `localCheckpoint`ed: iterative DataFrame loops
  * otherwise stack lineage until planning itself dominates. At cluster
  * scale use reliable `checkpoint()` (survives executor loss), and for
  * adversarial diameters (long chains) switch to the large-star /
  * small-star form (Kiveris et al., "Connected Components in MapReduce
  * and Beyond") whose round count is O(log n) regardless of diameter —
  * near-dup graphs in practice are dense cliques with tiny diameters, so
  * plain propagation converges in a handful of rounds.
  */
object ConnectedComponents {

  /** (id, comp) for every node appearing in `edges`, comp = min node id
    * of the component. Isolated nodes (no edges) are absent by
    * construction — union the node table back in if singletons matter.
    * Fails loudly after `maxIter` rounds rather than returning a
    * silently-unfinished labeling. */
  def minLabel(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .union(edges
        .select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .where(col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .localCheckpoint() // reused every round — scan the pair join once
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = sym.isEmpty
    while (!converged && iter < maxIter) {
      val nbrMin = sym.join(labels, col("b") === col("id"))
        .groupBy(col("a")).agg(min(col("comp")).as("nmin"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("a"), "left")
        .select(labels("id").as("id"),
          least(labels("comp"), coalesce(col("nmin"), labels("comp"))).as("comp"),
          labels("comp").as("prev"))
        .localCheckpoint()
      converged = next.where(col("comp") < col("prev")).isEmpty
      labels = next.drop("prev")
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          "(diameter too large — use the large-star/small-star form)")
    labels
  }
}
