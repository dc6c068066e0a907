package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filtered semi-join: the explicit form of Spark's runtime filter
  * (`InjectRuntimeFilter`), for fact–dim pruning where the dim's key set
  * is too big to broadcast as an exact set but a few-MB sketch of it is
  * cheap to ship.
  *
  * Three-step plan, exact end to end:
  *   1. aggregate `xxhash64(dim key)` into a `BloomFilterAggregate`
  *      sketch (partial aggregation map-side, one tiny merged row);
  *   2. prefilter the fact with the codegen'd `BloomFilterMightContain`
  *      probe — this runs IN THE SCAN STAGE, so rows that cannot join are
  *      dropped before the shuffle (at 100 TB the shuffle, not the scan,
  *      is what the filter is buying back);
  *   3. exact `left_semi` join on the key to strip bloom false positives.
  *
  * Step 3 makes the composition exact (oracle = plain semi-join); the
  * bloom only shrinks the fact side of that shuffle from |fact| to
  * |matches| + |fact|·fpp rows. The sketch travels as a literal in the
  * plan — the same "scalar subquery result embedded in the probe" shape
  * Catalyst itself produces, with sizing under caller control
  * (`estItems`; the aggregate picks optimal bits for ~3% fpp).
  *
  * Reference analogue: the reference prunes fact scans with driver-built
  * id whitelists pushed into SQL IN-lists (`utils/DBUtils.scala:56-109`
  * shard discovery + per-shard predicates); a bloom sketch is the
  * scale-safe version of the same idea — constant-size, no 10⁶-element
  * IN-list in the plan.
  */
object BloomJoin {

  /** Build the bloom sketch of column `key` over `dim`. One job: partial
    * bloom per partition, OR-merged to a single binary row, collected.
    * The result is bounded (≤ a few MB) regardless of |dim| — this is a
    * sketch collect, not a data collect. */
  def buildSketch(dim: DataFrame, key: String, estItems: Long): Array[Byte] =
    dim.select(
        call_function("graft_bloom_agg", xxhash64(col(key)), lit(estItems)).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** The codegen'd probe column: true iff `key` might be in `sketch`. */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    call_function("graft_might_contain", lit(sketch), xxhash64(key))

  /** Exact semi-join of `fact` against `dim` keys, bloom-pruned before
    * the shuffle. Keys are column NAMES resolved per-frame with
    * unresolved `col()` refs — cross-frame `df(name)` Columns carry
    * dataset-id metadata whose re-resolution breaks under join dedup. */
  def prunedSemiJoin(fact: DataFrame, factKey: String,
                     dim: DataFrame, dimKey: String,
                     estItems: Long): DataFrame = {
    val sketch = buildSketch(dim, dimKey, estItems)
    fact.filter(mightContain(sketch, col(factKey)))
      .join(dim.select(col(dimKey).as(factKey)).distinct(), Seq(factKey), "left_semi")
  }
}
