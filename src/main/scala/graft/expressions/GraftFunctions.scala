package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Registry for graft's native Catalyst expressions. Registration is
  * per-session and idempotent; queries reach the expressions through
  * `functions.call_function("graft_fdot", ...)`, which resolves against
  * this registry at analysis time. [[graft.core.Tables]] calls
  * [[ensureRegistered]] on every table load, so any externally-created
  * SparkSession that runs a graft query gets the functions installed
  * without needing `spark.sql.extensions` configuration (and
  * [[graft.core.GraftExtensions]] installs the same set through the
  * `spark.sql.extensions` config for sessions that never touch Tables).
  *
  * `graft_bloom_agg` / `graft_might_contain` surface Spark's own
  * runtime-filter expressions (`BloomFilterAggregate`,
  * `BloomFilterMightContain` — the pair `InjectRuntimeFilter` plants
  * under shuffle joins) so [[graft.operators.BloomJoin]] can build the
  * same map-side bloom prune explicitly, with graft controlling sizing
  * and placement. `BloomFilterMightContain` has `doGenCode`, so the
  * probe stays inside whole-stage codegen. Both sides hash with
  * `xxhash64` (LongType), exactly as `InjectRuntimeFilter` does.
  */
object GraftFunctions {

  private val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_fdot", classOf[FloatDotProduct].getName,
      args => FloatDotProduct(args.head, args(1))),
    // (xxhash64(key), estimatedNumItems [, numBits]) -> binary sketch
    ("graft_bloom_agg", classOf[BloomFilterAggregate].getName,
      args =>
        if (args.size >= 3) new BloomFilterAggregate(args(0), args(1), args(2))
        else new BloomFilterAggregate(args(0), args(1))),
    // (bloom binary literal, xxhash64(key)) -> boolean, codegen'd
    ("graft_might_contain", classOf[BloomFilterMightContain].getName,
      args => BloomFilterMightContain(args(0), args(1))),
    // (bigint x, bigint y, foldable int bits) -> bigint Hilbert index,
    // one codegen'd loop (replaces the 10-step column unroll — r12)
    ("graft_hilbert", classOf[HilbertIndex].getName,
      args => HilbertIndex(args(0), args(1), args(2))),
    // (string text, foldable array<array<string>> merges) -> bigint BPE
    // token count / array<string> token sequence; (text, merges,
    // foldable array<bigint> sizes) -> per-prefix counts. The native
    // form of BpeTrainer's heap encoder (replaces the typed MapElements
    // encode across the q223 pack/export family — r13)
    ("graft_bpe_ntokens", classOf[BpeTokenCount].getName,
      args => BpeTokenCount(args(0), args(1))),
    ("graft_bpe_tokens", classOf[BpeTokens].getName,
      args => BpeTokens(args(0), args(1))),
    ("graft_bpe_curve", classOf[BpeCurve].getName,
      args => BpeCurve(args(0), args(1), args(2)))
  )

  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, className, builder) =>
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id)) {
        reg.registerFunction(id, new ExpressionInfo(className, name), builder)
      }
    }
  }

  /** The same registrations, for injection points that hand out
    * (name, info, builder) triples — see [[graft.core.GraftExtensions]]. */
  def injectable: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    builders.map { case (name, className, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo(className, name), builder)
    }
}
