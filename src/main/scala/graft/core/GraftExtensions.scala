package graft.core

import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions` entry point: installs graft's native
  * expressions into any SparkSession at build time, so clusters that
  * configure
  *
  * {{{
  *   spark.sql.extensions=graft.core.GraftExtensions
  * }}}
  *
  * (spark-submit conf, no code change) can call `graft_fdot` /
  * `graft_bloom_agg` / `graft_might_contain` from SQL or
  * `call_function` without ever touching [[Tables]]. The injected set is
  * the same [[graft.expressions.GraftFunctions.injectable]] list the
  * per-session registry uses — one source of truth, two installation
  * paths (config-time here, lazy `ensureRegistered` there).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.expressions.GraftFunctions.injectable.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
    // equi-keyless interval-overlap joins → bucket-decomposed equi joins
    ext.injectOptimizerRule(_ => graft.plans.OverlapJoinRewrite())
  }
}
