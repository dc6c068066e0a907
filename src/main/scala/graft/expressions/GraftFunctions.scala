package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registry for graft's native Catalyst expressions. Registration is
  * per-session and idempotent; queries reach the expressions through
  * `functions.call_function("graft_fdot", ...)`, which resolves against
  * this registry at analysis time. [[graft.core.Tables]] calls
  * [[ensureRegistered]] on every table load, so any externally-created
  * SparkSession that runs a graft query gets the functions installed
  * without needing `spark.sql.extensions` configuration.
  */
object GraftFunctions {

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_fdot" -> { args => FloatDotProduct(args.head, args(1)) }
  )

  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id)) {
        reg.registerFunction(id,
          new ExpressionInfo(classOf[FloatDotProduct].getName, name), builder)
      }
    }
  }
}
