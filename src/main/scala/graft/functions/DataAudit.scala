package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audit primitives: constraint and referential-integrity
  * censuses over the lake tables, producing one `(check_name, n_bad, n_rows)`
  * row per check. The reference enforces none of this in-engine (bad
  * rows surface as report anomalies); a 100 TB ingest needs the checks
  * as first-class pre-publish operators — the constraint half of what
  * Delta `CHECK` constraints / deequ provide, kept engine-portable so
  * the census itself is oracle-checkable.
  *
  * Scale notes: [[predicateChecks]] fuses every predicate on the same
  * table into ONE scan (conditional sums in a single agg, unpivoted via
  * stack); [[orphanCheck]] is a left-anti join on the foreign key — the
  * same shuffle the production join would do anyway, so auditing costs
  * one pass, not a new plan shape; [[duplicateKeyCheck]] is a
  * distinct-count delta, one hash agg. */
object DataAudit {

  /** Fused predicate census: one row per (name, badWhen) pair, ONE scan
    * of `df` total. `n_bad` counts rows where the predicate holds. */
  def predicateChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one predicate check")
    // names are spliced into selectExpr (stack literal + __bad_ column):
    // anything beyond identifier characters would break parsing or inject
    // expressions, so reject it up front
    checks.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_]+"),
        s"check name '$name' must match [A-Za-z0-9_]+")
    }
    val aggs = checks.map { case (name, bad) =>
      sum(when(bad, 1L).otherwise(0L)).as(s"__bad_$name")
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.map { case (name, _) =>
      s"'$name', __bad_$name"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${checks.size}, $stacked) AS (check_name, n_bad)", "__n AS n_rows")
  }

  /** Referential integrity: child rows whose key misses every parent.
    * ONE scan of the child: a left join against the DISTINCT parent keys
    * (distinct ⇒ no row amplification) feeds both the orphan count and
    * the row count from the same pass — an anti-join + separate count
    * would read the child twice. */
  def orphanCheck(name: String, child: DataFrame, parent: DataFrame,
      childKey: String, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey)).distinct()
          .withColumn("__hit", lit(1)),
        col(childKey) === col(parentKey), "left")
      .agg(
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_bad"),
        count(lit(1)).as("n_rows"))
      .select(lit(name).as("check_name"), col("n_bad"), col("n_rows"))

  /** Primary-key uniqueness: rows beyond the first per key value. */
  def duplicateKeyCheck(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
    df.agg(
        (count(lit(1)) - count_distinct(struct(keys.map(col): _*))).as("n_bad"),
        count(lit(1)).as("n_rows"))
      .select(lit(name).as("check_name"), col("n_bad"), col("n_rows"))

  /** Union any number of check frames into one ordered report. */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _).orderBy(col("check_name"))

  /** Zero-extra-scan pipeline metrics via Spark's Observation API: the
    * returned frame computes `metrics` as a side effect of whatever
    * action next runs on it (a write, a count), with NO second scan —
    * at 100 TB the difference between "audited" and "audited at 2×
    * cost". The thunk blocks until that action completes, then yields
    * the metric row as a map.
    *
    * The reference audits by re-querying published tables
    * (`monitor/MonitorApp.scala` re-reads report output); this rides
    * the production action itself. Metrics must be aggregates
    * (sum/count/min/max...) per the Observation contract. */
  def observed(df: DataFrame, name: String, metrics: (String, Column)*)
      : (DataFrame, () => Map[String, Any]) = {
    require(metrics.nonEmpty, "need at least one observed metric")
    val obs = new org.apache.spark.sql.Observation(name)
    val out = df.observe(obs,
      metrics.head._2.as(metrics.head._1),
      metrics.tail.map { case (n, c) => c.as(n) }: _*)
    (out, () => obs.get)
  }
}
