package graft

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Library-quality gate, the dirty-data sibling of [[EmptyInputSpec]]:
  * EVERY query must run against tables where every column has had a
  * deterministic slice of its values nulled out — the
  * upstream-ETL-dropped-a-field / corrupt-shard case a 100 TB ingest
  * hits weekly. A query may silently drop null-keyed rows (inner-join /
  * explode semantics) or propagate nulls — what it must never do is die
  * with an NPE from typed lambda code, a MatchError on a null struct, or
  * an ANSI cast failure. Rows and exact values are NOT asserted (null
  * semantics differ per operator by design); completion and the contract
  * schema are. */
class NullInputSpec extends SparkSpec {

  /** sf0.001 with ~1/7 of every column nulled, staggered per column so
    * most rows keep most fields (hash-of-value selection: deterministic,
    * independent of read order). Key columns are nulled too — a null
    * foreign key is exactly what a bad upstream export produces. */
  private lazy val nullDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_nulls").toString
    Tables.all.foreach { t =>
      val df = Tables.load(spark, sfDir, t)
      val dirty = df.columns.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
        // xxhash64 of the stringified value + column ordinal: a stable
        // per-cell coin flip that survives column reorder and repartition
        d.withColumn(c,
          when(pmod(xxhash64(col(c).cast("string"), lit(i)), lit(7)) === 0,
            lit(null)).otherwise(col(c)))
      }
      dirty.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  /** Queries allowed to refuse dirty input with a DELIBERATE error
    * (require()/IllegalArgumentException carrying a message) — trainer
    * seeds that need specific rows by construction. An opaque
    * NPE/MatchError is never acceptable. */
  private val mayRefuseNulls: Set[String] = Set.empty

  test("every query survives null-riddled input with the contract schema") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try {
        val df = q(spark, nullDir)
        df.count()
        val got = df.schema.map(f => (f.name, f.dataType))
        val want = q(spark, sfDir).schema.map(f => (f.name, f.dataType))
        if (got != want)
          Some(s"$name: null-input schema drift: got $got, want $want")
        else None
      } catch {
        case _: IllegalArgumentException if mayRefuseNulls(name) => None
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    assert(failures.isEmpty, s"${failures.size} queries crash on null-riddled input:\n" +
      failures.mkString("\n"))
  }
}
