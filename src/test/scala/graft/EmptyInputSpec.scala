package graft

import graft.core.Tables
import org.apache.spark.sql.functions.lit

/** Library-quality gate: EVERY query must run (not necessarily return
  * rows) against structurally-identical but EMPTY tables — the
  * first-day-of-a-new-tenant / fully-filtered-partition case a 100 TB
  * deployment hits constantly. Catches driver-side `.head` on empty
  * aggregates, divisions that only work with rows present, and
  * collect-based loop seeds that assume data. Queries that legitimately
  * REQUIRE non-empty input (trainer-style seeds) must throw a
  * deliberate, descriptive error, not an opaque NPE/NoSuchElement. */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    Tables.all.foreach { t =>
      Tables.load(spark, sfDir, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  /** The ONLY queries allowed to refuse empty input, each with a
    * deliberate require()/IllegalArgumentException guard (trainer-style
    * seeds that need data by construction). Any other query throwing
    * IllegalArgumentException is a regression — it must return an empty
    * frame instead (round-5 ADVICE: a blanket IAE exemption would let a
    * spurious require() slip through the gate). */
  private val mayRefuseEmpty: Set[String] = Set.empty

  test("every query runs on empty tables with the contract schema") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try {
        val df = q(spark, emptyDir)
        df.count()
        // rows are optional but the CONTRACT SCHEMA is not: a limit(0)
        // with the wrong column set would otherwise pass (round-5
        // verdict #5). Nullability is excluded — it varies with
        // data-dependent optimizations, not the contract.
        val got = df.schema.map(f => (f.name, f.dataType))
        val want = q(spark, sfDir).schema.map(f => (f.name, f.dataType))
        if (got != want)
          Some(s"$name: empty-input schema drift: got $got, want $want")
        else None
      } catch {
        case _: IllegalArgumentException if mayRefuseEmpty(name) => None
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    assert(failures.isEmpty, s"${failures.size} queries crash on empty input:\n" +
      failures.mkString("\n"))
  }
}
